package graft

/** Diagnostic main: time one `SparkEntry.queries` entry with the same
  * harness rules as Bench (noop materialization, discarded warmup),
  * printing every pass so run-to-run variance is visible.
  *
  *   sbt "runMain graft.Time <queryName> [sfDir] [passes]"
  */
object Time {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_pricing")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = GraftSession.create()
    val fn = SparkEntry.queries(name)
    fn(spark, dir).write.format("noop").mode("overwrite").save() // warmup
    val times = (1 to passes).map { i =>
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[time] $name pass $i: $s%.3f s")
      s
    }
    println(f"[time] $name median: ${times.sorted.apply(passes / 2)}%.3f s @ $dir")
    spark.stop()
  }
}
