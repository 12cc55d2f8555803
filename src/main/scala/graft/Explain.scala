package graft

/** Diagnostic main: print the post-AQE physical plan of one (or
  * every) `SparkEntry.queries` entry.
  *
  *   sbt "runMain graft.Explain <queryName> [sfDir]"
  *
  * Runs the query first so AQE settles, then prints only the final
  * plan — the tool behind the plan audits in PlanSpec.scala and the
  * SURVEY §4/§6 notes.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_pricing")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.create()
    val df = SparkEntry.queries(name)(spark, dir)
    // collect() (NOT df.write, which builds a separate QueryExecution)
    // so THIS plan's AQE stages materialize with their WholeStageCodegen
    // wrappers before printing
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    println(s"=== $name @ $dir ===")
    println(plan)
    spark.stop()
  }
}
