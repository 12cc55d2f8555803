package graft.tools

import graft.{GraftSession, SparkEntry}
import java.nio.file.{Files, Paths}

/** Snapshot `.explain("formatted")` output for a set of queries into
  * plans/<tag>/<name>_<suffix>.txt — the before/after plan evidence
  * the optimization rounds commit alongside the bench numbers.
  *
  *   sbt "runMain graft.tools.PlanSnap <q1,q2,...> <suffix> [sfDir] [outDir]"
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("q1_pricing"))
    val suffix = args.lift(1).getOrElse("before")
    val dir = args.lift(2).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val outDir = args.lift(3).getOrElse("plans/r21")
    Files.createDirectories(Paths.get(outDir))
    val spark = GraftSession.create()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
        (s"== $name @ $dir ==\n" + formatted).getBytes("UTF-8"))
      println(s"[plansnap] wrote $outDir/${name}_$suffix.txt " +
        s"(${formatted.linesIterator.size} lines)")
    }
    spark.stop()
  }
}
