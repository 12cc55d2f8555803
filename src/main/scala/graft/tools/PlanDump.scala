package graft.tools

import graft.{GraftSession, SparkEntry}

/** Plan-audit helper: print the executed physical plan of one or more
  * `SparkEntry.queries` entries plus a one-line hazard summary
  * (cartesian products, nested-loop joins, single-partition exchanges,
  * whole-stage coverage) — the explain-driven iteration loop SURVEY §4
  * documents, as a tool instead of ad-hoc shell.
  *
  *   sbt "runMain graft.tools.PlanDump q1_pricing,corpus_pagerank [sfDir] [full]"
  *
  * Counts read the INITIAL adaptive plan (the query is planned, not
  * executed): join strategies may still improve under AQE at runtime
  * (shuffle joins becoming broadcasts at test scale), so treat the
  * summary as the worst-case strategy — a cartesian or nested-loop
  * flagged here is real, a SortMergeJoin may be AQE-upgraded. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args.headOption
      .map(_.split(",").toSeq)
      .getOrElse(Seq("q1_pricing"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val full = args.lift(2).contains("full")
    val spark = GraftSession.create()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      if (full) {
        println(s"==== $name ====")
        println(plan)
      }
      def n(sub: String) = plan.linesIterator.count(_.contains(sub))
      println(s"[plan] $name: exchanges=${n("Exchange")} " +
        s"wholestage=${n("WholeStageCodegen")} " +
        s"cartesian=${n("CartesianProduct")} " +
        s"bnlj=${n("BroadcastNestedLoopJoin")} " +
        s"smj=${n("SortMergeJoin")} bhj=${n("BroadcastHashJoin")} " +
        s"singlePartition=${n("SinglePartition")}")
    }
    spark.stop()
  }
}
