package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Dedup

/** One-off timing split for dedup_clusters: pairs pipeline vs the
  * connected-components loop. Diagnostic main, not part of the
  * library surface (collect-free; count actions only). */
object ClusterProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create()
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - s) / 1e9}%.2f s")
      r
    }
    // warmup: JIT + parquet footer caches
    t("warmup pairs")(Dedup.dedupMinhashPoly(spark, dir).count())
    val pairs = t("pairs count")(
      Dedup.dedupMinhashPoly(spark, dir).select("doc_a", "doc_b"))
    t("pairs action")(pairs.count())
    val labels = t("components plan")(Dedup.connectedComponents(pairs))
    t("components action")(labels.count())
    t("full query")(Dedup.dedupClusters(spark, dir).count())
    spark.stop()
  }
}
