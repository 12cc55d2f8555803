package graft

import org.apache.spark.sql.functions._

/** Corpus-cleaning composition (#44) invariants. */
class CorpusSpec extends SparkSpec {

  test("every document gets exactly one verdict; tags only on kept docs") {
    val out = operators.Corpus.corpusClean(spark, sf)
    assert(out.count() === Tables.load(spark, sf, "documents").count())
    assert(out.filter(col("verdict") === "kept" && col("lang_tag").isNull)
      .count() === 0)
    assert(out.filter(col("verdict") =!= "kept" && col("lang_tag").isNotNull)
      .count() === 0)
  }

  test("near-dup drops are exactly the Jaccard pair higher ids") {
    val out = operators.Corpus.corpusClean(spark, sf)
    val dropped = out.filter(col("verdict") === "near_dup")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = operators.Dedup.dedupJaccard(spark, sf)
      .select("doc_b").collect().map(_.getLong(0)).toSet
    assert(dropped === expected)
  }

  test("kept docs survive all three gates") {
    val out = operators.Corpus.corpusClean(spark, sf)
    val kept = out.filter(col("verdict") === "kept")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val quality = graft.functions.TextFunctions.quality(spark, sf)
      .filter(col("quality_ok") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(quality))
  }
}
