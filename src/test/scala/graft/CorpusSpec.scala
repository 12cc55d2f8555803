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

  test("content-keyed split: duplicates co-locate, ratios near 90/5/5") {
    val out = operators.Corpus.corpusSplit(spark, sf)
    // identical normalized content -> identical split (no leakage)
    val dups = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        lower(trim(regexp_replace(col("text"), "\\s+", " "))).as("norm"))
      .join(out, Seq("doc_id"))
      .groupBy("norm").agg(countDistinct("split").as("nsplits"))
    assert(dups.filter(col("nsplits") > 1).count() === 0)
    // buckets in range; train is the large majority
    assert(out.filter(col("bucket") < 0 || col("bucket") > 99).count() === 0)
    val n = out.count().toDouble
    val train = out.filter(col("split") === "train").count().toDouble
    assert(train / n > 0.8 && train / n < 0.97, s"train=${train / n}")
  }
}
