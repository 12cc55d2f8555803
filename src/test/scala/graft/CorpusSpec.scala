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

  test("decontamination flags exactly the docs sharing a benchmark n-gram") {
    val out = operators.Corpus.corpusDecontaminate(spark, sf)
    val docs = Tables.load(spark, sf, "documents").count()
    val benchDocs = Tables.load(spark, sf, "documents")
      .filter(col("doc_id") % operators.Corpus.BenchmarkMod === 0).count()
    // benchmark docs are excluded from the output
    assert(out.count() === docs - benchDocs)
    assert(out.filter(col("doc_id") % operators.Corpus.BenchmarkMod === 0)
      .count() === 0)
    // an exact copy of a benchmark doc MUST be flagged: every doc's
    // text equal to a benchmark doc's normalized text is contaminated
    val norm = graft.functions.TextFunctions.normText(col("text"))
    val d = Tables.load(spark, sf, "documents").select(col("doc_id"), norm.as("n"))
    val benchTexts = d.filter(col("doc_id") % operators.Corpus.BenchmarkMod === 0)
      .select(col("n").as("bn"))
    val copies = d.join(benchTexts, col("n") === col("bn"))
      .filter(col("doc_id") % operators.Corpus.BenchmarkMod =!= 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    if (copies.nonEmpty) {
      val flagged = out.filter(col("contaminated") === 1)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(copies.subsetOf(flagged))
    }
    // flag agrees with n_shared; bench_id present iff contaminated
    assert(out.filter(col("contaminated") === 1 && col("n_shared") < 1).count() === 0)
    assert(out.filter(col("contaminated") === 0 &&
      (col("n_shared") > 0 || col("bench_id").isNotNull)).count() === 0)
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
