package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The full relay path in one plan: frame → parse →
    * envelope → record. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relay.relayPipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Analytics.queries ++
      operators.Syslog.queries ++
      operators.Framing.queries ++
      operators.Envelope.queries ++
      operators.Gelf.queries ++
      operators.Proxy.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      functions.TextFunctions.queries ++
      operators.Scrub.queries ++
      operators.Multimodal.queries ++
      operators.Relay.queries ++
      operators.Corpus.queries ++
      operators.Sequence.queries ++
      operators.Ngrams.queries ++
      operators.Bpe.queries ++
      operators.Sketch.queries ++
      operators.Skew.queries ++
      operators.Bucketing.queries ++
      operators.Url.queries ++
      operators.Classifier.queries ++
      operators.Graph.queries ++
      operators.Crawl.queries ++
      operators.MediaHash.queries ++
      operators.MediaPipeline.queries ++
      operators.Wordpiece.queries ++
      operators.Unigram.queries ++
      operators.AnnIndex.queries ++
      sources.Spool.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Analytics.oracle ++
      operators.Syslog.oracle ++
      operators.Framing.oracle ++
      operators.Envelope.oracle ++
      operators.Gelf.oracle ++
      operators.Proxy.oracle ++
      operators.Dedup.oracle ++
      operators.Similarity.oracle ++
      functions.TextFunctions.oracle ++
      operators.Scrub.oracle ++
      operators.Multimodal.oracle ++
      operators.Relay.oracle ++
      operators.Corpus.oracle ++
      operators.Sequence.oracle ++
      operators.Ngrams.oracle ++
      operators.Bpe.oracle ++
      operators.Skew.oracle ++
      operators.Bucketing.oracle ++
      operators.Sketch.oracle ++
      operators.Url.oracle ++
      operators.Classifier.oracle ++
      operators.Graph.oracle ++
      operators.Crawl.oracle ++
      operators.MediaHash.oracle ++
      operators.MediaPipeline.oracle ++
      operators.Wordpiece.oracle ++
      operators.Unigram.oracle ++
      operators.AnnIndex.oracle ++
      sources.Spool.oracle
}
