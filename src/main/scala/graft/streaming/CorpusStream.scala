package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming corpus ingest with incremental exact dedup — the
  * training-data twin of the batch `operators.Dedup.dedupExact`: a
  * pipeline that continuously receives documents and must admit each
  * distinct text exactly once, across micro-batches AND restarts
  * (fingerprint state lives in the checkpoint).
  *
  * Scale: state is one 128-bit digest per distinct document, hash-
  * partitioned by fingerprint — the same key the batch dedup shuffles
  * on. For unbounded corpora, swap `dropDuplicates` for
  * `dropDuplicatesWithinWatermark` over an ingest-time horizon so
  * state is evicted past the watermark (near-dup state at scale comes
  * from the MinHash-LSH batch pass over the deduped spool instead).
  */
object CorpusStream {

  private def fingerprint(c: org.apache.spark.sql.Column) =
    md5(graft.functions.TextFunctions.normText(c))

  /** Drop documents whose normalized-text fingerprint was already
    * admitted (this batch or any earlier one). */
  def dedupedStream(docs: DataFrame): DataFrame =
    docs
      .withColumn("fingerprint", fingerprint(col("text")))
      .dropDuplicates("fingerprint")

  /** File-based ingest: each parquet drop in `inputDir` is a feed
    * increment; admitted (first-seen) docs append to `outDir`. */
  def dedupQuery(spark: SparkSession, inputDir: String, schema: StructType,
                 outDir: String, checkpointDir: String): StreamingQuery =
    dedupedStream(
      spark.readStream.schema(schema).parquet(inputDir))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .outputMode("append")
      .start()
}
