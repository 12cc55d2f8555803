package graft.streaming

import graft.operators.Dedup.{Bands, MinhashSeeds}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming MinHash-LSH near-dup admission (SURVEY §2 #82) — the
  * streaming twin of the batch `Dedup.dedupMinhash`: documents arrive
  * in micro-batches and each is flagged against every document seen
  * BEFORE it (this batch or any earlier one, across restarts).
  *
  * The batch job computes signatures with a map-side-combined
  * aggregate (explode + 32 min-aggs); a stream must not shuffle per
  * token, so here the signature folds INSIDE the row (HOF over the
  * shingle array) using the IDENTICAL hash algebra — xxhash64(tok)
  * then xxhash64(seed, base), banded as xxhash64(band, slice) — so a
  * doc hashes to the same (band, band_hash) buckets in both engines
  * (spec-asserted: every batch-detected pair collides in the stream).
  *
  * The only keyed state is one owner doc-id per CLAIMED LSH bucket —
  * ≤ `Bands` longs per distinct document seen, hash-partitioned by
  * bucket exactly like the batch band join's shuffle. At 100 TB the
  * horizon is the knob: swap NoTimeout for an ingest-time timeout so
  * buckets expire past the dedup window (the batch LSH pass over the
  * spooled corpus owns history beyond it).
  */
object MinhashStream {

  case class BandRow(doc_id: Long, band: Int, band_hash: Long)
  case class BucketOwner(owner: Long)
  /** One row per (incoming doc, band): which doc owns the bucket this
    * band landed in (owner == doc_id means this doc claimed it). */
  case class BandObs(doc_id: Long, band: Int, owner: Long)

  private val RowsPerBand = MinhashSeeds / Bands

  /** Per-row signature + band rows — no shuffle, stream-safe. */
  def bandRows(docs: DataFrame): Dataset[BandRow] = {
    import docs.sparkSession.implicits._
    docs
      .withColumn("toks", array_distinct(
        graft.functions.TextFunctions.word_ngrams(
          graft.functions.TextFunctions.normText(col("text")), 2)))
      .filter(size(col("toks")) > 0)
      .withColumn("base", expr("transform(toks, t -> xxhash64(t))"))
      .withColumn("sig", expr(
        s"""transform(sequence(0, ${MinhashSeeds - 1}),
           |  i -> array_min(transform(base, h -> xxhash64(i, h))))""".stripMargin))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, ${Bands - 1}),
           |  b -> xxhash64(b, slice(sig, b * $RowsPerBand + 1, $RowsPerBand)))""".stripMargin))
        .as(Seq("band", "band_hash")))
      .select(col("doc_id"), col("band").cast("int").as("band"), col("band_hash"))
      .as[BandRow]
  }

  /** First writer claims each bucket; everyone reports the owner.
    * Within a micro-batch the smallest doc_id claims (deterministic
    * regardless of arrival order inside the batch). */
  def bandObservations(docs: DataFrame): Dataset[BandObs] = {
    import docs.sparkSession.implicits._
    bandRows(docs)
      .groupByKey(r => (r.band, r.band_hash))
      .flatMapGroupsWithState[BucketOwner, BandObs](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (_, rows, state) =>
        val sorted = rows.toArray.sortBy(_.doc_id)
        val owner =
          if (state.exists) state.get.owner else sorted.head.doc_id
        if (!state.exists) state.update(BucketOwner(owner))
        sorted.iterator.map(r => BandObs(r.doc_id, r.band, owner))
      }
  }

  /** File-based ingest: per-band observations collapse to one verdict
    * row per doc in foreachBatch — `dup_of` = smallest colliding
    * owner, null means every bucket was fresh and the doc is ADMITTED
    * (batch_id stamps the increment; the parquet log is the admission
    * record). */
  def dedupQuery(spark: SparkSession, inputDir: String, schema: StructType,
                 checkpointDir: String, outDir: String): StreamingQuery =
    bandObservations(
      spark.readStream.schema(schema).parquet(inputDir))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .foreachBatch { (batch: Dataset[BandObs], batchId: Long) =>
        batch.toDF()
          .groupBy("doc_id")
          .agg(min(when(col("owner") =!= col("doc_id"), col("owner")))
            .as("dup_of"))
          .withColumn("admitted", col("dup_of").isNull.cast("int"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
      }
      .start()
}
