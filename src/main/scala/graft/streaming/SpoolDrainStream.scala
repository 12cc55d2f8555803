package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming Firehose drain (SURVEY §2 #87) — the reference uploader
  * loop (spool.py:105-130 + 199-211) as a streaming query over the
  * spool directory: `readStream.format("graft-spool")` tails the
  * spool exactly as the drain thread polls it, and each micro-batch's
  * records are packed into put-record batches under the SAME ≤ count
  * / ≤ bytes caps with the SAME oracle-verified greedy fold the batch
  * operator uses ([[graft.operators.Envelope.packRecords]]).
  *
  * Record sizes come from the spool files' on-disk byte lengths (the
  * reference packs by gzip size, sink.py:179), looked up with ONE
  * directory listing per micro-batch — the uploader's metadata poll,
  * bounded by files-per-trigger, never a data scan. The drain log
  * appends one row per put batch; at-least-once across restarts comes
  * from the source's checkpointed file-name watermark (a record never
  * re-enters a later micro-batch, matching the reference's unlink-
  * after-success contract).
  */
object SpoolDrainStream {

  /** One drain-log row per (micro_batch, dest, batch_id). */
  def drainQuery(spark: SparkSession, spoolDir: String,
                 checkpointDir: String, outDir: String,
                 maxCount: Int = graft.operators.Envelope.TestBatchCount,
                 maxSize: Long = graft.operators.Envelope.TestBatchSize): StreamingQuery =
    spark.readStream.format("graft-spool").load(spoolDir)
      .select("log_group", "log_stream", "src_file", "timestamp")
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sess = batch.sparkSession
        // one record per spool FILE: header + earliest event time.
        // src_file is the full URI; key on the bare name, which is
        // what the metadata poll below sees (and what spool.py keys
        // its drain on)
        val files = batch
          .withColumn("fname", element_at(split(col("src_file"), "/"), -1))
          .groupBy("fname")
          .agg(first("log_group").as("dest"),
            first("log_stream").as("source"),
            min("timestamp").as("first_event"))
        // uploader metadata poll: file → gzip byte size
        val p = new Path(spoolDir)
        val fs = p.getFileSystem(sess.sparkContext.hadoopConfiguration)
        val sizes = fs.listStatus(p).toSeq
          .filter(_.getPath.getName.endsWith(".gz"))
          .map(s => (s.getPath.getName, s.getLen))
        import sess.implicits._
        val sizeDf = sizes.toDF("fname", "part_bytes")
        val records = files.join(broadcast(sizeDf), Seq("fname"))
          .select(col("source"), col("dest"),
            col("fname").as("part_id"), col("part_bytes"),
            col("first_event"))
        graft.operators.Envelope.packRecords(records, maxCount, maxSize)
          .groupBy("dest", "batch_id")
          .agg(count(lit(1)).as("n_records"), sum("part_bytes").as("batch_bytes"))
          .withColumn("micro_batch", lit(batchId))
          .write.mode("append").parquet(outDir)
      }
      .start()
}
