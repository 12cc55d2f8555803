package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** #69 spool_source — the spool DIRECTORY round-trip through the
  * DataSourceV2 reader: materialize real `*.gz` spool files on disk
  * (one gzip CloudWatch record per file, exactly the bytes
  * `record_gzip` verifies in-plan), then read them back with
  * `spark.read.format("graft-spool")` and explode to events.
  *
  * The oracle is the plain synthesized event set (same as
  * `spool_read`), so file write → gzip → DSv2 scan → JSON parse →
  * explode is verified value-for-value in DuckDB.
  *
  * The spool files are written EXECUTOR-SIDE (foreachPartition) — on
  * a cluster the same code targets a shared filesystem; no event data
  * ever funnels through the driver.
  */
object Spool {

  /** Scratch base for the round-trip queries. Resolved from
    * `spark.graft.spool.scratch` when set (REQUIRED on a multi-node
    * cluster: it must name a shared filesystem path — the driver's
    * java.io.tmpdir default is node-local, so executor writes would
    * land on executor disks and the driver-side read-back would see
    * none of them); the default serves the local-mode oracle gate.
    * Resolved and manipulated as a Hadoop Path end to end — the same
    * abstraction the executor-side writes and the DSv2 read-back use —
    * so URI-schemed values (hdfs://, s3a://) work exactly like POSIX
    * paths instead of being mangled by java.io.File. */
  private def scratchPath(spark: SparkSession, dir: String,
                          prefix: String): org.apache.hadoop.fs.Path = {
    val base = spark.conf.getOption("spark.graft.spool.scratch")
      .getOrElse(sys.props("java.io.tmpdir"))
    new org.apache.hadoop.fs.Path(base,
      s"$prefix-${spark.sparkContext.applicationId}-${new File(dir).getName}")
  }

  /** (Re)create `p` empty, through its own FileSystem. */
  private def resetDir(spark: SparkSession,
                       p: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.Path = {
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(p, true)
    fs.mkdirs(p)
    p
  }

  /** Write one `.gz` file per spool record under `scratch`
    * (idempotent: the directory is cleared first). */
  private[graft] def writeSpoolDir(spark: SparkSession, dir: String): String = {
    val scratch = resetDir(spark, scratchPath(spark, dir, "graft-spool"))
    val base = scratch.toString
    val ser = new SerializableHadoopConf(
      spark.sessionState.newHadoopConf())
    graft.operators.Envelope
      .spoolBodies(spark, dir, graft.operators.Envelope.spoolFileRecordSize)
      .select(col("source"), col("dest"), col("part_id"), col("gz"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        // Hadoop FS, not java.io: with spark.graft.spool.scratch on a
        // shared filesystem each executor writes its rows directly;
        // the session conf ships with the closure so spark.hadoop.*
        // settings survive to the executor
        val conf = ser.value
        rows.foreach { r =>
          val name = s"${r.getAs[String]("source")}-${r.getAs[Int]("dest")}-" +
            s"${r.getAs[Long]("part_id")}.gz"
          val p = new org.apache.hadoop.fs.Path(base, name)
          val out = p.getFileSystem(conf).create(p, true)
          try out.write(r.getAs[Array[Byte]]("gz")) finally out.close()
        }
      }
    base
  }

  /** Read a spool directory back to the per-event oracle shape. */
  private def readBack(spark: SparkSession, path: String): DataFrame =
    spark.read.format("graft-spool").load(path)
      .select(
        col("id").cast("long").as("event_id"),
        col("log_stream").as("source"),
        element_at(split(col("log_group"), "/"), 3).cast("int").as("dest"),
        col("log_stream"),
        col("message"),
        col("timestamp").as("ts_ms"))
      .orderBy("event_id")

  def spoolSource(spark: SparkSession, dir: String): DataFrame =
    readBack(spark, writeSpoolDir(spark, dir))

  /** #72 spool_sink — the WRITE direction through the DataSourceV2
    * writer: event rows flow through
    * `df.write.format("graft-spool")`, whose per-task writers buffer
    * per (log_group, log_stream) and flush a gzip CloudWatch record
    * file whenever the next event would push the record past
    * `maxRecordBytes` (the reference sink's flush rule,
    * sink.py:167-186). Reading the directory back must reproduce the
    * synthesized events value-for-value — same oracle as
    * spool_source, so the writer's record packing is proven lossless
    * regardless of how rows were partitioned across writers. */
  def spoolSink(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Envelope.{GroupPrefix, MessageClass, Owner}
    val scratch = resetDir(spark, scratchPath(spark, dir, "graft-spoolsink"))
    val group = concat_ws("/", lit(GroupPrefix), lit(MessageClass), col("dest"))
    graft.operators.Envelope.withEnvelopeCols(spark, dir)
      .select(
        lit(Owner).as("owner"),
        group.as("log_group"),
        col("source").as("log_stream"),
        lit("DATA_MESSAGE").as("message_type"),
        array(group).as("subscription_filters"),
        lpad(col("event_id").cast("string"), 56, "0").as("id"),
        col("message"),
        (col("ts_s") * 1000).as("timestamp"))
      // one writer per stream: header-local buffers, per-stream files
      .repartition(col("log_group"), col("log_stream"))
      .write.format("graft-spool")
      .option("maxRecordBytes", graft.operators.Envelope.spoolFileRecordSize.toString)
      .mode("append").save(scratch.toString)
    readBack(spark, scratch.toString)
  }

  /** Identical shape to spool_read's oracle: the DSv2 path must
    * reproduce the synthesized events exactly. */
  val spoolSourceSql: String =
    """WITH e AS (
      |  SELECT event_id, epoch_ns(ts)//1000000000 AS ts_s,
      |    '10.0.0.' || (user_id % 200) AS source,
      |    CASE WHEN event_type IN ('click','view') THEN 514
      |         WHEN event_type IN ('signup','purchase') THEN 601
      |         ELSE 6514 END AS dest,
      |    printf('<%d>%s id=%d', event_id % 192, event_type, event_id) AS message
      |  FROM events
      |)
      |SELECT event_id, source, dest, source AS log_stream,
      |  message, ts_s * 1000 AS ts_ms
      |FROM e
      |ORDER BY event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "spool_source" -> spoolSource,
    "spool_sink" -> spoolSink)

  val oracle: Map[String, String] = Map(
    "spool_source" -> spoolSourceSql,
    "spool_sink" -> spoolSourceSql)
}
