package graft.operators

import graft.{Constants, Tables}
import graft.functions.BinaryFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sink envelope, record split, Firehose batching and stats counters
  * (SURVEY §2 #15–19).
  *
  * Reference semantics re-expressed relationally:
  *  - events are grouped by (source, dest-port); each group becomes a
  *    CloudWatch-Logs-style record {owner, logGroup: prefix/class/port,
  *    logStream: source, subscriptionFilters, messageType, logEvents}
  *    (reference: kinesyslog/sink.py:148-217)
  *  - a record whose size exceeds MAX_RECORD_SIZE splits its events
  *    into ⌈size/max⌉ even parts (sink.py:167-186); the reference
  *    measures the gzipped JSON, we use the uncompressed event bytes —
  *    deterministic, scale-equivalent, and oracle-computable
  *  - spooled records drain into Firehose batches under the ≤500
  *    records / ≤4 MiB caps, greedily in drain order
  *    (spool.py:163-186, constant.py:16-17)
  *  - counters count messages/bytes per (port, source)
  *    (protocol.py:66-74)
  *
  * Scale: one shuffle on (source, dest) for envelope/split (map-side
  * partial aggregation applies); batching shuffles once on dest and
  * runs the greedy scan per dest-partition — the sequential part is
  * bounded by records-per-destination, never by event count. No
  * driver-side loops.
  *
  * Synthesis contract (shared with the oracles): source =
  * '10.0.0.'||(user_id % 200); dest = 514 (click/view), 601
  * (signup/purchase), 6514 (error); message = `<pri>type id=N`;
  * bytes = length(message).
  */
object Envelope {

  private val msg = format_string("<%d>%s id=%d",
    col("event_id") % 192, col("event_type"), col("event_id"))
  private val source = concat(lit("10.0.0."), col("user_id") % 200)
  private val dest = when(col("event_type").isin("click", "view"), 514)
    .when(col("event_type").isin("signup", "purchase"), 601)
    .otherwise(6514)

  private val msgSql = "printf('<%d>%s id=%d', event_id % 192, event_type, event_id)"
  private val sourceSql = "'10.0.0.' || (user_id % 200)"
  private val destSql =
    """CASE WHEN event_type IN ('click','view') THEN 514
      |     WHEN event_type IN ('signup','purchase') THEN 601
      |     ELSE 6514 END""".stripMargin.replace("\n", " ")

  private[graft] def withEnvelopeCols(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"), col("ts_s"),
      source.as("source"), dest.as("dest"), msg.as("message"))

  private val oracleBase =
    s"""WITH e AS (
      |  SELECT event_id, epoch_ns(ts)//1000000000 AS ts_s,
      |    $sourceSql AS source,
      |    $destSql AS dest,
      |    $msgSql AS message
      |  FROM events
      |)""".stripMargin

  // ---------------------------------------------------------------------
  // #15 record_envelope
  // ---------------------------------------------------------------------

  /** Group prefix/class as the reference composes logGroup
    * (sink.py:163: '{prefix}/{message_class}/{port}'). */
  val GroupPrefix = "graft"
  val MessageClass = "syslog"
  val Owner = "000000000000"

  def recordEnvelope(spark: SparkSession, dir: String): DataFrame =
    withEnvelopeCols(spark, dir)
      .groupBy("source", "dest")
      .agg(
        count(lit(1)).as("n_events"),
        sum(length(col("message")).cast("long")).as("total_bytes"),
        (min("ts_s") * 1000).as("min_ts_ms"),
        (max("ts_s") * 1000).as("max_ts_ms"))
      .select(
        col("source"), col("dest"),
        concat_ws("/", lit(GroupPrefix), lit(MessageClass), col("dest"))
          .as("log_group"),
        col("source").as("log_stream"),
        // default subscription filter = the log group (sink.py:199-200)
        concat_ws("/", lit(GroupPrefix), lit(MessageClass), col("dest"))
          .as("subscription_filter"),
        lit(Owner).as("owner"),
        lit("DATA_MESSAGE").as("message_type"),
        col("n_events"), col("total_bytes"), col("min_ts_ms"), col("max_ts_ms"))
      .orderBy("source", "dest")

  val recordEnvelopeSql: String =
    s"""$oracleBase
      |SELECT source, dest,
      |  'graft/syslog/' || dest AS log_group,
      |  source AS log_stream,
      |  'graft/syslog/' || dest AS subscription_filter,
      |  '000000000000' AS owner,
      |  'DATA_MESSAGE' AS message_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(length(message)) AS BIGINT) AS total_bytes,
      |  MIN(ts_s) * 1000 AS min_ts_ms,
      |  MAX(ts_s) * 1000 AS max_ts_ms
      |FROM e
      |GROUP BY source, dest
      |ORDER BY source, dest""".stripMargin

  // ---------------------------------------------------------------------
  // #16 record_split — even-part split of oversize records
  // ---------------------------------------------------------------------

  /** Test-scale record cap; the production default is
    * Constants.MaxRecordSize. At sf0.01 a (source,dest) group carries
    * ~1.5 KiB of messages, so 4096 exercises 1-, 2- and 3-part splits. */
  val TestRecordSize = 4096

  /** Record cap for the FILE-WRITING spool paths (spool_sink /
    * spool_source): the oracle surface keeps [[TestRecordSize]] so
    * records actually split at test scale, but a ×100 decade sweep at
    * 4 KiB would create ~900k gzip files per pass and measure
    * filesystem metadata, not record packing — the sweep sets
    * SPARK_GRAFT_SPOOL_RECORD_BYTES to the reference's production
    * MAX_RECORD_SIZE (constant.py: 1 024 000). Content round-trips
    * identically at any cap (the oracle compares EVENTS, not files),
    * so the knob cannot affect a correctness comparison. */
  def spoolFileRecordSize: Int =
    sys.env.get("SPARK_GRAFT_SPOOL_RECORD_BYTES").map(_.toInt)
      .getOrElse(TestRecordSize)

  /** Every event with its spool-record part assignment — the shared
    * upstream of record_split (aggregate view) and record_gzip (spool
    * bodies), so a gzipped record can never outgrow the split cap that
    * record_split enforces. */
  private def splitEvents(spark: SparkSession, dir: String,
                          maxRecord: Int): DataFrame = {
    val e = withEnvelopeCols(spark, dir)
      .withColumn("bytes", length(col("message")).cast("long"))
    val grp = Window.partitionBy("source", "dest")
    val ord = grp.orderBy("event_id")
    e.withColumn("rn0", row_number().over(ord) - 1)
      .withColumn("n", count(lit(1)).over(grp))
      .withColumn("size", sum("bytes").over(grp))
      // ⌈size/max⌉ even parts of ⌊n/parts⌋ events (sink.py:179-186);
      // the trailing remainder spills into one extra part exactly as
      // the reference's `while start < len` loop does. Integer `div`,
      // not `/`+cast: Column./ is IEEE double division, whose rounding
      // can cross an integer boundary at large magnitudes and diverge
      // from the oracle's `//` floor (the house rule Skew/Corpus cite).
      .withColumn("split_count",
        expr(s"(size + ${maxRecord - 1}) div $maxRecord"))
      .withColumn("part_len",
        greatest(lit(1L), expr("n div split_count")))
      .withColumn("part_id", expr("rn0 div part_len"))
  }

  def recordSplit(spark: SparkSession, dir: String,
                  maxRecord: Int = TestRecordSize): DataFrame =
    splitEvents(spark, dir, maxRecord)
      .groupBy("source", "dest", "part_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum("bytes").as("part_bytes"),
        min("event_id").as("first_event"),
        max("event_id").as("last_event"))
      .orderBy("source", "dest", "part_id")

  def recordSplitSql(maxRecord: Int = TestRecordSize): String =
    s"""$oracleBase,
      |sized AS (
      |  SELECT source, dest, event_id, length(message) AS bytes,
      |    row_number() OVER (PARTITION BY source, dest ORDER BY event_id) - 1 AS rn0,
      |    COUNT(*) OVER (PARTITION BY source, dest) AS n,
      |    SUM(length(message)) OVER (PARTITION BY source, dest) AS size
      |  FROM e
      |),
      |parts AS (
      |  SELECT *,
      |    GREATEST(1, n // ((size + $maxRecord - 1) // $maxRecord)) AS part_len
      |  FROM sized
      |)
      |SELECT source, dest, CAST(rn0 // part_len AS BIGINT) AS part_id,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(bytes) AS BIGINT) AS part_bytes,
      |  MIN(event_id) AS first_event,
      |  MAX(event_id) AS last_event
      |FROM parts
      |GROUP BY source, dest, part_id
      |ORDER BY source, dest, part_id""".stripMargin

  // ---------------------------------------------------------------------
  // #17 firehose_batches — greedy drain under count/size caps
  // ---------------------------------------------------------------------

  /** Test-scale caps; production defaults are MaxBatchCount=500 /
    * MaxBatchSize=4 MiB. */
  val TestBatchCount = 10
  val TestBatchSize = 4096L

  /** Greedy per-record batch assignment in drain order (source,
    * part_id) within each dest: one output row per spool record with
    * its batch_id. The greedy scan is a per-dest fold over the sorted
    * record list — bounded by records-per-dest (spool files), not
    * events. Input columns: source, dest, part_id, part_bytes,
    * first_event. */
  private[graft] def packRecords(records: DataFrame,
                          maxCount: Int, maxSize: Long,
                          keys: Seq[String] = Seq("dest")): DataFrame = {
    val recs = records.groupBy(keys.map(col): _*).agg(
      array_sort(collect_list(struct(col("source"), col("part_id"),
        col("part_bytes"), col("first_event")))).as("rs"))
    val assigned = recs.withColumn("batch_ids",
      expr(
        s"""aggregate(
           |  rs,
           |  struct(CAST(array() AS ARRAY<BIGINT>) AS ids,
           |         CAST(0 AS BIGINT) AS b,
           |         CAST(0 AS BIGINT) AS c,
           |         CAST(0 AS BIGINT) AS s),
           |  (acc, x) -> CASE
           |    WHEN acc.c > 0 AND (acc.c >= $maxCount OR acc.s + x.part_bytes > ${maxSize}L)
           |    THEN struct(array_append(acc.ids, acc.b + 1) AS ids,
           |                acc.b + 1 AS b, CAST(1 AS BIGINT) AS c,
           |                CAST(x.part_bytes AS BIGINT) AS s)
           |    ELSE struct(array_append(acc.ids, acc.b) AS ids,
           |                acc.b AS b, acc.c + 1 AS c, acc.s + x.part_bytes AS s)
           |    END,
           |  acc -> acc.ids)""".stripMargin))
    assigned
      .select(keys.map(col) :+
        explode(arrays_zip(col("rs"), col("batch_ids"))).as("z"): _*)
      .select(keys.map(col) ++ Seq(col("z.batch_ids").as("batch_id"),
        col("z.rs.source").as("source"), col("z.rs.part_id").as("part_id"),
        col("z.rs.part_bytes").as("part_bytes"),
        col("z.rs.first_event").as("first_event")): _*)
  }

  private def spoolRecords(spark: SparkSession, dir: String): DataFrame =
    recordSplit(spark, dir).select(
      col("source"), col("dest"), col("part_id"), col("part_bytes"),
      col("first_event"))

  def firehoseBatches(spark: SparkSession, dir: String,
                      maxCount: Int = TestBatchCount,
                      maxSize: Long = TestBatchSize): DataFrame =
    packRecords(spoolRecords(spark, dir), maxCount, maxSize)
      .groupBy("dest", "batch_id")
      .agg(count(lit(1)).as("n_records"), sum("part_bytes").as("batch_bytes"))
      .orderBy("dest", "batch_id")

  /** Spool-shard-salted batching (VERDICT r3 watch item): with only a
    * handful of delivery streams, the per-dest record array in the
    * greedy fold grows linearly with source count. Hashing each
    * record's source into one of `shards` spool shards bounds every
    * fold at records/shards while preserving both caps — the
    * distributed analogue of running several uploader workers against
    * one stream, which is how the reference deployment scales out
    * (multiple processes sharing a spool directory each drain their
    * own slice). Batches stay cap-compliant per (dest, shard); the
    * only divergence from single-drain packing is WHICH records share
    * a batch. */
  def firehoseBatchesSharded(spark: SparkSession, dir: String,
                             shards: Int = 8,
                             maxCount: Int = TestBatchCount,
                             maxSize: Long = TestBatchSize): DataFrame = {
    val salted = spoolRecords(spark, dir)
      .withColumn("shard", pmod(hash(col("source")), lit(shards)))
    packRecords(salted, maxCount, maxSize, keys = Seq("dest", "shard"))
      .groupBy("dest", "shard", "batch_id")
      .agg(count(lit(1)).as("n_records"), sum("part_bytes").as("batch_bytes"))
      .orderBy("dest", "shard", "batch_id")
  }

  def firehoseBatchesSql(maxCount: Int = TestBatchCount,
                         maxSize: Long = TestBatchSize): String = {
    val split = recordSplitSql()
      .replace("ORDER BY source, dest, part_id", "")
    // Greedy packing as a linear recursion over per-dest drain order.
    "WITH recs AS (\n" +
      "  SELECT dest, row_number() OVER (PARTITION BY dest ORDER BY source, part_id) AS rn,\n" +
      "         part_bytes AS bytes\n" +
      "  FROM (" + split + ")\n" +
      "),\n" +
      "packed AS (\n" +
      "  WITH RECURSIVE walk(dest, rn, bytes, batch, bc, bs) AS (\n" +
      "    SELECT dest, rn, bytes, 0, 1, bytes FROM recs WHERE rn = 1\n" +
      "    UNION ALL\n" +
      "    SELECT r.dest, r.rn, r.bytes,\n" +
      s"      CASE WHEN w.bc >= $maxCount OR w.bs + r.bytes > $maxSize\n" +
      "           THEN w.batch + 1 ELSE w.batch END,\n" +
      s"      CASE WHEN w.bc >= $maxCount OR w.bs + r.bytes > $maxSize\n" +
      "           THEN 1 ELSE w.bc + 1 END,\n" +
      s"      CASE WHEN w.bc >= $maxCount OR w.bs + r.bytes > $maxSize\n" +
      "           THEN r.bytes ELSE w.bs + r.bytes END\n" +
      "    FROM walk w JOIN recs r ON r.dest = w.dest AND r.rn = w.rn + 1\n" +
      "  )\n" +
      "  SELECT * FROM walk\n" +
      ")\n" +
      "SELECT dest, CAST(batch AS BIGINT) AS batch_id,\n" +
      "  COUNT(*) AS n_records, CAST(SUM(bytes) AS BIGINT) AS batch_bytes\n" +
      "FROM packed\n" +
      "GROUP BY dest, batch\n" +
      "ORDER BY dest, batch_id"
  }

  // ---------------------------------------------------------------------
  // #53 firehose_retry — partial-failure re-drive (spool.py:199-211)
  // ---------------------------------------------------------------------

  /** Deterministic stand-in for Firehose's per-record put_record_batch
    * status: record fails iff (first_event·31 + part_id) ≡ 0 mod 5
    * (≈20% failure rate) — pure integer math, identical in DuckDB. */
  val FailMod = 5L

  private val failFlag: Column =
    ((col("first_event") * 31 + col("part_id")) % FailMod === 0).cast("int")

  /** The reference walks put_record_batch's per-record statuses:
    * succeeded records are unlinked from the spool, FAILED records stay
    * and re-enter the next drain's packing, and each failure increments
    * kinesyslog_batch_record_failed (spool.py:199-211). Modeled as two
    * drains: drain 1 packs every spool record and flags the seeded
    * failures; drain 2 re-packs exactly the failed records (all succeed
    * there). Output: one row per (drain, dest, batch) with its record
    * count, byte size, and how many of its records failed. */
  def firehoseRetry(spark: SparkSession, dir: String,
                    maxCount: Int = TestBatchCount,
                    maxSize: Long = TestBatchSize): DataFrame = {
    val d1 = packRecords(spoolRecords(spark, dir), maxCount, maxSize)
      .withColumn("failed", failFlag)
    val d2 = packRecords(
      d1.filter(col("failed") === 1)
        .select("source", "dest", "part_id", "part_bytes", "first_event"),
      maxCount, maxSize)
    val drain1 = d1.groupBy("dest", "batch_id")
      .agg(count(lit(1)).as("n_records"), sum("part_bytes").as("batch_bytes"),
        sum("failed").as("n_failed"))
      .select(lit(1).as("drain"), col("dest"), col("batch_id"),
        col("n_records"), col("batch_bytes"), col("n_failed"))
    val drain2 = d2.groupBy("dest", "batch_id")
      .agg(count(lit(1)).as("n_records"), sum("part_bytes").as("batch_bytes"))
      .select(lit(2).as("drain"), col("dest"), col("batch_id"),
        col("n_records"), col("batch_bytes"), lit(0L).as("n_failed"))
    drain1.unionAll(drain2).orderBy("drain", "dest", "batch_id")
  }

  def firehoseRetrySql(maxCount: Int = TestBatchCount,
                       maxSize: Long = TestBatchSize): String = {
    val split = recordSplitSql()
      .replace("ORDER BY source, dest, part_id", "")
    def walk(recsName: String): String =
      "  WITH RECURSIVE w(dest, rn, bytes, failed, batch, bc, bs) AS (\n" +
        s"    SELECT dest, rn, bytes, failed, 0, 1, bytes FROM $recsName WHERE rn = 1\n" +
        "    UNION ALL\n" +
        "    SELECT r.dest, r.rn, r.bytes, r.failed,\n" +
        s"      CASE WHEN w.bc >= $maxCount OR w.bs + r.bytes > $maxSize\n" +
        "           THEN w.batch + 1 ELSE w.batch END,\n" +
        s"      CASE WHEN w.bc >= $maxCount OR w.bs + r.bytes > $maxSize\n" +
        "           THEN 1 ELSE w.bc + 1 END,\n" +
        s"      CASE WHEN w.bc >= $maxCount OR w.bs + r.bytes > $maxSize\n" +
        "           THEN r.bytes ELSE w.bs + r.bytes END\n" +
        s"    FROM w JOIN $recsName r ON r.dest = w.dest AND r.rn = w.rn + 1\n" +
        "  )\n" +
        "  SELECT * FROM w\n"
    "WITH recs1 AS (\n" +
      "  SELECT dest, row_number() OVER (PARTITION BY dest ORDER BY source, part_id) AS rn,\n" +
      "         part_bytes AS bytes,\n" +
      s"         CASE WHEN (first_event * 31 + part_id) % $FailMod = 0 THEN 1 ELSE 0 END AS failed\n" +
      "  FROM (" + split + ")\n" +
      "),\n" +
      "walk1 AS (\n" + walk("recs1") + "),\n" +
      // drain-2 input comes from recs1, NOT walk1: the failure flag is
      // seeded per record (independent of packing), and DuckDB's
      // recursive walk2 silently stops at its anchor when its
      // recursive part joins a CTE derived from another recursive CTE
      "recs2 AS (\n" +
      "  SELECT dest, row_number() OVER (PARTITION BY dest ORDER BY rn) AS rn,\n" +
      "         bytes, 0 AS failed\n" +
      "  FROM (SELECT * FROM recs1 WHERE failed = 1)\n" +
      "),\n" +
      "walk2 AS (\n" + walk("recs2") + ")\n" +
      "SELECT * FROM (\n" +
      "  SELECT 1 AS drain, dest, CAST(batch AS BIGINT) AS batch_id,\n" +
      "    COUNT(*) AS n_records, CAST(SUM(bytes) AS BIGINT) AS batch_bytes,\n" +
      "    CAST(SUM(failed) AS BIGINT) AS n_failed\n" +
      "  FROM walk1 GROUP BY dest, batch\n" +
      "  UNION ALL\n" +
      "  SELECT 2 AS drain, dest, CAST(batch AS BIGINT) AS batch_id,\n" +
      "    COUNT(*) AS n_records, CAST(SUM(bytes) AS BIGINT) AS batch_bytes,\n" +
      "    CAST(0 AS BIGINT) AS n_failed\n" +
      "  FROM walk2 GROUP BY dest, batch\n" +
      ")\n" +
      "ORDER BY drain, dest, batch_id"
  }

  // ---------------------------------------------------------------------
  // #18 record_gzip — spool-format gzip round-trip (rows-only: gzip
  // byte output is library-specific, so there is no cross-engine hash)
  // ---------------------------------------------------------------------

  /** One gzipped spool body per SPLIT PART, not per (source, dest):
    * composing with recordSplit's part assignment means every gzipped
    * record's event payload is bounded by the record cap — a hot
    * (source, dest) pair at 100× scale becomes more records, never a
    * multi-GB single-row payload (the reference flushes every
    * 4 MiB/60 s and splits oversize records, sink.py:167-186; it never
    * builds an unbounded buffer either). */
  /** The spool-file bodies: one CloudWatch record JSON per split part
    * (sink.py:204-217), gzipped at level 9. Shared by record_gzip
    * (size/roundtrip view) and spool_read (the decode direction). */
  private[graft] def spoolBodies(spark: SparkSession, dir: String,
                                 maxRecord: Int): DataFrame =
    splitEvents(spark, dir, maxRecord)
      .groupBy("source", "dest", "part_id")
      .agg(to_json(struct(
        lit(Owner).as("owner"),
        concat_ws("/", lit(GroupPrefix), lit(MessageClass), col("dest"))
          .as("logGroup"),
        first(col("source")).as("logStream"),
        array(concat_ws("/", lit(GroupPrefix), lit(MessageClass), col("dest")))
          .as("subscriptionFilters"),
        lit("DATA_MESSAGE").as("messageType"),
        array_sort(collect_list(struct(
          lpad(col("event_id").cast("string"), 56, "0").as("id"),
          col("message"),
          (col("ts_s") * 1000).as("timestamp")))).as("logEvents")))
        .as("payload"))
      .withColumn("raw", col("payload").cast("binary"))
      .withColumn("gz", gzip_compress(col("raw")))

  def recordGzip(spark: SparkSession, dir: String,
                 maxRecord: Int = TestRecordSize): DataFrame = {
    spoolBodies(spark, dir, maxRecord)
      .withColumn("rt", decompress_auto(col("gz")))
      .select(
        col("source"), col("dest"), col("part_id"),
        length(col("payload")).as("raw_len"),
        octet_length(col("gz")).as("gz_len"),
        (col("rt") === col("raw")).cast("int").as("roundtrip_ok"))
      .orderBy("source", "dest", "part_id")
  }

  /** #64 spool_read — the DECODE direction: gunzip each spool body,
    * parse the CloudWatch record JSON, explode logEvents back into
    * rows. The oracle is the plain synthesized event set, so the
    * entire encode → gzip → gunzip → parse → explode loop is verified
    * value-for-value in DuckDB (record_gzip alone can only
    * row-count-check its opaque gzip bytes). from_json here is the
    * honest decode path, not a bench headliner — a spool reader runs
    * once per record, not per event. */
  def spoolRead(spark: SparkSession, dir: String,
                maxRecord: Int = TestRecordSize): DataFrame = {
    val recSchema =
      "STRUCT<owner: STRING, logGroup: STRING, logStream: STRING, " +
        "subscriptionFilters: ARRAY<STRING>, messageType: STRING, " +
        "logEvents: ARRAY<STRUCT<id: STRING, message: STRING, timestamp: BIGINT>>>"
    spoolBodies(spark, dir, maxRecord)
      .withColumn("rec",
        from_json(decompress_auto(col("gz")).cast("string"), lit(recSchema)))
      .select(col("source"), col("dest"), col("rec.logStream").as("log_stream"),
        explode(col("rec.logEvents")).as("ev"))
      .select(
        col("ev.id").cast("long").as("event_id"),
        col("source"), col("dest"), col("log_stream"),
        col("ev.message").as("message"),
        col("ev.timestamp").as("ts_ms"))
      .orderBy("event_id")
  }

  val spoolReadSql: String =
    s"""$oracleBase
      |SELECT event_id, source, dest, source AS log_stream,
      |  message, ts_s * 1000 AS ts_ms
      |FROM e
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------------
  // #19 stats_counters
  // ---------------------------------------------------------------------

  def statsCounters(spark: SparkSession, dir: String): DataFrame =
    withEnvelopeCols(spark, dir)
      .groupBy(col("dest").as("port"), col("source"))
      .agg(
        count(lit(1)).as("message_count"),
        sum(length(col("message")).cast("long")).as("message_bytes"))
      .orderBy("port", "source")

  val statsCountersSql: String =
    s"""$oracleBase
      |SELECT dest AS port, source,
      |  COUNT(*) AS message_count,
      |  CAST(SUM(length(message)) AS BIGINT) AS message_bytes
      |FROM e
      |GROUP BY dest, source
      |ORDER BY port, source""".stripMargin

  // ---------------------------------------------------------------------
  // #50 stats_export — Prometheus exposition of the relay's metrics
  // ---------------------------------------------------------------------

  /** Cumulative-histogram exposition lines for one metric: per-bound
    * `_bucket{le="b"}` counts plus `+Inf`/`_count`/`_sum`. The
    * reference registers these histograms with fixed bucket walls
    * (prometheus.py:38-42: MAX_BATCH_COUNT/10 and MAX_BATCH_SIZE/8
    * steps); here the walls scale with the test caps. Distributed: the
    * per-bound fan-out is |rows|×|bounds| inside one map stage, then a
    * single tiny groupBy(le). */
  private def histLines(df: DataFrame, valueCol: String, metric: String,
                        bounds: Seq[Long]): DataFrame = {
    val buckets = df
      .select(col(valueCol).cast("long").as("v"),
        explode(array(bounds.map(lit(_)): _*)).as("le"))
      .groupBy("le")
      .agg(sum(when(col("v") <= col("le"), 1L).otherwise(0L)).as("n"))
      .select(format_string(metric + "_bucket{le=\"%d\"} %d",
        col("le"), col("n")).as("line"))
    val summary = df
      // coalesce: sum() over an empty input is null, and a null _sum
      // line would sort differently in Spark (nulls first) vs DuckDB
      // (printf(NULL) row last) — render '…_sum 0' on empty input
      .agg(count(lit(1)).as("c"),
        coalesce(sum(col(valueCol).cast("long")), lit(0L)).as("s"))
      .select(explode(array(
        format_string(metric + "_bucket{le=\"+Inf\"} %d", col("c")),
        format_string(metric + "_count %d", col("c")),
        format_string(metric + "_sum %d", col("s")))).as("line"))
    buckets.unionAll(summary)
  }

  /** Spool-dir label for the gauge families — the reference's default
    * spool dir is the system tempdir (init.py:72-73), and the gauges
    * are labeled with it (spool.py:148-150). */
  val SpoolPath = "/tmp"
  /** Deterministic stand-in for Firehose's per-record ErrorMessage
    * (spool.py:207-210 labels the failure counter with it). */
  val FailMessage = "ServiceUnavailable"

  /** The /metrics page as a one-column DataFrame: the reference's
    * counter families by (port, source) (constant.py:44-45), the
    * batch histograms (constant.py:47-48), the spool gauges
    * (constant.py:51-52, spool.py:146-150) and the per-stream
    * batch_record_failed counter (constant.py:46, spool.py:207-210),
    * rendered in Prometheus exposition format and deterministically
    * sorted. A /metrics scrape of the reference relay and of graft
    * now shows the same metric families. */
  def statsExport(spark: SparkSession, dir: String): DataFrame = {
    // ONE pass over the counters aggregate emits both metric families
    // (a separate select per family would materialize the whole
    // events-scan + groupBy subtree twice).
    val counterLines = statsCounters(spark, dir).select(explode(array(
      format_string(
        "kinesyslog_message_count_total{port=\"%d\",source=\"%s\"} %d",
        col("port"), col("source"), col("message_count")),
      format_string(
        "kinesyslog_message_bytes_total{port=\"%d\",source=\"%s\"} %d",
        col("port"), col("source"), col("message_bytes")))).as("line"))
    val batches = firehoseBatches(spark, dir)
    val recSteps = math.max(1L, TestBatchCount.toLong / 10)
    val byteSteps = math.max(1L, TestBatchSize / 8)
    val recordSteps = math.max(1L, TestRecordSize.toLong / 8)
    val h1 = histLines(batches, "n_records", "kinesyslog_batch_records",
      (0L to TestBatchCount.toLong by recSteps))
    val h2 = histLines(batches, "batch_bytes", "kinesyslog_batch_bytes",
      (0L to TestBatchSize by byteSteps))
    val records = spoolRecords(spark, dir)
    val h3 = histLines(records, "part_bytes",
      "kinesyslog_record_bytes", (0L to TestRecordSize.toLong by recordSteps))
    // spool gauges: record count in the spool at drain time, and the
    // batch age. The reference sets age = loop.time() - last flush
    // (wall clock); the deterministic batch analogue is the event-time
    // span of the spooled events, in seconds.
    val spoolLines = withEnvelopeCols(spark, dir)
      .agg(coalesce(max("ts_s") - min("ts_s"), lit(0L)).as("age"))
      // 1-row build side: hint it explicitly rather than relying on
      // AQE's runtime fallback (uniform with every other scalar join)
      .crossJoin(broadcast(records.agg(count(lit(1)).as("c"))))
      .select(explode(array(
        format_string(
          "kinesyslog_spool_count{path=\"%s\"} %d", lit(SpoolPath), col("c")),
        format_string(
          "kinesyslog_spool_age{path=\"%s\"} %d", lit(SpoolPath), col("age"))))
        .as("line"))
    // per-stream failed-record counter: failures are per-record
    // (independent of batch packing), so they aggregate straight off
    // the spool records with the same seeded rule as firehose_retry
    val failedLines = records
      .groupBy("dest")
      .agg(sum(failFlag.cast("long")).as("nf"))
      .select(format_string(
        "kinesyslog_batch_record_failed{stream=\"%d\",error_message=\"%s\"} %d",
        col("dest"), lit(FailMessage), col("nf")).as("line"))
    counterLines.unionAll(h1).unionAll(h2).unionAll(h3)
      .unionAll(spoolLines).unionAll(failedLines)
      .orderBy("line")
  }

  val statsExportSql: String = {
    val batchesSub = firehoseBatchesSql().replace("ORDER BY dest, batch_id", "")
    val splitSub = recordSplitSql().replace("ORDER BY source, dest, part_id", "")
    val countersSub = statsCountersSql.replace("ORDER BY port, source", "")
    def histSql(src: String, value: String, metric: String,
                bounds: Seq[Long]): String =
      s"""SELECT printf('${metric}_bucket{le="%d"} %d', le, n) AS line FROM (
         |  SELECT le, CAST(SUM(CASE WHEN v <= le THEN 1 ELSE 0 END) AS BIGINT) AS n
         |  FROM (SELECT $value AS v FROM $src) CROSS JOIN
         |       (SELECT unnest([${bounds.mkString(", ")}]) AS le)
         |  GROUP BY le)
         |UNION ALL
         |SELECT printf('${metric}_bucket{le="+Inf"} %d', COUNT(*)) FROM $src
         |UNION ALL
         |SELECT printf('${metric}_count %d', COUNT(*)) FROM $src
         |UNION ALL
         |SELECT printf('${metric}_sum %d', CAST(COALESCE(SUM($value), 0) AS BIGINT)) FROM $src"""
        .stripMargin
    val recBounds = 0L to TestBatchCount.toLong by math.max(1L, TestBatchCount.toLong / 10)
    val byteBounds = 0L to TestBatchSize by math.max(1L, TestBatchSize / 8)
    val recordBounds = 0L to TestRecordSize.toLong by math.max(1L, TestRecordSize.toLong / 8)
    s"""WITH fb AS (SELECT * FROM ($batchesSub)),
      |rs AS (SELECT * FROM ($splitSub)),
      |sc AS (SELECT * FROM ($countersSub))
      |SELECT line FROM (
      |  SELECT printf('kinesyslog_message_count_total{port="%d",source="%s"} %d',
      |    port, source, message_count) AS line FROM sc
      |  UNION ALL
      |  SELECT printf('kinesyslog_message_bytes_total{port="%d",source="%s"} %d',
      |    port, source, message_bytes) FROM sc
      |  UNION ALL
      |  ${histSql("fb", "n_records", "kinesyslog_batch_records", recBounds)}
      |  UNION ALL
      |  ${histSql("fb", "batch_bytes", "kinesyslog_batch_bytes", byteBounds)}
      |  UNION ALL
      |  ${histSql("rs", "part_bytes", "kinesyslog_record_bytes", recordBounds)}
      |  UNION ALL
      |  SELECT printf('kinesyslog_spool_count{path="%s"} %d', '$SpoolPath',
      |    COUNT(*)) FROM rs
      |  UNION ALL
      |  SELECT printf('kinesyslog_spool_age{path="%s"} %d', '$SpoolPath',
      |    CAST(COALESCE(MAX(ts_s) - MIN(ts_s), 0) AS BIGINT))
      |  FROM ($oracleBase SELECT ts_s FROM e)
      |  UNION ALL
      |  SELECT printf('kinesyslog_batch_record_failed{stream="%d",error_message="$FailMessage"} %d',
      |    dest, CAST(SUM(CASE WHEN (first_event * 31 + part_id) % $FailMod = 0
      |                        THEN 1 ELSE 0 END) AS BIGINT))
      |  FROM rs GROUP BY dest
      |)
      |ORDER BY line""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "record_envelope" -> (recordEnvelope(_, _)),
    "record_split" -> ((s, d) => recordSplit(s, d)),
    "firehose_batches" -> ((s, d) => firehoseBatches(s, d)),
    "firehose_retry" -> ((s, d) => firehoseRetry(s, d)),
    "record_gzip" -> ((s, d) => recordGzip(s, d)),
    "spool_read" -> ((s, d) => spoolRead(s, d)),
    "stats_counters" -> (statsCounters(_, _)),
    "stats_export" -> (statsExport(_, _)))

  val oracle: Map[String, String] = Map(
    "record_envelope" -> recordEnvelopeSql,
    "record_split" -> recordSplitSql(),
    "firehose_batches" -> firehoseBatchesSql(),
    "firehose_retry" -> firehoseRetrySql(),
    "spool_read" -> spoolReadSql,
    "stats_counters" -> statsCountersSql,
    "stats_export" -> statsExportSql)
}
