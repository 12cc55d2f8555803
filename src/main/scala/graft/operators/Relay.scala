package graft.operators

import graft.Tables
import graft.functions.SyslogFunctions._
import graft.operators.Framing.syslogFrames
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end relay composition (flagship): the reference's full data
  * path as ONE Spark plan —
  *
  *   connection byte-stream → RFC6587 de-framing → syslog parse →
  *   missing-PRI default → event envelope → (source, dest) record
  *   grouping with CloudWatch-record fields
  *
  * i.e. everything the asyncio relay does between `data_received` and
  * a spool record (reference: kinesyslog/protocol.py:149-213 →
  * message.py:95-124 → sink.py:148-217), expressed as framing
  * expression + codegen'd parse columns + one aggregation. The only
  * shuffle is the final (source, dest) groupBy — framing and parse are
  * map-only over connection blobs, so the whole path scales with
  * partition count.
  *
  * Stream synthesis: one octet-counted connection blob per user (the
  * same contract as `frame_octet`), with RFC3164/RFC5424-mixed
  * messages from the `syslog_parse` contract. The oracle recomputes
  * the record-level aggregates straight from the events ground truth —
  * any bug in framing, parsing, PRI decode or grouping shows up as a
  * mismatch.
  */
object Relay {

  def relayPipeline(spark: SparkSession, dir: String): DataFrame = {
    // -- synthesize connection blobs (one per user, octet-counted) ----
    val pri = col("event_id") % 192
    val host = concat(lit("host-"), col("user_id"))
    val content = concat(col("event_type"), lit(" id="), col("event_id"))
    val ts54 = concat(formatCivil5424(col("ts_s")), lit("Z"))
    val ts31 = formatCivil3164(col("ts_s"))
    val msg = when(col("event_id") % 2 === 0,
        format_string("<%d>1 %s %s %s", pri, ts54, host, content))
      .otherwise(format_string("<%d>%s %s %s", pri, ts31, host, content))
    val framed = concat(length(msg).cast("string"), lit(" "), msg)
    val blobs = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), framed.as("frame"))
      .groupBy("user_id")
      .agg(array_join(
        array_sort(collect_list(struct(col("event_id"), col("frame").as("f"))))
          .getField("f"), "").as("blob"))

    // -- the relay: frame → parse → envelope → record ----------------
    val messages = blobs
      .select(col("user_id"),
        explode(syslogFrames(col("blob").cast("binary"))).as("b"))
      // backslashreplace decode, as the reference does on every framed
      // message (message.py:97) — identical to a plain cast on valid
      // UTF-8, lossless `\xHH` literals on corrupt bytes
      .select(col("user_id"),
        graft.functions.BinaryFunctions.decode_backslashreplace(col("b"))
          .as("message"))
    val parsed = messages
      .withColumn("h", parseHeader(col("message")))
      .select(col("user_id"), col("message"),
        coalesce(col("h.pri"), lit(graft.Constants.DefaultPri)).as("prio"),
        col("h.hostname").as("hostname"))
    parsed
      .withColumn("source", concat(lit("10.0.0."), col("user_id") % 200))
      .withColumn("dest",
        when(col("prio") % 8 <= 3, 6514).otherwise(514)) // severe → TLS port
      .groupBy("source", "dest")
      .agg(
        count(lit(1)).as("n_events"),
        sum(length(col("message")).cast("long")).as("total_bytes"),
        sum((col("prio") / 8).cast("int").cast("long")).as("facility_sum"),
        countDistinct("hostname").as("n_hosts"))
      .select(
        col("source"), col("dest"),
        concat_ws("/", lit("graft"), lit("syslog"), col("dest")).as("log_group"),
        col("source").as("log_stream"),
        col("n_events"), col("total_bytes"), col("facility_sum"), col("n_hosts"))
      .orderBy("source", "dest")
  }

  /** Ground-truth mirror: the oracle never runs the parser — it
    * recomputes every record aggregate from raw event fields. */
  val relayPipelineSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type,
      |    epoch_ns(ts)//1000000000 AS ts_s,
      |    event_id % 192 AS pri,
      |    'host-' || user_id AS host,
      |    '10.0.0.' || (user_id % 200) AS source
      |  FROM events
      |), m AS (
      |  SELECT *,
      |    CASE WHEN event_id % 2 = 0 THEN
      |      printf('<%d>1 %sZ %s %s id=%d', pri,
      |        strftime(make_timestamp(ts_s * 1000000), '%Y-%m-%dT%H:%M:%S'),
      |        host, event_type, event_id)
      |    ELSE
      |      printf('<%d>%s %s %s id=%d', pri,
      |        strftime(make_timestamp(ts_s * 1000000), '%b %d %H:%M:%S'),
      |        host, event_type, event_id)
      |    END AS message,
      |    CASE WHEN pri % 8 <= 3 THEN 6514 ELSE 514 END AS dest
      |  FROM e
      |)
      |SELECT source, dest,
      |  'graft/syslog/' || dest AS log_group,
      |  source AS log_stream,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(length(message)) AS BIGINT) AS total_bytes,
      |  CAST(SUM(pri // 8) AS BIGINT) AS facility_sum,
      |  COUNT(DISTINCT host) AS n_hosts
      |FROM m
      |GROUP BY source, dest
      |ORDER BY source, dest""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "relay_end_to_end" -> relayPipeline)

  val oracle: Map[String, String] = Map(
    "relay_end_to_end" -> relayPipelineSql)
}
