package graft.operators

import graft.Tables
import graft.functions.SyslogFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Syslog parse family (SURVEY §2 #1–6), oracle-checked end-to-end.
  *
  * Raw log lines are synthesized deterministically from the `events`
  * table INSIDE the Spark query (SURVEY §5): Spark builds the line,
  * parses it back with the real parser, and outputs the parse result;
  * the DuckDB oracle computes the EXPECTED result directly from the
  * ground-truth event fields with pure integer arithmetic. A bug in
  * either the synthesis or the parse shows up as a mismatch.
  *
  * Synthesis rules (shared contract with every oracle below):
  *  - pri = event_id % 192, host = 'host-'||user_id,
  *    content = event_type||' id='||event_id, recv_s = ts_s + 2,
  *    source = '10.0.0.'||(user_id % 200)
  *  - even event_id → RFC5424 line `<pri>1 TS host content` where TS
  *    shows local time ts_s + off at offset off ∈ {Z, +02:00, -05:30}
  *    by event_id % 3, with a `.500` fraction when event_id % 4 = 0
  *  - odd event_id → RFC3164 line `<pri>MMM dd HH:mm:ss host content`
  *    rendered from ts_s
  *
  * The year-inference reference clock is pinned to NOW_S
  * (2026-01-15T00:00:00Z) so both engines run the same rule on the
  * same constant: events on Jan 18–30 parse ≥ 3 days into the future
  * of Jan 15 and get moved to the prior year; Jan 1–17 events keep the
  * inferred year (reference: kinesyslog/message.py:20-30).
  *
  * Scale: synthesis + parse is one map-only stage over events — no
  * shuffle, no UDFs, full whole-stage codegen; the only shuffle in any
  * query here is the final presentation sort.
  */
object Syslog {

  /** 2026-01-15T00:00:00Z — fixed "now" for RFC3164 year inference. */
  val NowS = 1768435200L
  /** epoch(2026-01-01) - epoch(2024-01-01): shifts a Jan-2024 instant
    * to the same wall-clock in 2026 (both Januaries, no leap skew). */
  private val ShiftTo2026 = 63158400L
  /** Seconds in non-leap 2025: year-1 rollback for January stamps. */
  private val YearBack = 31536000L

  // -- shared synthesis columns (Spark side) ----------------------------

  /** Base events, globally sorted UP FRONT: the deterministic-output
    * sort must happen on the cheap scan, not after the parse — a
    * trailing orderBy makes the range partitioner's sampling pass
    * re-execute the whole expensive projection (measured 2× on the
    * bench). Filters still push below the sort; the parse projection
    * above it is order-preserving. */
  private def base(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"), col("user_id"), col("event_type"), col("ts_s"))
      .orderBy("event_id")

  private val pri     = col("event_id") % 192
  private val host    = concat(lit("host-"), col("user_id"))
  private val content = concat(col("event_type"), lit(" id="), col("event_id"))
  private val source  = concat(lit("10.0.0."), col("user_id") % 200)
  private val recvS   = col("ts_s") + 2

  /** Local-time shift of the displayed RFC5424 offset, by event_id%3:
    * Z → 0, +02:00 → +7200, -05:30 → -19800. */
  private val offS = when(col("event_id") % 3 === 1, 7200L)
    .when(col("event_id") % 3 === 2, -19800L).otherwise(0L)
  private val offSuffix = when(col("event_id") % 3 === 1, "+02:00")
    .when(col("event_id") % 3 === 2, "-05:30").otherwise(lit("Z"))
  private val frac = when(col("event_id") % 4 === 0, ".500").otherwise(lit(""))

  private val ts5424Str = concat(
    formatCivil5424(col("ts_s") + offS), frac, offSuffix)
  private val ts3164Str = formatCivil3164(col("ts_s"))

  private def mkLines(hostCol: Column): Column = {
    val l5424 = format_string("<%d>1 %s %s %s", pri, ts5424Str, hostCol, content)
    val l3164 = format_string("<%d>%s %s %s", pri, ts3164Str, hostCol, content)
    when(col("event_id") % 2 === 0, l5424).otherwise(l3164)
  }
  private val line5424 =
    format_string("<%d>1 %s %s %s", pri, ts5424Str, host, content)
  private val line3164 =
    format_string("<%d>%s %s %s", pri, ts3164Str, host, content)
  private val rawLine =
    when(col("event_id") % 2 === 0, line5424).otherwise(line3164)

  /** Shared oracle CTE: ground-truth fields per event, integer math
    * only (ts_s mirrors Tables.events' epoch_ns // 1e9). */
  private val oracleBase =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type,
      |         epoch_ns(ts)//1000000000 AS ts_s,
      |         event_id % 192 AS pri,
      |         'host-' || user_id AS host,
      |         event_type || ' id=' || event_id AS content,
      |         '10.0.0.' || (user_id % 200) AS source,
      |         epoch_ns(ts)//1000000000 + 2 AS recv_s
      |  FROM events
      |)""".stripMargin

  /** Pre-rendered relay input lines (the streaming bench surface):
    * the same synthesized RFC3164/RFC5424 mix the batch queries parse
    * inline, as (event_id, value) rows — written to text files they
    * are the byte stream a listener would hand the pipeline.
    * `hostMod > 0` folds hostnames to `hostMod` distinct sources —
    * the realistic relay shape (a listener serves hundreds of
    * devices, not one per message; the reference baseline measures a
    * SINGLE stream) — without touching the oracle-pinned synthesis
    * the batch queries parse. */
  def rawLines(spark: SparkSession, dir: String, hostMod: Int = 0): DataFrame = {
    val line = if (hostMod > 0)
      mkLines(concat(lit("host-"), col("user_id") % hostMod))
    else rawLine
    base(spark, dir).select(col("event_id"), line.as("value"))
  }

  // ---------------------------------------------------------------------
  // #1 syslog_parse
  // ---------------------------------------------------------------------

  def syslogParse(spark: SparkSession, dir: String): DataFrame =
    base(spark, dir)
      .withColumn("raw", rawLine)
      .withColumn("h", parseHeader(col("raw")))
      .select(
        col("event_id"),
        col("h.pri").as("pri"),
        col("h.version").as("version"),
        col("h.hostname").as("hostname"),
        col("h.content").as("content"))

  val syslogParseSql: String =
    s"""$oracleBase
      |SELECT event_id,
      |  CAST(pri AS INT) AS pri,
      |  CAST(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS INT) AS version,
      |  host AS hostname,
      |  content
      |FROM e
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------------
  // #2 syslog_severity
  // ---------------------------------------------------------------------

  def syslogSeverity(spark: SparkSession, dir: String): DataFrame =
    base(spark, dir)
      .withColumn("raw", rawLine)
      .withColumn("p",
        when(priRaw(col("raw")) =!= "", priRaw(col("raw")).cast("int")))
      .select(
        col("event_id"),
        col("p").as("pri"),
        facility(col("p")).as("facility"),
        severity(col("p")).as("severity"),
        facilityName(col("p")).as("facility_name"),
        severityName(col("p")).as("severity_name"))

  val syslogSeveritySql: String =
    s"""$oracleBase
      |SELECT event_id,
      |  CAST(pri AS INT) AS pri,
      |  CAST(pri // 8 AS INT) AS facility,
      |  CAST(pri % 8 AS INT) AS severity,
      |  ($facilityNamesSql)[CAST(pri // 8 AS INT) + 1] AS facility_name,
      |  ($severityNamesSql)[CAST(pri % 8 AS INT) + 1] AS severity_name
      |FROM e
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------------
  // #3 syslog_ts3164 — odd event_ids carry RFC3164 stamps
  // ---------------------------------------------------------------------

  def syslogTs3164(spark: SparkSession, dir: String): DataFrame =
    base(spark, dir)
      .filter(col("event_id") % 2 === 1)
      .withColumn("raw", rawLine)
      .withColumn("h", parseHeader(col("raw")))
      .withColumn("t", ts3164(col("h.ts_raw"), lit(NowS)))
      .select(
        col("event_id"),
        col("t.parsed_s").as("parsed_s"),
        col("t.adjusted").as("adjusted"))

  val syslogTs3164Sql: String =
    s"""$oracleBase
      |SELECT event_id,
      |  CASE WHEN ts_s + $ShiftTo2026 - $NowS >= 259200
      |       THEN ts_s + $ShiftTo2026 - $YearBack
      |       ELSE ts_s + $ShiftTo2026 END AS parsed_s,
      |  CAST(CASE WHEN ts_s + $ShiftTo2026 - $NowS >= 259200
      |       THEN 1 ELSE 0 END AS INT) AS adjusted
      |FROM e
      |WHERE event_id % 2 = 1
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------------
  // #4 syslog_ts5424 — even event_ids carry RFC5424 stamps
  // ---------------------------------------------------------------------

  def syslogTs5424(spark: SparkSession, dir: String): DataFrame =
    base(spark, dir)
      .filter(col("event_id") % 2 === 0)
      .withColumn("raw", rawLine)
      .withColumn("h", parseHeader(col("raw")))
      .select(
        col("event_id"),
        ts5424Millis(col("h.ts_raw")).as("parsed_ms"))

  val syslogTs5424Sql: String =
    s"""$oracleBase
      |SELECT event_id,
      |  ts_s * 1000 + CASE WHEN event_id % 4 = 0 THEN 500 ELSE 0 END
      |    AS parsed_ms
      |FROM e
      |WHERE event_id % 2 = 0
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------------
  // #5 syslog_normalize — mixed well-formed / headerless / NIL-stamp
  // lines; missing PRI → 13, unparseable stamp → RFC5424 rewrite with
  // the receive time and the connection source (message.py:95-124).
  // ---------------------------------------------------------------------

  /** Variant lines: event_id%5==0 → headerless (content only);
    * event_id%7==0 → NIL `-` stamp. Otherwise the #1 lines. */
  private val variantLine =
    when(col("event_id") % 5 === 0, content)
      .when(col("event_id") % 7 === 0,
        format_string("<%d>1 - %s %s", pri, host, content))
      .otherwise(rawLine)

  def syslogNormalize(spark: SparkSession, dir: String): DataFrame = {
    // Flatten the parse struct into ONE projection before fan-out use:
    // downstream expressions reference plain attributes, so Catalyst
    // cannot re-inline (and re-execute) the regex parse per reference.
    val flat = base(spark, dir)
      .withColumn("raw", variantLine)
      .withColumn("h", parseHeader(col("raw")))
      .select(col("event_id"), col("user_id"), col("ts_s"), col("raw"),
        col("h.pri").as("hpri"), col("h.version").as("hversion"),
        col("h.ts_raw").as("hts_raw"), col("h.content").as("hcontent"))
    flat
      .withColumn("prio",
        coalesce(col("hpri"), lit(graft.Constants.DefaultPri)))
      .withColumn("ts_ms",
        when(col("hversion") === 1, ts5424Millis(col("hts_raw")))
          .when(col("hversion") === 0,
            ts3164(col("hts_raw"), lit(NowS)).getField("parsed_s") * 1000))
      .select(
        col("event_id"),
        when(col("ts_ms").isNotNull, col("raw"))
          .otherwise(format_string("<%d>1 %s %s %s",
            col("prio"), format5424(recvS), source, col("hcontent")))
          .as("message"),
        coalesce(col("ts_ms"), recvS * 1000).as("ts_ms"))
  }

  val syslogNormalizeSql: String =
    s"""$oracleBase,
      |lines AS (
      |  SELECT *,
      |    CASE
      |      WHEN event_id % 5 = 0 THEN content
      |      WHEN event_id % 7 = 0 THEN printf('<%d>1 - %s %s', pri, host, content)
      |      ELSE NULL -- well-formed: message passes through unchanged
      |    END AS bad_line,
      |    strftime(make_timestamp(recv_s * 1000000), '%Y-%m-%dT%H:%M:%S')
      |      || '.000000' AS recv_5424,
      |    CASE WHEN event_id % 2 = 0 THEN
      |      strftime(make_timestamp((ts_s + CASE event_id % 3
      |          WHEN 1 THEN 7200 WHEN 2 THEN -19800 ELSE 0 END) * 1000000),
      |        '%Y-%m-%dT%H:%M:%S')
      |      || CASE WHEN event_id % 4 = 0 THEN '.500' ELSE '' END
      |      || CASE event_id % 3 WHEN 1 THEN '+02:00' WHEN 2 THEN '-05:30'
      |           ELSE 'Z' END
      |    ELSE strftime(make_timestamp(ts_s * 1000000), '%b %d %H:%M:%S')
      |    END AS good_ts
      |  FROM e
      |)
      |SELECT event_id,
      |  CASE
      |    WHEN event_id % 5 = 0
      |      THEN printf('<13>1 %s %s %s', recv_5424, source, content)
      |    WHEN event_id % 7 = 0
      |      THEN printf('<%d>1 %s %s %s', pri, recv_5424, source, content)
      |    WHEN event_id % 2 = 0
      |      THEN printf('<%d>1 %s %s %s', pri, good_ts, host, content)
      |    ELSE printf('<%d>%s %s %s', pri, good_ts, host, content)
      |  END AS message,
      |  CASE
      |    WHEN event_id % 5 = 0 OR event_id % 7 = 0 THEN recv_s * 1000
      |    WHEN event_id % 2 = 0
      |      THEN ts_s * 1000 + CASE WHEN event_id % 4 = 0 THEN 500 ELSE 0 END
      |    WHEN ts_s + $ShiftTo2026 - $NowS >= 259200
      |      THEN (ts_s + $ShiftTo2026 - $YearBack) * 1000
      |    ELSE (ts_s + $ShiftTo2026) * 1000
      |  END AS ts_ms
      |FROM lines
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------------
  // #6 event_envelope — {id, message, timestamp-millis}
  // (message.py:54-74; 56-digit id made deterministic for the oracle)
  // ---------------------------------------------------------------------

  def eventEnvelope(spark: SparkSession, dir: String): DataFrame =
    syslogNormalize(spark, dir)
      .select(
        col("event_id"),
        lpad(col("event_id").cast("string"), 56, "0").as("envelope_id"),
        col("message"),
        col("ts_ms"))

  val eventEnvelopeSql: String = {
    // No stripMargin here: the embedded normalize SQL contains `||`
    // string concats at line starts that stripMargin would mangle.
    val normBody = syslogNormalizeSql.replace("ORDER BY event_id", "")
    "WITH norm AS (" + normBody + ")\n" +
      "SELECT event_id,\n" +
      "  lpad(CAST(event_id AS VARCHAR), 56, '0') AS envelope_id,\n" +
      "  message, ts_ms\n" +
      "FROM norm\n" +
      "ORDER BY event_id"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "syslog_parse" -> syslogParse,
    "syslog_severity" -> syslogSeverity,
    "syslog_ts3164" -> syslogTs3164,
    "syslog_ts5424" -> syslogTs5424,
    "syslog_normalize" -> syslogNormalize,
    "event_envelope" -> eventEnvelope)

  val oracle: Map[String, String] = Map(
    "syslog_parse" -> syslogParseSql,
    "syslog_severity" -> syslogSeveritySql,
    "syslog_ts3164" -> syslogTs3164Sql,
    "syslog_ts5424" -> syslogTs5424Sql,
    "syslog_normalize" -> syslogNormalizeSql,
    "event_envelope" -> eventEnvelopeSql)
}
