package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Syslog header parsing as pure column compositions (SURVEY §2 #1–5).
  *
  * Everything here compiles to built-in codegen'd expressions
  * (regexp_extract / substring / to_timestamp / integer arithmetic) —
  * no UDFs — so the whole parse path stays inside whole-stage codegen
  * and is embarrassingly parallel: at 100 TB this is a map-only stage
  * bounded by scan throughput.
  *
  * Semantics match the reference relay (reference: kinesyslog/
  * message.py:11-124):
  *  - header = `<PRI>` + (RFC5424 `1 TIMESTAMP HOST MSG` | RFC3164
  *    `MMM dd HH:mm:ss HOST MSG`); missing PRI → 13; missing/bad
  *    timestamp → caller rewrites the message (see operators.Syslog).
  *  - RFC3164 timestamps carry no year: infer the year from a supplied
  *    `now`, then if the parsed time lands ≥ 3 days in the future
  *    (timedelta.days > 2), assume it was last year (message.py:20-30).
  *  - RFC5424 timestamps support `Z`, `±hh:mm` offsets and fractional
  *    seconds (message.py:32-48).
  */
object SyslogFunctions {

  /** Day-count threshold of the reference's "(parsed - now).days > 2"
    * future test: floor(diff/86400) > 2 ⟺ diff ≥ 3 days. */
  private val FutureSeconds = 3 * 86400L

  // ---------------------------------------------------------------------
  // Header split (#1)
  // ---------------------------------------------------------------------

  /** `<PRI>` prefix digits as string; empty when absent. */
  def priRaw(raw: Column): Column = regexp_extract(raw, "^<(\\d{1,3})>", 1)

  /** Message body after the `<PRI>` prefix (whole message when no PRI). */
  def afterPri(raw: Column): Column = regexp_replace(raw, "^<\\d{1,3}>", "")

  private val Rfc5424Rest = "^1 (\\S{20,38}|-) (\\S+) (.*)$"
  private val Rfc3164Rest = "^([A-Za-z]{3} \\d{2} \\d{2}:\\d{2}:\\d{2}) (\\S+) (.*)$"

  /** Full header parse → struct(pri int|null, version int, ts_raw,
    * hostname, content). version: 1 = RFC5424, 0 = RFC3164 header,
    * -1 = no recognizable header (content = body after PRI, or the
    * whole message when PRI is also missing). */
  def parseHeader(raw: Column): Column = {
    val pri  = priRaw(raw)
    val rest = afterPri(raw)
    val is54 = rest.rlike(Rfc5424Rest)
    val is31 = rest.rlike(Rfc3164Rest)
    struct(
      when(pri =!= "", pri.cast("int")).as("pri"),
      when(is54, 1).when(is31, 0).otherwise(-1).as("version"),
      when(is54, regexp_extract(rest, Rfc5424Rest, 1))
        .when(is31, regexp_extract(rest, Rfc3164Rest, 1)).as("ts_raw"),
      when(is54, regexp_extract(rest, Rfc5424Rest, 2))
        .when(is31, regexp_extract(rest, Rfc3164Rest, 2)).as("hostname"),
      when(is54, regexp_extract(rest, Rfc5424Rest, 3))
        .when(is31, regexp_extract(rest, Rfc3164Rest, 3))
        .otherwise(rest).as("content"))
  }

  // ---------------------------------------------------------------------
  // PRI decode (#2)
  // ---------------------------------------------------------------------

  def facility(pri: Column): Column = (pri.cast("int") / 8).cast("int")
  def severity(pri: Column): Column = pri.cast("int") % 8

  private val SeverityNames = Seq(
    "emerg", "alert", "crit", "err", "warning", "notice", "info", "debug")
  private val FacilityNames = Seq(
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "audit", "alert", "clock",
    "local0", "local1", "local2", "local3", "local4", "local5", "local6",
    "local7")

  def severityName(pri: Column): Column =
    element_at(array(SeverityNames.map(lit): _*), severity(pri) + 1)

  def facilityName(pri: Column): Column =
    element_at(array(FacilityNames.map(lit): _*), facility(pri) + 1)

  /** SQL list literals of the same name tables (DuckDB oracle side). */
  val severityNamesSql: String =
    SeverityNames.map(n => s"'$n'").mkString("[", ", ", "]")
  val facilityNamesSql: String =
    FacilityNames.map(n => s"'$n'").mkString("[", ", ", "]")

  // ---------------------------------------------------------------------
  // RFC3164 timestamp (#3)
  // ---------------------------------------------------------------------

  private def makeTs(y: Column, mo: Column, d: Column,
                     h: Column, mi: Column, s: Column): Column =
    call_function("make_timestamp", y, mo, d, h, mi, s.cast("decimal(16,6)"))

  /** Parse `MMM dd HH:mm:ss` with the year inferred from `nowS` (epoch
    * seconds). Returns struct(parsed_s long|null, adjusted int):
    * adjusted = 1 when the ≥3-days-in-the-future rule moved the stamp
    * to last year. The year-1 rebuild goes through make_timestamp so a
    * Feb 29 stamp in a non-leap prior year yields null (the reference
    * raises there and falls back to the rewrite path). */
  def ts3164(tsRaw: Column, nowS: Column): Column = {
    val nowYear = year(timestamp_seconds(nowS))
    val parsed = try_to_timestamp(
      concat(tsRaw, lit(" "), nowYear.cast("string")),
      lit("MMM dd HH:mm:ss yyyy"))
    val parsedS = unix_seconds(parsed)
    val adjusted = when(parsedS - nowS >= FutureSeconds, 1).otherwise(0)
    val lastYearS = unix_seconds(
      makeTs(year(parsed) - 1, month(parsed), dayofmonth(parsed),
        hour(parsed), minute(parsed), second(parsed)))
    struct(
      when(adjusted === 1, lastYearS).otherwise(parsedS).as("parsed_s"),
      when(parsedS.isNull, lit(null).cast("int")).otherwise(adjusted)
        .as("adjusted"))
  }

  // ---------------------------------------------------------------------
  // RFC5424 timestamp (#4)
  // ---------------------------------------------------------------------

  /** Parse RFC5424 `yyyy-MM-ddTHH:mm:ss[.SSS](Z|±hh:mm)` → epoch
    * millis; null when unparseable (e.g. the `-` NIL stamp). Offset
    * math mirrors the reference: a trailing `-hh:mm` ADDS the offset
    * (local clock was behind UTC), `+hh:mm` subtracts
    * (message.py:32-40). */
  def ts5424Millis(tsRaw: Column): Column = {
    val endsZ = substring(tsRaw, -1, 1) === "Z"
    val hasOffset = tsRaw.rlike("[+-]\\d{2}:\\d{2}$")
    // Split naive part vs offset with substring arithmetic (positions
    // from the right, as in the reference).
    val naive = when(endsZ, tsRaw.substr(lit(1), length(tsRaw) - 1))
      .when(hasOffset, tsRaw.substr(lit(1), length(tsRaw) - 6))
    val parsedNaive = coalesce(
      try_to_timestamp(naive, lit("yyyy-MM-dd'T'HH:mm:ss.SSS")),
      try_to_timestamp(naive, lit("yyyy-MM-dd'T'HH:mm:ss")))
    val naiveMs = unix_millis(parsedNaive)
    val signCh = substring(tsRaw, -6, 1)
    val offH = substring(tsRaw, -5, 2).cast("long")
    val offM = substring(tsRaw, -2, 2).cast("long")
    val sign = when(signCh === "-", 1L).otherwise(-1L)
    when(endsZ, naiveMs)
      .when(hasOffset, naiveMs + sign * (offH * 3600L + offM * 60L) * 1000L)
  }

  /** RFC5424 rewrite stamp for unparseable inputs:
    * `yyyy-MM-ddTHH:mm:ss.ffffff` of the receive time
    * (message.py:51-52). */
  def format5424(epochS: Column): Column =
    concat(
      date_format(timestamp_seconds(epochS), "yyyy-MM-dd'T'HH:mm:ss"),
      lit(".000000"))
}
