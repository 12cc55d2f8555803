package graft

import graft.functions.SyslogFunctions._
import org.apache.spark.sql.functions._

/** Unit fixtures for the syslog parse family (SURVEY §2 #1–5) against
  * hand-computed values; the DuckDB oracle covers the same operators
  * end-to-end over synthesized lines (operators.Syslog).
  */
class SyslogSpec extends SparkSpec {
  import spark.implicits._

  private def parseOne(line: String) =
    Seq(line).toDF("raw").select(parseHeader(col("raw")).as("h"))
      .select("h.pri", "h.version", "h.ts_raw", "h.hostname", "h.content")
      .collect().head

  test("RFC5424 header parses pri/version/ts/host/content") {
    val r = parseOne("<165>1 2024-01-05T10:11:12.500+02:00 web01 app started ok")
    assert(r.getInt(0) === 165)
    assert(r.getInt(1) === 1)
    assert(r.getString(2) === "2024-01-05T10:11:12.500+02:00")
    assert(r.getString(3) === "web01")
    assert(r.getString(4) === "app started ok")
  }

  test("RFC3164 header parses pri/ts/host/content") {
    val r = parseOne("<34>Jan 05 10:11:12 db-7 kernel: oom")
    assert(r.getInt(0) === 34)
    assert(r.getInt(1) === 0)
    assert(r.getString(2) === "Jan 05 10:11:12")
    assert(r.getString(3) === "db-7")
    assert(r.getString(4) === "kernel: oom")
  }

  test("headerless message yields null pri and content passthrough") {
    val r = parseOne("free text with no header")
    assert(r.isNullAt(0))
    assert(r.getInt(1) === -1)
    assert(r.getString(4) === "free text with no header")
  }

  test("PRI-only message (prio_pattern fallback)") {
    val r = parseOne("<13>something unstructured")
    assert(r.getInt(0) === 13)
    assert(r.getInt(1) === -1)
    assert(r.getString(4) === "something unstructured")
  }

  test("facility/severity decode and names") {
    val df = Seq(165, 34, 13, 0, 191).toDF("pri").select(
      col("pri"),
      facility(col("pri")).as("f"), severity(col("pri")).as("s"),
      facilityName(col("pri")).as("fn"), severityName(col("pri")).as("sn"))
    val rows = df.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3), r.getString(4)))
    assert(rows(0) === ((165, 20, 5, "local4", "notice")))
    assert(rows(1) === ((34, 4, 2, "auth", "crit")))
    assert(rows(2) === ((13, 1, 5, "user", "notice")))
    assert(rows(3) === ((0, 0, 0, "kern", "emerg")))
    assert(rows(4) === ((191, 23, 7, "local7", "debug")))
  }

  test("RFC3164 space-padded day (real-world senders) parses") {
    val r = parseOne("<34>Jan  5 10:11:12 db-7 kernel: oom")
    assert(r.getInt(1) === 0)
    assert(r.getString(2) === "Jan  5 10:11:12")
    assert(r.getString(3) === "db-7")
    val nowS = 1768435200L // 2026-01-15
    val t = Seq("Jan  5 10:11:12").toDF("ts")
      .select(ts3164(col("ts"), lit(nowS)).as("t")).select("t.parsed_s")
      .collect().head
    // equals zero-padded parse
    val t2 = Seq("Jan 05 10:11:12").toDF("ts")
      .select(ts3164(col("ts"), lit(nowS)).as("t")).select("t.parsed_s")
      .collect().head
    assert(t.getLong(0) === t2.getLong(0))
  }

  test("RFC3164 year inference: past keeps inferred year, future rolls back") {
    // now = 2026-01-15T00:00:00Z
    val nowS = 1768435200L
    val df = Seq("Jan 10 00:00:00", "Jan 20 00:00:00").toDF("ts")
      .select(ts3164(col("ts"), lit(nowS)).as("t")).select("t.parsed_s", "t.adjusted")
    val rows = df.collect()
    // Jan 10 2026 = now - 5 days
    assert(rows(0).getLong(0) === nowS - 5 * 86400)
    assert(rows(0).getInt(1) === 0)
    // Jan 20 is 5 days in the future → rolled back to Jan 20 2025
    assert(rows(1).getLong(0) === nowS + 5 * 86400 - 31536000L)
    assert(rows(1).getInt(1) === 1)
  }

  test("Feb 29 parses in a leap year; rollback into a non-leap year is null") {
    // now = 2024-01-15 (leap year): "Feb 29" parses as 2024-02-29,
    // which is > 3 days in the future -> rollback to 2023 -> invalid -> null
    val nowLeap = 1705276800L // 2024-01-15T00:00:00Z
    val r = Seq("Feb 29 12:00:00").toDF("ts")
      .select(ts3164(col("ts"), lit(nowLeap)).as("t"))
      .select("t.parsed_s", "t.adjusted").collect().head
    assert(r.isNullAt(0))
    assert(r.getInt(1) === 1)
    // now = 2024-03-15: "Feb 29" is in the past -> keeps 2024-02-29
    val nowAfter = 1710460800L // 2024-03-15T00:00:00Z
    val r2 = Seq("Feb 29 12:00:00").toDF("ts")
      .select(ts3164(col("ts"), lit(nowAfter)).as("t"))
      .select("t.parsed_s").collect().head
    assert(r2.getLong(0) === 1709208000L) // 2024-02-29T12:00:00Z
  }

  test("RFC3164 header with explicit trailing year (message.py:15)") {
    val r = parseOne("<34>Jan 05 10:11:12 2026 db-7 kernel: oom")
    assert(r.getInt(0) === 34)
    assert(r.getInt(1) === 0)
    assert(r.getString(2) === "Jan 05 10:11:12 2026")
    assert(r.getString(3) === "db-7") // NOT "2026"
    assert(r.getString(4) === "kernel: oom")
  }

  test("year-like hostname is not consumed as a year") {
    val r = parseOne("<34>Jan 05 10:11:12 2026x kernel: oom")
    assert(r.getString(2) === "Jan 05 10:11:12")
    assert(r.getString(3) === "2026x")
    assert(r.getString(4) === "kernel: oom")
  }

  test("explicit year followed by a single token parses without error") {
    // the slice heuristic reads the year arm; the remainder then has a
    // hostname but no content part — content degrades to null (the
    // reference binds "" there), and the job must NOT die on an ANSI
    // array-index error
    val r = parseOne("<34>Jan 05 10:11:12 2026 up")
    assert(r.getInt(1) === 0)
    assert(r.getString(2) === "Jan 05 10:11:12 2026")
    assert(r.getString(3) === "up")
    assert(r.isNullAt(4))
  }

  test("ts3164 explicit year: used directly, future rule still applies") {
    val nowS = 1768435200L // 2026-01-15T00:00:00Z
    val df = Seq(
      "Jan 05 10:11:12 2023",  // explicit past year, kept
      "Jan 20 00:00:00 2026")  // explicit year but ≥3d future → 2025
      .toDF("ts").select(ts3164(col("ts"), lit(nowS)).as("t"))
      .select("t.parsed_s", "t.adjusted")
    val rows = df.collect()
    assert(rows(0).getLong(0) === 1672913472L) // 2023-01-05T10:11:12Z
    assert(rows(0).getInt(1) === 0)
    assert(rows(1).getLong(0) === nowS + 5 * 86400 - 31536000L) // Jan 20 2025
    assert(rows(1).getInt(1) === 1)
  }

  test("impossible civil dates are null (reference strptime raises)") {
    val nowS = 1768435200L // 2026 (non-leap)
    val rows = Seq(
      "Feb 30 12:00:00", "Jan 99 12:00:00", "Apr 31 00:00:00",
      "Feb 29 12:00:00",        // 2026 is non-leap → invalid
      "Feb 29 12:00:00 2024",   // explicit leap year → valid
      "Jan 05 25:00:00")        // hour out of range
      .toDF("ts").select(ts3164(col("ts"), lit(nowS)).as("t"))
      .select("t.parsed_s").collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).isNullAt(0))
    assert(rows(2).isNullAt(0))
    assert(rows(3).isNullAt(0))
    assert(rows(4).getLong(0) === 1709208000L) // 2024-02-29T12:00:00Z
    assert(rows(5).isNullAt(0))
  }

  test("RFC5424 timestamp offsets and fractions") {
    val df = Seq(
      "2024-01-05T00:00:00Z",
      "2024-01-05T00:00:00.500Z",
      "2024-01-05T02:00:00+02:00",   // local ahead → subtract
      "2024-01-04T18:30:00-05:30")   // local behind → add
      .toDF("ts").select(ts5424Millis(col("ts")).as("ms"))
    val base = 1704412800000L // 2024-01-05T00:00:00Z
    val rows = df.collect().map(_.getLong(0))
    assert(rows(0) === base)
    assert(rows(1) === base + 500)
    assert(rows(2) === base)
    assert(rows(3) === base)
  }

  test("NIL timestamp parses to null") {
    val r = Seq("-").toDF("ts").select(ts5424Millis(col("ts")).as("ms")).collect().head
    assert(r.isNullAt(0))
  }

  test("normalize rewrites headerless lines as RFC5424 with recv time") {
    val out = operators.Syslog.syslogNormalize(spark, sf)
      .filter(col("event_id") % 5 === 0).limit(1).collect().head
    val msg = out.getString(1)
    assert(msg.startsWith("<13>1 "))
    assert(msg.contains(".000000 10.0.0."))
  }

  test("envelope ids are 56 digits and ts_ms positive") {
    val rows = operators.Syslog.eventEnvelope(spark, sf).limit(5).collect()
    rows.foreach { r =>
      assert(r.getString(1).length === 56)
      assert(r.getString(1).forall(_.isDigit))
      assert(r.getLong(3) > 0)
    }
  }
}
