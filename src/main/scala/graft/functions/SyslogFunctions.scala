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

  /** Message body after the `<PRI>` prefix (whole message when no
    * PRI). Derived with substring arithmetic off priRaw — codegen'd
    * subexpression elimination then shares ONE regex execution between
    * pri and rest instead of running a second regexp_replace. */
  def afterPri(raw: Column): Column = {
    val p = priRaw(raw)
    when(p =!= "", raw.substr(length(p) + lit(3), lit(Int.MaxValue)))
      .otherwise(raw)
  }

  private val Rfc5424Rest = "^1 (\\S{20,38}|-) (\\S+) (.*)$"
  /** RFC3164 stamp with the optional explicit year the reference's
    * pattern accepts (message.py:15: `...\ ..\ ..:..:..(\ 20\d\d)?`).
    * The greedy optional group consumes the year when present, exactly
    * like the reference — without it the year would bind as the
    * hostname. */
  private val Rfc3164Rest =
    "^([A-Za-z]{3} [ 0-9]\\d \\d{2}:\\d{2}:\\d{2}( 20\\d{2})?) (\\S+) (.*)$"

  /** Full header parse → struct(pri int|null, version int, ts_raw,
    * hostname, content). version: 1 = RFC5424, 0 = RFC3164 header,
    * -1 = no recognizable header (content = body after PRI, or the
    * whole message when PRI is also missing).
    *
    * Hot-path note: each format is VALIDATED with one anchored rlike,
    * then fields come from splits/substrings — a regexp_extract per
    * group would re-run the full match per field (~10 regex executions
    * per row, measured ~2× slower on the parse bench). */
  def parseHeader(raw: Column): Column = {
    val pri  = priRaw(raw)
    val rest = afterPri(raw)
    val is54 = rest.rlike(Rfc5424Rest)
    val is31 = rest.rlike(Rfc3164Rest)
    // Year presence re-checked on a fixed 6-char slice (cheap) instead
    // of a second full-line regex: the greedy year group matched iff
    // chars 16-20 are " 20\d\d" AND char 21 delimits it with a space
    // (a hostname like "2026x" must not read as a year).
    val is31y = is31 && substring(rest, 16, 6).rlike("^ 20\\d{2} $")
    // RFC5424: "1 TS HOST CONTENT" — split on the first 3 spaces.
    val p54 = split(rest, " ", 4)
    // RFC3164: "MMM dd HH:mm:ss[ yyyy] HOST CONTENT" — fixed 15- or
    // 20-char stamp, then host and content split on the next space.
    // p31 accessors use 0-based `get` (null past the end, never an
    // ANSI INVALID_ARRAY_INDEX): with a year stamp followed by a
    // single trailing token ("…12 2026 up") the remainder has no
    // content part, which must degrade to content=null — the
    // reference's `(?P<content>.*)` binds "" there (message.py:16) —
    // not kill the job.
    val rem31 = when(is31y, substring(rest, 22, Int.MaxValue))
      .otherwise(substring(rest, 17, Int.MaxValue))
    val p31 = split(rem31, " ", 2)
    struct(
      when(pri =!= "", pri.cast("int")).as("pri"),
      when(is54, 1).when(is31y || is31, 0).otherwise(-1).as("version"),
      when(is54, element_at(p54, 2))
        .when(is31y, substring(rest, 1, 20))
        .when(is31, substring(rest, 1, 15)).as("ts_raw"),
      when(is54, element_at(p54, 3))
        .when(is31y || is31, get(p31, lit(0))).as("hostname"),
      when(is54, element_at(p54, 4))
        .when(is31y || is31, get(p31, lit(1)))
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

  /** Epoch seconds of a civil UTC date-time via pure integer
    * arithmetic (Julian-day-number formula) — stays inside whole-stage
    * codegen, no DateTimeFormatter. Inputs must be validated upstream;
    * out-of-range day-of-month simply rolls over (callers gate with an
    * anchored rlike + month map, matching the reference parser's
    * accept set). */
  private def civilEpochSeconds(y: Column, mo: Column, d: Column,
                                h: Column, mi: Column, s: Column): Column = {
    // truncating casts are floor here: every intermediate is positive
    val a = ((lit(14) - mo) / 12).cast("long")
    val y2 = y + 4800L - a
    val m2 = mo + lit(12L) * a - 3L
    val jdn = d + ((m2 * 153L + 2L) / 5L).cast("long") + y2 * 365L +
      (y2 / 4L).cast("long") - (y2 / 100L).cast("long") +
      (y2 / 400L).cast("long") - 32045L
    (jdn - 2440588L) * 86400L + h * 3600L + mi * 60L + s
  }

  private val MonthNums: Column = map(
    Seq("Jan" -> 1, "Feb" -> 2, "Mar" -> 3, "Apr" -> 4, "May" -> 5,
      "Jun" -> 6, "Jul" -> 7, "Aug" -> 8, "Sep" -> 9, "Oct" -> 10,
      "Nov" -> 11, "Dec" -> 12)
      .flatMap { case (n, v) => Seq(lit(n), lit(v)) }: _*)

  private def isLeap(y: Column): Column =
    y % 4 === 0 && (y % 100 =!= 0 || y % 400 === 0)

  private def daysInMonth(y: Column, mo: Column): Column =
    when(mo === 2, when(isLeap(y), 29).otherwise(28))
      .when(mo.isin(4, 6, 9, 11), 30)
      .otherwise(31)

  /** Parse `MMM dd HH:mm:ss[ yyyy]` with the year inferred from `nowS`
    * (epoch seconds) when absent; an explicit trailing year (which the
    * reference's pattern accepts, message.py:15 + the len>15 branch of
    * parse_rfc3164_timestamp) is used directly. Returns
    * struct(parsed_s long|null, adjusted int): adjusted = 1 when the
    * ≥3-days-in-the-future rule moved the stamp to last year — the
    * reference applies that rule even to explicit-year stamps
    * (message.py:26-28). Impossible civil dates (`Feb 30`, `Jan 99`,
    * `Feb 29` of a non-leap parse year) yield null, exactly where the
    * reference's strptime raises and the message falls to the rewrite
    * path; so does a Feb 29 rolled back into a non-leap year. All
    * arithmetic is integer codegen — no DateTimeFormatter on the hot
    * path. */
  def ts3164(tsRaw: Column, nowS: Column): Column = {
    val shape =
      tsRaw.rlike("^[A-Za-z]{3} [ 0-9]\\d \\d{2}:\\d{2}:\\d{2}( 20\\d{2})?$") &&
      map_contains_key(MonthNums, substring(tsRaw, 1, 3))
    val hasYear = length(tsRaw) > 15
    val nowYear = year(timestamp_seconds(nowS)).cast("long")
    val theYear = when(hasYear, substring(tsRaw, 17, 4).cast("long"))
      .otherwise(nowYear)
    val mo = element_at(MonthNums, substring(tsRaw, 1, 3)).cast("long")
    val d  = substring(tsRaw, 5, 2).cast("long")
    val h  = substring(tsRaw, 8, 2).cast("long")
    val mi = substring(tsRaw, 11, 2).cast("long")
    val s  = substring(tsRaw, 14, 2).cast("long")
    val valid = shape && d >= 1 && d <= daysInMonth(theYear, mo) &&
      h <= 23 && mi <= 59 && s <= 59
    val parsedS = civilEpochSeconds(theYear, mo, d, h, mi, s)
    val adjusted = when(parsedS - nowS >= FutureSeconds, 1).otherwise(0)
    val lastYearS = when(mo === 2 && d === 29 && !isLeap(theYear - 1),
        lit(null).cast("long"))
      .otherwise(civilEpochSeconds(theYear - 1, mo, d, h, mi, s))
    struct(
      when(!valid, lit(null).cast("long"))
        .when(adjusted === 1, lastYearS).otherwise(parsedS).as("parsed_s"),
      when(!valid, lit(null).cast("int")).otherwise(adjusted).as("adjusted"))
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
    val Valid =
      "^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}(\\.\\d{1,6})?(Z|[+-]\\d{2}:\\d{2})$"
    val valid = tsRaw.rlike(Valid)
    val endsZ = substring(tsRaw, -1, 1) === "Z"
    // Fixed-position integer fields — no DateTimeFormatter on the hot
    // path; one anchored rlike validates the shape.
    val naiveS = civilEpochSeconds(
      substring(tsRaw, 1, 4).cast("long"),
      substring(tsRaw, 6, 2).cast("long"),
      substring(tsRaw, 9, 2).cast("long"),
      substring(tsRaw, 12, 2).cast("long"),
      substring(tsRaw, 15, 2).cast("long"),
      substring(tsRaw, 18, 2).cast("long"))
    // fraction (if any) truncated to millis, right-padded: ".5" =
    // 500ms. The validating rlike pins the shape, so the fraction sits
    // at fixed position 21 with the zone suffix (1 or 6 chars) behind
    // it — substring arithmetic replaces a per-row regexp_extract.
    val suffixLen = when(endsZ, 1).otherwise(6)
    val fracDigits = when(substring(tsRaw, 20, 1) === ".",
        tsRaw.substr(lit(21), length(tsRaw) - lit(20) - suffixLen))
      .otherwise(lit(""))
    val fracMs = when(fracDigits === "", 0L)
      .otherwise(rpad(substring(fracDigits, 1, 3), 3, "0").cast("long"))
    val naiveMs = naiveS * 1000L + fracMs
    // Offset math as in the reference: trailing '-hh:mm' ADDS the
    // offset (local clock behind UTC), '+hh:mm' subtracts.
    val signCh = substring(tsRaw, -6, 1)
    val offH = substring(tsRaw, -5, 2).cast("long")
    val offM = substring(tsRaw, -2, 2).cast("long")
    val sign = when(signCh === "-", 1L).otherwise(-1L)
    when(!valid, lit(null).cast("long"))
      .when(endsZ, naiveMs)
      .otherwise(naiveMs + sign * (offH * 3600L + offM * 60L) * 1000L)
  }

  // ---------------------------------------------------------------------
  // Integer-math timestamp FORMATTING (inverse of civilEpochSeconds) —
  // used by the rewrite path and by query-side line synthesis so the
  // whole round-trip stays off DateTimeFormatter.
  // ---------------------------------------------------------------------

  /** Compact eval expression for timestamp FORMATTING: a column-level
    * inverse-Julian composition expands to a huge codegen tree (each
    * struct-field reference re-derives the whole date), which blows
    * janino's 64 KB method limit and drops the stage to interpreted
    * mode. One call into a static primitive-arithmetic helper is both
    * smaller and faster — and doGenCode (rather than CodegenFallback)
    * keeps the surrounding projection inside whole-stage codegen, so
    * line synthesis fuses with the parse stage instead of forcing an
    * interpreted Project between them. */
  case class CivilFormat(child: org.apache.spark.sql.catalyst.expressions.Expression,
                         rfc5424: Boolean)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    import org.apache.spark.sql.types.{DataType, StringType}
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      CivilFormat.format(v.asInstanceOf[Long], rfc5424)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.SyslogFunctions$$CivilFormat$$.MODULE$$.format($c, $rfc5424)")
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression): CivilFormat =
      copy(child = c)
  }

  object CivilFormat {
    import org.apache.spark.unsafe.types.UTF8String
    private val MonthNames = Array("Jan", "Feb", "Mar", "Apr", "May", "Jun",
      "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")

    /** Static so generated code can call it directly. */
    def format(epochS: Long, rfc5424: Boolean): UTF8String = {
      val days = Math.floorDiv(epochS, 86400L)
      val rem = Math.floorMod(epochS, 86400L)
      val jdn = days + 2440588L
      val a = jdn + 32044L
      val b = (4 * a + 3) / 146097L
      val c = a - 146097L * b / 4
      val d2 = (4 * c + 3) / 1461L
      val e = c - 1461L * d2 / 4
      val m = (5 * e + 2) / 153L
      val day = e - (153L * m + 2) / 5 + 1
      val month = (m + 3 - 12 * (m / 10)).toInt
      val year = 100L * b + d2 - 4800L + m / 10
      val h = rem / 3600; val mi = (rem % 3600) / 60; val s = rem % 60
      val sb = new java.lang.StringBuilder(20)
      def p2(x: Long): Unit = { if (x < 10) sb.append('0'); sb.append(x) }
      if (rfc5424) {
        sb.append(year).append('-'); p2(month); sb.append('-'); p2(day)
        sb.append('T'); p2(h); sb.append(':'); p2(mi); sb.append(':'); p2(s)
      } else {
        sb.append(MonthNames(month - 1)).append(' ')
        p2(day); sb.append(' ')
        p2(h); sb.append(':'); p2(mi); sb.append(':'); p2(s)
      }
      UTF8String.fromString(sb.toString)
    }
  }

  /** `yyyy-MM-ddTHH:mm:ss` of an epoch-second column. */
  def formatCivil5424(epochS: Column): Column =
    org.apache.spark.sql.graft.Exprs.toColumn(CivilFormat(
      org.apache.spark.sql.graft.Exprs.toExpression(epochS.cast("long")),
      rfc5424 = true))

  /** `MMM dd HH:mm:ss` (zero-padded day) of an epoch-second column. */
  def formatCivil3164(epochS: Column): Column =
    org.apache.spark.sql.graft.Exprs.toColumn(CivilFormat(
      org.apache.spark.sql.graft.Exprs.toExpression(epochS.cast("long")),
      rfc5424 = false))

  /** RFC5424 rewrite stamp for unparseable inputs:
    * `yyyy-MM-ddTHH:mm:ss.ffffff` of the receive time
    * (message.py:51-52). */
  def format5424(epochS: Column): Column =
    concat(formatCivil5424(epochS), lit(".000000"))
}
