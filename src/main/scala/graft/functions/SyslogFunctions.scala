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
  val FutureSeconds = 3 * 86400L

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

  /** Null past the 24 RFC facilities: priRaw admits 3-digit PRIs up
    * to 999 (facility ≤ 124), and under Spark 4's default ANSI mode
    * an unguarded element_at would fail the whole job on one such
    * line — DuckDB's out-of-bounds list index yields NULL, so the
    * guard also keeps the two engines aligned. */
  def facilityName(pri: Column): Column =
    when(facility(pri) <= lit(FacilityNames.length - 1),
      element_at(array(FacilityNames.map(lit): _*), facility(pri) + 1))

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
  /** Static twin of the Julian formula for the parse expressions
    * (truncating division is floor: every intermediate is positive). */
  def civilEpoch(y: Long, mo: Long, d: Long, h: Long, mi: Long, s: Long): Long = {
    val a = (14L - mo) / 12L
    val y2 = y + 4800L - a
    val m2 = mo + 12L * a - 3L
    val jdn = d + (m2 * 153L + 2L) / 5L + y2 * 365L +
      y2 / 4L - y2 / 100L + y2 / 400L - 32045L
    (jdn - 2440588L) * 86400L + h * 3600L + mi * 60L + s
  }

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
  def ts3164(tsRaw: Column, nowS: Column): Column =
    org.apache.spark.sql.graft.Exprs.toColumn(Rfc3164Ts(
      org.apache.spark.sql.graft.Exprs.toExpression(tsRaw),
      org.apache.spark.sql.graft.Exprs.toExpression(nowS.cast("long"))))

  /** RFC3164 parse as ONE compact expression. The column-level
    * formulation of the same logic re-evaluated its shared subtrees
    * per reference — `mo` (a per-row literal-map lookup) ~6×, the
    * Julian composition twice, everything doubled again by the two
    * struct fields — measured ~44 µs/row; this evaluates the stamp
    * once against a compiled pattern and runs the integer math in a
    * static helper (same semantics, same nulls, UTC year inference
    * matching the session timezone the library pins). */
  case class Rfc3164Ts(left: org.apache.spark.sql.catalyst.expressions.Expression,
                       right: org.apache.spark.sql.catalyst.expressions.Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructField, StructType}
    override def dataType: DataType = StructType(Seq(
      StructField("parsed_s", LongType, nullable = true),
      StructField("adjusted", IntegerType, nullable = true)))
    override def nullSafeEval(raw: Any, now: Any): Any =
      Rfc3164Ts.parse(raw.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        now.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.SyslogFunctions$$Rfc3164Ts$$.MODULE$$.parse($a, $b)")
    override protected def withNewChildrenInternal(
        l: org.apache.spark.sql.catalyst.expressions.Expression,
        r: org.apache.spark.sql.catalyst.expressions.Expression): Rfc3164Ts =
      copy(left = l, right = r)
  }

  object Rfc3164Ts {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.unsafe.types.UTF8String

    private val Shape = java.util.regex.Pattern.compile(
      "^[A-Za-z]{3} [ 0-9]\\d \\d{2}:\\d{2}:\\d{2}( 20\\d{2})?$")
    private val Months: java.util.HashMap[String, java.lang.Integer] = {
      val m = new java.util.HashMap[String, java.lang.Integer]()
      Seq("Jan", "Feb", "Mar", "Apr", "May", "Jun",
        "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
        .zipWithIndex.foreach { case (n, i) => m.put(n, Integer.valueOf(i + 1)) }
      m
    }
    private def leap(y: Long): Boolean =
      y % 4 == 0 && (y % 100 != 0 || y % 400 == 0)
    private def daysIn(y: Long, mo: Int): Int = mo match {
      case 2 => if (leap(y)) 29 else 28
      case 4 | 6 | 9 | 11 => 30
      case _ => 31
    }
    private def utcYear(epochS: Long): Long = {
      val jdn = Math.floorDiv(epochS, 86400L) + 2440588L
      val a = jdn + 32044L
      val b = (4 * a + 3) / 146097L
      val c = a - 146097L * b / 4
      val d2 = (4 * c + 3) / 1461L
      val e = c - 1461L * d2 / 4
      val m = (5 * e + 2) / 153L
      100L * b + d2 - 4800L + m / 10
    }

    /** Static so generated code can call it directly. Null result ⟺
      * the stamp is unparseable (shape, month, or civil validity). */
    def parse(raw: UTF8String, nowS: Long): InternalRow = {
      val s = raw.toString
      if (!Shape.matcher(s).matches())
        return new GenericInternalRow(Array[Any](null, null))
      val moBoxed = Months.get(s.substring(0, 3))
      if (moBoxed == null)
        return new GenericInternalRow(Array[Any](null, null))
      val mo = moBoxed.toInt
      val hasYear = s.length > 15
      val theYear =
        if (hasYear) s.substring(16, 20).toLong else utcYear(nowS)
      val d = s.substring(4, 6).trim.toLong
      val h = s.substring(7, 9).toLong
      val mi = s.substring(10, 12).toLong
      val sec = s.substring(13, 15).toLong
      if (d < 1 || d > daysIn(theYear, mo) || h > 23 || mi > 59 || sec > 59)
        return new GenericInternalRow(Array[Any](null, null))
      val parsedS = SyslogFunctions.civilEpoch(theYear, mo, d, h, mi, sec)
      if (parsedS - nowS >= SyslogFunctions.FutureSeconds) {
        // ≥3 days in the future: roll back one year (reference rule);
        // Feb 29 rolled into a non-leap year is unrepresentable → null
        val lastYear: Any =
          if (mo == 2 && d == 29 && !leap(theYear - 1)) null
          else java.lang.Long.valueOf(
            SyslogFunctions.civilEpoch(theYear - 1, mo, d, h, mi, sec))
        new GenericInternalRow(Array[Any](lastYear, Integer.valueOf(1)))
      } else {
        new GenericInternalRow(
          Array[Any](java.lang.Long.valueOf(parsedS), Integer.valueOf(0)))
      }
    }
  }

  // ---------------------------------------------------------------------
  // RFC5424 timestamp (#4)
  // ---------------------------------------------------------------------

  /** Parse RFC5424 `yyyy-MM-ddTHH:mm:ss[.SSS](Z|±hh:mm)` → epoch
    * millis; null when unparseable (e.g. the `-` NIL stamp). Offset
    * math mirrors the reference: a trailing `-hh:mm` ADDS the offset
    * (local clock was behind UTC), `+hh:mm` subtracts
    * (message.py:32-40). */
  def ts5424Millis(tsRaw: Column): Column =
    org.apache.spark.sql.graft.Exprs.toColumn(Rfc5424Ms(
      org.apache.spark.sql.graft.Exprs.toExpression(tsRaw)))

  /** RFC5424 timestamp parse as ONE compact expression (compiled
    * pattern + fixed-position integer fields in a static helper) —
    * the column formulation re-derived the Julian composition per
    * reference and rebuilt substrings per branch. Offset math mirrors
    * the reference: a trailing `-hh:mm` ADDS the offset (local clock
    * was behind UTC), `+hh:mm` subtracts (message.py:32-40). Null when
    * unparseable (e.g. the `-` NIL stamp). */
  case class Rfc5424Ms(child: org.apache.spark.sql.catalyst.expressions.Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    import org.apache.spark.sql.types.{DataType, LongType}
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def nullSafeEval(raw: Any): Any =
      Rfc5424Ms.parse(raw.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val helper = s"graft.functions.SyslogFunctions$$Rfc5424Ms$$.MODULE$$"
      nullSafeCodeGen(ctx, ev, a => s"""
        |java.lang.Long boxed = $helper.parse($a);
        |if (boxed == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = boxed.longValue(); }
        |""".stripMargin)
    }
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression): Rfc5424Ms =
      copy(child = c)
  }

  object Rfc5424Ms {
    import org.apache.spark.unsafe.types.UTF8String
    private val Shape = java.util.regex.Pattern.compile(
      "^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}(\\.\\d{1,6})?(Z|[+-]\\d{2}:\\d{2})$")

    /** Static so generated code can call it; null ⟺ unparseable. */
    def parse(raw: UTF8String): java.lang.Long = {
      val s = raw.toString
      if (!Shape.matcher(s).matches()) return null
      val naiveS = SyslogFunctions.civilEpoch(
        s.substring(0, 4).toLong, s.substring(5, 7).toLong,
        s.substring(8, 10).toLong, s.substring(11, 13).toLong,
        s.substring(14, 16).toLong, s.substring(17, 19).toLong)
      val endsZ = s.charAt(s.length - 1) == 'Z'
      val suffixLen = if (endsZ) 1 else 6
      // fraction (if any) truncated to millis, right-padded: ".5" = 500 ms
      val fracMs =
        if (s.length > 19 && s.charAt(19) == '.') {
          val digits = s.substring(20, s.length - suffixLen)
          val d3 = (digits + "000").substring(0, 3)
          d3.toLong
        } else 0L
      val naiveMs = naiveS * 1000L + fracMs
      if (endsZ) java.lang.Long.valueOf(naiveMs)
      else {
        val sign = if (s.charAt(s.length - 6) == '-') 1L else -1L
        val offH = s.substring(s.length - 5, s.length - 3).toLong
        val offM = s.substring(s.length - 2).toLong
        java.lang.Long.valueOf(
          naiveMs + sign * (offH * 3600L + offM * 60L) * 1000L)
      }
    }
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
