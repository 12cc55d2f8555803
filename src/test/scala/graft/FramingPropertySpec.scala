package graft

import scala.util.Random

import graft.operators.Framing.frameStream
import org.scalatest.funsuite.AnyFunSuite

/** Randomized (seeded, reproducible) round-trip checks of the framing
  * automaton and the integer RFC5424 parser against independent
  * implementations. */
class FramingPropertySpec extends AnyFunSuite {

  test("octet-framed concatenation round-trips (incl. binary payloads)") {
    val rnd = new Random(42)
    for (_ <- 1 to 100) {
      val msgs = Vector.fill(rnd.nextInt(8) + 1) {
        val m = new Array[Byte](rnd.nextInt(200) + 1)
        rnd.nextBytes(m)
        // zero bytes allowed INSIDE octet-counted payloads
        m
      }
      val stream = msgs.flatMap(m => s"${m.length} ".getBytes("US-ASCII") ++ m).toArray
      val out = frameStream(stream)
      assert(out.length === msgs.length)
      out.zip(msgs).foreach { case (a, b) => assert(a.sameElements(b)) }
    }
  }

  test("LF-framed terminator-free messages round-trip") {
    val rnd = new Random(7)
    for (_ <- 1 to 100) {
      val lines = Vector.fill(rnd.nextInt(10) + 1)(
        Vector.fill(rnd.nextInt(100) + 1)(
          ('a' + rnd.nextInt(26)).toChar).mkString)
      val stream = lines.map(_ + "\n").mkString.getBytes("UTF-8")
      assert(frameStream(stream).map(new String(_, "UTF-8")) === lines)
    }
  }

  test("rfc3164 parse + year inference recovers random instants in the valid window") {
    import graft.functions.SyslogFunctions.ts3164
    import org.apache.spark.sql.functions.{col, lit}
    val spark = SparkSpec.session
    import spark.implicits._
    val nowS = 1768435200L // 2026-01-15; recoverable window ≈ (now-362d, now+3d)
    val rnd = new Random(99)
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("MMM dd HH:mm:ss", java.util.Locale.US)
    val cases = for (_ <- 1 to 300) yield {
      val epoch = nowS - 360L * 86400 + (rnd.nextDouble() * 362 * 86400).toLong
      val ts = java.time.LocalDateTime
        .ofEpochSecond(epoch, 0, java.time.ZoneOffset.UTC).format(fmt)
      (ts, epoch)
    }
    val got = cases.map(_._1).toDF("t")
      .select(ts3164(col("t"), lit(nowS)).getField("parsed_s"))
      .collect().map(_.getLong(0))
    got.zip(cases).foreach { case (g, (ts, want)) =>
      assert(g === want, s"ts=$ts")
    }
  }

  test("rfc3164 explicit-year parse recovers random instants across decades") {
    import graft.functions.SyslogFunctions.ts3164
    import org.apache.spark.sql.functions.{col, lit}
    val spark = SparkSpec.session
    import spark.implicits._
    // "now" far in the future: no instant triggers the ≥3d-future
    // rollback, so the explicit year must be used verbatim
    val nowS = 4102444800L // 2100-01-01
    val rnd = new Random(314)
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("MMM dd HH:mm:ss yyyy", java.util.Locale.US)
    val cases = for (_ <- 1 to 300) yield {
      // 2000..2097 (the reference's pattern accepts 20\d\d years)
      val epoch = 946684800L + (rnd.nextDouble() * 3.1e9).toLong
      val ts = java.time.LocalDateTime
        .ofEpochSecond(epoch, 0, java.time.ZoneOffset.UTC).format(fmt)
      (ts, epoch)
    }
    val got = cases.map(_._1).toDF("t")
      .select(ts3164(col("t"), lit(nowS)).getField("parsed_s"))
      .collect().map(_.getLong(0))
    got.zip(cases).foreach { case (g, (ts, want)) =>
      assert(g === want, s"ts=$ts")
    }
  }

  test("rfc5424 integer parse agrees with java.time over random instants") {
    import graft.functions.SyslogFunctions.ts5424Millis
    import org.apache.spark.sql.functions.col
    val spark = SparkSpec.session
    import spark.implicits._
    val rnd = new Random(2024)
    val offsets = Seq(0, 120, -330, 765, -720)
    val fracs = Seq("" -> 0L, ".5" -> 500L, ".25" -> 250L, ".123" -> 123L)
    val cases = for (_ <- 1 to 300) yield {
      val epoch = (rnd.nextDouble() * 4102444800L).toLong // 1970..2100
      val offMin = offsets(rnd.nextInt(offsets.length))
      val (frac, fracMs) = fracs(rnd.nextInt(fracs.length))
      val local = java.time.LocalDateTime.ofEpochSecond(
        epoch + offMin * 60L, 0, java.time.ZoneOffset.UTC)
      val suffix =
        if (offMin == 0) "Z"
        else f"${if (offMin < 0) "-" else "+"}${math.abs(offMin) / 60}%02d:${math.abs(offMin) % 60}%02d"
      val ts = local.format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd'T'HH:mm:ss")) + frac + suffix
      (ts, epoch * 1000L + fracMs)
    }
    val got = cases.map(_._1).toDF("t")
      .select(ts5424Millis(col("t"))).collect().map(_.getLong(0))
    got.zip(cases).foreach { case (g, (ts, want)) =>
      assert(g === want, s"ts=$ts")
    }
  }
}
