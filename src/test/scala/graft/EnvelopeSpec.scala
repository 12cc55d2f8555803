package graft

import graft.functions.BinaryFunctions._
import org.apache.spark.sql.functions._

/** Envelope/record/batch/stats (#15–19) invariants + gzip/zlib
  * expression round-trips. */
class EnvelopeSpec extends SparkSpec {
  import spark.implicits._

  test("gzip round-trip preserves bytes and writes gzip magic") {
    val df = Seq("hello spool", "x" * 5000).toDF("s")
      .withColumn("raw", col("s").cast("binary"))
      .withColumn("gz", gzip_compress(col("raw")))
      .withColumn("rt", decompress_auto(col("gz")))
    val rows = df.select("gz", "rt", "raw").collect()
    rows.foreach { r =>
      val gz = r.getAs[Array[Byte]](0)
      assert(gz(0) == 0x1f.toByte && gz(1) == 0x8b.toByte)
      assert(r.getAs[Array[Byte]](1).sameElements(r.getAs[Array[Byte]](2)))
    }
  }

  test("zlib round-trip via magic sniff") {
    val df = Seq("gelf payload").toDF("s")
      .withColumn("raw", col("s").cast("binary"))
      .withColumn("z", zlib_compress(col("raw")))
      .withColumn("rt", decompress_auto(col("z")))
    val r = df.select("z", "rt", "raw").collect().head
    assert(r.getAs[Array[Byte]](0)(0) == 0x78.toByte)
    assert(r.getAs[Array[Byte]](1).sameElements(r.getAs[Array[Byte]](2)))
  }

  test("uncompressed payloads pass through decompress_auto unchanged") {
    val r = Seq("{\"version\":\"1.1\"}").toDF("s")
      .withColumn("raw", col("s").cast("binary"))
      .select(decompress_auto(col("raw")).cast("string")).collect().head
    assert(r.getString(0) === "{\"version\":\"1.1\"}")
  }

  test("corrupt gzip payload yields null (reference drops it)") {
    val bytes = Array[Byte](0x1f.toByte, 0x8b.toByte, 1, 2, 3)
    val r = Seq(bytes).toDF("raw").select(decompress_auto(col("raw"))).collect().head
    assert(r.isNullAt(0))
  }

  test("text starting with 'x' is never mis-sniffed as zlib") {
    // "xy" = 0x78 0x79 fails the RFC 1950 FCHECK (0x7879 % 31 != 0):
    // the single-byte 0x78 sniff would have routed it to inflate and
    // nulled it; the full header check must pass it through
    val r = Seq("xylophone lessons", "x marks the spot").toDF("s")
      .withColumn("raw", col("s").cast("binary"))
      .select(decompress_auto(col("raw")).cast("string")).collect()
    assert(r.map(_.getString(0)).toSeq ===
      Seq("xylophone lessons", "x marks the spot"))
    // "x " = 0x7820 ≡ 0 mod 31 FORGES a valid zlib header — the
    // inflate attempt fails and must fall back to pass-through, not
    // null: text payloads survive the sniff at any corpus scale
    assert(((0x78 << 8) | ' '.toInt) % 31 === 0)
  }

  test("record_split parts reassemble each (source,dest) group exactly") {
    val split = operators.Envelope.recordSplit(spark, sf)
    val env = operators.Envelope.recordEnvelope(spark, sf)
    val back = split.groupBy("source", "dest")
      .agg(sum("n_events").as("n"), sum("part_bytes").as("b"))
    val joined = env.join(back, Seq("source", "dest"))
      .filter(col("n") =!= col("n_events") || col("b") =!= col("total_bytes"))
    assert(joined.count() === 0)
  }

  test("record_split respects the size cap (greedy even parts)") {
    // Every part except possibly the remainder of each group must be
    // at or below the cap when messages are small relative to it.
    val over = operators.Envelope.recordSplit(spark, sf)
      .filter(col("part_bytes") > operators.Envelope.TestRecordSize * 2)
    assert(over.count() === 0)
  }

  test("firehose batches respect count and size caps") {
    val b = operators.Envelope.firehoseBatches(spark, sf)
    assert(b.filter(col("n_records") > operators.Envelope.TestBatchCount).count() === 0)
    // size cap can only be exceeded by a single oversize record
    val over = b.filter(col("batch_bytes") > operators.Envelope.TestBatchSize &&
      col("n_records") > 1)
    assert(over.count() === 0)
    assert(b.count() > 0)
  }

  test("sharded batching preserves caps and record conservation") {
    val sharded = operators.Envelope.firehoseBatchesSharded(spark, sf, shards = 4)
    val flat = operators.Envelope.firehoseBatches(spark, sf)
    // every record lands in exactly one sharded batch
    assert(sharded.agg(sum("n_records")).collect().head.getLong(0) ===
      flat.agg(sum("n_records")).collect().head.getLong(0))
    // caps hold per (dest, shard) batch
    assert(sharded.filter(col("n_records") > operators.Envelope.TestBatchCount)
      .count() === 0)
    assert(sharded.filter(col("batch_bytes") > operators.Envelope.TestBatchSize &&
      col("n_records") > 1).count() === 0)
    // the salt actually spreads the drain across shards
    assert(sharded.select("shard").distinct().count() > 1)
  }

  test("record_gzip compresses the CloudWatch record JSON and round-trips") {
    val r = operators.Envelope.recordGzip(spark, sf)
    assert(r.filter(col("roundtrip_ok") =!= 1).count() === 0)
    assert(r.filter(col("gz_len") >= col("raw_len")).count() === 0)
  }

  test("record_gzip composes with recordSplit: one gzip per part, bounded size") {
    val r = operators.Envelope.recordGzip(spark, sf)
    val split = operators.Envelope.recordSplit(spark, sf)
    // one gzipped spool body per split part — never an unbounded
    // (source, dest) collect_list
    assert(r.count() === split.count())
    // every compressed record fits the record cap (the reference's
    // split keeps gzipped records under MAX_RECORD_SIZE, sink.py:167)
    val over = r.filter(col("gz_len") > operators.Envelope.TestRecordSize)
    assert(over.count() === 0)
  }

  test("firehose_retry: failed records re-enter drain 2 and converge") {
    val r = operators.Envelope.firehoseRetry(spark, sf).collect()
    val d1 = r.filter(_.getInt(0) === 1)
    val d2 = r.filter(_.getInt(0) === 2)
    val failed1 = d1.map(_.getLong(5)).sum
    assert(failed1 > 0, "seeded failure rule should fail some records")
    // every drain-1 failure re-enters drain 2 exactly once, and drain 2
    // reports no failures (convergence after one retry)
    assert(d2.map(_.getLong(3)).sum === failed1)
    assert(d2.map(_.getLong(5)).sum === 0)
    // drain-2 batches respect the same caps as drain 1
    d2.foreach { row =>
      assert(row.getLong(3) <= operators.Envelope.TestBatchCount)
    }
  }

  test("backslashreplace decode matches Python semantics") {
    // b'abc\xff\xc3\xa9'.decode('utf-8','backslashreplace') == 'abc\\xffé'
    val cases = Seq(
      Array[Byte]('a', 'b', 'c', 0xff.toByte, 0xc3.toByte, 0xa9.toByte) ->
        "abc\\xffé",
      "plain ascii".getBytes("UTF-8") -> "plain ascii",
      Array[Byte](0xed.toByte, 0xa0.toByte, 0x80.toByte) -> // surrogate half
        "\\xed\\xa0\\x80",
      Array[Byte]('x', 0xc3.toByte) -> "x\\xc3", // truncated 2-byte seq
      "héllo 😀".getBytes("UTF-8") -> "héllo 😀")
    val got = cases.map(_._1).toDF("b")
      .select(decode_backslashreplace(col("b"))).collect().map(_.getString(0))
    got.zip(cases).foreach { case (g, (_, want)) => assert(g === want) }
  }

  test("stats counters cover all events") {
    val s = operators.Envelope.statsCounters(spark, sf)
    val total = s.agg(sum("message_count")).collect().head.getLong(0)
    assert(total === Tables.events(spark, sf).count())
  }

  test("stats_export renders exposition lines with monotone histogram buckets") {
    val lines = operators.Envelope.statsExport(spark, sf)
      .collect().map(_.getString(0))
    assert(lines.forall(l => l.startsWith("kinesyslog_")))
    // cumulative bucket counts are monotone in le, and +Inf == _count
    val bucketRe = """kinesyslog_batch_records_bucket\{le="(\d+)"\} (\d+)""".r
    val buckets = lines.collect { case bucketRe(le, n) => (le.toLong, n.toLong) }
      .sortBy(_._1)
    assert(buckets.nonEmpty)
    assert(buckets.zip(buckets.tail).forall { case ((_, a), (_, b)) => a <= b })
    val inf = lines.collectFirst {
      case l if l.startsWith("kinesyslog_batch_records_bucket{le=\"+Inf\"}") =>
        l.split(" ").last.toLong }.get
    val cnt = lines.collectFirst {
      case l if l.startsWith("kinesyslog_batch_records_count") =>
        l.split(" ").last.toLong }.get
    assert(inf === cnt && buckets.last._2 <= inf)
  }

  test("StatsServer serves the #50 exposition text over HTTP") {
    val server = tools.StatsServer.serve(spark, sf, port = 0)
    try {
      val url = java.net.URI
        .create(s"http://127.0.0.1:${server.boundPort}/metrics").toURL
      val conn = url.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      assert(conn.getResponseCode === 200)
      assert(conn.getContentType.startsWith("text/plain"))
      val body = new String(conn.getInputStream.readAllBytes(), "UTF-8")
      val served = body.split("\n").filter(_.nonEmpty).toSeq
      val expected = operators.Envelope.statsExport(spark, sf)
        .collect().map(_.getString(0)).toSeq
      assert(served === expected)
      // a second scrape re-renders (the pull model): same stable data,
      // same body
      val conn2 = url.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      val body2 = new String(conn2.getInputStream.readAllBytes(), "UTF-8")
      assert(body2 === body)
    } finally server.stop()
  }
}
