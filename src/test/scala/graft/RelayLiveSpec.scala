package graft

import java.io.File
import java.net.Socket

/** The reference's whole deployment, live, end to end: bytes arrive
  * on a real TCP socket, the listener publishes them, the streaming
  * pipeline parses + envelopes + spools them as real gzip spool
  * files, and the shipping drain packs + ships every record through
  * a transport — #123 → #20 → #72 → #87 → #53 chained on one data
  * path, each stage the already-spec-proven component. */
class RelayLiveSpec extends SparkSpec {

  test("live relay loop: socket -> parse -> spool files -> drain -> transport") {
    val root = new File(sys.props("java.io.tmpdir"),
      s"graft-relay-live-${spark.sparkContext.applicationId}")
    def dir(name: String): File = {
      val d = new File(root, name)
      d.mkdirs()
      Option(d.listFiles()).foreach(_.foreach(_.delete()))
      d
    }
    val ingestDir = dir("ingest")
    val spoolDir = dir("spool")
    val shipDir = dir("delivered")
    val retryDir = dir("retry")
    val logDir = new File(root, "shiplog").getAbsolutePath

    // 1. live listener: two connections, newline-framed syslog
    val ing = new sources.SocketIngest.TcpIngest(0, ingestDir.getAbsolutePath)
    ing.start()
    val msgs = (1 to 8).map(i =>
      s"<${i * 17 % 192}>Feb  5 17:32:${10 + i} host-${i % 3} event id=$i")
    try {
      val s1 = new Socket("127.0.0.1", ing.boundPort)
      val s2 = new Socket("127.0.0.1", ing.boundPort)
      s1.getOutputStream.write(
        msgs.take(5).map(_ + "\n").mkString.getBytes("UTF-8"))
      s2.getOutputStream.write(
        msgs.drop(5).map(_ + "\n").mkString.getBytes("UTF-8"))
      val total = msgs.map(_.length + 1).sum
      val deadline = System.currentTimeMillis() + 10000
      while (ing.bytesIn < total && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(ing.bytesIn === total.toLong)
      s1.close(); s2.close()
    } finally ing.stop()

    // 2. streaming relay: tail the listener's files, parse, envelope,
    //    write REAL spool files (per-stream partitioning as prod would)
    val q = streaming.SyslogPipeline.spoolDirQuery(
      streaming.SyslogPipeline.parsedStream(spark, ingestDir.getAbsolutePath)
        .repartition(org.apache.spark.sql.functions.col("hostname")),
      spoolDir.getAbsolutePath,
      new File(root, "cp-relay").getAbsolutePath)
    q.awaitTermination(60000)

    // spool round-trip: every socket message is in the spool exactly once
    val spooled = spark.read.format("graft-spool")
      .load(spoolDir.getAbsolutePath)
      .select("message").collect().map(_.getString(0))
    assert(spooled.sorted.toSeq === msgs.sorted)

    // 3. drain + ship: every spool file packs into a batch and ships
    val transport = new streaming.FilesystemTransport(shipDir.getAbsolutePath)
    val drain = streaming.SpoolDrainStream.shipQuery(
      spark, spoolDir.getAbsolutePath,
      new File(root, "cp-drain").getAbsolutePath, logDir, transport,
      retryDir.getAbsolutePath, maxCount = 3, maxSize = Long.MaxValue)
    drain.awaitTermination(60000)

    val spoolFiles = spoolDir.listFiles()
      .map(_.getName).filter(_.endsWith(".gz")).sorted
    val log = spark.read.parquet(logDir)
      .select("n_records", "n_failed").collect()
    assert(log.map(_.getLong(0)).sum === spoolFiles.length.toLong)
    assert(log.map(_.getLong(1)).sum === 0L)
    val delivered = shipDir.listFiles().filter(_.getName.endsWith(".txt"))
      .flatMap(f => new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        .split("\n").filter(_.nonEmpty)).sorted
    assert(delivered.toSeq === spoolFiles.toSeq) // each file shipped once
  }
}
