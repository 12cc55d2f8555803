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

  // --- RelayMain: the one-command assembly drives the same loop ---

  import TlsTestSupport.{genCertKey, tlsClient, freePort}

  test("RelayMain assembles the relay: syslog over TCP + TLS + UDP, shipped and measured") {
    val root = new File(sys.props("java.io.tmpdir"),
      s"graft-relaymain-${spark.sparkContext.applicationId}")
    org.apache.commons.io.FileUtils.deleteQuietly(root)
    root.mkdirs()
    val (certFile, keyFile) = genCertKey(root)
    val spoolDir = new File(root, "spool")
    val config = RelayConfig(
      tcpPorts = Seq(freePort()), tlsPorts = Seq(freePort()),
      udpPorts = Seq(freePort()),
      certFile = Some(certFile), keyFile = Some(keyFile),
      prometheusPorts = Seq(freePort()),
      spoolDir = spoolDir.getAbsolutePath,
      maxBatchCount = 3)
    val shipDir = new File(root, "delivered")
    val relay = new tools.RelayMain.Relay(spark, config,
      tools.RelayMain.RelayDirs(root.getAbsolutePath),
      new streaming.FilesystemTransport(shipDir.getAbsolutePath))
    relay.start()
    val tcpMsgs = (1 to 4).map(i =>
      s"<${i * 17 % 192}>Feb  5 17:32:1$i tcp-host-$i plain leg id=$i")
    val tlsMsgs = (5 to 8).map(i =>
      s"<${i * 17 % 192}>Feb  5 17:32:1$i tls-host-$i secure leg id=$i")
    val udpMsgs = (9 to 10).map(i =>
      s"<${i * 13 % 192}>Feb  5 17:32:2$i udp-host-$i datagram leg id=$i")
    try {
      val plain = new Socket("127.0.0.1", relay.boundPorts("tcp").head)
      plain.getOutputStream.write(
        tcpMsgs.map(_ + "\n").mkString.getBytes("UTF-8"))
      val secure = tlsClient(certFile, relay.boundPorts("tls").head)
      secure.getOutputStream.write(
        tlsMsgs.map(_ + "\n").mkString.getBytes("UTF-8"))
      secure.getOutputStream.flush()
      val dsock = new java.net.DatagramSocket()
      val addr = java.net.InetAddress.getByName("127.0.0.1")
      udpMsgs.foreach { m =>
        val b = m.getBytes("UTF-8")
        dsock.send(new java.net.DatagramPacket(
          b, b.length, addr, relay.boundPorts("udp").head))
      }
      dsock.close()
      val total = (tcpMsgs ++ tlsMsgs).map(_.length + 1).sum
      val deadline = System.currentTimeMillis() + 15000
      while ((relay.bytesIn < total || relay.datagramsIn < udpMsgs.length)
          && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(relay.bytesIn === total.toLong)
      assert(relay.datagramsIn === udpMsgs.length.toLong)
      plain.close(); secure.close()
      // listeners publish their final chunks on stop(); stop before
      // draining so every byte is in a *.dat file (drainOnce is a
      // flush pass, not a tailer)
      relay.tcpListeners.foreach(_._4.stop())
      relay.udpListeners.foreach(_._3.stop())
      relay.drainOnce()
      // spool round-trip: every message exactly once, and each leg's
      // logGroup carries its own bound port (sink.py:163 semantics)
      val spooled = spark.read.format("graft-spool")
        .load(spoolDir.getAbsolutePath)
        .select("log_group", "message").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(spooled.map(_._2).sorted.toSeq ===
        (tcpMsgs ++ tlsMsgs ++ udpMsgs).sorted)
      val byGroup = spooled.groupBy(_._1).view.mapValues(_.length).toMap
      assert(byGroup(s"/kinesyslog/syslog/${relay.boundPorts("tcp").head}") === 4)
      assert(byGroup(s"/kinesyslog/syslog/${relay.boundPorts("tls").head}") === 4)
      assert(byGroup(s"/kinesyslog/syslog/${relay.boundPorts("udp").head}") === 2)
      // drain shipped every spool file exactly once, no failures
      val log = spark.read.parquet(new File(root, "shiplog").getAbsolutePath)
        .select("n_records", "n_failed").collect()
      val nSpool = spoolDir.listFiles().count(_.getName.endsWith(".gz"))
      assert(log.map(_.getLong(0)).sum === nSpool.toLong)
      assert(log.map(_.getLong(1)).sum === 0L)
      // stats endpoint serves live per-stream counters over HTTP
      val url = java.net.URI.create(
        s"http://127.0.0.1:${relay.statsPorts.head}/metrics").toURL
      val metrics = new String(url.openStream().readAllBytes(), "UTF-8")
      assert(metrics.contains("kinesyslog_message_count_total"))
      assert(metrics.contains("tcp-host-1"))
      assert(metrics.contains("tls-host-5"))
    } finally relay.stop()
  }

  test("RelayMain gelf mode: the same assembly with the GELF parse path") {
    val root = new File(sys.props("java.io.tmpdir"),
      s"graft-relaymain-gelf-${spark.sparkContext.applicationId}")
    org.apache.commons.io.FileUtils.deleteQuietly(root)
    root.mkdirs()
    val spoolDir = new File(root, "spool")
    val config = RelayConfig(
      gelf = true,
      tcpPorts = Seq(freePort()), tlsPorts = Seq(0),
      spoolDir = spoolDir.getAbsolutePath,
      maxBatchCount = 3)
    val relay = new tools.RelayMain.Relay(spark, config,
      tools.RelayMain.RelayDirs(root.getAbsolutePath),
      new streaming.FilesystemTransport(
        new File(root, "delivered").getAbsolutePath))
    relay.start()
    val msgs = (1 to 3).map(i =>
      s"""{"version":"1.1","host":"gelf-host-$i","short_message":"msg $i","timestamp":17000000$i.25}""")
    try {
      val s = new Socket("127.0.0.1", relay.boundPorts("tcp").head)
      s.getOutputStream.write(msgs.map(_ + "\n").mkString.getBytes("UTF-8"))
      val total = msgs.map(_.length + 1).sum
      val deadline = System.currentTimeMillis() + 15000
      while (relay.bytesIn < total && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(relay.bytesIn === total.toLong)
      s.close()
      relay.tcpListeners.foreach(_._4.stop())
      relay.drainOnce()
      val spooled = spark.read.format("graft-spool")
        .load(spoolDir.getAbsolutePath)
        .select("log_group", "log_stream", "message").collect()
      assert(spooled.map(_.getString(2)).sorted.toSeq === msgs.sorted)
      // message class lands in the group path (sink.py:163)
      assert(spooled.forall(_.getString(0) ==
        s"/kinesyslog/gelf/${relay.boundPorts("tcp").head}"))
      assert(spooled.map(_.getString(1)).toSet ===
        (1 to 3).map(i => s"gelf-host-$i").toSet)
    } finally relay.stop()
  }
}
