package graft

/** Library analogue of the reference relay's configuration surface
  * (reference: kinesyslog/init.py:30-170 — CLI/env options). A user of
  * the reference maps each option onto a field here; socket-level
  * options (bind address, TLS cert/key, privilege drop) belong to the
  * ingestion tier that feeds the stream source and have no Spark
  * analogue.
  *
  * Defaults mirror the reference's (`--group-prefix /kinesyslog`,
  * `--tls-port 6514`, flush constants from constant.py).
  */
case class RelayConfig(
    /** Firehose delivery stream (`--stream`). */
    deliveryStream: String = "kinesyslog",
    /** LogGroup prefix (`--group-prefix`). */
    groupPrefix: String = "/kinesyslog",
    /** GELF mode instead of syslog (`--gelf`) — selects the message
      * class used in logGroup composition and the parse path. */
    gelf: Boolean = false,
    /** Listener ports (`--udp-port`/`--tcp-port`/`--tls-port`); port 0
      * disables, matching the reference. */
    udpPorts: Seq[Int] = Seq(0),
    tcpPorts: Seq[Int] = Seq(0),
    tlsPorts: Seq[Int] = Seq(6514),
    /** Ports with PROXY protocol enabled (`--proxy-protocol`). */
    proxyProtocolPorts: Seq[Int] = Seq(0),
    /** Spool directory (`--spool-dir`). */
    spoolDir: String = System.getProperty("java.io.tmpdir"),
    /** Sink flush semantics (constant.py:12-17). */
    flushSeconds: Int = Constants.FlushTime,
    flushBytes: Int = Constants.FlushSize,
    maxRecordSize: Int = Constants.MaxRecordSize,
    maxBatchCount: Int = Constants.MaxBatchCount,
    maxBatchSize: Int = Constants.MaxBatchSize) {

  def messageClass: String = if (gelf) "gelf" else "syslog"

  /** logGroup for a destination port:
    * `{prefix}/{message_class}/{port}` (sink.py:163). */
  def logGroup(port: Int): String = s"$groupPrefix/$messageClass/$port"

  def activePorts: Seq[Int] =
    (udpPorts ++ tcpPorts ++ tlsPorts).filter(_ != 0).distinct
}
