package graft

import graft.operators.Proxy._
import org.apache.spark.sql.functions._

/** PROXY protocol v1/v2 fixtures (#13–14): inet6, unix, local command,
  * TLV walk, malformed headers. */
class ProxySpec extends SparkSpec {
  import spark.implicits._

  private val magic = Array[Byte](0x0d, 0x0a, 0x0d, 0x0a, 0x00, 0x0d,
    0x0a, 'Q', 'U', 'I', 'T', 0x0a)

  private def v2(verCmd: Int, famProto: Int, addr: Array[Byte],
                 tlv: Array[Byte] = Array.empty,
                 payload: Array[Byte] = Array.empty): Array[Byte] = {
    val addrLen = addr.length + tlv.length
    magic ++ Array(verCmd.toByte, famProto.toByte,
      ((addrLen >> 8) & 0xff).toByte, (addrLen & 0xff).toByte) ++
      addr ++ tlv ++ payload
  }

  private def parse(d: Array[Byte]) =
    Seq(d).toDF("d").select(proxy_v2_parse(col("d")).as("p"))
      .select("p.command", "p.family", "p.protocol", "p.src_addr",
        "p.dst_addr", "p.src_port", "p.dst_port", "p.tlvs", "p.payload")
      .collect().head

  test("v1 header parse with CRLF payload split") {
    val r = Seq("PROXY TCP4 192.168.1.10 10.0.0.1 45123 514\r\n<13>hello\n")
      .toDF("s").select(proxyV1(col("s")).as("p"))
      .select("p.proto", "p.src_addr", "p.src_port", "p.dst_port", "p.payload")
      .collect().head
    assert(r.getString(0) === "TCP4")
    assert(r.getString(1) === "192.168.1.10")
    assert(r.getInt(2) === 45123)
    assert(r.getInt(3) === 514)
    assert(r.getString(4) === "<13>hello\n")
  }

  test("v2 inet parse with payload") {
    val addr = Array[Byte](10, 0, 0, 5, 10, 1, 0, 1,
      (45123 >> 8).toByte, (45123 & 0xff).toByte, 2, 2)
    val r = parse(v2(0x21, 0x11, addr, payload = "data".getBytes))
    assert(r.getString(0) === "proxy")
    assert(r.getString(1) === "inet")
    assert(r.getString(2) === "stream")
    assert(r.getString(3) === "10.0.0.5")
    assert(r.getString(4) === "10.1.0.1")
    assert(r.getInt(5) === 45123)
    assert(r.getInt(6) === 514)
    assert(new String(r.getAs[Array[Byte]](8)) === "data")
  }

  test("v2 inet6 parse") {
    val src = Array.fill[Byte](16)(0); src(15) = 1
    val dst = Array.fill[Byte](16)(0); dst(0) = 0x20; dst(1) = 0x01; dst(15) = 2
    val addr = src ++ dst ++ Array[Byte](0x1f, 0x40, 2, 2) // 8000 → 514
    val r = parse(v2(0x21, 0x21, addr))
    assert(r.getString(1) === "inet6")
    assert(r.getString(3) === "0:0:0:0:0:0:0:1")
    assert(r.getString(4) === "2001:0:0:0:0:0:0:2")
    assert(r.getInt(5) === 8000)
  }

  test("v2 unix parse strips NUL padding") {
    val src = "/var/run/app.sock".getBytes.padTo(108, 0.toByte)
    val dst = "/var/run/dst.sock".getBytes.padTo(108, 0.toByte)
    val r = parse(v2(0x21, 0x31, src ++ dst))
    assert(r.getString(1) === "unix")
    assert(r.getString(3) === "/var/run/app.sock")
    assert(r.getString(4) === "/var/run/dst.sock")
  }

  test("v2 local command carries no addresses") {
    val r = parse(v2(0x20, 0x00, Array.empty))
    assert(r.getString(0) === "local")
    assert(r.isNullAt(1) || r.getString(1) == null)
    assert(r.isNullAt(3))
  }

  test("v2 TLV walk skips NOOP and keeps known types") {
    val addr = Array[Byte](10, 0, 0, 5, 10, 1, 0, 1, 0, 80, 2, 2)
    val tlv =
      Array[Byte](0x04, 0, 2, 9, 9) ++          // NOOP (skipped)
      Array[Byte](0x02, 0, 3) ++ "abc".getBytes ++ // AUTHORITY
      Array[Byte](0x7f, 0, 1, 5)                 // unknown (skipped)
    val r = parse(v2(0x21, 0x11, addr, tlv))
    val tlvs = r.getMap[String, Array[Byte]](7)
    assert(tlvs.size === 1)
    assert(new String(tlvs("PP2_TYPE_AUTHORITY")) === "abc")
  }

  test("v1 malformed header yields nulls, not an ANSI cast error") {
    val r = Seq("GET / HTTP/1.1\r\nHost: x\r\n").toDF("s")
      .select(proxyV1(col("s")).as("p"))
      .select("p.proto", "p.src_port").collect().head
    assert(r.isNullAt(0))
    assert(r.isNullAt(1))
  }

  test("v2 bad magic / version / family yield null") {
    val addr = Array[Byte](10, 0, 0, 5, 10, 1, 0, 1, 0, 80, 2, 2)
    val badMagic = v2(0x21, 0x11, addr); badMagic(0) = 0x00
    val badVer = v2(0x31, 0x11, addr)
    val badFam = v2(0x21, 0x41, addr)
    Seq(badMagic, badVer, badFam).foreach { d =>
      val r = Seq(d).toDF("d").select(proxy_v2_parse(col("d"))).collect().head
      assert(r.isNullAt(0))
    }
  }
}
