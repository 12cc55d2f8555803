package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Exprs
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PROXY protocol v1/v2 header strip (SURVEY §2 #13–14).
  *
  * The reference peels the header off the connection byte-stream and
  * exposes the real peer/sock addresses before handing the payload to
  * the app protocol (reference: kinesyslog/proxy.py:121-205).
  * Spark-first: one connection blob per row; v1 is a pure regexp
  * composition (codegen'd), v2 is a binary struct-parse expression.
  * Both map-only.
  *
  * v2 notes: 16-byte preamble = 12-byte magic, ver/cmd nibbles,
  * family/proto nibbles, 2-byte addr length; inet/inet6/unix address
  * blocks; TLV walk skips PP2_TYPE_NOOP and unknown types
  * (proxy.py:146-199). The reference's `buffer[13] * 0x0F` protocol
  * extraction is a typo for `& 0x0F` (the published v2 spec's lower
  * nibble); we implement the spec.
  */
object Proxy {

  // -- #13 v1 (text) ----------------------------------------------------

  private val V1Pattern = "^PROXY (\\S+) (\\S+) (\\S+) (\\d+) (\\d+)\\r\\n([\\s\\S]*)$"

  /** v1 header parse over a connection stream string → struct; all
    * fields null when the header doesn't match (the reference closes
    * the connection, proxy.py:131-139). The rlike gate also keeps the
    * port casts ANSI-safe on malformed input. */
  def proxyV1(stream: Column): Column = {
    val valid = stream.rlike(V1Pattern)
    def f(g: Int) = when(valid, regexp_extract(stream, V1Pattern, g))
    struct(
      f(1).as("proto"),
      f(2).as("src_addr"),
      f(3).as("dst_addr"),
      f(4).cast("int").as("src_port"),
      f(5).cast("int").as("dst_port"),
      f(6).as("payload"))
  }

  def proxyV1Query(spark: SparkSession, dir: String): DataFrame = {
    val streams = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        format_string("PROXY TCP4 10.0.0.%d 10.1.0.1 %d 514\r\npayload user=%d n=%d",
          col("user_id"), lit(1024) + col("user_id") % 60000, col("user_id"), col("n"))
          .as("stream"))
    streams.select(col("user_id"), proxyV1(col("stream")).as("p"))
      .select(col("user_id"),
        col("p.proto").as("proto"),
        col("p.src_addr").as("src_addr"),
        col("p.dst_addr").as("dst_addr"),
        col("p.src_port").as("src_port"),
        col("p.dst_port").as("dst_port"),
        col("p.payload").as("payload"))
      .orderBy("user_id")
  }

  val proxyV1Sql: String =
    """SELECT user_id,
      |  'TCP4' AS proto,
      |  '10.0.0.' || user_id AS src_addr,
      |  '10.1.0.1' AS dst_addr,
      |  CAST(1024 + user_id % 60000 AS INT) AS src_port,
      |  CAST(514 AS INT) AS dst_port,
      |  printf('payload user=%d n=%d', user_id, COUNT(*)) AS payload
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // -- #14 v2 (binary) --------------------------------------------------

  private val V2Magic = Array[Byte](0x0d, 0x0a, 0x0d, 0x0a, 0x00, 0x0d,
    0x0a, 'Q', 'U', 'I', 'T', 0x0a)

  private val TlvNames = Map(
    0x01 -> "PP2_TYPE_ALPN", 0x02 -> "PP2_TYPE_AUTHORITY",
    0x03 -> "PP2_TYPE_CRC32C", 0x04 -> "PP2_TYPE_NOOP",
    0x20 -> "PP2_TYPE_SSL", 0x26 -> "PP2_TYPE_NETNS",
    0xea -> "PP2_TYPE_AWS")

  /** Static v2 parse kernel, shared by the interpreted eval and the
    * generated code: header bytes → InternalRow, or null for bad
    * magic/version/command/family. */
  def v2Parse(b: Array[Byte]): InternalRow = {
      if (b.length < 16 || !b.take(12).sameElements(V2Magic)) return null
      val version = b(12) & 0xf0
      val command = b(12) & 0x0f
      val family = b(13) & 0xf0
      val proto = b(13) & 0x0f
      val addrLen = ((b(14) & 0xff) << 8) | (b(15) & 0xff)
      val tlvEnd = 16 + addrLen
      if (version != 0x20 || b.length < tlvEnd) return null
      val commandName = command match {
        case 0 => "local"; case 1 => "proxy"; case _ => return null
      }
      val protoName = proto match {
        case 1 => "stream"; case 2 => "datagram"; case _ => "unspec"
      }
      def u16(i: Int) = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
      def ip4(i: Int) = (0 until 4).map(k => b(i + k) & 0xff).mkString(".")
      def ip6(i: Int) = (0 until 8).map(k => f"${u16(i + 2 * k)}%x").mkString(":")

      var (familyName, srcA, dstA, srcP, dstP, tlvStart) =
        ("", null: String, null: String, -1, -1, 16)
      if (commandName == "proxy") {
        // addrLen must cover the family's fixed address block BEFORE
        // any read: a malformed header declaring addrLen 0 with an
        // inet family would otherwise index past the 16-byte buffer
        // (AIOOBE killing the task) instead of parsing to null
        family match {
          case 0x10 =>
            if (addrLen < 12) return null
            familyName = "inet"
            srcA = ip4(16); dstA = ip4(20); srcP = u16(24); dstP = u16(26)
            tlvStart = 28
          case 0x20 =>
            if (addrLen < 36) return null
            familyName = "inet6"
            srcA = ip6(16); dstA = ip6(32); srcP = u16(48); dstP = u16(50)
            tlvStart = 52
          case 0x30 =>
            if (addrLen < 216) return null
            familyName = "unix"
            srcA = new String(b.slice(16, 124), "US-ASCII").takeWhile(_ != 0)
            dstA = new String(b.slice(124, 232), "US-ASCII").takeWhile(_ != 0)
            tlvStart = 232
          case _ => return null
        }
      }
      val tlvKeys = Vector.newBuilder[UTF8String]
      val tlvVals = Vector.newBuilder[Array[Byte]]
      var p = tlvStart
      while (p + 3 <= tlvEnd && p + 3 <= b.length) {
        val t = b(p) & 0xff
        val len = u16(p + 1)
        TlvNames.get(t).foreach { name =>
          if (name != "PP2_TYPE_NOOP") {
            tlvKeys += UTF8String.fromString(name)
            // clamp to the header (tlvEnd), not the buffer: a corrupt
            // TLV length must not read application-payload bytes —
            // those are emitted separately via drop(tlvEnd)
            tlvVals += b.slice(p + 3,
              math.min(p + 3 + len, math.min(tlvEnd, b.length)))
          }
        }
        p += 3 + len
      }
      InternalRow(
        UTF8String.fromString(commandName),
        if (familyName.isEmpty) null else UTF8String.fromString(familyName),
        UTF8String.fromString(protoName),
        if (srcA == null) null else UTF8String.fromString(srcA),
        if (dstA == null) null else UTF8String.fromString(dstA),
        if (srcP < 0) null else srcP,
        if (dstP < 0) null else dstP,
        new ArrayBasedMapData(
          new GenericArrayData(tlvKeys.result().toArray[Any]),
          new GenericArrayData(tlvVals.result().toArray[Any])),
        b.drop(tlvEnd))
  }

  /** Binary v2 parse → struct(command, family, protocol, src_addr,
    * dst_addr, src_port, dst_port, tlvs map<string,binary>, payload);
    * null for bad magic/version/command/family. doGenCode keeps the
    * stage in whole-stage codegen via the static [[v2Parse]] kernel. */
  case class ProxyV2Parse(child: Expression) extends UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    override def dataType: DataType = StructType(Seq(
      StructField("command", StringType),
      StructField("family", StringType),
      StructField("protocol", StringType),
      StructField("src_addr", StringType),
      StructField("dst_addr", StringType),
      StructField("src_port", IntegerType),
      StructField("dst_port", IntegerType),
      StructField("tlvs", MapType(StringType, BinaryType)),
      StructField("payload", BinaryType)))
    // bad headers parse to null over a non-null child
    override def nullable: Boolean = true

    override def nullSafeEval(v: Any): Any =
      v2Parse(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.operators.Proxy$$.MODULE$$.v2Parse($c);
        ${ev.isNull} = ${ev.value} == null;
      """)
    override protected def withNewChildInternal(c: Expression): ProxyV2Parse =
      copy(child = c)
  }

  def proxy_v2_parse(c: Column): Column =
    Exprs.toColumn(ProxyV2Parse(Exprs.toExpression(c)))

  /** rows-only query: synthesized inet/stream v2 headers per user. */
  def proxyV2Query(spark: SparkSession, dir: String): DataFrame = {
    val streams = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        concat(
          lit("0D0A0D0A000D0A515549540A"), // magic
          lit("21"), lit("11"), lit("000C"), // proxy/inet/stream, 12B addrs
          lpad(hex(lit(0x0a000000L) + col("user_id")), 8, "0"), // 10.0.0.x
          lit("0A010001"), // 10.1.0.1
          lpad(hex(lit(1024) + col("user_id") % 60000), 4, "0"),
          lit("0202")) // 514
          .as("hex"),
        format_string("payload user=%d n=%d", col("user_id"), col("n")).as("payload"))
    streams
      .withColumn("dgram", concat(unhex(col("hex")), col("payload").cast("binary")))
      .select(col("user_id"), proxy_v2_parse(col("dgram")).as("p"))
      .select(col("user_id"),
        col("p.command").as("command"),
        col("p.family").as("family"),
        col("p.protocol").as("protocol"),
        col("p.src_addr").as("src_addr"),
        col("p.dst_addr").as("dst_addr"),
        col("p.src_port").as("src_port"),
        col("p.dst_port").as("dst_port"),
        col("p.payload").cast("string").as("payload"))
      .orderBy("user_id")
  }

  /** v2 is binary, but the parsed output is fully SQL-predictable from
    * the synthesis contract — oracle it like v1. */
  val proxyV2Sql: String =
    """SELECT user_id,
      |  'proxy' AS command,
      |  'inet' AS family,
      |  'stream' AS protocol,
      |  printf('%d.%d.%d.%d',
      |    (167772160 + user_id) // 16777216 % 256,
      |    (167772160 + user_id) // 65536 % 256,
      |    (167772160 + user_id) // 256 % 256,
      |    (167772160 + user_id) % 256) AS src_addr,
      |  '10.1.0.1' AS dst_addr,
      |  CAST(1024 + user_id % 60000 AS INT) AS src_port,
      |  CAST(514 AS INT) AS dst_port,
      |  printf('payload user=%d n=%d', user_id, COUNT(*)) AS payload
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "proxy_v1" -> proxyV1Query,
    "proxy_v2" -> proxyV2Query)

  val oracle: Map[String, String] = Map(
    "proxy_v1" -> proxyV1Sql,
    "proxy_v2" -> proxyV2Sql)
}
