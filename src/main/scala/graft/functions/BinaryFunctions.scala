package graft.functions

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, DeflaterOutputStream, GZIPInputStream, GZIPOutputStream, Inflater, InflaterInputStream}

import graft.Constants
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Exprs
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Binary compression expressions (SURVEY §2 #12, #18).
  *
  * The reference gzips spool records at level 9 (reference:
  * kinesyslog/sink.py:211-217) and sniffs zlib (0x78) / gzip (0x1f8b)
  * magics on inbound GELF datagrams, dropping payloads that fail to
  * decompress (protocol.py:246-261, constant.py:9-10).
  *
  * The per-row work is inherently imperative (JVM zlib), but each
  * expression still implements doGenCode as a static call into this
  * object: a CodegenFallback in the projection forces the generated
  * stage to materialize an InternalRow and dispatch through the
  * interpreted `eval` per row — on the 100 TB relay parse path, the
  * one map stage that dominates the job. Map-only — no shuffle at any
  * scale.
  */
object BinaryFunctions {

  /** Public static surfaces for generated code (doGenCode below). */
  def gzip9(data: Array[Byte]): Array[Byte] = gzip(data, 9)
  def zlib6(data: Array[Byte]): Array[Byte] = zlibCompress(data, 6)

  private def gzip(data: Array[Byte], level: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream(data.length / 2 + 64)
    val gz = new GZIPOutputStream(bos) { `def`.setLevel(level) }
    gz.write(data); gz.close()
    bos.toByteArray
  }

  private def gunzip(data: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new java.io.ByteArrayInputStream(data))
    try in.readAllBytes() finally in.close()
  }

  private def zlibCompress(data: Array[Byte], level: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream(data.length / 2 + 64)
    val out = new DeflaterOutputStream(bos, new Deflater(level))
    out.write(data); out.close()
    bos.toByteArray
  }

  /** Strict whole-payload inflate: the stream must decode to the end
    * AND consume every input byte. InflaterInputStream.readAllBytes
    * can return an EMPTY result without throwing on forged headers
    * (printable "x " passes the RFC 1950 FCHECK), which the sniff
    * would mistake for a successful decompress — truncation and
    * trailing garbage must be loud here so [[autoDecompress]] can
    * fall back to pass-through. */
  private def zlibDecompress(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 2))
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0) {
          if (inf.needsInput() || inf.needsDictionary())
            throw new java.util.zip.DataFormatException("truncated zlib stream")
        } else out.write(buf, 0, n)
      }
      if (inf.getRemaining != 0)
        throw new java.util.zip.DataFormatException("trailing bytes after zlib stream")
      out.toByteArray
    } finally inf.end()
  }

  /** gzip at the spool's compression level (9). */
  case class GzipCompress(child: Expression) extends UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    override def dataType: DataType = BinaryType
    override def nullSafeEval(v: Any): Any = gzip(v.asInstanceOf[Array[Byte]], 9)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.BinaryFunctions$$.MODULE$$.gzip9($c)")
    override protected def withNewChildInternal(c: Expression): GzipCompress =
      copy(child = c)
  }

  case class ZlibCompress(child: Expression) extends UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    override def dataType: DataType = BinaryType
    override def nullSafeEval(v: Any): Any =
      zlibCompress(v.asInstanceOf[Array[Byte]], 6)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.BinaryFunctions$$.MODULE$$.zlib6($c)")
    override protected def withNewChildInternal(c: Expression): ZlibCompress =
      copy(child = c)
  }

  /** JVM-side magic-sniff decompress — gzip 0x1f8b → gunzip, zlib
    * header → inflate, anything else passes through unchanged. Shared
    * by the [[AutoDecompress]] expression and the streaming chunk
    * reassembly, which runs the REASSEMBLED buffer back through this
    * sniff as the reference feeds it back through data_received
    * (protocol.py:281-287 → 217-224).
    *
    * Deliberate divergence from the reference's single-byte 0x78
    * sniff: this operator is applied to ARBITRARY payloads (the
    * reference only ever sees GELF JSON, which starts with '{'), and
    * 0x78 is a printable 'x' — any text starting with 'x' would be
    * mis-routed. So zlib detection validates the full RFC 1950
    * header (CM = 8, FCHECK: big-endian first-two-bytes ≡ 0 mod 31),
    * and because printable text can still forge that ("x " = 0x7820 ≡
    * 0 mod 31), a zlib-sniffed payload that fails to inflate passes
    * through VERBATIM instead of dropping — at corpus scale, silently
    * nulling real text is the worse failure; a genuinely corrupt
    * stream flows raw into the downstream JSON parse, which rejects
    * it there. Corrupt GZIP still yields null (the reference drops
    * it; 0x1f8b is never printable text). */
  private def looksGzip(data: Array[Byte]): Boolean =
    data.length >= 2 && data(0) == Constants.GzipMagic(0) &&
      data(1) == Constants.GzipMagic(1)

  private def looksZlib(data: Array[Byte]): Boolean =
    data.length >= 2 && (data(0) & 0x0F) == 8 &&
      (((data(0) & 0xFF) << 8) | (data(1) & 0xFF)) % 31 == 0

  /** True when the payload carries an arm [[autoDecompress]] would
    * inflate. GELF-protocol consumers (chunk stream, datagram
    * framing) use this to turn the corpus-oriented pass-through
    * fallback back into the reference's drop: a payload that LOOKED
    * compressed but came back verbatim failed to inflate. */
  def looksCompressed(data: Array[Byte]): Boolean =
    looksGzip(data) || looksZlib(data)

  def autoDecompress(data: Array[Byte]): Array[Byte] =
    if (looksGzip(data)) {
      try gunzip(data) catch { case _: Exception => null }
    } else if (looksZlib(data)) {
      try zlibDecompress(data) catch { case _: Exception => data }
    } else data

  /** Magic-sniffing decompress as a Catalyst expression. Nullable
    * regardless of the child: corrupt gzip evaluates to null, and
    * inheriting non-nullability would let NullPropagation fold a
    * caller's defensive isNotNull guard to literal true. The codegen
    * must re-check for that null (defineCodeGen alone would leave
    * isNull false on a null value and NPE downstream). */
  case class AutoDecompress(child: Expression) extends UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any =
      autoDecompress(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.functions.BinaryFunctions$$.MODULE$$.autoDecompress($c);
        ${ev.isNull} = ${ev.value} == null;
      """)
    override protected def withNewChildInternal(c: Expression): AutoDecompress =
      copy(child = c)
  }

  /** Python-style `bytes.decode('utf-8', 'backslashreplace')`
    * (reference: kinesyslog/message.py:81, :97): UTF-8 decode where
    * each invalid byte becomes the 4-char literal `\xHH` instead of
    * U+FFFD, so malformed relay input survives round-trips losslessly
    * in the event envelope. Valid input is wrapped zero-copy.
    * (Approximation note: on a truncated multi-byte sequence Python
    * may escape 1-2 bytes as a unit; this escapes byte-by-byte —
    * byte-identical output on every single-byte corruption.) */
  def backslashReplace(b: Array[Byte]): org.apache.spark.unsafe.types.UTF8String = {
    import org.apache.spark.unsafe.types.UTF8String
    def cont(i: Int): Boolean = i < b.length && (b(i) & 0xc0) == 0x80
    def contIn(i: Int, lo: Int, hi: Int): Boolean =
      i < b.length && (b(i) & 0xff) >= lo && (b(i) & 0xff) <= hi
    // returns the length of the valid UTF-8 sequence at i, or 0
    def seqLen(i: Int): Int = {
      val b0 = b(i) & 0xff
      if (b0 < 0x80) 1
      else if (b0 >= 0xc2 && b0 <= 0xdf) { if (cont(i + 1)) 2 else 0 }
      else if (b0 == 0xe0) { if (contIn(i + 1, 0xa0, 0xbf) && cont(i + 2)) 3 else 0 }
      else if (b0 == 0xed) { if (contIn(i + 1, 0x80, 0x9f) && cont(i + 2)) 3 else 0 }
      else if (b0 >= 0xe1 && b0 <= 0xef) { if (cont(i + 1) && cont(i + 2)) 3 else 0 }
      else if (b0 == 0xf0) { if (contIn(i + 1, 0x90, 0xbf) && cont(i + 2) && cont(i + 3)) 4 else 0 }
      else if (b0 >= 0xf1 && b0 <= 0xf3) { if (cont(i + 1) && cont(i + 2) && cont(i + 3)) 4 else 0 }
      else if (b0 == 0xf4) { if (contIn(i + 1, 0x80, 0x8f) && cont(i + 2) && cont(i + 3)) 4 else 0 }
      else 0
    }
    var i = 0
    var clean = true
    while (clean && i < b.length) {
      val n = seqLen(i)
      if (n == 0) clean = false else i += n
    }
    if (clean) return UTF8String.fromBytes(b)
    val out = new ByteArrayOutputStream(b.length + 16)
    out.write(b, 0, i) // the valid prefix scanned above
    val hex = "0123456789abcdef"
    while (i < b.length) {
      val n = seqLen(i)
      if (n > 0) { out.write(b, i, n); i += n }
      else {
        val v = b(i) & 0xff
        out.write('\\'); out.write('x')
        out.write(hex.charAt(v >> 4)); out.write(hex.charAt(v & 0xf))
        i += 1
      }
    }
    UTF8String.fromBytes(out.toByteArray)
  }

  /** BINARY → STRING with Python backslashreplace semantics. */
  case class DecodeBackslashReplace(child: Expression) extends UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    override def dataType: DataType = org.apache.spark.sql.types.StringType
    override def nullSafeEval(v: Any): Any =
      backslashReplace(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.BinaryFunctions$$.MODULE$$.backslashReplace($c)")
    override protected def withNewChildInternal(c: Expression): DecodeBackslashReplace =
      copy(child = c)
  }

  def gzip_compress(c: Column): Column =
    Exprs.toColumn(GzipCompress(Exprs.toExpression(c)))
  def zlib_compress(c: Column): Column =
    Exprs.toColumn(ZlibCompress(Exprs.toExpression(c)))
  def decompress_auto(c: Column): Column =
    Exprs.toColumn(AutoDecompress(Exprs.toExpression(c)))
  def decode_backslashreplace(c: Column): Column =
    Exprs.toColumn(DecodeBackslashReplace(Exprs.toExpression(c)))
}
