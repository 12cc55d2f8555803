package graft.functions

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, DeflaterOutputStream, GZIPInputStream, GZIPOutputStream, Inflater, InflaterInputStream}

import graft.Constants
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.Exprs
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Binary compression expressions (SURVEY §2 #12, #18).
  *
  * The reference gzips spool records at level 9 (reference:
  * kinesyslog/sink.py:211-217) and sniffs zlib (0x78) / gzip (0x1f8b)
  * magics on inbound GELF datagrams, dropping payloads that fail to
  * decompress (protocol.py:246-261, constant.py:9-10).
  *
  * All are evaluated expressions (CodegenFallback): per-row
  * compression is inherently imperative, and the surrounding plan
  * stages stay codegen'd. Map-only — no shuffle at any scale.
  */
object BinaryFunctions {

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

  private def zlibDecompress(data: Array[Byte]): Array[Byte] = {
    val in = new InflaterInputStream(new java.io.ByteArrayInputStream(data), new Inflater())
    try in.readAllBytes() finally in.close()
  }

  /** gzip at the spool's compression level (9). */
  case class GzipCompress(child: Expression) extends UnaryExpression
      with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(v: Any): Any = gzip(v.asInstanceOf[Array[Byte]], 9)
    override protected def withNewChildInternal(c: Expression): GzipCompress =
      copy(child = c)
  }

  case class ZlibCompress(child: Expression) extends UnaryExpression
      with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(v: Any): Any =
      zlibCompress(v.asInstanceOf[Array[Byte]], 6)
    override protected def withNewChildInternal(c: Expression): ZlibCompress =
      copy(child = c)
  }

  /** Magic-sniffing decompress: gzip 0x1f8b → gunzip, zlib 0x78 →
    * inflate, anything else passes through unchanged; a payload whose
    * magic matches but fails to decompress yields null (the reference
    * logs and drops it). */
  case class AutoDecompress(child: Expression) extends UnaryExpression
      with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(v: Any): Any = {
      val data = v.asInstanceOf[Array[Byte]]
      try {
        if (data.length >= 2 && data(0) == Constants.GzipMagic(0) &&
            data(1) == Constants.GzipMagic(1)) gunzip(data)
        else if (data.length >= 1 && data(0) == Constants.ZlibMagic)
          zlibDecompress(data)
        else data
      } catch { case _: Exception => null }
    }
    override protected def withNewChildInternal(c: Expression): AutoDecompress =
      copy(child = c)
  }

  def gzip_compress(c: Column): Column =
    Exprs.toColumn(GzipCompress(Exprs.toExpression(c)))
  def zlib_compress(c: Column): Column =
    Exprs.toColumn(ZlibCompress(Exprs.toExpression(c)))
  def decompress_auto(c: Column): Column =
    Exprs.toColumn(AutoDecompress(Exprs.toExpression(c)))
}
