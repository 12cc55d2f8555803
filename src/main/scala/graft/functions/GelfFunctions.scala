package graft.functions

import graft.Constants
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Exprs
import org.apache.spark.sql.types._

/** Chunked-GELF wire format (SURVEY §2 #8).
  *
  * A chunk datagram is `0x1E0F` + 8-byte message id + 1-byte sequence
  * number + 1-byte chunk count, then payload (reference:
  * kinesyslog/gelf.py:11-50: struct `!HqBB`, constant.py:11). The
  * reference accumulates per-id and emits when all `count` parts are
  * seen, ignoring duplicate sequence numbers; reassembly here is a
  * groupBy(id) with the same complete-only rule (operators.Gelf).
  */
object GelfFunctions {

  /** Static parse kernel, shared by the interpreted eval and the
    * generated code: chunk datagram → InternalRow(id, seq, total,
    * payload), or null on bad magic / short datagram. */
  def parseChunk(data: Array[Byte]): InternalRow =
    if (data.length < 12 ||
        data(0) != Constants.GelfMagic(0) || data(1) != Constants.GelfMagic(1)) {
      null
    } else {
      val bb = java.nio.ByteBuffer.wrap(data, 2, 10) // big-endian (!)
      val id = bb.getLong
      val seq = bb.get() & 0xff
      val total = bb.get() & 0xff
      InternalRow(id, seq, total, data.drop(12))
    }

  /** Parse one chunk datagram → struct(id, seq, total, payload);
    * null when the magic doesn't match or the datagram is too short. */
  case class GelfChunkParse(child: Expression) extends UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    override def dataType: DataType = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("seq", IntegerType, nullable = false),
      StructField("total", IntegerType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    // short / bad-magic datagrams evaluate to null even over a
    // non-null child — declare it, or the optimizer folds callers'
    // isNotNull guards away and null structs reach field accessors
    override def nullable: Boolean = true

    override def nullSafeEval(v: Any): Any =
      parseChunk(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.functions.GelfFunctions$$.MODULE$$.parseChunk($c);
        ${ev.isNull} = ${ev.value} == null;
      """)
    override protected def withNewChildInternal(c: Expression): GelfChunkParse =
      copy(child = c)
  }

  def gelf_chunk_parse(c: Column): Column =
    Exprs.toColumn(GelfChunkParse(Exprs.toExpression(c)))
}
