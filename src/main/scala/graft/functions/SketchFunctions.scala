package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Exprs
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distributed distinct-count sketching (SURVEY §2 #63).
  *
  * KMV ("k minimum values", Bar-Yossef et al. 2002): keep the k
  * smallest DISTINCT hash values seen; if fewer than k were kept the
  * count is exact, otherwise estimate D ≈ (k-1)·M/h_(k) for a hash
  * domain of size M. Unlike exact count_distinct — whose expand plan
  * shuffles every (group, value) pair — the sketch's aggregation state
  * is a bounded k-longs buffer with map-side partial merge, so at
  * 100 TB the shuffle carries k·8 bytes per group per map task, full
  * stop. The estimate math is pure integer division, so DuckDB
  * reproduces the whole pipeline bit-for-bit (rows-ordered min-k via
  * window rank — sketch ⇄ SQL equivalence is the oracle).
  *
  * [[PolyHash]] is the same rolling polynomial hash the portable
  * dedup twins use (h' = h·131 + char, mod 1e9+7) as ONE codegen'd
  * expression instead of an interpreted per-character HOF lambda.
  */
object SketchFunctions {

  val PolyP = 1000000007L

  /** Static so generated code can call it. Matches the HOF
    * formulation `aggregate(split(s,''), 0, (acc,ch) -> (acc*131 +
    * ascii(ch)) % p)` exactly for BMP text (charAt == codepoint).
    * PRECONDITION: inputs must stay within the BMP — an astral
    * character (emoji) would hash as two UTF-16 surrogates here but
    * as one codepoint under DuckDB's ord(). The synthetic corpus is
    * ASCII by construction (normText only lowercases and collapses
    * whitespace — it does NOT transliterate), so the equivalence
    * holds on every table this library hashes; real non-BMP ingest
    * would need codepoint iteration on BOTH sides first. */
  def polyHash(s: UTF8String, p: Long): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) { acc = (acc * 131 + str.charAt(i).toLong) % p; i += 1 }
    acc
  }

  case class PolyHash(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      polyHash(v.asInstanceOf[UTF8String], PolyP)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.SketchFunctions$$.MODULE$$.polyHash($a, ${PolyP}L)")
    override protected def withNewChildInternal(c: Expression): PolyHash =
      copy(child = c)
  }

  def poly_hash(c: Column): Column =
    Exprs.toColumn(PolyHash(Exprs.toExpression(c)))

  /** DuckDB rendering of [[polyHash]] over a column expression — the
    * list_reduce spelling the #84 bloom oracle established (Corpus
    * inlines the same text; this export is for newer oracles so the
    * hash has ONE duck spelling to drift from). */
  def polyHashSqlDuck(x: String): String =
    s"""list_reduce(
       |      list_prepend(CAST(0 AS BIGINT),
       |        list_transform(string_split($x, ''), ch -> CAST(ord(ch) AS BIGINT))),
       |      (acc, c) -> (acc * 131 + c) % $PolyP)""".stripMargin

  /** Bounded distinct-min-k insert — the single definition of KMV's
    * update rule, shared by the batch aggregate and the streaming
    * state twin ([[graft.streaming.SketchStream]]). */
  def addBounded(buf: java.util.TreeSet[java.lang.Long], v: Long, k: Int): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) { if (buf.add(v)) { buf.pollLast(); () } }

  /** KMV estimate from a sorted ascending min-k array: exact when the
    * sketch never filled, (k−1)·M/h₍k₎ integer division otherwise.
    * h₍k₎ = 0 (possible: polyHash("") == 0, reachable with k = 1 on
    * an empty-string token) would divide by zero — every hash is then
    * ≤ 0, i.e. the single value 0, so the exact count IS the answer. */
  def kmvEstimate(mins: Array[Long], k: Int): Long =
    if (mins.length < k || mins(k - 1) == 0L) mins.length.toLong
    else (k - 1).toLong * PolyP / mins(k - 1)

  /** The k smallest distinct BIGINT values of the group, as a sorted
    * ascending ARRAY<BIGINT>. State is a TreeSet capped at k entries;
    * update/merge never grow it past k, so partial aggregation buffers
    * stay O(k) regardless of group size. */
  case class KMinValues(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

    require(k >= 1, "KMinValues requires k >= 1")

    override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
      new java.util.TreeSet[java.lang.Long]()

    private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
      addBounded(buf, v, k)

    override def update(
        buf: java.util.TreeSet[java.lang.Long],
        input: InternalRow): java.util.TreeSet[java.lang.Long] = {
      val v = child.eval(input)
      if (v != null) add(buf, v.asInstanceOf[Long])
      buf
    }

    override def merge(
        b1: java.util.TreeSet[java.lang.Long],
        b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
      val it = b2.iterator()
      while (it.hasNext) add(b1, it.next())
      b1
    }

    override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
      val out = new Array[Long](buf.size)
      val it = buf.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      ArrayData.toArrayData(out) // TreeSet iterates ascending
    }

    override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
      bb.putInt(buf.size)
      val it = buf.iterator()
      while (it.hasNext) bb.putLong(it.next())
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = createAggregationBuffer()
      var i = 0
      while (i < n) { buf.add(bb.getLong); i += 1 }
      buf
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "kmin_values"
    override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): KMinValues =
      copy(child = newChild)
  }

  def kmin_values(c: Column, k: Int): Column =
    Exprs.toColumn(KMinValues(Exprs.toExpression(c), k).toAggregateExpression())
}
