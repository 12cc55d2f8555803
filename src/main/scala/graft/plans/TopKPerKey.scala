package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Top-k-per-key as a WHOLE-PLAN operator (logical node + planner
  * strategy + partial/final physical operators).
  *
  * The DataFrame idiom for "keep the best k rows of every group" —
  * `row_number().over(Window.partitionBy(key).orderBy(ord)) <= k` —
  * SORTS every group in full: a group with 100M rows sorts 100M rows
  * in one task to keep 20. This operator plans it the way aggregation
  * is planned instead:
  *
  *   TopKPartialExec  per input partition, per key: a bounded heap of
  *                    at most k rows — O(n log k), no sort, no spill
  *                    pressure; the map-side combine of top-k
  *   Exchange         hash on the keys (inserted by EnsureRequirements
  *                    because TopKFinalExec requires clustering)
  *   TopKFinalExec    re-merge the ≤ k·partitions survivors per key,
  *                    emit each key's k best in sort order
  *
  * Shuffled bytes drop from n rows to ≤ k·partitions rows per key —
  * at 100 TB, the difference between shuffling the corpus and
  * shuffling a rounding error. Ties: the ordering must be total (add
  * a unique tiebreaker column) for deterministic output, same as the
  * window formulation.
  *
  * Usage: `TopKPerKey.topK(df, Seq($"source"), Seq($"n_chars".desc,
  * $"doc_id"), k = 20)`; the strategy is injected by GraftExtensions.
  */
case class TopKPerKeyNode(keys: Seq[Expression], ordering: Seq[SortOrder],
                          k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKPerKey {
  /** Public API: the best-k rows of every key group under `ordering`.
    * Self-registers the planner strategy (idempotent), so it works in
    * sessions built without GraftExtensions too. */
  def topK(df: DataFrame, keys: Seq[Column], ordering: Seq[Column], k: Int): DataFrame = {
    val exp = df.sparkSession.experimental
    // extraStrategies is a plain var: serialize the check-then-append
    // so concurrent callers can't lose a third strategy's registration
    // (or double-register this one) in the read-modify-write race
    exp.synchronized {
      if (!exp.extraStrategies.contains(TopKStrategy))
        exp.extraStrategies = exp.extraStrategies :+ TopKStrategy
    }
    def toExpr(c: Column) = GraftShims.expression(df.sparkSession, c)
    val sortOrders = ordering.map(c => toExpr(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    GraftShims.ofRows(df.sparkSession,
      TopKPerKeyNode(keys.map(toExpr), sortOrders, k,
        df.queryExecution.analyzed))
  }
}

/** Plans the logical node as partial → (exchange) → final. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, ordering, k, child) =>
      TopKFinalExec(keys, ordering, k,
        TopKPartialExec(keys, ordering, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Per-key bounded heap over one partition's rows. Shared by the
  * partial and final operators — the combine is idempotent, exactly
  * like partial/final aggregation. */
private[graft] object TopKHeap {
  /** keep the k smallest rows under `ord`; heap head = worst kept.
    * `maxKeys` bounds partial-state memory: when the key map outgrows
    * it, current winners are emitted downstream and the map resets
    * (the final pass re-merges — correctness never depends on the
    * partial's completeness, only on it never DROPPING a potential
    * winner, which flush preserves). */
  def topKPerKey(iter: Iterator[InternalRow], keyExprs: Seq[Expression],
                 ordering: Seq[SortOrder], k: Int, output: Seq[Attribute],
                 maxKeys: Int, sortedEmit: Boolean): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(keyExprs, output)
    val ord = RowOrdering.create(ordering, output)
    // max-heap on ord: head is the LARGEST (= worst, since ord sorts
    // best-first) row kept for the key
    val heapOrd: Ordering[InternalRow] = (a: InternalRow, b: InternalRow) =>
      ord.compare(a, b)
    val state = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]

    def drain(): Iterator[InternalRow] = {
      val out = state.valuesIterator.flatMap { q =>
        if (sortedEmit) q.dequeueAll.reverseIterator // best-first
        else q.iterator
      }.toArray
      state.clear()
      out.iterator
    }

    // Lazily interleave flushes with consumption: a flush's rows are
    // YIELDED downstream before more input is read, so retained memory
    // is one drained snapshot (≤ maxKeys·k rows) regardless of key
    // cardinality — buffering flushes to the end would retain
    // ~distinctKeys·k rows and defeat the cap it implements.
    new Iterator[InternalRow] {
      private var pending: Iterator[InternalRow] = Iterator.empty
      private var done = false
      private def advance(): Unit =
        while (!pending.hasNext && !done) {
          if (!iter.hasNext) { pending = drain(); done = true }
          else {
            val row = iter.next()
            val key = keyProj(row)
            state.get(key) match {
              case Some(q) =>
                if (q.size < k) q.enqueue(row.copy())
                else if (ord.compare(row, q.head) < 0) {
                  q.dequeue(); q.enqueue(row.copy())
                }
              case None =>
                if (state.size >= maxKeys) pending = drain()
                val q = mutable.PriorityQueue.empty[InternalRow](heapOrd)
                q.enqueue(row.copy())
                state.put(key.copy(), q)
            }
          }
        }
      override def hasNext: Boolean = { advance(); pending.hasNext }
      override def next(): InternalRow = { advance(); pending.next() }
    }
  }
}

case class TopKPartialExec(keys: Seq[Expression], ordering: Seq[SortOrder],
                           k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] = {
    val (kx, ox, kk, out) = (keys, ordering, k, child.output)
    child.execute().mapPartitions(
      TopKHeap.topKPerKey(_, kx, ox, kk, out,
        maxKeys = TopKPartialExec.MaxBufferedKeys, sortedEmit = false),
      preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPartialExec =
    copy(child = newChild)
}

object TopKPartialExec {
  /** Partial-state cap, the analogue of hash-aggregate fallback: at
    * most this many keys buffer per task before a flush. 100k keys ×
    * k rows bounds partial memory regardless of key cardinality. */
  val MaxBufferedKeys = 100000
}

case class TopKFinalExec(keys: Seq[Expression], ordering: Seq[SortOrder],
                         k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    // empty keys = GLOBAL top-k: every partial survivor must meet in
    // one place, or each partition would emit its own "global" k
    if (keys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(keys) :: Nil
  override protected def doExecute(): RDD[InternalRow] = {
    val (kx, ox, kk, out) = (keys, ordering, k, child.output)
    child.execute().mapPartitions(
      TopKHeap.topKPerKey(_, kx, ox, kk, out,
        maxKeys = Int.MaxValue, sortedEmit = true),
      preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): TopKFinalExec =
    copy(child = newChild)
}
