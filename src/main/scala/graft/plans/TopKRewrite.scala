package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: the standard top-k-per-group idiom
  *
  *   df.withColumn("rn", row_number().over(Window.partitionBy(P).orderBy(O)))
  *     .filter($"rn" <= k).drop("rn")
  *
  * rewrites to [[TopKPerKeyNode]] — the window (which sorts every
  * group in full, merely group-limit-pruned by Spark's own
  * InferWindowGroupLimit) becomes the bounded-heap partial/final plan
  * with no sort at all. Users keep writing the idiom every Spark
  * tutorial teaches; the planner swaps in the plan that survives a
  * 100M-row group.
  *
  * Guards (leave the plan unchanged otherwise):
  *  - the window computes EXACTLY row_number() (rank/dense_rank admit
  *    ties past k; other functions need the full partition);
  *  - the filter bounds that row number above by a positive literal
  *    (all `rn <= k` conjunct forms; the tightest bound wins), and no
  *    OTHER conjunct references rn;
  *  - the Project above drops rn (if rn is kept, the caller wants the
  *    rank itself — e.g. corpus_domain_cap — and the window stays);
  *  - k ≤ 100k, bounding partial-heap memory at k rows per key per
  *    task (past that, the window's sort-spill machinery is the right
  *    tool);
  *  - an InferWindowGroupLimit node already under the window is
  *    stripped: TopKPerKey subsumes its pruning.
  */
object TopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val MaxK = 100000L

  private def longLit(e: Expression): Option[Long] = e match {
    case Literal(v: Int, _) => Some(v.toLong)
    case Literal(v: Long, _) => Some(v)
    case _ => None
  }

  /** `conj` as an upper bound on `rn`: Some(k) for rn ≤ k forms. */
  private def boundOf(conj: Expression, rn: Attribute): Option[Long] = conj match {
    case LessThanOrEqual(a: AttributeReference, l) if a.semanticEquals(rn) => longLit(l)
    case LessThan(a: AttributeReference, l) if a.semanticEquals(rn) => longLit(l).map(_ - 1)
    case GreaterThanOrEqual(l, a: AttributeReference) if a.semanticEquals(rn) => longLit(l)
    case GreaterThan(l, a: AttributeReference) if a.semanticEquals(rn) => longLit(l).map(_ - 1)
    case EqualTo(a: AttributeReference, l) if a.semanticEquals(rn) && longLit(l).contains(1L) => Some(1L)
    case EqualTo(l, a: AttributeReference) if a.semanticEquals(rn) && longLit(l).contains(1L) => Some(1L)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(list, Filter(cond, w: Window)) =>
      val rewritten = w.windowExpressions match {
        case Seq(a @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(part, order,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _))
            if order.nonEmpty =>
          val rn = a.toAttribute
          val conjs = splitConjunctivePredicates(cond)
          val (bounds, rest) = conjs.partition(boundOf(_, rn).isDefined)
          val ks = bounds.flatMap(boundOf(_, rn))
          if (ks.isEmpty || ks.min <= 0 || ks.min > MaxK ||
            rest.exists(_.references.contains(rn)) ||
            list.exists(_.references.contains(rn))) None
          else {
            val child = w.child match {
              case g: WindowGroupLimit => g.child
              case c => c
            }
            val topk = TopKPerKeyNode(part, order, ks.min.toInt, child)
            val filtered =
              if (rest.isEmpty) topk else Filter(rest.reduce(And), topk)
            Some(Project(list, filtered))
          }
        case _ => None
      }
      rewritten.getOrElse(p)
  }
}
