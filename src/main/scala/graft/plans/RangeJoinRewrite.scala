package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite band (interval) joins into bucketized
  * equality joins.
  *
  * A join whose only cross-side predicate is a time band
  *
  *   b.ts > a.ts AND b.ts - a.ts <= Δ        (Δ a positive literal)
  *
  * has no equi-key, so Spark plans BroadcastNestedLoopJoin /
  * CartesianProduct — O(|A|·|B|) comparisons regardless of how narrow
  * the band is. But the band predicate itself implies an equality:
  * flooring both timestamps to Δ-wide buckets, an in-band b row lands
  * either in its a row's bucket or the next one. This rule makes that
  * equality explicit — explode the lower side to {bkt, bkt+1}, project
  * the bucket on the upper side, hash-join on it, keep the original
  * band predicate as the exact filter — so users write the natural
  * inequality join and still get a shuffle-hash plan whose per-task
  * work is bounded by the band width, not the input product.
  * `operators.Sequence.eventsRangeJoin` is the hand-written shape this
  * rule derives automatically.
  *
  * Scope guards (leave the plan unchanged otherwise):
  *  - inner joins only (outer variants change null-production);
  *  - a genuine cross-side equality conjunct already present means
  *    Spark has a hash key — rewriting would only add fan-out (this
  *    also makes the rule idempotent: the rewritten join carries the
  *    bucket equality);
  *  - both band operands must be integral (cast to BIGINT buckets).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** Floor division that is exact for negative values too —
    * IntegralDivide truncates toward zero, which would break bucket
    * adjacency left of epoch. */
  private def floorDiv(x: Expression, d: Long): Expression = {
    val q = IntegralDivide(x, Literal(d))
    val r = Remainder(x, Literal(d))
    Subtract(q, If(LessThan(r, Literal(0L)), Literal(1L), Literal(0L)))
  }

  private def integral(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType | LongType => true
    case _ => false
  }

  private def longLit(l: Literal): Option[Long] = l.value match {
    case i: Int => Some(i.toLong)
    case i: Long => Some(i)
    case i: Short => Some(i.toLong)
    case _ => None
  }

  /** (lower `a`, upper `b`, Δ) from `b - a <= Δ` / `b - a < Δ`. */
  private def bandWidth(e: Expression): Option[(Expression, Expression, Long)] =
    e match {
      case LessThanOrEqual(s: Subtract, l: Literal) =>
        longLit(l).map(d => (s.right, s.left, d))
      case LessThan(s: Subtract, l: Literal) =>
        longLit(l).map(d => (s.right, s.left, d))
      case GreaterThanOrEqual(l: Literal, s: Subtract) =>
        longLit(l).map(d => (s.right, s.left, d))
      case GreaterThan(l: Literal, s: Subtract) =>
        longLit(l).map(d => (s.right, s.left, d))
      case _ => None
    }

  /** Is `e` a lower bound `b > a` / `b >= a` for the same operands? */
  private def lowerBound(e: Expression, a: Expression, b: Expression): Boolean =
    e match {
      case GreaterThan(b2, a2) => b2.semanticEquals(b) && a2.semanticEquals(a)
      case GreaterThanOrEqual(b2, a2) => b2.semanticEquals(b) && a2.semanticEquals(a)
      case LessThan(a2, b2) => b2.semanticEquals(b) && a2.semanticEquals(a)
      case LessThanOrEqual(a2, b2) => b2.semanticEquals(b) && a2.semanticEquals(a)
      case _ => false
    }

  private def crossSideEquality(conjs: Seq[Expression],
                                left: LogicalPlan, right: LogicalPlan): Boolean =
    conjs.exists {
      case EqualTo(l, r) =>
        val (lr, rr) = (l.references, r.references)
        lr.nonEmpty && rr.nonEmpty &&
          ((lr.subsetOf(left.outputSet) && rr.subsetOf(right.outputSet)) ||
            (lr.subsetOf(right.outputSet) && rr.subsetOf(left.outputSet)))
      case EqualNullSafe(l, r) =>
        val (lr, rr) = (l.references, r.references)
        lr.nonEmpty && rr.nonEmpty &&
          ((lr.subsetOf(left.outputSet) && rr.subsetOf(right.outputSet)) ||
            (lr.subsetOf(right.outputSet) && rr.subsetOf(left.outputSet)))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjs = splitConjunctivePredicates(cond)
      val band = conjs.iterator.flatMap(bandWidth(_)).collectFirst {
        case (a, b, d) if d > 0 && integral(a) && integral(b) &&
          conjs.exists(lowerBound(_, a, b)) => (a, b, d)
      }
      band match {
        case Some((a, b, d)) if !crossSideEquality(conjs, left, right) =>
          // `a` (the band's lower endpoint) probes {bkt, bkt+1};
          // `b` lands in its exact bucket.
          val sides: Option[(LogicalPlan, LogicalPlan, Boolean)] =
            if (a.references.subsetOf(left.outputSet) &&
              b.references.subsetOf(right.outputSet))
              Some((left, right, true))
            else if (a.references.subsetOf(right.outputSet) &&
              b.references.subsetOf(left.outputSet))
              Some((right, left, false))
            else None
          sides match {
            case Some((probe, index, probeIsLeft)) =>
              val qProbe = floorDiv(Cast(a, LongType), d)
              val genOut =
                AttributeReference("__graft_bkt_probe", LongType)()
              val newProbe = Generate(
                Explode(CreateArray(Seq(qProbe, Add(qProbe, Literal(1L))))),
                unrequiredChildIndex = Nil, outer = false, qualifier = None,
                generatorOutput = Seq(genOut), child = probe)
              val idxAlias =
                Alias(floorDiv(Cast(b, LongType), d), "__graft_bkt_index")()
              val newIndex = Project(index.output :+ idxAlias, index)
              val newCond = And(EqualTo(genOut, idxAlias.toAttribute), cond)
              val newJoin =
                if (probeIsLeft) Join(newProbe, newIndex, Inner, Some(newCond), hint)
                else Join(newIndex, newProbe, Inner, Some(newCond), hint)
              Project(j.output, newJoin)
            case None => j
          }
        case _ => j
      }
  }
}
