package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.SortedJaccard
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: similarity-join length pruning (the AllPairs /
  * PPJoin length filter, Bayardo et al. WWW'07 shape).
  *
  * `jaccard(A,B) >= t` implies `|A∩B| >= t·|A∪B|`, and since
  * `|A∩B| <= min(|A|,|B|)` and `|A∪B| >= max(|A|,|B|)`, it follows
  * that `min(|A|,|B|) >= t·max(|A|,|B|)`. That size test costs two
  * array-length reads; the full [[SortedJaccard]] merge scan costs
  * O(|A|+|B|). The rule conjoins the implied size predicate in front
  * of every `SortedJaccard >= literal` bound (bare or under
  * `round(_, s)`, with the rounding half-ulp slack), so within-bucket
  * verification skips the merge scan for pairs whose sizes already
  * rule them out — on a near-dup corpus, the vast majority.
  *
  * Semantics-preserving (the added conjunct is implied by the
  * original). Only TOP-LEVEL conjuncts are rewritten: a bound that
  * sits under OR / NOT / CASE does not imply the size filter for the
  * whole row (e.g. `jaccard >= 0.9 OR p` must keep rows satisfying
  * only `p`), so such occurrences are left untouched. Skipped if the
  * condition already mentions `size(...)`, which also makes the rule
  * idempotent under the optimizer's fixed-point batch.
  */
object JaccardLengthPruning extends Rule[LogicalPlan] with PredicateHelper {

  private def bound(e: Expression): Option[(Expression, Expression, Double)] = e match {
    case GreaterThanOrEqual(SortedJaccard(a, b), Literal(t: Double, DoubleType)) =>
      Some((a, b, t))
    case GreaterThanOrEqual(r: Round, Literal(t: Double, DoubleType)) =>
      r.child match {
        // round(j, s) >= t admits j >= t - 0.5*10^-s; widen by a full ulp
        case SortedJaccard(a, b) => Some((a, b, math.max(0.0,
          t - math.pow(10.0, -scaleOf(r)))))
        case _ => None
      }
    case _ => None
  }

  private def scaleOf(r: Round): Int = r.scale match {
    case Literal(s: Int, _) => s
    case _ => 0
  }

  private def prefilter(a: Expression, b: Expression, t: Double): Expression = {
    val sa = Cast(Size(a, legacySizeOfNull = false), DoubleType)
    val sb = Cast(Size(b, legacySizeOfNull = false), DoubleType)
    GreaterThanOrEqual(Least(Seq(sa, sb)), Multiply(Literal(t), Greatest(Seq(sa, sb))))
  }

  private def rewrite(cond: Expression): Option[Expression] = {
    // only bounds that are themselves top-level conjuncts imply the
    // size prefilter for every surviving row
    val found = splitConjunctivePredicates(cond).flatMap(bound)
    if (found.isEmpty) None
    else Some(found.foldLeft(cond) { case (c, (a, b, t)) => And(prefilter(a, b, t), c) })
  }

  private def untouched(cond: Expression): Boolean = !cond.exists(_.isInstanceOf[Size])

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) if untouched(cond) =>
      rewrite(cond).map(c => f.copy(condition = c)).getOrElse(f)
    case j @ Join(_, _, _, Some(cond), _) if untouched(cond) =>
      rewrite(cond).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }
}
