package graft.plans

import graft.functions.{JaccardSim, WordShingleHashes, WordShingles}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: a threshold predicate `jaccard_sim(A, B) >= t` over
  * DISTINCT sets implies `|A| >= t·|B| AND |B| >= t·|A|` (for distinct
  * arrays, J = |A∩B|/|A∪B| ≤ min(|A|,|B|)/max(|A|,|B|)) — so the cheap
  * size comparison can run BEFORE the expensive membership loop and skip
  * it for pairs that cannot possibly reach the threshold. On an LSH
  * verify join this prunes the length-mismatched candidate pairs at a
  * cost of two `size()` calls.
  *
  * Soundness guards (both required):
  *  - the implication only holds for distinct arrays, and raw-size
  *    semantics break it when duplicates inflate one side — the rewrite
  *    therefore fires only when BOTH inputs are PROVABLY distinct by
  *    construction (word_shingles / word_shingle_hashes / array_distinct
  *    nodes), never for opaque columns;
  *  - only TOP-LEVEL conjuncts are strengthened — a candidate nested
  *    under OR/NOT must not contribute a top-level size bound.
  *
  * The added conjuncts are plain `size()` predicates, so the surrounding
  * optimizer batch can still push them toward the scan. Idempotent
  * (required: injected rules run inside a fixed-point batch) — bounds
  * already present as conjuncts are not re-added.
  */
object JaccardPrefilterRule extends Rule[LogicalPlan] with PredicateHelper {

  private def provablyDistinct(e: Expression): Boolean = e match {
    case _: WordShingles | _: WordShingleHashes | _: ArrayDistinct => true
    case _ => false
  }

  private def sizeOf(e: Expression): Expression =
    Cast(Size(e, legacySizeOfNull = false), DoubleType)

  /** The two one-sided bounds for jaccard_sim(a, b) >= t. */
  private def bounds(j: JaccardSim, t: Double): Seq[Expression] = Seq(
    GreaterThanOrEqual(sizeOf(j.left), Multiply(Literal(t), sizeOf(j.right))),
    GreaterThanOrEqual(sizeOf(j.right), Multiply(Literal(t), sizeOf(j.left))))

  private def candidate(conjunct: Expression): Option[Seq[Expression]] = conjunct match {
    case GreaterThanOrEqual(j: JaccardSim, Literal(t: Double, DoubleType))
        if t > 0.0 && provablyDistinct(j.left) && provablyDistinct(j.right) =>
      Some(bounds(j, t))
    case GreaterThan(j: JaccardSim, Literal(t: Double, DoubleType))
        if t > 0.0 && provablyDistinct(j.left) && provablyDistinct(j.right) =>
      Some(bounds(j, t))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val missing = conjuncts.flatMap(candidate).flatten.distinct
        .filterNot(b => conjuncts.exists(_.semanticEquals(b)))
      if (missing.isEmpty) f
      else Filter(And(missing.reduce(And), cond), child)
  }
}
