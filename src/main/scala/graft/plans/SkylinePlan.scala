package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, SinglePartition}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types._

/** Whole-operator Catalyst integration for the skyline (Pareto front):
  * a custom LogicalPlan node, a planner Strategy, and a physical
  * SparkPlan — the full extension stack for semantics no built-in
  * operator composition expresses as a single plan node. The RDD-level
  * twin lives in [[graft.operators.Skyline]]; this form exists so the
  * skyline participates in Catalyst like any native operator: it shows
  * up in explain(), planning can reason about its SinglePartition
  * output, and downstream operators compose onto its physical output
  * without leaving the SQL engine.
  *
  * Semantics (identical to graft.operators.Skyline.skyline): dominated
  * rows are dropped; rows with a null or NaN in any skyline dimension
  * are dropped; ties (equal on every dimension) all survive.
  */
case class SkylineNode(dims: Seq[(Attribute, Boolean)], child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  // dims hide inside tuples, invisible to QueryPlan's expression
  // reflection — declare them, or column pruning strips the dominance
  // columns out from under the operator
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(dims.map(_._1))
  override protected def withNewChildInternal(c: LogicalPlan): SkylineNode =
    copy(child = c)
}

/** Planner strategy: SkylineNode → SkylineExec(planLater(child)). */
object SkylineStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case SkylineNode(dims, child) => SkylineExec(dims, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Physical two-phase skyline: phase 1 map-only per-partition fronts
  * (block-nested-loop over a candidate window — dominance transitivity
  * makes local elimination safe), phase 2 resolves the union of fronts
  * in one partition. Rows are copied into the window (upstream
  * operators reuse InternalRow buffers); no codegen (the operator is
  * window-stateful), so it forms a codegen boundary like any
  * aggregation.
  */
case class SkylineExec(dims: Seq[(Attribute, Boolean)], child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = SinglePartition

  override protected def doExecute(): RDD[InternalRow] = {
    val dimMeta: Array[(Int, Boolean, DataType)] = dims.map { case (a, asc) =>
      val i = child.output.indexWhere(_.exprId == a.exprId)
      require(i >= 0, s"skyline dimension $a not found in child output ${child.output}")
      (i, asc, child.output(i).dataType)
    }.toArray

    def localPass(it: Iterator[InternalRow]): Iterator[InternalRow] = {
      def dim(r: InternalRow, k: Int): Double = {
        val (i, _, dt) = dimMeta(k)
        dt match {
          case DoubleType => r.getDouble(i)
          case FloatType => r.getFloat(i).toDouble
          case IntegerType => r.getInt(i).toDouble
          case LongType => r.getLong(i).toDouble
          case ShortType => r.getShort(i).toDouble
          case other => throw new IllegalStateException(s"non-numeric skyline dim: $other")
        }
      }
      def dominates(b: InternalRow, a: InternalRow): Boolean = {
        var strict = false
        var k = 0
        while (k < dimMeta.length) {
          val asc = dimMeta(k)._2
          val (vb, va) = (dim(b, k), dim(a, k))
          val worse = if (asc) vb > va else vb < va
          if (worse) return false
          val better = if (asc) vb < va else vb > va
          if (better) strict = true
          k += 1
        }
        strict
      }
      val window = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      it.foreach { r =>
        // drop null AND NaN dimension rows (NaN compares false both ways
        // in Java, so it would survive every front) — kept in lockstep
        // with graft.operators.Skyline.skyline
        if (!dimMeta.indices.exists { k =>
          r.isNullAt(dimMeta(k)._1) || dim(r, k).isNaN
        }) {
          var dominated = false
          var k = 0
          while (k < window.length && !dominated) {
            if (dominates(window(k), r)) dominated = true
            k += 1
          }
          if (!dominated) {
            val keep = window.filterNot(w => dominates(r, w))
            window.clear()
            window ++= keep
            window += r.copy() // upstream reuses row buffers
          }
        }
      }
      window.iterator
    }

    val local = child.execute().mapPartitions(localPass)
    local.coalesce(1).mapPartitions(localPass)
  }

  override protected def withNewChildInternal(c: SparkPlan): SkylineExec =
    copy(child = c)
}
