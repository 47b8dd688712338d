package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Index of the centroid with the SMALLEST squared-L2 distance to the
  * input vector, ties → smallest index — the Euclidean twin of
  * [[CentroidArgmax]] (which is cosine). Exists for product
  * quantization: PQ codebooks minimize per-subspace L2, not cosine
  * (subvector norms differ block to block, so a cosine argmax picks
  * wrong codes). Same design rationale as CentroidArgmax: a loop over
  * a matrix is O(1) plan nodes at any k, where expression composition
  * is linear and dies at real codebook sizes. PQ codebooks are tiny
  * (k×subDim, e.g. 16×8), so the matrix always rides in-plan.
  *
  * Semantics: elements widened to double; null elements read as 0.0; a
  * centroid of mismatched dimension is never chosen; null input → null.
  */
case class CentroidArgminL2(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  require(centroids.nonEmpty, "need at least one centroid")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"centroid_argmin_l2 expects a numeric array, got ${child.dataType.sql}")

  @transient private lazy val elemType: DataType = child.dataType match {
    case ArrayType(t, _) => t
    case _ => throw new IllegalStateException("unreachable")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val vec = new Array[Double](n)
    var i = 0
    while (i < n) {
      vec(i) = if (v.isNullAt(i)) 0.0 else elemType match {
        case FloatType => v.getFloat(i).toDouble
        case DoubleType => v.getDouble(i)
        case IntegerType => v.getInt(i).toDouble
        case LongType => v.getLong(i).toDouble
        case _ => throw new IllegalStateException("unreachable")
      }
      i += 1
    }
    var best = 0
    var bestDist = Double.PositiveInfinity
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      if (cent.length == n) {
        var d = 0.0
        var j = 0
        while (j < n) { val t = vec(j) - cent(j); d += t * t; j += 1 }
        if (d < bestDist) { bestDist = d; best = c }
      }
      c += 1
    }
    best
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "centroid_argmin_l2"
}

object CentroidArgminL2 {
  def argmin(vec: Column, centroids: Array[Array[Double]]): Column =
    GraftSqlBridge.column(CentroidArgminL2(GraftSqlBridge.expression(vec), centroids))
}
