package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Bucket index of a numeric value against a sorted boundary array:
  * the count of boundaries strictly below the value, found by binary
  * search — O(log B) comparisons per row where the
  * `aggregate(boundsLit, …)` higher-order-function formulation costs B
  * interpreted lambda frames per row (measured 8× slower end-to-end on
  * the Z-order write at B=255). The boundary array rides inside the
  * expression, shipped once per task via closure serialization.
  *
  * Null input → null (callers pick their own null bucket via coalesce).
  * NaN sorts above every boundary (`java.lang.Double.compare` order),
  * landing in the top bucket — deterministic, matching Spark's sort
  * order for doubles.
  */
case class QuantileBucket(child: Expression, bounds: Array[Double])
    extends UnaryExpression with CodegenFallback {

  require(bounds.nonEmpty, "need at least one boundary")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quantile_bucket expects a numeric value, got ${t.sql}")
  }

  @transient private lazy val toDouble: Any => Double = child.dataType match {
    case DoubleType => x => x.asInstanceOf[Double]
    case FloatType => x => x.asInstanceOf[Float].toDouble
    case LongType => x => x.asInstanceOf[Long].toDouble
    case IntegerType => x => x.asInstanceOf[Int].toDouble
    case ShortType => x => x.asInstanceOf[Short].toDouble
    case ByteType => x => x.asInstanceOf[Byte].toDouble
    case _: DecimalType => x => x.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
    case t => throw new IllegalStateException(s"unreachable: $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = toDouble(input)
    // upper bound: first index whose boundary is >= v (NaN > everything)
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (java.lang.Double.compare(bounds(mid), v) < 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "quantile_bucket"
}

object QuantileBucket {
  def bucket(v: Column, bounds: Array[Double]): Column =
    GraftSqlBridge.column(QuantileBucket(GraftSqlBridge.expression(v), bounds))
}
