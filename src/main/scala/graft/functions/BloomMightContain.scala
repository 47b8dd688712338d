package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Membership probe against a serialized Bloom filter riding inside the
  * expression — the probe side of a "tiny-relative-to-corpus but too big
  * to broadcast as an exact set" semi-join. The filter bytes ship once
  * per task via closure serialization and deserialize lazily per
  * executor; probing is then a per-row bit test, map-only, no join.
  *
  * False positives only (rate set at build time), never false
  * negatives — callers get a conservative superset, the right direction
  * for decontamination-style filters.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects a bigint, got ${t.sql}")
  }

  @transient private lazy val bloom =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(filterBytes))

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContain {
  def mightContain(v: Column, filter: org.apache.spark.util.sketch.BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    filter.writeTo(bos)
    GraftSqlBridge.column(BloomMightContain(GraftSqlBridge.expression(v), bos.toByteArray))
  }
}
