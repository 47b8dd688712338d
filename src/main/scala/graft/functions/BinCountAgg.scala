package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Fixed-width bin counter over a known [lo, hi] range: state is ONE
  * long array of `bins` counters — constant per partition regardless of
  * row count or value cardinality, merged by vector addition. This is the
  * first pass of the exact-quantile refinement in
  * [[graft.operators.Histograms.exactQuantiles]]: it localizes any global
  * rank to one bin using a single map-side scan with no shuffle of values
  * (the plan is scan → partial → one merged row), which is what makes
  * EXACT percentiles affordable at corpus scale — Spark's built-in
  * `percentile` holds a value→count map whose size is O(distinct values).
  *
  * Bin index: `floor((v - lo) / w)` clamped to [0, bins-1], where
  * `w = (hi - lo) / bins`. The same double arithmetic MUST be used by any
  * follow-up pass that filters rows back to candidate bins (see
  * Histograms.binIndexCol), so a value is attributed to the same bin in
  * both passes bit-for-bit. Nulls and NaNs are skipped (a null has no
  * rank; the engine's quantile surfaces exclude them before aggregation).
  */
case class BinCountAgg(
    child: Expression,
    lo: Double,
    hi: Double,
    bins: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(bins >= 1, s"bins must be >= 1, got $bins")
  require(hi >= lo, s"hi ($hi) must be >= lo ($lo)")

  private val width = (hi - lo) / bins

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bin_counts expects a double column, got ${t.sql}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bins)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (!d.isNaN) buf(BinCountAgg.binIndex(d, lo, width, bins)) += 1L
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bins) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(off: Int): BinCountAgg = copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): BinCountAgg = copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
  override def prettyName: String = "bin_counts"
}

object BinCountAgg {
  /** Shared bin arithmetic — every pass (aggregate update, candidate-bin
    * filter, driver-side attribution) must agree bit-for-bit.
    */
  def binIndex(v: Double, lo: Double, width: Double, bins: Int): Int = {
    if (width == 0.0) return 0
    var i = math.floor((v - lo) / width).toInt
    if (i < 0) i = 0
    if (i >= bins) i = bins - 1
    i
  }

  /** agg column: bin_counts(value, lo, hi, bins) → array<long> of size bins. */
  def bin_counts(value: Column, lo: Double, hi: Double, bins: Int): Column =
    GraftSqlBridge.column(BinCountAgg(
      GraftSqlBridge.expression(value), lo, hi, bins).toAggregateExpression())
}
