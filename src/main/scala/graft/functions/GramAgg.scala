package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fixed-point Gram (uncentered covariance) matrix aggregate: one pass
  * over an embedding column accumulating Σ q·qᵀ where q = ⌊scale·x⌋ —
  * the input PCA/whitening/linear-probe fits need, computed WITHOUT the
  * d²-row explosion a relational formulation pays (explode × explode
  * multiplies a 100 TB scan by d² before the shuffle; this buffer ships
  * d(d+1)/2 longs per partition, once).
  *
  * Fixed point (floor, not round — round half-breaking differs between
  * the JVM and C libms; floor is identical everywhere) keeps the sums
  * exact integers: merge order, partitioning, and engine cannot change
  * a single cell, which is what lets a DuckDB oracle replay the matrix
  * bit-for-bit. Overflow headroom: |q| ≤ scale·max|x|, so a cell grows
  * by ≤ (scale·max|x|)² per row — at scale 10⁴ and |x| ≤ 1 that is
  * 10⁸/row, safe to ~9×10¹⁰ rows per partition-tree in int64.
  *
  * The buffer stores the upper triangle (the matrix is symmetric);
  * eval mirrors it to the full row-major d² array.
  *
  * Null discipline: a null VECTOR is skipped (standard aggregate
  * semantics); a null ELEMENT inside a vector fails fast — reading it
  * as a primitive would silently fold an undefined value into a matrix
  * whose whole contract is bit-exactness.
  */
case class GramAgg(
    child: Expression,
    dim: Int,
    scale: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(dim >= 1 && dim <= 4096, "dim must be in [1, 4096]")
  require(scale >= 1, "scale must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram expects array<float|double>, got ${t.sql}")
  }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](dim * (dim + 1) / 2)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"gram: expected $dim-dim vector, got ${arr.numElements()}")
      val q = new Array[Long](dim)
      var i = 0
      while (i < dim) {
        // a null element would read as an undefined primitive and fold
        // silently into the "exact" matrix — fail fast instead
        require(!arr.isNullAt(i),
          s"gram: null element at index $i — the fixed-point Gram contract " +
            "is exactness; repair or filter null-element vectors upstream")
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        q(i) = math.floor(x * scale).toLong
        i += 1
      }
      var k = 0
      i = 0
      while (i < dim) {
        var j = i
        while (j < dim) {
          buf(k) += q(i) * q(j)
          k += 1
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var k = 0
    while (k < buf.length) { buf(k) += other(k); k += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val full = new Array[Long](dim * dim)
    var k = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        full(i * dim + j) = buf(k)
        full(j * dim + i) = buf(k)
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(full)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(out.putLong)
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(dim * (dim + 1) / 2)(in.getLong)
  }

  override def withNewMutableAggBufferOffset(off: Int): GramAgg = copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): GramAgg = copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
  override def prettyName: String = "gram_matrix"
}
