package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV / bottom-k theta sketch (Bar-Yossef et al.; the Apache DataSketches
  * theta-sketch family): the `k` smallest distinct xxhash64 values of a
  * column. What HLL cannot do and this can: SET EXPRESSIONS — because two
  * sketches over the same hash family are comparable sample sets, union /
  * intersection / difference cardinalities of 100 TB key sets come from
  * comparing two k-long arrays, no join, no shuffle of the raw keys.
  *
  * Distinct estimate: a full sketch's k-th smallest normalized hash θ
  * estimates k/|S| (order statistics of uniform hashes), so
  * |S| ≈ (k−1)/θ (the unbiased form); a sketch below capacity holds every
  * distinct hash and is EXACT. Intersection: θ = min(θ_a, θ_b); hashes
  * below θ in both sketches are a uniform sample of A∩B at rate θ, so
  * |A∩B| ≈ |common < θ| / θ — the standard theta-sketch estimator, with
  * relative error O(1/√k).
  *
  * Unlike order-sensitive sketches (t-digest), a KMV over a fixed VALUE
  * SET is deterministic under any partitioning, merge order, or
  * duplication — the k smallest distinct hashes are a property of the
  * set. Results are reproducible run-over-run (spec-pinned), just not
  * SQL-expressible in DuckDB (different hash family) → rows-only.
  *
  * Buffer: a size-capped TreeSet (dedup + max eviction in O(log k));
  * merge feeds one sketch through the other's cap. The shuffle ships ≤
  * 8k bytes per group per mapper instead of the group's raw keys.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSketchAgg.Kmv] {

  require(k >= 16, "sketch size k must be >= 16")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch expects a long/int/string column, got ${t.sql}")
  }

  override def createAggregationBuffer(): KmvSketchAgg.Kmv = new KmvSketchAgg.Kmv(k)

  override def update(buf: KmvSketchAgg.Kmv, input: InternalRow): KmvSketchAgg.Kmv = {
    val v = child.eval(input)
    if (v != null) {
      val h = child.dataType match {
        case LongType => XXH64.hashLong(v.asInstanceOf[Long], KmvSketchAgg.Seed)
        case IntegerType => XXH64.hashLong(v.asInstanceOf[Int].toLong, KmvSketchAgg.Seed)
        case StringType => XXH64.hashUTF8String(v.asInstanceOf[UTF8String], KmvSketchAgg.Seed)
        case _ => throw new IllegalStateException("unreachable")
      }
      buf.add(h)
    }
    buf
  }

  override def merge(buf: KmvSketchAgg.Kmv, other: KmvSketchAgg.Kmv): KmvSketchAgg.Kmv = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: KmvSketchAgg.Kmv): Any =
    new GenericArrayData(buf.sorted) // Array[Long] overload — primitive, no boxing

  override def serialize(buf: KmvSketchAgg.Kmv): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): KmvSketchAgg.Kmv =
    KmvSketchAgg.Kmv.fromBytes(bytes, k)

  override def withNewMutableAggBufferOffset(off: Int): KmvSketchAgg = copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): KmvSketchAgg = copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
  override def prettyName: String = "kmv_sketch"
}

object KmvSketchAgg {

  val Seed = 9001L

  /** Bounded bottom-k set of hashes. */
  final class Kmv(k: Int) {
    private val set = new java.util.TreeSet[java.lang.Long]()

    def add(h: Long): Unit = {
      if (set.size < k) { set.add(h); () }
      else if (h < set.last()) {
        if (set.add(h)) { set.remove(set.last()); () }
      }
    }

    def mergeFrom(other: Kmv): Unit = {
      val it = other.set.iterator()
      while (it.hasNext) add(it.next())
    }

    def sorted: Array[Long] = {
      val out = new Array[Long](set.size)
      val it = set.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }

    def toBytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      val arr = sorted
      out.writeInt(arr.length)
      arr.foreach(out.writeLong)
      out.flush()
      bos.toByteArray
    }
  }

  object Kmv {
    def fromBytes(bytes: Array[Byte], k: Int): Kmv = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val n = in.readInt()
      val s = new Kmv(k)
      var i = 0
      while (i < n) { s.add(in.readLong()); i += 1 }
      s
    }
  }
}

/** Column-level sketch builders and estimators. The estimators are plain
  * built-in array/scalar expressions over the sketch arrays — once the
  * sketches exist (one aggregation pass over each source), every set
  * estimate is driver-cheap arithmetic on ≤ k longs.
  */
object KmvFunctions {

  def kmv_sketch(value: Column, k: Int): Column =
    GraftSqlBridge.column(KmvSketchAgg(GraftSqlBridge.expression(value), k)
      .toAggregateExpression())

  /** Signed 64-bit hash → uniform (0, 1]: (h + 2⁶³ + 1) / 2⁶⁴, monotone in
    * unsigned order. Doubles lose bits below 2⁻⁵³ — irrelevant at the
    * estimator's O(1/√k) error.
    */
  private def unit(h: Column): Column =
    (h.cast("double") / lit(2.0 * Long.MaxValue)) + lit(0.5)

  /** θ of a sketch: the normalized k-th (largest retained) hash when the
    * sketch is full, else 1.0 (every distinct value retained).
    */
  def kmv_theta(sketch: Column, k: Int): Column =
    when(size(sketch) < k, lit(1.0)).otherwise(unit(element_at(sketch, -1)))

  /** Estimated distinct count: exact below capacity, (k−1)/θ when full. */
  def kmv_distinct(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit(k - 1).cast("double") / unit(element_at(sketch, -1)))

  /** Estimated |A ∩ B|: common hashes below the joint θ, scaled by 1/θ. */
  def kmv_intersect(a: Column, b: Column, k: Int): Column = {
    val theta = least(kmv_theta(a, k), kmv_theta(b, k))
    val common = filter(array_intersect(a, b), h => unit(h) < theta)
    size(common).cast("double") / theta
  }

  /** Estimated |A ∪ B|: the k smallest hashes of the concatenation form
    * the union's sketch; estimate as usual.
    */
  def kmv_union_distinct(a: Column, b: Column, k: Int): Column =
    kmv_distinct(slice(array_sort(array_union(a, b)), 1, k), k)
}
