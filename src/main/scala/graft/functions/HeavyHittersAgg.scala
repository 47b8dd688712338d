package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy hitters ("frequent" algorithm) as a
  * TypedImperativeAggregate: the at-most-`k` items whose frequency can
  * exceed N/(k+1), each with a LOWER-BOUND count estimate.
  *
  * Why not `groupBy(item).count().orderBy(...).limit(k)`: that shuffles
  * one row per DISTINCT item — for a 100 TB corpus of URLs or shingles the
  * distinct set is itself petascale, and the query only wants the few
  * dominant items. This buffer holds ≤ k counters, partials merge
  * map-side, and the shuffle ships one ~kilobyte summary per mapper.
  *
  * Guarantees (classic MG + Agarwal et al. merge): for every item,
  * `true_count − N/(k+1) ≤ estimate ≤ true_count`; any item with
  * true_count > N/(k+1) is PRESENT in the output. When the column has at
  * most `k` distinct values the summary is EXACT (no decrements ever
  * fire), which also makes it deterministic and oracle-checkable in that
  * regime.
  *
  * Merge: add counters pairwise, then if more than `k` survive, subtract
  * the (k+1)-th largest count from all and drop the non-positive — the
  * standard error-composing MG merge.
  *
  * Output: array<struct<item string, cnt long>> ordered count DESC then
  * item ASC. Null items are skipped.
  */
case class HeavyHittersAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHittersAgg.Summary] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(HeavyHittersAgg.entryType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters expects a string column, got ${t.sql}")
  }

  override def createAggregationBuffer(): HeavyHittersAgg.Summary =
    new HeavyHittersAgg.Summary(k)

  override def update(buf: HeavyHittersAgg.Summary, input: InternalRow): HeavyHittersAgg.Summary = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: HeavyHittersAgg.Summary,
      other: HeavyHittersAgg.Summary): HeavyHittersAgg.Summary = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: HeavyHittersAgg.Summary): Any =
    new GenericArrayData(buf.sorted.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    }.asInstanceOf[Array[Any]])

  override def serialize(buf: HeavyHittersAgg.Summary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val entries = buf.sorted
    out.writeInt(entries.length)
    entries.foreach { case (s, c) => out.writeUTF(s); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): HeavyHittersAgg.Summary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val s = new HeavyHittersAgg.Summary(k)
    var i = 0
    while (i < n) { s.add(in.readUTF(), in.readLong()); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(off: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
  override def prettyName: String = "heavy_hitters"
}

object HeavyHittersAgg {

  val entryType: StructType = StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false)))

  /** ≤ k counters with the Misra-Gries decrement discipline. */
  final class Summary(k: Int) {
    private val counts = new java.util.HashMap[String, Long](k * 2)

    def add(item: String, weight: Long): Unit = {
      val cur = counts.get(item)
      if (cur != 0L || counts.containsKey(item)) counts.put(item, cur + weight)
      else if (counts.size < k) counts.put(item, weight)
      else decrementAll(weight)
    }

    /** The MG decrement step, batched: subtract `by` from every counter
      * (the incoming item's weight cancels against them); counters at or
      * below zero drop. If the decrement doesn't fully consume the
      * incoming weight (all existing counters were smaller), the incoming
      * item claims a freed slot with the remainder.
      */
    private def decrementAll(by: Long): Unit = {
      // the incoming weight cancels against the SMALLEST it can: classic
      // MG decrements all counters by min(by, min counter) repeatedly;
      // one pass with the true min is equivalent for a single item
      var remaining = by
      while (remaining > 0 && counts.size == k) {
        var minC = Long.MaxValue
        val it0 = counts.values().iterator()
        while (it0.hasNext) { val c = it0.next(); if (c < minC) minC = c }
        val step = math.min(remaining, minC)
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val nc = e.getValue - step
          if (nc <= 0L) it.remove() else e.setValue(nc)
        }
        remaining -= step
      }
      // remaining weight (if slots freed) is dropped — estimates stay
      // lower bounds either way, and a single stream item's weight is 1,
      // so in the streaming path remaining is always consumed exactly
    }

    def mergeFrom(other: Summary): Unit = {
      val it = other.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = counts.get(e.getKey)
        counts.put(e.getKey, cur + e.getValue)
      }
      if (counts.size > k) {
        // subtract the (k+1)-th largest count from all; drop non-positive
        val vals = counts.values().toArray(new Array[java.lang.Long](0))
          .map(_.longValue()).sorted(Ordering[Long].reverse)
        val sub = vals(k)
        val it2 = counts.entrySet().iterator()
        while (it2.hasNext) {
          val e = it2.next()
          val nc = e.getValue - sub
          if (nc <= 0L) it2.remove() else e.setValue(nc)
        }
      }
    }

    /** Entries ordered (count DESC, item ASC). */
    def sorted: Array[(String, Long)] = {
      val arr = new Array[(String, Long)](counts.size)
      val it = counts.entrySet().iterator()
      var i = 0
      while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey, e.getValue); i += 1 }
      arr.sortBy { case (item, c) => (-c, item) }
    }
  }
}

object HeavyHittersFunctions {
  /** agg column: heavy_hitters(item, k) → array<struct<item,cnt>>. */
  def heavy_hitters(item: Column, k: Int): Column =
    GraftSqlBridge.column(HeavyHittersAgg(
      GraftSqlBridge.expression(item), k).toAggregateExpression())
}
