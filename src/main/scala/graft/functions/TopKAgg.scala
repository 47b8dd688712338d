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

/** Top-k (score, id) pairs per group as a TypedImperativeAggregate.
  *
  * The window formulation (`row_number().over(partitionBy(key).orderBy
  * (score))` then `rank <= k`) shuffles EVERY input row and sorts whole
  * partitions before discarding all but k. This aggregate keeps a bounded
  * min-heap per group; partial aggregation runs map-side, so each mapper
  * ships at most k rows per key across the shuffle — for a 100 TB corpus
  * scored against a query set, the exchange shrinks from O(corpus) to
  * O(queries × k × mappers).
  *
  * Ordering: score DESC, then id ASC (deterministic tiebreak) — identical
  * to the window form, so results are oracle-compatible. Null scores/ids
  * are skipped. Output: array<struct<score double, id long>> sorted best
  * first.
  */
case class TopKAgg(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Heap] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(TopKAgg.entryType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"top_k expects (double, bigint), got (${s.sql}, ${i.sql})")
    }

  override def createAggregationBuffer(): TopKAgg.Heap = new TopKAgg.Heap(k)

  override def update(buf: TopKAgg.Heap, input: InternalRow): TopKAgg.Heap = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKAgg.Heap, other: TopKAgg.Heap): TopKAgg.Heap = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKAgg.Heap): Any = {
    val sorted = buf.sortedBestFirst
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopKAgg.Heap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val entries = buf.entries
    out.writeInt(entries.length)
    entries.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Heap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val h = new TopKAgg.Heap(k)
    var j = 0
    while (j < n) { h.offer(in.readDouble(), in.readLong()); j += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(off: Int): TopKAgg = copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): TopKAgg = copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = c(0), idExpr = c(1))
  override def prettyName: String = "top_k"
}

object TopKAgg {

  val entryType: StructType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))

  /** Bounded "keep the k best" heap: min-heap ordered worst-first under
    * (score DESC, id ASC), so the root is the first entry to evict.
    */
  final class Heap(k: Int) {
    // worse = smaller score, or equal score with larger id. Scores are
    // compared with Double.compare, which totally orders NaN greater than
    // every other double — identical to Spark's window sort order, so the
    // heap stays equivalent to the row_number formulation even on NaN.
    private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
      val c = java.lang.Double.compare(s1, s2)
      c < 0 || (c == 0 && i1 > i2)
    }

    private val pq = new java.util.PriorityQueue[(Double, Long)](k,
      (a: (Double, Long), b: (Double, Long)) =>
        if (worse(a._1, a._2, b._1, b._2)) -1
        else if (worse(b._1, b._2, a._1, a._2)) 1 else 0)

    def offer(score: Double, id: Long): Unit =
      if (pq.size < k) pq.add((score, id))
      else {
        val root = pq.peek()
        if (worse(root._1, root._2, score, id)) { pq.poll(); pq.add((score, id)) }
      }

    def mergeFrom(other: Heap): Unit = {
      val it = other.pq.iterator()
      while (it.hasNext) { val e = it.next(); offer(e._1, e._2) }
    }

    def entries: Array[(Double, Long)] = pq.toArray(Array.empty[(Double, Long)])

    def sortedBestFirst: Array[(Double, Long)] =
      entries.sortWith((a, b) => worse(b._1, b._2, a._1, a._2))
  }
}

object TopKFunctions {
  /** agg column: top_k(score, id, k) → array<struct<score,id>> best-first. */
  def top_k(score: Column, id: Column, k: Int): Column =
    GraftSqlBridge.column(TopKAgg(
      GraftSqlBridge.expression(score), GraftSqlBridge.expression(id), k)
      .toAggregateExpression())
}
