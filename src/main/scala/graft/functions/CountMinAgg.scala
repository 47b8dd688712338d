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

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a
  * TypedImperativeAggregate, evaluated at a fixed list of query items.
  *
  * The OVERESTIMATE-only companion to the Misra-Gries lower bounds of
  * [[HeavyHittersAgg]]: `true_count ≤ estimate ≤ true_count + εN` with
  * ε = e/width at confidence 1 − (1/2)^depth. Where MG answers "which
  * items dominate", CMS answers "how often does THIS item occur" for
  * items known up front — the shape of blocklist-frequency or
  * probe-term monitoring over a 100 TB scan.
  *
  * Scale design: the buffer is a fixed `depth × width` long matrix
  * (+ total), so the shuffle ships one ~2 KB summary per mapper no
  * matter how many DISTINCT items the column holds — the exact
  * `groupBy(item).count()` alternative shuffles one row per distinct
  * item, petascale for URLs or shingles. Merge is elementwise addition:
  * exactly associative and commutative, so the sketch — and therefore
  * every estimate — is BIT-IDENTICAL under any partitioning (asserted
  * by CountMinSpec), unlike sampled or decrement-based summaries.
  *
  * Determinism / oracle regime: cells are addressed by double hashing
  * (Kirsch–Mitzenmacher) over two fixed-seed MurmurHash3 runs of the
  * UTF-8 bytes — a pure function of the item STRING. When the column's
  * distinct items happen to be pairwise collision-free in at least one
  * row each (a property of the strings alone, checkable up front and
  * independent of data volume — `a16_cms_counts` asserts it for the
  * five event types at ANY sf), the estimates are EXACT and the DuckDB
  * `count(*)` oracle applies verbatim.
  *
  * Output: array<struct<item string, est_cnt long>> in query-item order.
  * Null items are skipped (not counted in N, matching count(col)).
  */
case class CountMinAgg(
    child: Expression,
    width: Int,
    depth: Int,
    queryItems: Seq[String],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinAgg.Sketch] {

  require(width > 0 && depth > 0, "width and depth must be positive")
  require(queryItems.nonEmpty, "queryItems must be non-empty")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(CountMinAgg.entryType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"count_min expects a string column, got ${t.sql}")
  }

  override def createAggregationBuffer(): CountMinAgg.Sketch =
    new CountMinAgg.Sketch(width, depth)

  override def update(buf: CountMinAgg.Sketch, input: InternalRow): CountMinAgg.Sketch = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].getBytes, 1L)
    buf
  }

  override def merge(buf: CountMinAgg.Sketch, other: CountMinAgg.Sketch): CountMinAgg.Sketch = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: CountMinAgg.Sketch): Any =
    new GenericArrayData(queryItems.map { item =>
      InternalRow(UTF8String.fromString(item),
        buf.estimate(item.getBytes("UTF-8")))
    }.toArray[Any])

  override def serialize(buf: CountMinAgg.Sketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.total)
    buf.cells.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CountMinAgg.Sketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new CountMinAgg.Sketch(width, depth)
    s.total = in.readLong()
    var i = 0
    while (i < s.cells.length) { s.cells(i) = in.readLong(); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(off: Int): CountMinAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): CountMinAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
  override def prettyName: String = "count_min"
}

object CountMinAgg {

  val entryType: StructType = StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est_cnt", LongType, nullable = false)))

  private val Seed1 = 0x9747b28c
  private val Seed2 = 0x5bd1e995

  /** Row-i cell index for an item: double hashing over two fixed-seed
    * murmur runs — pure function of the bytes, stable across JVMs.
    */
  def cellIndex(bytes: Array[Byte], row: Int, width: Int): Int =
    rowIndex(scala.util.hashing.MurmurHash3.bytesHash(bytes, Seed1).toLong,
      scala.util.hashing.MurmurHash3.bytesHash(bytes, Seed2).toLong, row, width)

  /** Kirsch–Mitzenmacher row derivation: h1 + row·h2 mod width. Split
    * from [[cellIndex]] so the per-row hot paths hash each record ONCE
    * per seed and derive all `depth` rows from (h1, h2) — not 2·depth
    * murmur runs per record, which doubled the hashing cost of every
    * update at 100 TB for no change in the sketch contents.
    */
  @inline def rowIndex(h1: Long, h2: Long, row: Int, width: Int): Int =
    java.lang.Math.floorMod(h1 + row.toLong * h2, width.toLong).toInt

  /** depth × width counter matrix; merge = elementwise add. */
  final class Sketch(width: Int, depth: Int) {
    val cells: Array[Long] = new Array[Long](width * depth)
    var total: Long = 0L

    def add(bytes: Array[Byte], weight: Long): Unit = {
      val h1 = scala.util.hashing.MurmurHash3.bytesHash(bytes, Seed1).toLong
      val h2 = scala.util.hashing.MurmurHash3.bytesHash(bytes, Seed2).toLong
      var r = 0
      while (r < depth) {
        cells(r * width + rowIndex(h1, h2, r, width)) += weight
        r += 1
      }
      total += weight
    }

    def estimate(bytes: Array[Byte]): Long = {
      val h1 = scala.util.hashing.MurmurHash3.bytesHash(bytes, Seed1).toLong
      val h2 = scala.util.hashing.MurmurHash3.bytesHash(bytes, Seed2).toLong
      var best = Long.MaxValue
      var r = 0
      while (r < depth) {
        val c = cells(r * width + rowIndex(h1, h2, r, width))
        if (c < best) best = c
        r += 1
      }
      best
    }

    def mergeFrom(other: Sketch): Unit = {
      require(other.cells.length == cells.length, "sketch shape mismatch")
      var i = 0
      while (i < cells.length) { cells(i) += other.cells(i); i += 1 }
      total += other.total
    }
  }
}

object CountMinFunctions {
  /** agg column: count_min(item, width, depth, queryItems) →
    * array<struct<item, est_cnt>> in query-item order.
    */
  def count_min(item: Column, width: Int, depth: Int, queryItems: Seq[String]): Column =
    GraftSqlBridge.column(CountMinAgg(
      GraftSqlBridge.expression(item), width, depth, queryItems).toAggregateExpression())

  /** True iff, for EVERY given item, some sketch row maps it to a cell
    * shared with NO other item — then, provided `items` covers the
    * column's whole distinct set, every estimate is EXACT regardless of
    * data volume (the min picks that clean row). A property of the
    * strings alone; callers pinning a count(*) oracle to CMS output
    * assert this first (a16_cms_counts does, via CountMinSpec).
    */
  def exactRegime(width: Int, depth: Int, items: Seq[String]): Boolean = {
    val bs = items.map(_.getBytes("UTF-8"))
    bs.indices.forall { i =>
      (0 until depth).exists { r =>
        val ci = CountMinAgg.cellIndex(bs(i), r, width)
        bs.indices.forall(j => j == i ||
          CountMinAgg.cellIndex(bs(j), r, width) != ci)
      }
    }
  }
}
