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

/** t-digest quantile sketch (Dunning & Ertl, "Computing Extremely Accurate
  * Quantiles Using t-Digests") as a TypedImperativeAggregate.
  *
  * Why this exists next to the built-ins: `percentile` is exact but holds
  * EVERY value in the aggregation buffer — O(rows) memory per group, dead
  * at 100 TB; `percentile_approx` (Greenwald-Khanna) is bounded but its
  * error is uniform in rank, so tail quantiles (p99.9 — the ones
  * operations actually watch) carry the worst relative error. The t-digest
  * bounds centroid weight by a scale function that pinches at q→0 and q→1,
  * giving near-exact tails with a fixed ~O(δ) footprint, and its buffers
  * MERGE — partial sketches combine map-side and across partitions, so the
  * shuffle ships one ~kilobyte sketch per group per mapper instead of the
  * group's values.
  *
  * Accuracy is partition-order dependent (like any mergeable sketch —
  * results are approximate, not run-deterministic), so this is exposed as
  * a rows-only query, with the error bound pinned by spec instead of a
  * hash oracle.
  *
  * Buffer: unsorted point buffer + centroid list; compressed with the k1
  * scale-function weight limit `4·N·q·(1−q)/δ` whenever the point buffer
  * fills. Quantile evaluation linearly interpolates between centroid
  * means, treating each centroid as centered at its cumulative midpoint.
  */
case class TDigestAgg(
    child: Expression,
    probabilities: Seq[Double],
    compression: Int = 100,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestAgg.Digest] {

  require(compression >= 20, "compression must be >= 20")
  require(probabilities.nonEmpty && probabilities.forall(p => p >= 0.0 && p <= 1.0),
    "probabilities must be in [0, 1]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType | IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"tdigest expects a numeric column, got ${t.sql}")
  }

  override def createAggregationBuffer(): TDigestAgg.Digest =
    new TDigestAgg.Digest(compression)

  override def update(buf: TDigestAgg.Digest, input: InternalRow): TDigestAgg.Digest = {
    val v = child.eval(input)
    if (v != null) {
      val d = child.dataType match {
        case DoubleType => v.asInstanceOf[Double]
        case FloatType => v.asInstanceOf[Float].toDouble
        case IntegerType => v.asInstanceOf[Int].toDouble
        case LongType => v.asInstanceOf[Long].toDouble
        case _ => throw new IllegalStateException("unreachable")
      }
      if (!d.isNaN) buf.add(d, 1L)
    }
    buf
  }

  override def merge(buf: TDigestAgg.Digest, other: TDigestAgg.Digest): TDigestAgg.Digest = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TDigestAgg.Digest): Any =
    new GenericArrayData(probabilities.map(buf.quantile).toArray.asInstanceOf[Array[Double]])

  override def serialize(buf: TDigestAgg.Digest): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): TDigestAgg.Digest =
    TDigestAgg.Digest.fromBytes(bytes, compression)

  override def withNewMutableAggBufferOffset(off: Int): TDigestAgg = copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): TDigestAgg = copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
  override def prettyName: String = "tdigest_quantiles"
}

object TDigestAgg {

  /** Mergeable t-digest: centroid arrays (mean, weight) sorted by mean,
    * plus an unmerged point buffer compressed in batches.
    */
  final class Digest(compression: Int) {
    private val bufCap = compression * 4
    // merged centroids, sorted by mean
    private var means = new Array[Double](0)
    private var weights = new Array[Long](0)
    private var total = 0L
    // unmerged batch
    private val bufMeans = new Array[Double](bufCap)
    private val bufWeights = new Array[Long](bufCap)
    private var bufN = 0

    def add(mean: Double, weight: Long): Unit = {
      bufMeans(bufN) = mean
      bufWeights(bufN) = weight
      bufN += 1
      if (bufN == bufCap) compress()
    }

    def mergeFrom(other: Digest): Unit = {
      other.compress()
      var i = 0
      while (i < other.means.length) {
        add(other.means(i), other.weights(i))
        i += 1
      }
    }

    /** Merge buffer + centroids into a new centroid list bounded by the
      * k1 scale function: a centroid may absorb while its weight stays
      * within 4·N·q·(1−q)/δ at its cumulative midpoint.
      */
    private def compress(): Unit = {
      if (bufN == 0) return
      val n = means.length + bufN
      val ms = new Array[Double](n)
      val ws = new Array[Long](n)
      System.arraycopy(means, 0, ms, 0, means.length)
      System.arraycopy(weights, 0, ws, 0, means.length)
      var i = 0
      while (i < bufN) {
        ms(means.length + i) = bufMeans(i)
        ws(means.length + i) = bufWeights(i)
        i += 1
      }
      bufN = 0
      // sort (mean, weight) pairs by mean — indices sorted indirectly
      val idx = Array.range(0, n).sortBy(ms(_))
      val newTotal = ws.sum
      val outM = new Array[Double](n)
      val outW = new Array[Long](n)
      var k = -1
      var cum = 0L // weight fully before the current output centroid
      i = 0
      while (i < n) {
        val m = ms(idx(i)); val w = ws(idx(i))
        if (k < 0) { k = 0; outM(0) = m; outW(0) = w }
        else {
          val candW = outW(k) + w
          val q = (cum + candW / 2.0) / newTotal
          val limit = 4.0 * newTotal * q * (1.0 - q) / compression
          if (candW <= limit) {
            // weighted-mean absorb
            outM(k) = outM(k) + (m - outM(k)) * w / candW
            outW(k) = candW
          } else {
            cum += outW(k)
            k += 1; outM(k) = m; outW(k) = w
          }
        }
        i += 1
      }
      means = java.util.Arrays.copyOf(outM, k + 1)
      weights = java.util.Arrays.copyOf(outW, k + 1)
      total = newTotal
    }

    /** Interpolated quantile: centroid c covers cumulative ranks centered
      * at cum + w/2; linear between adjacent centers, clamped to the
      * extreme means at the ends.
      */
    def quantile(p: Double): Double = {
      compress()
      if (total == 0) return Double.NaN
      val target = p * total
      var cum = 0.0
      var i = 0
      var prevCenter = 0.0
      var prevMean = means.headOption.getOrElse(Double.NaN)
      while (i < means.length) {
        val center = cum + weights(i) / 2.0
        if (target <= center) {
          if (i == 0 || center == prevCenter) return means(i)
          val f = (target - prevCenter) / (center - prevCenter)
          return prevMean + f * (means(i) - prevMean)
        }
        prevCenter = center
        prevMean = means(i)
        cum += weights(i)
        i += 1
      }
      means.last
    }

    def centroidCount: Int = { compress(); means.length }
    def totalWeight: Long = { compress(); total }

    def toBytes: Array[Byte] = {
      compress()
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(means.length)
      var i = 0
      while (i < means.length) {
        out.writeDouble(means(i)); out.writeLong(weights(i)); i += 1
      }
      out.flush()
      bos.toByteArray
    }
  }

  object Digest {
    def fromBytes(bytes: Array[Byte], compression: Int): Digest = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val n = in.readInt()
      val d = new Digest(compression)
      var i = 0
      while (i < n) { d.add(in.readDouble(), in.readLong()); i += 1 }
      d
    }
  }
}

object TDigestFunctions {
  /** agg column: tdigest_quantiles(value, probabilities, δ) → array<double>. */
  def tdigest_quantiles(value: Column, probabilities: Seq[Double],
      compression: Int = 100): Column =
    GraftSqlBridge.column(TDigestAgg(
      GraftSqlBridge.expression(value), probabilities, compression)
      .toAggregateExpression())
}
