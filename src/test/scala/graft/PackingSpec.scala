package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

/** Sequence-packing semantics: exact agreement with a driver-side
  * reference fold, invariance to the group count and input partitioning,
  * and over-budget documents spanning multiple packs.
  */
class PackingSpec extends SparkSpec {

  import spark.implicits._

  private def reference(tokens: Seq[(Long, Long)], budget: Long): Map[Long, Long] = {
    var off = 0L
    tokens.sortBy(_._1).map { case (id, n) =>
      val pack = off / budget
      off += n
      id -> pack
    }.toMap
  }

  test("packByOffset matches the sequential reference fold") {
    val rnd = new scala.util.Random(13)
    val docs = (0L until 500L).map(i => (i, 1L + rnd.nextInt(300).toLong))
    val got = Packing.packByOffset(docs.toDF("doc_id", "n"), "n", "doc_id", budget = 1000)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    assert(got == reference(docs, 1000))
  }

  test("pack assignment is invariant to group count and input partitioning") {
    val rnd = new scala.util.Random(17)
    val docs = (0L until 400L).map(i => (i, 1L + rnd.nextInt(100).toLong))
    val base = docs.toDF("doc_id", "n")
    val one = Packing.packByOffset(base, "n", "doc_id", 500, numPartitions = 1)
      .select("doc_id", "pack_id", "start_offset").as[(Long, Long, Long)].collect().toSet
    for (p <- Seq(3, 8, 64)) {
      val multi = Packing.packByOffset(base.repartition(11), "n", "doc_id", 500, numPartitions = p)
        .select("doc_id", "pack_id", "start_offset").as[(Long, Long, Long)].collect().toSet
      assert(multi == one, s"numPartitions=$p diverged")
    }
  }

  test("a document larger than the budget spans packs; empty input is fine") {
    val docs = Seq((1L, 100L), (2L, 5000L), (3L, 100L)).toDF("doc_id", "n")
    val got = Packing.packByOffset(docs, "n", "doc_id", 1000)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    // doc 2 starts at 100 (pack 0); doc 3 starts at 5100 (pack 5)
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 5L))
    val empty = Packing.packByOffset(
      Seq.empty[(Long, Long)].toDF("doc_id", "n"), "n", "doc_id", 1000)
    assert(empty.count() == 0)
  }

  test("inferenceBatches: dense batches per bucket, only the last short, layout-invariant") {
    val docs = (0L until 100L).map(i => (i, 10L + (i % 7) * 40L)).toDF("doc_id", "len")
    val out = Packing.inferenceBatches(docs, "doc_id", "len",
        bucketWidth = 100, batchSize = 8)
      .select("doc_id", "len_bucket", "batch_id", "pos_in_batch")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.size == 100)
    out.groupBy(r => (r._2, r._3)).foreach { case ((_, _), rows) =>
      assert(rows.size <= 8)
      assert(rows.map(_._4).sorted == (0L until rows.size.toLong)) // dense positions
    }
    // within a bucket, every batch except the highest id is full
    out.groupBy(_._2).foreach { case (_, rows) =>
      val byBatch = rows.groupBy(_._3)
      val last = byBatch.keys.max
      byBatch.foreach { case (b, rs) => if (b != last) assert(rs.size == 8) }
    }
    // bucket is the length bucket of the row's own len
    out.foreach(r => assert(r._2 == (10L + (r._1 % 7) * 40L) / 100L))
    val rep = Packing.inferenceBatches(docs.repartition(13, col("doc_id")),
        "doc_id", "len", bucketWidth = 100, batchSize = 8)
      .select("doc_id", "len_bucket", "batch_id", "pos_in_batch")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rep.sortBy(_._1) == out.sortBy(_._1))
  }
}
