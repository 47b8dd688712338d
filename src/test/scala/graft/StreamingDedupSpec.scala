package graft

import graft.streaming.{StateBackend, StreamingDedup}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Streaming LSH near-dup: copies are flagged at ingest, within a batch
  * and across batches (bucket state carries), unrelated docs are not,
  * and estimates match the batch operator's signature math (identical
  * copies → every MinHash component equal → est exactly 1.0).
  */
class StreamingDedupSpec extends SparkSpec {

  import spark.implicits._

  test("copies are paired within and across batches; unrelated docs are not") {
    implicit val sc = spark.sqlContext
    StateBackend.withRocksDb(spark) { // transformWithState requires RocksDB
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double)]()
      val mem = MemoryStream[(Long, String)]
      val docs = mem.toDF().toDF("doc_id", "text")
      val q = StreamingDedup.nearDupPairs(docs, minEstJaccard = 0.9)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamingDedup.NearDupPair], _: Long) =>
          b.dropDuplicates("a_id", "b_id").collect()
            .foreach(p => buf.add((p.a_id, p.b_id, p.est_jaccard)))
          ()
        }
        .outputMode("append")
        .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
      try {
        val base = "the quick brown fox jumps over the lazy dog again and again at noon today"
        val other = "structured streaming keeps per bucket state inside rocksdb stores on local disk"
        def pairs = buf.toArray(Array.empty[(Long, Long, Double)]).toSet
        def waitFor(want: (Long, Long), what: String): Unit = {
          val deadline = System.currentTimeMillis + 60000
          while (!pairs.exists(p => (p._1, p._2) == want)) {
            if (System.currentTimeMillis > deadline)
              fail(s"timed out waiting for $what; saw $pairs")
            Thread.sleep(100)
          }
        }
        mem.addData((1L, base), (2L, base), (4L, other)) // same-batch copies
        waitFor((1L, 2L), "intra-batch copy pair")
        mem.addData((3L, base)) // cross-batch copy: bucket state must carry
        waitFor((1L, 3L), "cross-batch pair vs doc 1")
        waitFor((2L, 3L), "cross-batch pair vs doc 2")
        // exact copies share every MinHash component
        assert(pairs.filter(p => Set((1L,2L),(1L,3L),(2L,3L))((p._1, p._2)))
          .forall(_._3 == 1.0), s"copy estimates must be 1.0: $pairs")
        // the unrelated doc never pairs with anything
        assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
          s"unrelated doc must not pair: $pairs")
      } finally q.stop()
    }
  }

  test("horizon: bucket entries older than the TTL stop matching") {
    implicit val sc = spark.sqlContext
    StateBackend.withRocksDb(spark) {
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double)]()
      val mem = MemoryStream[(Long, String)]
      val docs = mem.toDF().toDF("doc_id", "text")
      val q = StreamingDedup.nearDupPairs(docs, minEstJaccard = 0.9,
          horizon = java.time.Duration.ofMillis(500))
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamingDedup.NearDupPair], _: Long) =>
          b.dropDuplicates("a_id", "b_id").collect()
            .foreach(p => buf.add((p.a_id, p.b_id, p.est_jaccard)))
          ()
        }
        .outputMode("append")
        .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
      try {
        val base = "the quick brown fox jumps over the lazy dog again and again at noon today"
        def pairs = buf.toArray(Array.empty[(Long, Long, Double)]).toSet
        mem.addData((1L, base))
        // the TTL clock starts when doc 1's entry is WRITTEN (batch-1
        // commit), not at addData — wait for the batch before aging
        val ingestDeadline = System.currentTimeMillis + 60000
        while (!q.recentProgress.exists(_.numInputRows > 0)) {
          if (System.currentTimeMillis > ingestDeadline)
            fail("timed out waiting for batch 1 to process doc 1")
          Thread.sleep(100)
        }
        Thread.sleep(1500) // age doc 1 well past the 500 ms TTL
        mem.addData((2L, base), (3L, base))
        val deadline = System.currentTimeMillis + 60000
        while (!pairs.exists(p => (p._1, p._2) == (2L, 3L))) {
          if (System.currentTimeMillis > deadline)
            fail(s"timed out waiting for the live pair; saw $pairs")
          Thread.sleep(100)
        }
        // (2,3) proves the batch was processed — doc 1 must NOT have
        // matched, its bucket entry expired while idle
        assert(!pairs.exists(p => p._1 == 1L || p._2 == 1L),
          s"expired entry must not pair: $pairs")
      } finally q.stop()
    }
  }
}
