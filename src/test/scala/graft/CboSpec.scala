package graft

import graft.sources.Stats
import org.apache.spark.sql.functions._

/** Cost-based-optimizer story: ANALYZE'd statistics change physical
  * planning. The dimension table is big ON DISK but tiny after a
  * selective filter — without column stats Spark must assume the filter
  * keeps everything (sort-merge join); with NDV stats + CBO the
  * estimate shrinks below the broadcast threshold and the same query
  * plans a broadcast join. At 100 TB this is the difference between
  * shuffling a fact table and not.
  */
class CboSpec extends SparkSpec {

  test("ANALYZE + CBO: filtered dim flips from shuffle join to broadcast join") {
    // own session: CBO flags and a scoped-down broadcast threshold must
    // not leak into the other suites sharing the JVM-wide session
    val s = spark.newSession()
    // plan-stats visitors read SQLConf.get (the ACTIVE session's conf, a
    // thread-local) — without this, the child session's CBO flags are
    // invisible to pure plan inspection and rowCount never propagates
    org.apache.spark.sql.SparkSession.setActiveSession(s)
    import s.implicits._
    Stats.enableCbo(s)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", (64 * 1024).toString)

    s.sql("DROP TABLE IF EXISTS cbo_fact")
    s.sql("DROP TABLE IF EXISTS cbo_dim")
    // the in-memory catalog is fresh per JVM but the warehouse directory
    // persists on disk — clear leftovers of a previous run explicitly
    Seq("cbo_fact", "cbo_dim").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"target/test-warehouse/$t"))
    }
    (0L until 20000L).map(i => (i % 4000L, i)).toDF("k", "fact_payload")
      .write.mode("overwrite").saveAsTable("cbo_fact")
    // ~1.3 MB of incompressible payload: comfortably above the 64 KiB
    // broadcast threshold at file-size estimation
    (0L until 40000L).toDF("k")
      .select(col("k"), (col("k") % 1000L).as("tag"), md5(col("k").cast("string")).as("payload"))
      .write.mode("overwrite").saveAsTable("cbo_dim")

    def plan(): String = s.sql(
      """SELECT f.k, f.fact_payload, d.payload
        |FROM cbo_fact f JOIN (SELECT * FROM cbo_dim WHERE tag = 7) d ON f.k = d.k
        |""".stripMargin).queryExecution.sparkPlan.toString

    // no statistics: the filter's output is estimated at the full file
    // size -> no broadcast
    assert(Stats.rowCountEstimate(s, "cbo_dim").isEmpty)
    assert(!plan().contains("BroadcastHashJoin"), s"expected shuffle join pre-ANALYZE:\n${plan()}")

    Stats.analyze(s, "cbo_dim", Seq("tag"))
    assert(Stats.rowCountEstimate(s, "cbo_dim").contains(BigInt(40000)))
    // NDV(tag)=1000 -> selectivity 1/1000 -> ~40 rows, far under the
    // threshold: CBO plans the broadcast
    assert(plan().contains("BroadcastHashJoin"), s"expected broadcast join post-ANALYZE:\n${plan()}")

    s.sql("DROP TABLE IF EXISTS cbo_fact")
    s.sql("DROP TABLE IF EXISTS cbo_dim")
    org.apache.spark.sql.SparkSession.setActiveSession(spark)
  }
}
