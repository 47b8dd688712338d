package graft

import graft.operators.{Dedup, Graph, Materialize}

/** The graft.materialize.mode knob: every mode must produce identical
  * results — the conf trades fault-tolerance against speed, never
  * semantics.
  */
class MaterializeSpec extends SparkSpec {

  import spark.implicits._

  private val modes = Seq("localCheckpoint", "persist", "off")

  private def withMode[A](mode: String)(f: => A): A = {
    spark.conf.set(Materialize.ConfKey, mode)
    try f finally spark.conf.unset(Materialize.ConfKey)
  }

  test("simhashNearDups is identical under every materialize mode") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "pack my box with five dozen liquor jugs"),
      (4L, "sphinx of black quartz judge my vow"),
      (5L, "the quick brown fox jumps over the lazy cat")
    ).toDF("doc_id", "text")
    val results = modes.map { m =>
      withMode(m)(Dedup.simhashNearDups(docs, maxHamming = 3)
        .orderBy("a_id", "b_id").collect().toSeq)
    }
    assert(results.distinct.size == 1,
      s"modes diverged: ${modes.zip(results.map(_.size))}")
    assert(results.head.nonEmpty) // the planted exact copy must pair
  }

  test("triangleCount(materializeOriented) is identical under every mode") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), // triangle
      (3L, 4L), (4L, 5L), (3L, 5L), // triangle
      (5L, 6L)                      // dangling edge
    ).toDF("u", "v")
    val counts = modes.map { m =>
      withMode(m)(Graph.triangleCount(edges, "u", "v", materializeOriented = true)
        .collect().head.getLong(0))
    }
    assert(counts.forall(_ == 2L), s"expected 2 triangles under all modes, got $counts")
  }

  test("persist pin: flat plan, released pin recomputes from lineage, release safe everywhere") {
    val df = Seq.tabulate(100)(i => (i.toLong, i * 2L)).toDF("id", "v")
    withMode("persist") {
      val pinned = Materialize(df.filter(org.apache.spark.sql.functions.col("id") < 50))
      // flat LogicalRDD plan: the iterative-loop 2^rounds blowup is gone
      assert(pinned.queryExecution.logical.toString.contains("LogicalRDD") ||
        pinned.queryExecution.optimizedPlan.toString.contains("LogicalRDD") ||
        pinned.queryExecution.logical.toString.contains("ExistingRDD"),
        s"persist mode must return a flat scan plan:\n${pinned.queryExecution.logical}")
      val before = pinned.collect().toSeq
      // releasing the pin must not change results — the RDD lineage
      // recomputes the rows (the fault-tolerance property)
      Materialize.release(pinned)
      val after = pinned.collect().toSeq
      assert(before == after && before.size == 50)
    }
    // release on a localCheckpoint / off materialization is a safe no-op
    withMode("localCheckpoint") {
      val lc = Materialize(df)
      Materialize.release(lc)
      assert(lc.count() == 100L)
    }
    withMode("off") {
      val off = Materialize(df)
      Materialize.release(off)
      assert(off.count() == 100L)
    }
  }

  test("kCore loop under persist releases superseded rounds (bounded pins)") {
    withMode("persist") {
      val edges = Seq.tabulate(200)(i => (i.toLong, (i + 1).toLong))
        .toDF("u", "v")
      val out = Graph.kCore(edges, "u", "v", k = 2, rounds = 6)
      out.collect() // force the full loop
      // only the final round's pin (plus possibly one in flight) may
      // remain registered; 6 rounds must NOT leave 6 pinned RDDs
      val pinnedNow = spark.sparkContext.getPersistentRDDs.size
      assert(pinnedNow <= 2,
        s"superseded k-core rounds must be released, $pinnedNow RDDs still pinned")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
  }

  test("unknown mode fails fast with the contract message") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      withMode("cache")(Dedup.simhashNearDups(docs).collect())
    }
    assert(e.getMessage.contains(Materialize.ConfKey))
  }
}
