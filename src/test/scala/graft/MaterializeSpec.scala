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

  test("unknown mode fails fast with the contract message") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      withMode("cache")(Dedup.simhashNearDups(docs).collect())
    }
    assert(e.getMessage.contains(Materialize.ConfKey))
  }
}
