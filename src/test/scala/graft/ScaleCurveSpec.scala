package graft

import org.apache.spark.sql.functions._

/** Pins the ScaleCurve synthesizer's structure-preservation contract —
  * the property every scaling ratio in bench/scaling.json rests on: a
  * factor-k replica must be k disjoint translated copies of the base
  * join graph, never a cross-linked or resampled one.
  */
class ScaleCurveSpec extends SparkSpec {
  import spark.implicits._

  private val base = "/root/testdata/sf0.001"

  test("factor-2 synthesis: schemas identical, counts doubled, keys disjoint, join graph replicated") {
    assume(new java.io.File(base).isDirectory, s"testdata missing: $base")
    val out = java.nio.file.Files
      .createTempDirectory("graft-scalecurve").toString
    val counts = ScaleCurve.synthesize(spark, base, out, factor = 2).toMap
    // row counts: dims copied 1x, every keyed table exactly 2x
    assert(counts("region") == ((5L, 5L)) && counts("nation") == ((25L, 25L)))
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings")) {
      val (b, s) = counts(t)
      assert(s == 2 * b, s"$t: scaled $s != 2x base $b")
    }
    // schema identical (names, types, order) — the queries must not be
    // able to tell the replica from driver-written testdata
    for (t <- Seq("lineitem", "events", "documents")) {
      val bs = graft.sources.Tables.load(spark, base, t).schema
      val ss = spark.read.parquet(s"$out/$t.parquet").schema
      assert(ss.map(f => (f.name, f.dataType)) ==
        bs.map(f => (f.name, f.dataType)), s"$t schema drifted")
    }
    // primary keys stay unique (copies are disjoint, shift collided
    // nothing): distinct doc_id count == row count
    val docs = spark.read.parquet(s"$out/documents.parquet")
    assert(docs.select(countDistinct("doc_id")).as[Long].head() ==
      counts("documents")._2)
    // null pattern replicates: events.user_id nulls exactly doubled
    val bNull = graft.sources.Tables.load(spark, base, "events")
      .filter(col("user_id").isNull).count()
    val sNull = spark.read.parquet(s"$out/events.parquet")
      .filter(col("user_id").isNull).count()
    assert(sNull == 2 * bNull, s"user_id nulls $sNull != 2x $bNull")
    // join graph translated, not cross-linked: lineitem ⋈ orders hits
    // exactly 2x the base pairs (any cross-copy key collision would
    // inflate this beyond 2x; a broken shift would deflate it)
    val bJoin = graft.sources.Tables.load(spark, base, "lineitem")
      .join(graft.sources.Tables.load(spark, base, "orders"),
        col("l_orderkey") === col("o_orderkey")).count()
    val sJoin = spark.read.parquet(s"$out/lineitem.parquet")
      .join(spark.read.parquet(s"$out/orders.parquet"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(sJoin == 2 * bJoin, s"join pairs $sJoin != 2x base $bJoin")
    // per-group structure replicates: every l_returnflag group doubles
    val bg = graft.sources.Tables.load(spark, base, "lineitem")
      .groupBy("l_returnflag").count().as[(String, Long)].collect().toMap
    val sg = spark.read.parquet(s"$out/lineitem.parquet")
      .groupBy("l_returnflag").count().as[(String, Long)].collect().toMap
    assert(sg == bg.map { case (k, v) => k -> 2 * v })
  }

  test("selectQueries picks the bench record's heaviest, skips exclusions and unknown names") {
    val tmp = java.nio.file.Files.createTempFile("graft-scale-bench", ".json")
    // s10 is heaviest but excluded (never scans sfDir); gone_query is
    // heavy but no longer in the registry; the rest rank by seconds
    // with a name tie-break. Real registry names keep the filter honest.
    java.nio.file.Files.writeString(tmp,
      """{"metric":"bench","value":9.9,"sf":"sf0.1","queries":{
        |"s10_streaming_landing":9.0,"gone_query":8.0,
        |"stat13_mad_outliers":6.0,"stat11_trimmed_mean":2.7,
        |"ml15_conformal":2.4,"failed_one":-1.0}}""".stripMargin)
    val got = ScaleCurve.selectQueries(spark, tmp.toString, topN = 2)
    assert(got.contains(Seq("stat13_mad_outliers", "stat11_trimmed_mean")),
      s"got $got")
    // absent record → None (caller falls back to the frozen list)
    assert(ScaleCurve.selectQueries(spark, "/nonexistent/bench.json").isEmpty)
    java.nio.file.Files.deleteIfExists(tmp)
    // the committed record, when present, must yield a full top-10 of
    // registry queries — the 'provably includes the current top-10'
    // contract the curve's JSON claims
    if (new java.io.File("bench/bench.json").isFile) {
      val live = ScaleCurve.selectQueries(spark, "bench/bench.json")
      assert(live.exists(qs => qs.size == 10 &&
        qs.forall(SparkEntry.queries.contains)), s"live selection: $live")
    }
  }
}
