package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** EvalQueries against hand-computed references on crafted inputs:
  * confusion-matrix metrics, tie-aware rank-sum AUC vs the O(n²)
  * pairwise definition, calibration bin arithmetic, interval-union
  * coverage vs intervals merged by hand, and the degree histogram.
  */
class EvalQueriesSpec extends SparkSpec {

  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-eval").toString

  /** documents.parquet with crafted (lang, text); doc_id/source/n_chars
    * filled mechanically (the eval queries ignore them).
    */
  private def writeDocs(dir: String, rows: Seq[(String, String)]): Unit =
    rows.zipWithIndex
      .map { case ((lang, text), i) => (i.toLong, text, lang, "s", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("ml1_langid_eval: hand-computed confusion metrics, incl. never-predicted class") {
    val dir = tmpDir()
    // predicted: "the the the"->en, "el la los"->es, "der die das"->de
    writeDocs(dir, Seq(
      "en" -> "the the the", // en/en  tp
      "en" -> "el la los", // en/es  fn(en), fp(es)
      "es" -> "el la los", // es/es  tp
      "zh" -> "the the the")) // zh/en  fp(en), zh never predicted
    val rows = SparkEntry.queries("ml1_langid_eval")(spark, dir).collect()
    val byLang = rows.map(r => r.getAs[String]("lang") -> r).toMap
    assert(byLang.keySet == Set("en", "es", "zh"))
    // en: tp=1, support=2, predicted_n=2 -> p=1/2, r=1/2, f1=2*1/(2+2)=1/2
    val en = byLang("en")
    assert(en.getAs[Long]("tp") == 1L && en.getAs[Long]("support") == 2L &&
      en.getAs[Long]("predicted_n") == 2L)
    assert(en.getAs[Long]("precision_x1e6") == 500000L &&
      en.getAs[Long]("recall_x1e6") == 500000L &&
      en.getAs[Long]("f1_x1e6") == 500000L)
    // es: tp=1, support=1, predicted_n=2 -> p=1/2, r=1, f1=2/3 floored
    val es = byLang("es")
    assert(es.getAs[Long]("precision_x1e6") == 500000L &&
      es.getAs[Long]("recall_x1e6") == 1000000L &&
      es.getAs[Long]("f1_x1e6") == 666666L)
    // zh: never predicted -> precision NULL, recall 0, f1 0
    val zh = byLang("zh")
    assert(zh.isNullAt(zh.fieldIndex("precision_x1e6")))
    assert(zh.getAs[Long]("recall_x1e6") == 0L && zh.getAs[Long]("f1_x1e6") == 0L)
  }

  test("ml5_cohens_kappa: hand-computed kappa on the ml1 fixture") {
    val dir = tmpDir()
    writeDocs(dir, Seq(
      "en" -> "the the the", "en" -> "el la los",
      "es" -> "el la los", "zh" -> "the the the"))
    // cells: en/en 1, en/es 1, es/es 1, zh/en 1 -> N=4, agree=2
    // marginal products over classes on BOTH sides: en 2*2 + es 1*2 = 6
    // (zh never predicted -> excluded); kappa = (4*2-6)/(16-6) = 0.2
    val r = SparkEntry.queries("ml5_cohens_kappa")(spark, dir).head()
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("agree") == 2L)
    assert(r.getAs[Double]("chance_pairs") == 6.0)
    assert(r.getAs[Double]("kappa") == 0.2)
  }

  test("ml5_cohens_kappa: single-class corpus yields NULL kappa (not Inf/NaN)") {
    val dir = tmpDir()
    writeDocs(dir, Seq("en" -> "the the the", "en" -> "the a of"))
    val r = SparkEntry.queries("ml5_cohens_kappa")(spark, dir).head()
    assert(r.getAs[Long]("n") == 2L && r.getAs[Long]("agree") == 2L)
    assert(r.isNullAt(r.fieldIndex("kappa")),
      "kappa must be NULL when chance agreement is total")
  }

  test("ml2_auc matches the O(n^2) pairwise definition with ties") {
    val dir = tmpDir()
    // score = 2*n_tokens for stopword-free unpunctuated text: "zz"*k -> 2k.
    // en (positive) scores: 6, 4, 4; others (negative): 4, 2, 2
    def zz(k: Int) = Seq.fill(k)("zz").mkString(" ")
    writeDocs(dir, Seq(
      "en" -> zz(3), "en" -> zz(2), "en" -> zz(2),
      "fr" -> zz(2), "de" -> zz(1), "es" -> zz(1)))
    val pos = Seq(6, 4, 4)
    val neg = Seq(4, 2, 2)
    val pairs = for { p <- pos; n <- neg } yield
      if (p > n) 2L else if (p == n) 1L else 0L
    val expected = (BigInt(pairs.sum) * 1000000000L /
      (2L * pos.size * neg.size)).toLong
    val r = SparkEntry.queries("ml2_auc")(spark, dir).head()
    assert(r.getAs[Long]("n_pos") == 3L && r.getAs[Long]("n_neg") == 3L)
    assert(r.getAs[Long]("auc_x1e9") == expected)
  }

  test("ml4_pr_curve: hand-computed precision/recall at every threshold") {
    val dir = tmpDir()
    def zz(k: Int) = Seq.fill(k)("zz").mkString(" ")
    // same fixture as ml2: pos scores {6,4,4}, neg {4,2,2}
    writeDocs(dir, Seq(
      "en" -> zz(3), "en" -> zz(2), "en" -> zz(2),
      "fr" -> zz(2), "de" -> zz(1), "es" -> zz(1)))
    val got = SparkEntry.queries("ml4_pr_curve")(spark, dir).collect()
      .map(r => (r.getAs[Long]("score"), r.getAs[Long]("cum_n"),
        r.getAs[Long]("cum_pos"), r.getAs[Long]("precision_x1e6"),
        r.getAs[Long]("recall_x1e6")))
    // t=6: 1 of 1 predicted is pos, recall 1/3; t=4: 3/4, recall 1;
    // t=2: 3/6, recall 1
    assert(got.toSeq == Seq(
      (2L, 6L, 3L, 500000L, 1000000L),
      (4L, 4L, 3L, 750000L, 1000000L),
      (6L, 1L, 1L, 1000000L, 333333L)))
  }

  test("ml3_calibration: bin ids, counts and rates from first principles") {
    val dir = tmpDir()
    def zz(k: Int) = Seq.fill(k)("zz").mkString(" ")
    // scores 2,4,...,20 -> smin=2, smax=20, width denom 19:
    // bin = (sc-2)*10 DIV 19
    val rows = (1 to 10).map(k => (if (k >= 8) "en" else "fr") -> zz(k))
    writeDocs(dir, rows)
    val got = SparkEntry.queries("ml3_calibration")(spark, dir).collect()
    val expectedBins = (1 to 10).map(k => ((2 * k - 2) * 10) / 19)
    assert(got.map(_.getAs[Long]("bin")).toSeq ==
      expectedBins.distinct.sorted.map(_.toLong))
    val total = got.map(_.getAs[Long]("n")).sum
    val totalPos = got.map(_.getAs[Long]("n_pos")).sum
    assert(total == 10L && totalPos == 3L)
    // highest bin holds exactly the max score with its known rate
    val top = got.last
    assert(top.getAs[Long]("max_score") == 20L)
    assert(top.getAs[Long]("pos_rate_x1e6") ==
      top.getAs[Long]("n_pos") * 1000000L / top.getAs[Long]("n"))
  }

  test("ivl2_interval_coverage equals intervals merged by hand") {
    val dir = tmpDir()
    // 10-min intervals from: 0s, 300s (overlap), 2000s (separate),
    // 2000s (exact duplicate), 2600s (touching: starts when prev ends)
    val starts = Seq(0L, 300L, 2000L, 2000L, 2600L)
    starts.zipWithIndex.map { case (sec, i) =>
      (i.toLong, new java.sql.Timestamp(sec * 1000L), 1L, "click", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("ivl2_interval_coverage")(spark, dir).head()
    // union: [0,900s) + [2000s,3200s) = 900 + 1200 = 2100 s
    assert(r.getAs[Long]("covered_us") == 2100L * 1000000L)
    // boundaries: 0,300,600,900,2000,2600,3200 (2000 start deduped; 2600
    // is both an end and a start -> one boundary row)
    assert(r.getAs[Long]("n_boundaries") == 7L)
  }

  test("ivl3_largest_gaps: hand-built gap structure, duplicate ts collapse") {
    val dir = tmpDir()
    // seconds 0, 10, 10 (dup), 40, 100, 101 -> gaps 10, 30, 60, 1
    val secs = Seq(0L, 10L, 10L, 40L, 100L, 101L)
    secs.zipWithIndex.map { case (sec, i) =>
      (i.toLong, new java.sql.Timestamp(sec * 1000L), 1L, "click", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("ivl3_largest_gaps")(spark, dir).collect()
      .map(r => (r.getAs[Long]("gap_start_us") / 1000000L,
        r.getAs[Long]("gap_end_us") / 1000000L,
        r.getAs[Long]("gap_us") / 1000000L))
    assert(got.toSeq == Seq((40L, 100L, 60L), (10L, 40L, 30L),
      (0L, 10L, 10L), (100L, 101L, 1L)))
  }

  test("graph5_degree_dist: hand-computed histogram") {
    val dir = tmpDir()
    // edges: s1-{p1,p2,p3}, s2-{p1} (duplicate observation collapses)
    Seq((1L, 101L), (1L, 102L), (1L, 103L), (2L, 101L), (2L, 101L))
      .toDF("l_suppkey", "l_partkey").repartition(2)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("graph5_degree_dist")(spark, dir)
      .collect().map(r => (r.getAs[Long]("degree"), r.getAs[Long]("n_nodes")))
    // degrees: s1=3, s2=1, p1=2, p2=1, p3=1 -> {1:3, 2:1, 3:1}
    assert(got.toSeq == Seq((1L, 3L), (2L, 1L), (3L, 1L)))
  }
}
