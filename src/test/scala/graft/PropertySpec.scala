package graft

import graft.operators.{Transforms, Validation}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated property tests (SURVEY.md §5): quality-score
  * trichotomy, between-expectation null handling, and sha2/reference hash
  * parity over arbitrary inputs. Generators are driven directly with a
  * fixed seed (the scalatest-scalacheck bridge isn't on the offline
  * classpath), so failures are reproducible.
  */
class PropertySpec extends SparkSpec {

  import spark.implicits._

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  test("quality score is a total trichotomy over any battery/null combination") {
    val gen = for {
      battery <- Gen.chooseNum(-10.0, 120.0)
      tempNull <- Gen.oneOf(true, false)
      humNull <- Gen.oneOf(true, false)
      aqiNull <- Gen.oneOf(true, false)
    } yield (battery, tempNull, humNull, aqiNull)
    val cases = sample(Gen.listOfN(300, gen), 42L)

    val df = cases.map { case (b, tn, hn, an) =>
      (b, if (tn) None else Some(1.0), if (hn) None else Some(1.0),
        if (an) None else Some(1.0))
    }.toDF("battery", "temp", "hum", "aqi")
    val got = df.select(col("battery"), col("temp"), col("hum"), col("aqi"),
      Transforms.qualityScore(col("battery"), col("temp"), col("hum"), col("aqi"))
        .as("q")).collect()
    assert(got.length == 300)
    got.foreach { r =>
      val b = r.getDouble(0)
      val allPresent = !r.isNullAt(1) && !r.isNullAt(2) && !r.isNullAt(3)
      val expected =
        if (b >= 50 && allPresent) "PASS" else if (b >= 20) "WARN" else "FAIL"
      assert(r.getString(4) == expected, s"row $r")
    }
  }

  test("between expectation: null rows never count as out-of-range") {
    (1L to 5L).foreach { seed =>
      val vs = sample(Gen.listOfN(100, Gen.option(Gen.chooseNum(-100.0, 200.0))), seed)
      val df = vs.toDF("x")
      val r = Validation.validate(df, "t", Seq(Validation.Between("x", 0, 100)))
      val expectedOor = vs.count(v => v.exists(d => d < 0 || d > 100))
      assert(r.results.head.details("out_of_range_count") == expectedOor.toLong,
        s"seed=$seed vs=$vs")
    }
  }

  test("sha2 matches java MessageDigest for arbitrary strings") {
    val ss = sample(Gen.listOfN(100, Gen.asciiPrintableStr), 7L).distinct
    val got = ss.toDF("s")
      .select(col("s"), Transforms.pseudonymize(col("s")))
      .as[(String, String)].collect().toMap
    val md = java.security.MessageDigest.getInstance("SHA-256")
    ss.foreach { s =>
      val expected = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(got(s) == expected)
    }
  }

  test("scrubPii is idempotent over arbitrary text") {
    import graft.operators.TextAnalysis
    val gen = Gen.listOfN(120, Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.const("mail a.b@c.org and 10.0.0.1 and +44 123 456 7890"),
      Gen.const("digits 123456789012 spread 1 2 3 4 5 6 7 8 9 0")))
    val ss = sample(gen, 11L)
    val rows = ss.toDF("t")
      .select(TextAnalysis.scrubPii(col("t")).as("once"))
      .select(col("once"), TextAnalysis.scrubPii(col("once")).as("twice"))
      .as[(String, String)].collect()
    rows.foreach { case (once, twice) =>
      assert(once == twice, s"not idempotent: $once")
    }
  }

  test("stratifiedSample: membership respects per-stratum rates and is a subset") {
    import graft.operators.Sampling
    val df = (0L until 2000L).map(i => (i, s"s${i % 4}")).toDF("id", "stratum")
    val rates = Map("s0" -> 100, "s1" -> 0, "s2" -> 50)
    val kept = Sampling.stratifiedSample(df, "stratum", "id", rates, defaultPct = 25)
      .as[(Long, String)].collect()
    val byStratum = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byStratum.getOrElse("s0", 0) == 500)   // 100% of 500
    assert(!byStratum.contains("s1"))             // 0%
    val s2 = byStratum.getOrElse("s2", 0)         // ~50% of 500
    assert(s2 > 200 && s2 < 300, s"s2=$s2")
    val s3 = byStratum.getOrElse("s3", 0)         // default ~25% of 500
    assert(s3 > 80 && s3 < 170, s"s3=$s3")
    // sub-sampling at a lower rate is a SUBSET of the higher rate (nested
    // samples - the property that makes rate changes auditable)
    val tighter = Sampling.stratifiedSample(df, "stratum", "id",
      Map("s2" -> 20), defaultPct = 0).as[(Long, String)].collect().map(_._1).toSet
    val wider = kept.filter(_._2 == "s2").map(_._1).toSet
    assert(tighter.subsetOf(wider))
  }

  test("skyline properties over random data: sound, complete, idempotent") {
    import graft.operators.Skyline
    val gen = for {
      x <- Gen.chooseNum(0, 40)
      y <- Gen.chooseNum(0, 40)
    } yield (x, y)
    (1L to 3L).foreach { seed =>
      val pts = sample(Gen.listOfN(250, gen), seed).zipWithIndex
        .map { case ((x, y), i) => (i.toLong, x, y.toDouble) }
      val df = pts.toDF("id", "size", "price").repartition(1 + seed.toInt * 3)
      val dims = Seq(("price", true), ("size", false))
      val sky = Skyline.skyline(df, dims)
        .select("id").as[Long].collect().toSet
      def dominates(b: (Long, Int, Double), a: (Long, Int, Double)) =
        b._3 <= a._3 && b._2 >= a._2 && (b._3 < a._3 || b._2 > a._2)
      // sound: no skyline member dominated by ANY point
      pts.filter(p => sky.contains(p._1)).foreach { a =>
        assert(!pts.exists(b => dominates(b, a)), s"seed $seed: $a dominated")
      }
      // complete: every non-member dominated by someone
      pts.filterNot(p => sky.contains(p._1)).foreach { a =>
        assert(pts.exists(b => dominates(b, a)), s"seed $seed: $a wrongly dropped")
      }
      // idempotent: the skyline of the skyline is itself
      val skyDf = df.filter(col("id").isin(sky.toSeq: _*))
      val again = Skyline.skyline(skyDf, dims).select("id").as[Long].collect().toSet
      assert(again == sky)
    }
  }

  test("bpe encode/train closure holds under random corpora") {
    import graft.operators.TextAnalysis
    val word = Gen.listOfN(4, Gen.oneOf("a", "b", "c")).map(_.mkString)
    val doc = Gen.listOfN(8, word).map(_.mkString(" "))
    val docs = sample(Gen.listOfN(30, doc), 7L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, numMerges = 6)
      .orderBy("rank").as[(Int, String, String, Long)].collect()
      .map(m => (m._2, m._3)).toSeq
    val enc = docs
      .select(explode(graft.functions.BpeEncode.encode(
        TextAnalysis.tokens(col("text")), merges)).as("s"))
      .as[String].collect()
    // every emitted symbol reassembles from single chars and merge pairs
    val vocab = scala.collection.mutable.Set("a", "b", "c")
    merges.foreach { case (l, r) =>
      assert(vocab.contains(l) && vocab.contains(r),
        s"merge ($l,$r) references unknown symbols")
      vocab += (l + r)
    }
    enc.foreach(s => assert(vocab.contains(s), s"symbol '$s' not derivable"))
  }

  test("connectedComponents is idempotent: re-clustering cluster edges is stable") {
    import graft.operators.Dedup
    val rnd = new scala.util.Random(23)
    val edges = Seq.fill(40)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter(p => p._1 != p._2)
    val verts = (0L until 50L).toDF("doc_id")
    val first = Dedup.connectedComponents(edges.toDF("a_id", "b_id"), verts)
      .as[(Long, Long)].collect().toMap
    // edges rewritten as (member -> its component representative)
    val starEdges = first.toSeq.filter { case (id, c) => id != c }
      .toDF("a_id", "b_id")
    val second = Dedup.connectedComponents(starEdges, verts)
      .as[(Long, Long)].collect().toMap
    assert(first == second)
  }

  test("aucPerGroup equals the brute-force pairwise count over random slices") {
    // the rank-sum identity vs the DEFINITION: AUC = (concordant +
    // ties/2) / (n1*n0) over every (pos, neg) pair — ScalaCheck data
    // with deliberately heavy score ties across both classes
    val gen = for {
      g <- Gen.oneOf("a", "b", "c")
      y <- Gen.oneOf(0L, 1L)
      sc <- Gen.chooseNum(0, 8) // tiny domain -> dense ties
    } yield (g, y, sc.toDouble)
    val rows = sample(Gen.listOfN(400, gen), 1313L)
    val got = graft.operators.Trainer.aucPerGroup(
        rows.toDF("g", "y", "sc").repartition(7), "g", "y", "sc")
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    for ((g, members) <- rows.groupBy(_._1)) {
      val pos = members.filter(_._2 == 1L).map(_._3)
      val neg = members.filter(_._2 == 0L).map(_._3)
      val want =
        if (pos.isEmpty || neg.isEmpty) None
        else {
          // doubled concordance in exact integers: 2*wins + ties
          val num2 = (for (p <- pos; n <- neg) yield {
            if (p > n) 2L else if (p == n) 1L else 0L
          }).sum
          Some(BigInt(num2) * 1000000000 / (2 * BigInt(pos.size) * neg.size))
            .map(_.toLong)
        }
      assert(got(g) == want, s"slice $g: got ${got(g)} want $want")
    }
  }

  test("stat11-style trimmed mean equals the sort-and-slice definition") {
    // the closed-form partial-inclusion arithmetic vs literally sorting
    // and averaging the middle, on random duplicate-heavy integers
    val gen = Gen.listOfN(237, Gen.chooseNum(0L, 50L))
    for (seed <- Seq(5L, 17L, 99L)) {
      val vals = sample(gen, seed)
      val rows = vals.map(("g", _)).toDF("g", "cents").repartition(5)
      val cnt = rows.groupBy("g", "cents").agg(count(lit(1)).as("c"))
      val rm = graft.operators.Rank.globalRunningSum(cnt, "cents", "c",
        outCol = "cum", seriesCols = Seq("g"))
      val n = vals.size.toLong
      val k = n * 5 / 100
      val kept = rm.collect().map { r =>
        val (cents, c, cum) = (r.getLong(1), r.getLong(2), r.getLong(3))
        val lo = math.max(cum - c + 1, k + 1)
        val hi = math.min(cum, n - k)
        cents * math.max(hi - lo + 1, 0L)
      }.sum
      val naive = vals.sorted.slice(k.toInt, (n - k).toInt)
      assert(kept == naive.sum && n - 2 * k == naive.size,
        s"seed $seed: partial-inclusion sum $kept != naive ${naive.sum}")
    }
  }

  test("preferencePairs equals the naive per-prompt extremes on random logs") {
    val gen = for {
      p <- Gen.chooseNum(0L, 15L)
      r <- Gen.chooseNum(0L, 500L)
      sc <- Gen.chooseNum(0L, 6L) // dense score ties
    } yield (p, r, sc)
    val rows = sample(Gen.listOfN(300, gen), 888L)
      .distinctBy(t => (t._1, t._2)) // one score per (prompt, response)
    val got = graft.operators.Trainer.preferencePairs(
        rows.toDF("p", "resp", "sc").repartition(6), "p", "resp", "sc")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val want = rows.groupBy(_._1).flatMap { case (p, ms) =>
      val chosen = ms.maxBy(t => (t._3, t._2))
      val rejected = ms.minBy(t => (t._3, t._2))
      val margin = chosen._3 - rejected._3
      if (ms.size >= 2 && margin >= 1) Some(p -> (chosen._2, rejected._2, margin))
      else None
    }
    assert(got == want)
  }
}
