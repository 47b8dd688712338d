package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** stat6_mannwhitney's null contract (ADVICE r9 #2): null values are
  * excluded on BOTH sides of the oracle pair — without the filter,
  * Spark's rank window would order NULLS FIRST while DuckDB orders
  * NULLS LAST, and parity held only because the shipped testdata had no
  * null `events.value`. Pinned here on an engineered null-bearing
  * events table, against a hand-computed tie-aware U.
  */
class MannWhitneySpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("stat6 on null-bearing input: nulls excluded, tie-aware doubled U exact") {
    // clicks [1,2,2,5] + null, errors [2,3,5] + null, plus a foreign type.
    // Combined ranks: 1→1; 2→avg(2,3,4)=3; 3→5; 5→avg(6,7)=6.5.
    // R1 (clicks) = 1+3+3+6.5 = 13.5 → U1 = 13.5 − 4·5/2 = 3.5 → U1·2 = 7.
    val rows = Seq(
      ("click", Some(1.0)), ("click", Some(2.0)), ("click", Some(2.0)),
      ("click", Some(5.0)), ("click", None),
      ("error", Some(2.0)), ("error", Some(3.0)), ("error", Some(5.0)),
      ("error", None),
      ("view", Some(100.0)))
    val tmp = Files.createTempDirectory("graft-stat6").toString
    rows.toDF("event_type", "value").repartition(3)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = SparkEntry.queries("stat6_mannwhitney")(spark, tmp).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n1") == 4L, s"n1 must exclude the null click: $r")
    assert(r.getAs[Long]("n2") == 3L, s"n2 must exclude the null error: $r")
    assert(r.getAs[Long]("u1_x2") == 7L, s"tie-aware doubled U mismatch: $r")
  }
}
