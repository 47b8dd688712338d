package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._

/** As-of backward join semantics: latest right <= left ts, inclusive
  * boundary, deterministic tiebreak, null on no-match.
  */
class AsOfSpec extends SparkSpec {

  import spark.implicits._

  test("backward as-of: latest <=, ties inclusive, no-match -> null") {
    val left = Seq(
      (1L, "u1", 100L), // after r at 50 and 100 -> ties with ts=100 row
      (2L, "u1", 60L),  // only r at 50 qualifies
      (3L, "u1", 10L),  // before all rights -> null
      (4L, "u2", 500L)  // key with no rights -> null
    ).toDF("order_id", "k", "ots")
    val right = Seq(
      ("u1", 50L, 10L, 0.5),
      ("u1", 100L, 20L, 0.7),  // equal-ts: matched inclusively
      ("u1", 100L, 21L, 0.9),  // same ts, larger tiebreak id wins
      ("u1", 200L, 30L, 1.1)   // in the future of all lefts
    ).toDF("k", "rts", "event_id", "value")

    val out = AsOf.joinBackward(left, right, "k", "k",
      col("ots"), col("rts"), Seq("event_id", "value"), col("event_id"))
      .orderBy("order_id")
      .select("order_id", "event_id", "value")
      .collect()

    assert(out(0).getLong(1) == 21L && out(0).getDouble(2) == 0.9)
    assert(out(1).getLong(1) == 10L && out(1).getDouble(2) == 0.5)
    assert(out(2).isNullAt(1) && out(2).isNullAt(2))
    assert(out(3).isNullAt(1) && out(3).isNullAt(2))
  }

  test("as-of equals the naive theta-join + argmax formulation on testdata") {
    val sfDir = "/root/testdata/sf0.001"
    val orders = graft.sources.Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderdate").limit(500)
    val events = graft.sources.Tables.load(spark, sfDir, "events")

    val fast = AsOf.joinBackward(orders, events, "o_custkey", "user_id",
      unix_micros(col("o_orderdate").cast("timestamp")), unix_micros(col("ts")),
      Seq("event_id"), col("event_id"))
      .select("o_orderkey", "event_id")

    val naive = orders.join(events,
        col("o_custkey") === col("user_id") &&
          unix_micros(col("ts")) <= unix_micros(col("o_orderdate").cast("timestamp")), "left_outer")
      .groupBy("o_orderkey")
      .agg(max(struct(unix_micros(col("ts")), col("event_id"))).getField("event_id")
        .as("event_id"))

    assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty)
  }
}
