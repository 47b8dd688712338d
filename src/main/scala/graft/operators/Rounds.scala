package graft.operators

import org.apache.spark.sql.SparkSession

/** Scoped physical-planning overrides for DRIVER-BOUND iterative
  * rounds (IRLS/Newton, boosting, fixed-point strength updates): loops
  * that run one tiny-output aggregation job per round over a pinned
  * table. Profiled on ml11 (19 IRLS rounds over a 4838-row pinned
  * projection, sf0.1/local[32]): 66 Spark jobs but only ~0.6 s of
  * summed task time in ~3.6 s of wall — the cost is driver scheduling
  * and per-round (re)planning, not compute. Two session settings feed
  * that overhead and buy nothing for this shape:
  *
  *  - AQE turns every round into a multi-job query (one job per
  *    shuffle stage plus the broadcast) and re-optimizes a plan whose
  *    reduce side it cannot improve — the aggregate output is
  *    O(groups · state) KILOBYTES by the caller's own contract.
  *  - The session shuffle-partition count fans those few KB into
  *    dozens of sub-millisecond reduce tasks per round.
  *
  * [[driverBound]] scopes `spark.sql.adaptive.enabled = false` plus a
  * shuffle-partition count DERIVED from the loop's own reduce size to
  * the loop body, and restores the prior values on every exit path.
  * Measured on ml11: 3.13 s → 2.25 s (min-of-3 each) for the fit.
  *
  * This is deliberately NOT blanket config (guide §1.2: config last,
  * and never constants tuned to one box): `reduceBytes` names the
  * per-round aggregate output size — groups × per-group state — so the
  * partition count scales with the problem (clamped to
  * [1, defaultParallelism] at ~64 KiB per reduce task) and the
  * override dies with the loop. Callers whose per-round relations are
  * CORPUS-sized (graph rounds over edge tables) must size
  * `reduceBytes` from the real per-round relation, not the collected
  * state, or not use this at all. MEASURED HAZARD: do not wrap loops
  * containing HINT-LESS joins — with AQE off their strategy falls back
  * to the static planner, which cannot prove a pinned-RDD build side
  * small (no statistics) and picks sort-merge; kCore under this helper
  * went 1.5 → 8.2 s at sf0.1 before the revert. Of the wrapped loops,
  * the Newton trainers broadcast-hint their only join and the boosters
  * join nothing; bradleyTerryFit's strength joins are hint-less but
  * both sides are the SAME O(items) cardinality, so sort-merge is the
  * right strategy with or without AQE (measured neutral). NOT
  * thread-safe against concurrent
  * queries on the same session (session-level conf) — the engine's
  * batch drivers run queries serially; the streaming path never calls
  * into these trainers.
  */
object Rounds {

  /** Round-robin repartition to `defaultParallelism` IFF the plan's
    * current width is below it — a conditional parallelism floor for
    * HEAVY per-row map pipelines (per-replicate hashing, tokenization)
    * whose input is a raw scan. A parquet file is splittable only at
    * row-group boundaries, so a single-row-group file scans as ONE task
    * and serializes every narrow transformation above it no matter what
    * `spark.sql.files.minPartitionNum` asks for (the testdata fixtures
    * are exactly this shape; measured on samp8's ×10 bootstrap explode:
    * 1.11 s → 0.49 s at sf0.1/local[32]). On a real multi-split input
    * the width test fails and NO shuffle is added — this must never
    * become an unconditional `repartition(n)` (guide §2.4: that is the
    * textbook accidental exchange). The width probe reads the physical
    * plan's partitioning (no job); the shuffle, when taken, moves only
    * the operator's already-projected input columns.
    */
  def widen(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }

  /** Partition count for an RDD-native round loop, derived from the
    * loop's OWN row count (guide §2: scale-adaptive, never a constant
    * tuned to one box): the per-round fold does a handful of flops per
    * row, so below ~2¹⁸ rows a task is pure scheduling overhead —
    * clamp to [1, defaultParallelism]. Callers repartition UP to this
    * when their scan came in narrower (the single-row-group fixture
    * shape) and leave wider inputs alone.
    */
  def sizedParts(spark: SparkSession, rows: Long,
      targetRowsPerTask: Long = 1L << 18): Int =
    math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      (rows + targetRowsPerTask - 1) / targetRowsPerTask)).toInt

  def driverBound[T](spark: SparkSession, reduceBytes: Long)(body: => T): T = {
    val conf = spark.conf
    val aqeBefore = conf.get("spark.sql.adaptive.enabled")
    val partsBefore = conf.get("spark.sql.shuffle.partitions")
    val parts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      reduceBytes / (64L << 10)))
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.shuffle.partitions", parts.toString)
    try body
    finally {
      conf.set("spark.sql.adaptive.enabled", aqeBefore)
      conf.set("spark.sql.shuffle.partitions", partsBefore)
    }
  }
}
