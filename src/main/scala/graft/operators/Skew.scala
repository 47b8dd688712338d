package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys. A plain groupBy on a skewed key
  * sends every row of the hot key to one reducer; two-phase salted
  * aggregation splits each key across `salts` reducers and recombines —
  * the hot key's work parallelizes by the salt factor. Results are
  * identical to the unsalted aggregate for decomposable aggregates
  * (sum/count/min/max), so the DuckDB oracle can verify the rewrite.
  *
  * (For joins, AQE's skewJoin handles runtime splitting —
  * spark.sql.adaptive.skewJoin.enabled, on by default.)
  */
object Skew {

  /** groupBy(key).agg(count, sum(valueCol)) computed via salt-and-combine.
    * Phase 1 groups on (key, salt) — salt derived from a hash of the whole
    * row's monotonically varying companion column so rows of a hot key
    * spread uniformly; phase 2 combines partials per key.
    */
  def saltedGroupAgg(df: DataFrame, key: String, valueCol: Column,
      saltCol: Column, salts: Int = 16): DataFrame = {
    val phase1 = df
      .withColumn("__salt", pmod(xxhash64(saltCol), lit(salts.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__cnt"), sum(valueCol).as("__sum"))
    phase1.groupBy(col(key))
      .agg(sum(col("__cnt")).as("cnt"), sum(col("__sum")).as("total"))
  }

  /** Salted equi-join for a skewed FACT side against a dimension too big
    * to broadcast: the fact side gets a per-row salt in [0, salts), the
    * dimension side is replicated `salts`× (explode of a literal range),
    * and the join runs on (key, salt) — a hot fact key's rows spread over
    * `salts` reducers instead of one. Row-identical to the plain join;
    * costs dimension-side replication, so size `salts` to the skew
    * factor, not higher.
    *
    * Prefer AQE's runtime skew-join splitting when it applies
    * (spark.sql.adaptive.skewJoin handles sort-merge joins); this is the
    * explicit form for when it doesn't — e.g. a join feeding directly
    * into a co-keyed aggregation, or pinned non-SMJ strategies.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltCol: Column, salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    // fact-side-preserving join types only: an unmatched REPLICATED dim
    // row would surface `salts` times under right/full outer semantics
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports fact-preserving join types only, got $joinType")
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(saltCol), lit(salts.toLong)))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedFact.join(replicatedDim, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
