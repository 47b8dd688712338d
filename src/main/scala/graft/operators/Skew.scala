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
}
