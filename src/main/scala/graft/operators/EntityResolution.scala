package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: match dirty records against a
  * master table when keys don't line up — the blocking + verify shape
  * every large-scale linkage system uses (Fellegi-Sunter pipelines,
  * dedupe-style ER).
  *
  * A naive fuzzy join is a cross join with an edit-distance predicate —
  * O(probe × master) distance computations, dead at scale. Blocking
  * makes it an EQUI-join on a cheap deterministic key (a name suffix, a
  * phonetic code, a sorted-token prefix) that any true match must
  * share; the quadratic verify then runs only inside blocks. The block
  * key rides a hash-partitioned shuffle, so work is
  * O(Σ block² · verify) spread uniformly — pick keys with bounded
  * selectivity (the classic blocking-key design rule) and the join is
  * scan-bound at 100 TB.
  */
object EntityResolution {

  /** Blocked fuzzy join: equi-join `probe` and `master` on `blockCol`
    * (present on both sides), keep pairs whose names are within
    * `maxDist` edits.
    *
    * The verify uses Spark's THRESHOLDED levenshtein — banded dynamic
    * programming that abandons a pair the moment its distance provably
    * exceeds `maxDist`: O(len·maxDist) per pair instead of O(len²),
    * which is most of the verify cost when blocks contain mostly
    * non-matches. A length prefilter (|len(a)−len(b)| ≤ maxDist, a free
    * necessary condition) skips the DP entirely for hopeless pairs.
    * Emits both sides' columns plus the actual distance `lev`.
    */
  def fuzzyJoin(probe: DataFrame, master: DataFrame, blockCol: String,
      probeName: String, masterName: String, maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    val lenOk =
      abs(length(col(probeName)) - length(col(masterName))) <= maxDist
    val dist = levenshtein(col(probeName), col(masterName), maxDist)
    probe.join(master, blockCol)
      .filter(lenOk)
      .withColumn("lev", dist)
      .filter(col("lev") >= 0 && col("lev") <= maxDist)
  }

  /** Last-`n`-characters blocking key — effective when identifiers vary
    * at the tail (serial numbers, padded ids) and corruption hits the
    * head/middle; swap for a phonetic or sorted-shingle key when the
    * tail is noisy too.
    */
  def suffixBlock(name: Column, n: Int): Column = substring(name, -n, n)
}
