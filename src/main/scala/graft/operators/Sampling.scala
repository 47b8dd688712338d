package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and split assignment for training-data
  * pipelines. `df.sample`/`rand(seed)` are partitioning-dependent — the
  * same row can land in different samples after a repartition or AQE
  * re-plan. These operators hash the row's stable id instead: the sample
  * is a pure function of (id, salt), reproducible across runs, engines,
  * cluster sizes, and re-partitioning — which is what makes a train/val
  * split auditable at 100 TB. Map-only, no shuffle.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from md5(id || salt) — md5 (not
    * xxhash64) so external systems (and the DuckDB oracle) can reproduce
    * membership exactly.
    */
  def hashBucket(id: Column, salt: String, buckets: Int = 100): Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Keep ~pct% of rows, deterministically. */
  def deterministicSample(df: DataFrame, idCol: String, pct: Int,
      salt: String = "graft"): DataFrame =
    df.filter(hashBucket(col(idCol), salt) < pct)

  /** Assign train/val/test split labels by hash bucket:
    * [0,trainPct) → train, [trainPct,trainPct+valPct) → val, rest → test.
    */
  def assignSplit(df: DataFrame, idCol: String, trainPct: Int, valPct: Int,
      salt: String = "graft"): DataFrame = {
    val b = hashBucket(col(idCol), salt)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Keep at most `n` rows per group, preferring the highest `scoreCol`
    * (ties → smallest `idCol`). Runs on the bounded-heap top-k aggregate —
    * map-side partial top-k, never a per-partition window sort — then
    * semi-joins the surviving ids back to recover full rows.
    *
    * `idCol` must be integral (the heap keys on long, and the semi-join
    * equates the long back to the original column): a non-numeric id would
    * cast to null and silently drop every row, so it is rejected here.
    */
  def capPerGroup(df: DataFrame, groupCol: String, scoreCol: Column,
      idCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    require(Set[org.apache.spark.sql.types.DataType](ByteType, ShortType, IntegerType, LongType)
      .contains(df.schema(idCol).dataType),
      s"capPerGroup requires an integral id column; '$idCol' is ${df.schema(idCol).dataType.sql}")
    val keep = Similarity.topKPerKey(
      df.select(col(groupCol), scoreCol.cast("double").as("__score"),
        col(idCol).cast("long").as("__id")),
      groupCol, col("__score"), col("__id"), n)
      .select(col(groupCol), col("id").as(idCol))
    df.join(keep, Seq(groupCol, idCol), "left_semi")
      .select(df.columns.map(col).toIndexedSeq: _*)
  }
}
