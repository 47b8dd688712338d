package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4 moved
  * the Expression-backed Column constructor behind
  * org.apache.spark.sql.classic.ExpressionUtils). Needed to expose custom
  * Catalyst expressions (graft.functions.*) through the Column API.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Apply a SparkSessionExtensions' injected functions to an existing
    * session's registry (what SparkSession.builder does at build time;
    * `registerFunctions` is private[sql]).
    */
  def registerExtensionFunctions(ext: SparkSessionExtensions,
      registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry): Unit =
    ext.registerFunctions(registry)

  /** DataFrame from a custom LogicalPlan (Dataset.ofRows is private[sql]) —
    * the construction path for custom logical operators like
    * graft.plans.SkylineNode.
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Pin a DataFrame's rows on executor storage WITH the RDD lineage
    * kept (fault-tolerant: a lost block recomputes from source), while
    * returning a FLAT LogicalRDD plan — localCheckpoint's plan shape
    * without its unrecoverable truncation. This is what `persist` on the
    * Dataset cannot give: Dataset-level persist caches data but keeps
    * the full logical plan, so an iterative loop's plan doubles per
    * round (each round references the previous twice) and analysis cost
    * grows 2^rounds — the graph3_kcore heap exhaustion under the
    * fault-tolerance sweep. The `.map(_.copy())` is mandatory: codegen
    * reuses UnsafeRow buffers per partition, and caching uncopied rows
    * corrupts the store (same copy Dataset.checkpoint performs).
    *
    * Returns the flat DataFrame and the pinned RDD (for release).
    */
  /** The RDD behind a LogicalRDD-planned DataFrame (localCheckpoint /
    * internalCreateDataFrame output) — the handle an owner needs to
    * unpersist exactly the blocks IT pinned. None for any other plan
    * shape, so callers never grab an RDD they don't own.
    */
  def scanRddOf(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }

  def pinWithLineage(df: DataFrame)
      : (DataFrame, org.apache.spark.rdd.RDD[_]) = {
    val classicDf = df.asInstanceOf[classic.Dataset[Row]]
    val spark = classicDf.sparkSession
    val rdd = classicDf.queryExecution.toRdd.map(_.copy())
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rdd.count()
    (spark.internalCreateDataFrame(rdd, classicDf.schema), rdd)
  }
}
