package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Fault-tolerance knob for the multi-consumer materialization points
  * (the SimHash/pHash signature snapshot in [[Dedup.hammingNearDups]],
  * the oriented edge set in [[Graph.triangleCount]]): one relation feeds
  * several differently-keyed joins, so without pinning it the expensive
  * upstream pass re-executes once per consumer (Spark has no
  * cross-consumer subplan reuse, and AQE-wrapped exchanges never
  * canonicalize equal).
  *
  * `graft.materialize.mode` (session conf) picks HOW it is pinned:
  *
  *  - `localCheckpoint` (default): eager, truncates lineage. Fastest
  *    locally and the blocks ride executor storage — but TRUNCATED
  *    lineage means an executor loss makes the blocks unrecoverable and
  *    FAILS the job on a real cluster (there is no plan left to
  *    recompute them from). The right trade on local[] and on clusters
  *    with task-level retry only.
  *  - `persist`: `MEMORY_AND_DISK`, lineage kept. An executor loss
  *    recomputes the lost partitions from source — the fault-tolerant
  *    choice for long-running 100 TB jobs, at the cost of keeping the
  *    (cheap, spillable) recompute path alive.
  *  - `off`: no pinning; the upstream pass runs once per consumer.
  *    Correct always — the escape hatch when executor storage is the
  *    scarcer resource (results are identical under every mode, spec-
  *    pinned by DedupSimilaritySpec/GraphSpec).
  *
  * The RDD-level checkpoints inside the label-propagation loop
  * ([[Dedup]] connected components) are NOT governed by this knob: they
  * exist to reset Catalyst plan statistics, not to dedup consumers (see
  * the scaladoc there), and swapping them for plain persist reintroduces
  * the double-exponential stats blow-up.
  */
object Materialize {

  val ConfKey = "graft.materialize.mode"

  def apply(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption(ConfKey).getOrElse("localCheckpoint") match {
      case "localCheckpoint" => df.localCheckpoint()
      case "persist"         => df.persist(StorageLevel.MEMORY_AND_DISK)
      case "off"             => df
      case other => throw new IllegalArgumentException(
        s"$ConfKey must be one of localCheckpoint|persist|off, got '$other'")
    }
}
