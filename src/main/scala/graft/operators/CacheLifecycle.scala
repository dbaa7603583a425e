package graft.operators

import org.apache.spark.sql.DataFrame

/** Persist-lifecycle helper for operators whose plan consumes a shared
  * intermediate more than once (self-joins, candidate-generate + verify).
  *
  * The round-2 lesson: a `.persist()` with no matching release pins
  * executor storage memory for the rest of the job — locally it shows up
  * as cache-eviction/GC churn taxing every later query; on a 1000-executor
  * cluster it is storage memory lost to the whole pipeline. So operators
  * that persist intermediates must bound their footprint to their RESULT:
  *
  *  1. persist the shared intermediates (working set, input-sized);
  *  2. eagerly materialize the result with `localCheckpoint` — this
  *     truncates lineage, so the released intermediates can never be
  *     silently recomputed by a downstream action;
  *  3. unpersist the intermediates before returning.
  *
  * The contract: `result` must be output-sized (near-dup pairs, top-k
  * lists, per-entity summaries — all vanishing fractions of the input by
  * construction), because the checkpoint keeps it in executor storage
  * until the DataFrame is garbage-collected.
  */
private[graft] object CacheLifecycle {

  def materialize(result: DataFrame, shared: DataFrame*): DataFrame = {
    shared.foreach(_.persist())
    try result.localCheckpoint(eager = true)
    finally shared.foreach(_.unpersist(blocking = false))
  }

  /** Storage level for the ITERATIVE families' per-round checkpoints
    * (pagerank / label-prop / k-core / CC contraction), overridable with
    * SPARK_GRAFT_ROUND_CHECKPOINT_LEVEL (e.g. DISK_ONLY) for the
    * heap-vs-disk A/B: at a heap sized to the FAMILY caches (the r10
    * 16 g rule) the default MEMORY_AND_DISK round blocks compete with
    * resident caches, so the iterative family pays eviction churn that
    * scales with its per-round state. DISK_ONLY removes the blocks from
    * the storage-pool contention entirely at the price of a re-read per
    * consumer — which round checkpoints have few of (each round's block
    * is read once by the next round, then released).
    */
  private val roundLevel: Option[org.apache.spark.storage.StorageLevel] =
    sys.env.get("SPARK_GRAFT_ROUND_CHECKPOINT_LEVEL")
      .map(org.apache.spark.storage.StorageLevel.fromString)

  /** Eager per-round checkpoint at the configured level — the drop-in
    * for `.localCheckpoint(true)` inside iterative loops. Results and
    * family caches keep the default level; only superseded-per-round
    * state routes through here.
    */
  def roundCheckpoint(df: DataFrame): DataFrame = roundLevel match {
    case Some(level) => df.localCheckpoint(eager = true, storageLevel = level)
    case None        => df.localCheckpoint(eager = true)
  }

  /** Explicitly free the block storage behind a `localCheckpoint`ed
    * frame. `Dataset.unpersist` does NOT release checkpoint blocks —
    * they are RDD-persisted outside the cache manager — so without this
    * every superseded per-round checkpoint in an iterative loop
    * (pagerank / label-prop / k-core / CC contraction) lingers until the
    * weak-reference ContextCleaner happens to collect the RDD object.
    * Across a 200-query single-JVM sweep that is unbounded storage
    * churn: superseded rounds' blocks squeeze the storage pool and tax
    * every later query's GC (the r7 driver-bench pathology).
    *
    * CONTRACT: call only on a frame returned by `localCheckpoint` whose
    * every consumer has already materialized — a released local
    * checkpoint cannot be recomputed (lineage is truncated), so any
    * later action on it fails with missing blocks. Never call it on
    * family-cache frames (shared across queries).
    */
  def release(df: DataFrame): Unit =
    org.apache.spark.sql.GraftSqlShims.analyzed(df).foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
