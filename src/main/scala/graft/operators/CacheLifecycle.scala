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
}
