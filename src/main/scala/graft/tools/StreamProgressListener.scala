package graft.tools

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev probe (r12, verdict item 4 "streaming floor"): per-micro-batch
  * duration breakdown for every streaming query in the process, printed to
  * stderr. Registered declaratively so it reaches the isolated
  * `newSession()` each StreamOps query runs in (their managers are out of
  * a probe's reach programmatically):
  *
  *   SPARK_GRAFT_EXTRA_CONF="spark.sql.streaming.streamingQueryListeners=graft.tools.StreamProgressListener"
  *
  * Output: one line per progress event with the durationMs map
  * (triggerExecution = total; addBatch / getBatch / latestOffset /
  * queryPlanning / walCommit / commitOffsets are its parts) plus
  * state-store rows/commit info — the data that says whether the
  * per-query ~0.5–1 s floor is state-store open/commit, source listing,
  * per-batch planning, or sink.
  */
class StreamProgressListener extends StreamingQueryListener {
  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit =
    System.err.println(s"[streamprobe] started name=${e.name} at=${e.timestamp}")

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val dur = p.durationMs
    val state = p.stateOperators.map(s =>
      s"op=${s.operatorName} rows=${s.numRowsTotal} commitMs=${s.commitTimeMs}")
      .mkString(" | ")
    System.err.println(
      s"[streamprobe] name=${p.name} batch=${p.batchId} rows=${p.numInputRows} " +
        s"durationMs=$dur state{$state}")
  }

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    System.err.println(s"[streamprobe] terminated id=${e.id}")
}
