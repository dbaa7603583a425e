package graft.harness

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The single execution backend. The reference multiplexes pandas / Modin /
  * HDK / Polars behind one API with explicit laziness fencing
  * (/root/reference/timedf/backend.py:14-76); on Spark that collapses to a
  * SparkSession manager plus action fences so per-stage timings are honest
  * (Spark is lazy like Modin-on-HDK — without a fence every stage's cost
  * lands in the first downstream action).
  */
object SparkBackend {

  def session(numThreads: Int = Runtime.getRuntime.availableProcessors(),
              appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$numThreads]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", numThreads.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Fence for a loaded table that later stages reuse: persist + count
    * (mirrors trigger_loading, /root/reference/timedf/backend.py:58-66).
    */
  def triggerLoading(df: DataFrame): DataFrame = {
    val cached = df.persist()
    cached.count()
    cached
  }

  /** Fence for a stage result that is measured but not necessarily reused:
    * force full materialization (mirrors trigger_execution,
    * /root/reference/timedf/backend.py:68-76 — which drains all partition
    * futures, so a full count() is the faithful equivalent).
    */
  def triggerExecution(df: DataFrame): Long = df.count()
}
