package graft

import org.apache.spark.sql.SparkSession

/** The one local-mode session builder shared by every CLI main (Bench,
  * Verify, FloorProbe). Engine-behavior conf lives HERE so a tuning tweak
  * lands in one place — a profiler building its own session would silently
  * measure a different engine than the bench.
  */
object GraftSession {
  def builder(appName: String, cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // spark.driver.maxResultSize stays at the 1g DEFAULT: it is the
      // guard that catches a runaway driver collect before it buffers
      // gigabytes. The one workload that used to cross it at sf10 — the
      // sessionization verification's complete-mode memory sink — now
      // drains through a parquet FILE sink (Sessionize.streaming), so no
      // result bytes route through the driver. Dev override, if ever
      // needed: SPARK_GRAFT_EXTRA_CONF="spark.driver.maxResultSize=8g".
      //
      // ObjectHashAggregate (collect_set/collect_list/typed aggregates)
      // falls back to SORT-based aggregation after 128 distinct keys per
      // partition by default — pathological for the grouped-array builds
      // (co-purchase pair-gen, adjacency lists, minhash signatures) whose
      // per-key state is small but key counts are corpus-sized. Raise the
      // threshold so the hash path holds; per-key state here is bounded
      // (schema-bounded order arrays, capped signatures), so memory stays
      // partial-aggregate-sized.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "10000000")
      // dev knob: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" overlays arbitrary conf
      // for config experiments without editing builders
      .config(sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
        .flatMap(_.split(";")).filter(_.contains("="))
        .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap)
}
