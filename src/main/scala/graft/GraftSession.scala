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
      // The streaming queries verify through the MEMORY sink (complete
      // mode), whose final state is collected as task results — at sf10
      // the sessionization state crosses the 1g default and kills the
      // query with EXCEEDED_MAX_RESULT_SIZE. This is a ceiling of the
      // local VERIFICATION sink, not of the operators (production sinks
      // are files/topics and never drive results through the driver);
      // size it to the fixture decade instead of failing the bench.
      .config("spark.driver.maxResultSize", "8g")
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
