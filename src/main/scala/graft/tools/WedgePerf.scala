package graft.tools

/** Dev micro-benchmark (r12): graph_common_neighbors' wedge exchange —
  * per-wedge rows (the r6–r11 form) vs grouped-suffix rows (guide §2.3,
  * "shuffle fewer bytes"). Interleaved reps in one JVM so host noise hits
  * both arms; equality asserted before timing; both stage plans dumped
  * for the round's evidence.
  *
  * Usage: runMain graft.tools.WedgePerf [sfDir] [reps] [candidateMod]
  */
object WedgePerf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val mod = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = graft.GraftSession.builder("graft-wedge-perf",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), dir).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val old = () => graft.operators.Graph.commonNeighborsPlan(
      spark, dir, 5, mod, groupedSuffix = false)
    val sfx = () => graft.operators.Graph.commonNeighborsPlan(
      spark, dir, 5, mod, groupedSuffix = true)

    // warm the family caches so timings attribute the wedge tail alone
    graft.operators.Graph.buildPairs(spark, dir).count()

    val diff = old().exceptAll(sfx()).count() + sfx().exceptAll(old()).count()
    println(s"[wedgeperf] mismatches=$diff (must be 0)")
    require(diff == 0, "wedge forms diverge — do not time")

    val planDir = java.nio.file.Paths.get("plans/r12")
    java.nio.file.Files.createDirectories(planDir)
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      java.nio.file.Files.write(planDir.resolve(name),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
    dump("graph_common_neighbors_before.txt", old())
    dump("graph_common_neighbors_after.txt", sfx())

    def time(tag: String, f: () => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      println(f"[wedgeperf] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    for (_ <- 1 to reps) {
      time("wedge-rows    ", old)
      time("grouped-suffix", sfx)
    }
    spark.stop()
  }
}
