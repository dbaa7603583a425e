package graft.tools

import org.apache.spark.sql.functions._

/** Dev microbenchmark for the machine's raw shuffle/aggregate floor —
  * calibrates the environment before interpreting suite-level timings
  * (different builder hosts have shown up to ~2× different shuffle
  * throughput at identical sf0.1 scan times, which otherwise reads as a
  * suite regression). Synthetic `range` input, no fixture dependency.
  *
  * Usage: runMain graft.tools.ShufflePerf [rows] [reps]
  */
object ShufflePerf {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.builder("graft-shuffle-perf",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (_ <- 1 to reps) {
      val t0 = System.nanoTime()
      spark.range(rows)
        .select((col("id") % (rows / 3)).as("k"), col("id").as("v"))
        .repartition(32).groupBy("k").agg(sum("v")).count()
      println(f"groupBy ${rows}%d -> ${rows / 3}%d keys: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      val t1 = System.nanoTime()
      spark.range(rows)
        .select((col("id") * 2654435761L % rows).as("k")).distinct().count()
      println(f"distinct ${rows}%d: ${(System.nanoTime() - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
