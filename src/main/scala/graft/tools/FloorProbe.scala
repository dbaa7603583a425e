package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler for the per-query overhead floor (VERDICT r5 item 10):
  * splits each query's wall time into plan construction (DataFrame
  * building = analysis), physical planning (optimizer + strategy +
  * codegen entry), and execution (jobs). Run on warmed state — each
  * query executes `reps` times after one discarded warm-up, reporting
  * medians — so JVM/codegen cold start is excluded and what remains is
  * the steady-state floor the bench suite pays per entry.
  *
  * Usage: SPARK_GRAFT_QUERIES=q01_group_count,... \
  *   sbt "runMain graft.tools.FloorProbe /root/testdata/sf0.1 [reps]"
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder("graft-floor-probe", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only.fold(graft.SparkEntry.queries)(f =>
      graft.SparkEntry.queries.filter { case (k, _) => f(k) })

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

    println(f"${"query"}%-28s ${"build"}%8s ${"plan"}%8s ${"exec"}%8s ${"total"}%8s")
    val rows = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      fn(spark, dir).count() // warm-up rep, discarded
      val samples = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimize+planning
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e3, (t2 - t1) / 1e3, (t3 - t2) / 1e3)
      }
      val (b, p, e) = (med(samples.map(_._1)), med(samples.map(_._2)),
        med(samples.map(_._3)))
      println(f"$name%-28s ${b / 1000}%8.3f ${p / 1000}%8.3f ${e / 1000}%8.3f ${(b + p + e) / 1000}%8.3f")
      (b, p, e)
    }
    println(f"${"TOTAL"}%-28s ${rows.map(_._1).sum / 1000}%8.3f ${rows.map(_._2).sum / 1000}%8.3f ${rows.map(_._3).sum / 1000}%8.3f")
    spark.stop()
  }
}
