package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Dev profiler for the HLL sketch aggregate (test-scoped, not shipped). */
object ProfileHll {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $name%-32s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-prof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val ev = Tables.events(spark, dir)
    time("events count")(ev.count())
    time("exact distinct")(
      ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(countDistinct("user_id")).count())
    time("hll 1st")(Relational.sketchHllUsers(spark, dir).count())
    time("hll 2nd")(Relational.sketchHllUsers(spark, dir).count())
    val plan = Relational.sketchHllUsers(spark, dir)
      .queryExecution.executedPlan.toString
    println(plan.linesIterator.take(12).mkString("\n"))
    spark.stop()
  }
}
