package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Dev profiler for survivorPolicy stages (test-scoped, not shipped). */
object ProfileSurvivor {
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

    val members = time("clusterMembers")(
      { val m = Dedup.clusterMembers(spark, dir); m.count(); m })
    val t = graft.functions.TextFunctions.tokens(col("text"))
    val quality = Tables.documents(spark, dir).select(
      col("doc_id"),
      round(size(array_distinct(t)) / size(t).cast("double"), 6).as("quality"))
    time("quality count")(quality.count())
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("quality").desc, col("doc_id"))
    time("join+window") {
      members.join(quality, Seq("doc_id"))
        .withColumn("rnk", row_number().over(w))
        .select(col("doc_id"), col("cluster_id"), col("quality"),
          (col("rnk") === 1).as("survivor")).count()
    }
    time("full op")(Dedup.survivorPolicy(spark, dir).count())
    spark.stop()
  }
}
