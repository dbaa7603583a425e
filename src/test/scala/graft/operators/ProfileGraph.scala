package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Dev profiler for the co-purchase graph family — per-stage timings for
  * pagerank/triangles so suite entries attribute to stages. Test-scoped
  * (`sbt "Test/runMain graft.operators.ProfileGraph"`), not shipped.
  */
object ProfileGraph {
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

    val li = time("li distinct") {
      val d = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct().persist()
      d.count(); d
    }
    val pairs = time("pairs build") {
      val p = li.as("a").join(li.as("b"), Seq("l_orderkey"))
        .filter(col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .distinct().persist()
      p.count(); p
    }
    val edges = pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
    val deg = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    val adj = time("adj build") {
      val a = edges.join(deg, col("src") === col("node"))
        .select(col("src"), col("dst"), col("deg"))
        .repartition(col("src")).persist()
      a.count(); a
    }
    val n = time("deg count")(deg.count())
    var ranks = time("r0")(
      deg.select(col("node"), lit(1.0 / n).as("rank")).localCheckpoint(true))
    for (i <- 1 to 3) {
      ranks = time(s"iter $i") {
        adj.join(ranks, col("src") === col("node"))
          .groupBy(col("dst"))
          .agg((lit(0.15 / n) + lit(0.85) * sum(col("rank") / col("deg"))).as("rank"))
          .select(col("dst").as("node"), col("rank"))
          .localCheckpoint(true)
      }
    }
    time("final join")(
      ranks.join(deg, Seq("node"))
        .select(col("node").as("part"),
          round(col("rank") * lit(n.toDouble), 6).as("pagerank"), col("deg"))
        .count())
    spark.stop()
  }
}
