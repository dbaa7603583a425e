package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: degree-distribution audit of the co-purchase graph at a
  * given fixture scale — the r10 wedge-family deep-dive's first question
  * ("is the sf10 bend fixture-real hot-node growth, or engine-side?").
  * ScaleUp shifts l_partkey per replica, so the scaled graph SHOULD be
  * `factor` disjoint copies with per-node degree constant across decades;
  * this tool verifies that on data and prints the wedge-volume
  * consequences (Σ C(k,2) over commonNeighbors' center arrays — the
  * actual row count entering the pair aggregation).
  *
  * Usage: runMain graft.tools.DegreeAudit <sfDir> [candidateMod=4]
  */
object DegreeAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val candidateMod = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = graft.GraftSession.builder("graft-degree-audit",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), dir).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val pairs = graft.operators.Graph.coPairs(spark, dir)
    val edges = pairs.union(
      pairs.select(col("dst").as("src"), col("src").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val degStats = deg.agg(
      count(lit(1)).as("nodes"), sum("deg").as("deg_sum"),
      max("deg").as("deg_max"), avg("deg").as("deg_mean"),
      expr("percentile_approx(deg, array(0.5, 0.9, 0.99, 0.999), 10000)")
        .as("deg_q")).head()
    println(s"[degaudit] dir=$dir nodes=${degStats.getLong(0)} " +
      s"edges(dir)=${degStats.getLong(1)} degMax=${degStats.getLong(2)} " +
      f"degMean=${degStats.getDouble(3)}%.2f " +
      s"degQ(p50,p90,p99,p999)=${degStats.getSeq[Long](4).mkString(",")}")

    // commonNeighbors' center arrays: watchlist neighbors per center —
    // the wedge volume Σ C(k,2) is the pair-aggregation input cardinality
    val centers = edges.filter(col("dst") % candidateMod === 0)
      .groupBy(col("src").as("b"))
      .agg(count(lit(1)).as("k"))
      .filter(col("k") >= 2)
    val w = centers.agg(
      count(lit(1)).as("centers"), max("k").as("k_max"),
      avg("k").as("k_mean"),
      sum((col("k") * (col("k") - 1) / 2).cast("long")).as("wedges"),
      expr("percentile_approx(k, array(0.5, 0.9, 0.99, 0.999), 10000)")
        .as("k_q")).head()
    println(s"[degaudit] centers=${w.getLong(0)} kMax=${w.getLong(1)} " +
      f"kMean=${w.getDouble(2)}%.2f wedges=${w.getLong(3)} " +
      s"kQ(p50,p90,p99,p999)=${w.getSeq[Long](4).mkString(",")}")
    spark.stop()
  }
}
