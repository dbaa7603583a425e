package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Algorithm cross-validation for connected components at scales where
  * the recursive-CTE closure oracle is intractable (sf1's phash pair
  * graph holds 14M edges): label every vertex with BOTH the distributed
  * large-star/small-star contraction and the driver union-find (guard
  * raised so it accepts the full pair set) and compare assignments
  * row-for-row. Test-scoped dev main:
  * `sbt "Test/runMain graft.operators.ClusterCrossCheck <sfDir>"`.
  */
object ClusterCrossCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-cc-crosscheck")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pairs = Multimodal.phashPairsPortable(spark, dir)
      .select(col("id_a"), col("id_b")).localCheckpoint(true)
    println(s"[crosscheck] pairs=${pairs.count()}")
    val star = Dedup.componentsOf(spark, pairs, driverMaxPairs = 0)
    val driver = Dedup.componentsOf(spark, pairs, driverMaxPairs = Long.MaxValue)
    val mismatches = star.as("s")
      .join(driver.as("d"), Seq("doc_id"), "full_outer")
      .filter(coalesce(col("s.cluster_id"), lit(-1L)) =!=
        coalesce(col("d.cluster_id"), lit(-2L)))
      .count()
    val n = star.count()
    println(s"[crosscheck] $dir vertices=$n mismatches=$mismatches " +
      (if (mismatches == 0) "OK" else "DIVERGED"))
    spark.stop()
    if (mismatches != 0) sys.exit(1)
  }
}
