package graft.operators

import org.apache.spark.sql.SparkSession

/** Dev profiler: cold vs warm cost of the ANN queries, to attribute
  * first-use expression/codegen init separately from steady-state cost.
  * Test-scoped; run via `sbt "Test/runMain graft.operators.ProfileAnn"`.
  */
object ProfileAnn {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $name%-32s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-prof-ann")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$dir/region.parquet").count()

    time("brute cold")(Similarity.bruteForceTopK(spark, dir).count())
    time("brute warm")(Similarity.bruteForceTopK(spark, dir).count())
    time("brute warm 2")(Similarity.bruteForceTopK(spark, dir).count())
    time("ivf cold")(Similarity.annIvf(spark, dir).count())
    time("ivf warm")(Similarity.annIvf(spark, dir).count())
    time("lsh warm-ish")(Similarity.annLsh(spark, dir).count())
    spark.stop()
  }
}
