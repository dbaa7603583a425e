package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the phash family: attributes mm_phash_clusters time
  * to its stages (signatures, collapse, bucket-verify, components).
  * Test-scoped (`sbt "Test/runMain graft.operators.ProfilePhash [sfDir]"`).
  */
object ProfilePhash {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $name%-32s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-prof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sigs = time("signatures (build+persist)") {
      val x = Multimodal.phashSigsPortable(spark, dir)
      x.count(); x
    }
    val reps = sigs.groupBy("sig").agg(min("doc_id").as("rep_id"))
    time("collapse (sig reps)") { println(s"  reps = ${reps.count()}") }
    val copyEdges = sigs.join(reps, Seq("sig"))
      .filter(col("doc_id") =!= col("rep_id"))
      .select(col("doc_id").as("id_a"), col("rep_id").as("id_b"))
    time("copy edges") { println(s"  copy edges = ${copyEdges.count()}") }
    val repSigs = reps.select(col("rep_id").as("doc_id"), col("sig"))
    val repPairs = time("bucket-verify") {
      val p = Dedup.simhashBucketVerify(repSigs, 100000)
        .select(col("id_a"), col("id_b"))
      println(s"  pairs = ${p.count()}")
      p
    }
    time("components") {
      val c = Dedup.componentsOf(spark, repPairs.unionByName(copyEdges))
        .groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
      println(s"  clusters = ${c.count()}")
    }
    time("end-to-end phashClusters") {
      Multimodal.phashClusters(spark, dir).count()
    }
    time("full mm_dedup_phash (pairs cached)") {
      Multimodal.phashPairsPortable(spark, dir).count()
    }
    spark.stop()
  }
}
