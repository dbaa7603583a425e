package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession.{sf, spark}

/** Storage-layout features the 100 TB design leans on: partitioned
  * directory layout (partition pruning at the scan) and bucketed tables
  * (co-located joins with no shuffle). Verified against the physical
  * plans, not just the results.
  */
class SinksSpec extends AnyFunSuite {

  test("partitioned parquet write prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft-part").toString + "/docs"
    graft.Tables.documents(spark, sf)
      .write.partitionBy("lang").mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("lang") === "en")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("isnotnull(lang"), plan.take(1500))
    val expected = graft.Tables.documents(spark, sf)
      .filter(col("lang") === "en").count()
    assert(back.count() === expected)
    // only the lang=en directory is read
    assert(new java.io.File(dir).list().count(_.startsWith("lang=")) > 1)
  }

  test("bucketed tables join without an exchange on the join key") {
    // spark.sql.warehouse.dir is static; managed test tables land in the
    // default warehouse and are dropped (files removed) at the end. Also
    // clear any orphaned location left by an interrupted run.
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Seq("b_orders", "b_lineitem").foreach { t =>
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }
    graft.Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    graft.Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    // force the non-broadcast path: the point is the co-located
    // bucket-aware sort-merge join (at scale neither side broadcasts)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // both sides are bucketed on the key: no shuffle before the join
      assert(!plan.contains("Exchange"), plan.take(2000))
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(joined.count() ===
        graft.Tables.orders(spark, sf).join(graft.Tables.lineitem(spark, sf),
          col("o_orderkey") === col("l_orderkey")).count())
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
