package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession.{sf, spark}

/** Substantiates SCALE.md's repeated-workload claim: bucketing both join
  * sides on the join key removes the per-query shuffle entirely — the
  * exchange is paid ONCE at write time and every subsequent join reads
  * co-located buckets. This is the storage-layout lever a 100 TB
  * deployment pulls for its hot join keys.
  */
class BucketingSpec extends AnyFunSuite {

  test("bucketed co-located join plans zero exchanges and matches the plain join") {
    val wh = Files.createTempDirectory("graft-bucketed").toString
    val orders = graft.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    try {
      orders.write.option("path", s"$wh/orders_b")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_b")
      lineitem.write.option("path", s"$wh/lineitem_b")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_b")

      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_items"),
          round(sum("l_extendedprice"), 2).as("sum_price"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join AND the aggregation ride the bucket layout: the only
      // acceptable exchange is none at all (AQE may leave a reused
      // subtree marker, never a ShuffleExchange)
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        plan.take(3000))

      // identical results to the plain (shuffling) join
      val expected = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_items"),
          round(sum("l_extendedprice"), 2).as("sum_price"))
        .collect().map(_.toSeq).toSet
      assert(joined.collect().map(_.toSeq).toSet === expected)
      assert(expected.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
