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

      // force the sort-merge path: on the tiny fixture AQE would broadcast
      // the build side, which skips bucketing entirely — the 100 TB claim
      // this spec protects is the co-located SMJ, where neither side fits
      // in a broadcast
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined =
        try {
          val j = spark.table("orders_b")
            .join(spark.table("lineitem_b"),
              col("o_orderkey") === col("l_orderkey"))
            .groupBy("o_orderkey")
            .agg(count(lit(1)).as("n_items"),
              round(sum("l_extendedprice"), 2).as("sum_price"))
          val plan = j.queryExecution.executedPlan.toString
          // the join AND the aggregation ride the bucket layout: the only
          // acceptable exchange is none at all. Count the generic "Exchange"
          // token (minus ReusedExchange markers) rather than matching one
          // partitioning's rendering — shuffles print as "Exchange
          // hashpartitioning(...)"/"Exchange rangepartitioning(...)", and a
          // BroadcastExchange would mean bucketing stopped being exercised.
          val nExchanges = "(?<!Reused)Exchange".r.findAllMatchIn(plan).size
          assert(nExchanges == 0, plan.take(3000))
          assert(plan.contains("SortMergeJoin"), plan.take(3000))
          j
        } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

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
