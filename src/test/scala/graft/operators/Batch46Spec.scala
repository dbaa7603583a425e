package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.operators.SparkTestSession.{sf, spark}

/** Pins for batch 46: the WOE encoder's single-scan fit (exchange
  * reuse, category-sized state) and arithmetic identity with a direct
  * recomputation; the FS linkage's block discipline (equi-join only —
  * the edit distance must never ride a join condition) and score
  * determinism.
  */
class Batch46Spec extends AnyFunSuite {

  private def planOf(df: DataFrame): String = {
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    df.queryExecution.executedPlan.toString
  }

  test("woe fit scans orders once (totals reuse the grouped exchange)") {
    val df = Features.woeEncode(spark, sf)
    df.collect() // AQE finalizes the reuse only on execution
    // the AQE plan string repeats the tree under "== Initial Plan ==";
    // count scans only in the executed final section
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val scans = "orders\\.parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected one orders scan, got $scans:\n${p.take(2000)}")
    assert(p.contains("ReusedExchange"), "totals must reuse the grouped exchange")
  }

  test("woe values equal a direct recomputation from exact counts") {
    val rows = Features.woeEncode(spark, sf).collect()
    assert(rows.nonEmpty)
    val counts = Tables.orders(spark, sf)
      .groupBy("o_orderpriority")
      .agg(sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("p"),
        sum(when(col("o_orderstatus") =!= "F", 1L).otherwise(0L)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val posTot = counts.values.map(_._1).sum
    val negTot = counts.values.map(_._2).sum
    rows.foreach { r =>
      val (p, n) = counts(r.getString(0))
      assert(r.getLong(1) == p && r.getLong(2) == n)
      val woe = BigDecimal(math.log(((p + 0.5) / posTot) / ((n + 0.5) / negTot)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - woe) < 1e-9,
        s"${r.getString(0)} woe ${r.getDouble(3)} vs $woe")
    }
  }

  test("linkage blocks are equi-joins; levenshtein stays out of the join") {
    val p = planOf(Linkage.customerPairs(spark, sf))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "blocking must be an equi-join, never a nested loop")
    p.linesIterator.filter(_.contains("Join")).foreach { l =>
      assert(!l.contains("levenshtein"),
        s"edit distance pushed into a join condition:\n$l")
    }
  }

  test("linkage output: blocked pairs only, scores from the weight table") {
    val rows = Linkage.customerPairs(spark, sf, k = 50).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val cust = Tables.customer(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), math.floor(r.getDouble(3) / 500.0).toLong,
        r.getDouble(3), r.getString(1).take(14)))).toMap
    // descending score order with deterministic tie-break
    val scores = rows.map(_.getDouble(4))
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
    rows.foreach { r =>
      val (na, banda, bala, pfxa) = cust(r.getLong(0))
      val (nb, bandb, balb, pfxb) = cust(r.getLong(1))
      assert(r.getLong(0) < r.getLong(1))
      assert(na == nb && banda == bandb && pfxa == pfxb,
        "pair escaped its block")
      val expected =
        (if (r.getInt(2) <= 2) 4.0 else -1.0) + 1.5 +
          (if (math.abs(bala - balb) <= 100.0) 2.0 else -0.75)
      assert(r.getDouble(4) == expected)
      val cls = if (expected >= 7.0) "match"
        else if (expected >= 4.0) "possible" else "non_match"
      assert(r.getString(5) == cls)
    }
  }
}
