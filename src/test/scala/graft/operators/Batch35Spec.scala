package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables

/** Pins for batch 35: interpolation geometry, salted-join result
  * equality + plan shape, governance counting sanity, lag-feature
  * sequences, and the chained-stateful streaming distinct's batch
  * equality.
  */
class Batch35Spec extends AnyFunSuite {
  import SparkTestSession._

  test("interpolated values are convex combinations of the value range") {
    val rows = Relational.q53Interpolate(spark, sf).collect()
    assert(rows.nonEmpty)
    val bounds = Tables.events(spark, sf).groupBy("user_id")
      .agg(min("value").as("lo"), max("value").as("hi"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    rows.foreach { r =>
      val (lo, hi) = bounds(r.getLong(0))
      val v = r.getDouble(2)
      assert(v >= lo - 1e-6 && v <= hi + 1e-6,
        s"user ${r.getLong(0)} ivalue $v outside [$lo, $hi]")
      // grid points are day-aligned
      assert(r.getTimestamp(1).toInstant.toString.endsWith("T00:00:00Z"))
    }
  }

  test("salted join result equals the plain unsalted join, salt in join keys") {
    val salted = Relational.q54SkewJoinSalted(spark, sf)
    val dim = Tables.events(spark, sf).groupBy("user_id")
      .agg(avg("value").as("user_mean"))
    val plain = Tables.events(spark, sf).join(dim, Seq("user_id"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(avg(col("value") - col("user_mean")), 6).as("avg_dev"),
        round(max(abs(col("value") - col("user_mean"))), 6).as("max_dev"))
    val a = salted.collect().map(_.toString).sorted.toSeq
    val b = plain.collect().map(_.toString).sorted.toSeq
    assert(a == b)
    // the salt must actually reach the shuffle: join keys include it
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("salt"), "salt column absent from physical plan")
  }

  test("l-diversity: distinct sensitive values bounded by class size") {
    val rows = Governance.lDiversity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2))
      assert(r.getBoolean(4) == (r.getLong(3) >= 3))
    }
  }

  test("lag features reproduce a driver-side sequence walk") {
    val rows = Features.lagFeatures(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        r.getDouble(4)))
    val events = Tables.events(spark, sf)
      .select("user_id", "event_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(2).getTime, r.getLong(1),
        r.getDouble(3)))
    val expected: Map[(Long, Long), (Option[Double], Option[Double], Double)] =
      events.groupBy(_._1).iterator.flatMap { case (u, es) =>
      val seq = es.sortBy(e => (e._2, e._3))
      seq.zipWithIndex.map { case (e, i) =>
        val lag1 = if (i >= 1) Some(seq(i - 1)._4) else None
        val lag2 = if (i >= 2) Some(seq(i - 2)._4) else None
        val w = seq.slice(math.max(0, i - 2), i + 1).map(_._4)
        (u, e._3) -> (lag1, lag2,
          BigDecimal(w.sum / w.length)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.toMap
    assert(rows.nonEmpty)
    rows.foreach { case (u, eid, l1, l2, ma) =>
      val (e1, e2, ema) = expected((u, eid))
      assert(l1 == e1 && l2 == e2, s"lags mismatch at ($u, $eid)")
      assert(math.abs(ma - ema) < 1e-6, s"ma3 mismatch at ($u, $eid)")
    }
  }

  test("chained-stateful streaming distinct equals batch count-distinct") {
    val streamed = graft.streaming.StreamOps.streamDistinctUsers(spark, sf)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).sortBy(_._1.getTime)
    val batch = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("win_start"))
      .agg(countDistinct("user_id").as("n_users"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).sortBy(_._1.getTime)
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }
}
