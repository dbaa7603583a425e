package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.operators.SparkTestSession.{sf, spark}

/** Pins for batch 44: the classic-warehouse subquery shapes (q61–q65)
  * keep the plans we'd want at 100 TB — dimension sides broadcast, the
  * fact spine shuffles at most once, top-k never globally sorts, the
  * decorrelated Q17 window touches the fact table exactly once — and the
  * data-quality family's checks are one conditional-sum scan per table
  * whose results cross-check against direct recomputation.
  */
class Batch44Spec extends AnyFunSuite {

  private def planOf(df: DataFrame): String = {
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    df.queryExecution.executedPlan.toString
  }

  private def lineitemScans(p: String): Int =
    "lineitem\\.parquet".r.findAllIn(p).length

  test("q62 broadcasts the having-filtered order keys; top-100 is TakeOrdered") {
    val p = planOf(Relational.q62BigSpenders(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n${p.take(1200)}")
    assert(p.contains("TakeOrderedAndProject"), "top-100 must not global-sort")
    assert(!p.contains("CartesianProduct"))
  }

  test("q63 pushes the return-flag and date predicates into the scans") {
    val p = planOf(Relational.q63ReturnedItems(spark, sf))
    assert(p.contains("EqualTo(l_returnflag,R)") ||
      p.contains("l_returnflag), EqualTo(l_returnflag,R"),
      s"return-flag not pushed:\n${p.take(2000)}")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q64 decorrelates to ONE lineitem scan (window, not join-back)") {
    val p = planOf(Relational.q64SmallQtyRevenue(spark, sf))
    assert(lineitemScans(p) == 1,
      s"expected exactly one lineitem scan, plan:\n${p.take(2000)}")
    assert(p.contains("Window"), "per-part avg must be a window aggregate")
  }

  test("q64 window value equals the join-back formulation") {
    val brandParts = Tables.part(spark, sf)
      .filter(col("p_brand") === "Brand#9").select("p_partkey")
    val li = Tables.lineitem(spark, sf)
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val avgs = li.groupBy("l_partkey").agg(avg("l_quantity").as("aq"))
    val expected = li.join(avgs, "l_partkey")
      .filter(col("l_quantity") < col("aq") * 0.5)
      .agg(round(sum("l_extendedprice") / 7.0, 2)).collect()(0).getDouble(0)
    val got = Relational.q64SmallQtyRevenue(spark, sf)
      .collect()(0).getDouble(0)
    assert(got == expected, s"window=$got joinBack=$expected")
  }

  test("q65 finds the max-revenue supplier without a global window sort") {
    val p = planOf(Relational.q65TopSupplier(spark, sf))
    assert(!p.contains("Window"), "scalar max must not be a window pass")
    val rows = Relational.q65TopSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getDouble(2)).distinct
    assert(revs.length == 1, "all returned suppliers tie at the max")
  }

  test("q61 share arithmetic: nation_rev <= total_rev, share in [0,1]") {
    val rows = Relational.q61MarketShare(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nat, tot, share) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(nat >= 0.0 && nat <= tot)
      assert(share >= 0.0 && share <= 1.0)
      assert(math.abs(share - nat / tot) < 1e-5)
    }
  }

  test("dq_constraints avoids the distinct Expand and cross-checks recomputation") {
    val p = planOf(DataQuality.constraints(spark, sf))
    // two scans per table BY DESIGN (r7): the conditional sums and the
    // key-uniqueness distinct run as separate aggregates — folding them
    // into one made Catalyst plan an Expand that doubled every fact row
    // through the shuffle. The split plan must contain no Expand at all.
    assert(lineitemScans(p) == 2,
      s"constraint suite should split sums + distinct scans:\n${p.take(2000)}")
    assert(!p.contains("Expand"),
      s"mixed distinct aggregate reintroduced an Expand:\n${p.take(2000)}")
    val got = DataQuality.constraints(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size == 10)
    val li = Tables.lineitem(spark, sf)
    val expectedPkDups = li.count() -
      li.select("l_orderkey", "l_linenumber").distinct().count()
    assert(got("lineitem.pk_unique") == expectedPkDups)
    // the fixture's domains and ranges are clean; the suite must say so
    assert(got("lineitem.discount_in_[0,1]") == 0L)
    assert(got("lineitem.returnflag_domain") == 0L)
    assert(got("orders.pk_unique") == 0L)
  }

  test("dq_referential aggregates fact keys before the anti-join and finds no orphans") {
    val p = planOf(DataQuality.referential(spark, sf))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop") ||
      p.contains("broadcast"), "dimension key sets must broadcast")
    val rows = DataQuality.referential(spark, sf).collect()
    assert(rows.length == 7)
    // the star fixture is referentially closed — every edge audits clean
    rows.foreach { r =>
      assert(r.getLong(1) == 0L, s"edge ${r.getString(0)} orphan rows")
      assert(r.getLong(2) == 0L, s"edge ${r.getString(0)} orphan keys")
    }
  }

  test("dq_profile covers every lineitem column with exact cardinalities") {
    val rows = DataQuality.profile(spark, sf).collect()
    val byCol = rows.map(r => r.getString(0) -> r).toMap
    assert(byCol.size == Tables.lineitem(spark, sf).schema.size)
    val li = Tables.lineitem(spark, sf)
    val n = li.count()
    rows.foreach { r => assert(r.getLong(1) == n) }
    assert(byCol("l_returnflag").getLong(4) == 3L) // R/A/N
    assert(byCol("l_orderkey").getLong(4) ==
      li.select("l_orderkey").distinct().count())
    // numeric range lands; string/timestamp columns carry NULL range
    assert(!byCol("l_discount").isNullAt(5))
    assert(byCol("l_returnflag").isNullAt(5))
    // approx mode: same shape, cardinalities within HLL error
    val approx = DataQuality.profile(spark, sf, approxCardinality = true)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    approx.foreach { case (c, est) =>
      val exact = byCol(c).getLong(4)
      assert(math.abs(est - exact) <= math.max(2.0, 0.1 * exact),
        s"$c approx $est vs exact $exact")
    }
  }
}
