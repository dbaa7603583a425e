package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.operators.SparkTestSession.{sf, spark}

/** Pins for batch 50: the Q4 exists-shape decorrelates to a semi join
  * (one row per order however many lines are late), and snapshot expiry
  * deletes exactly the unshared files while the retained version
  * re-reads whole from disk.
  */
class Batch50Spec extends AnyFunSuite {

  private def planOf(df: DataFrame): String = {
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    df.queryExecution.executedPlan.toString
  }

  test("q66 plans a LEFT SEMI join with the late-date residual riding it") {
    val p = planOf(Relational.q66OrderPriority(spark, sf))
    assert(p.contains("LeftSemi"), s"expected semi join:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("q66 counts each order once regardless of its late-line count") {
    val totalInWindow = Tables.orders(spark, sf)
      .filter(col("o_orderdate").cast("date") >= lit("1997-01-01").cast("date") &&
        col("o_orderdate").cast("date") < lit("1997-04-01").cast("date"))
      .count()
    val late = Relational.q66OrderPriority(spark, sf).collect()
      .map(_.getLong(1)).sum
    assert(late > 0 && late <= totalInWindow)
  }

  test("snapshot expiry: set-algebra file accounting and live re-read") {
    val rows = Lake.snapshotExpire(spark, sf).collect()
      .map(r => r.getInt(0) ->
        ((r.getBoolean(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    assert(rows.keySet == Set(1, 2, 3))
    val (k1, f1, s1, a1) = rows(1)
    val (k2, f2, s2, a2) = rows(2)
    val (k3, f3, s3, a3) = rows(3)
    assert(!k1 && !k2 && k3)
    // append shares v1's files (v2 references both generations); the COW
    // rewrite shares nothing, so every expired file is safe
    assert(f1 == 4L && s1 == 4L)
    assert(f2 == 8L && s2 == 8L)
    assert(f3 == 4L && s3 == 0L)
    assert(a1.isEmpty && a2.isEmpty)
    // the retained version re-read AFTER deletion equals the full table
    assert(a3.contains(Tables.documents(spark, sf).count()))
  }
}
