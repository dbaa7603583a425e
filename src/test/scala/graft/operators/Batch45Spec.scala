package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.operators.SparkTestSession.{sf, spark}

/** Pins for batch 45: the theta/KMV overlap sketch estimates track the
  * exact set algebra within the ~1/sqrt(k) theory bound, the sketch is
  * replayable (pure function of the id set), and sub-k groups degrade
  * to EXACT answers.
  */
class Batch45Spec extends AnyFunSuite {

  test("theta overlap estimates track exact union/intersection/Jaccard") {
    val est = Sketches.thetaOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(5), r.getDouble(6), r.getDouble(7))).toMap
    assert(est.nonEmpty)
    val tu = Tables.events(spark, sf)
      .select("event_type", "user_id").distinct().collect()
      .groupBy(_.getString(0)).map { case (t, rs) =>
        t -> rs.map(_.getLong(1)).toSet }
    val k = 256.0
    // theta-sketch relative standard error ~ 1/sqrt(k); allow 4 sigma
    // plus an absolute slack for small intersections
    val tol = 4.0 / math.sqrt(k)
    est.foreach { case ((a, b), (eu, ei, ej)) =>
      val exactU = (tu(a) union tu(b)).size.toDouble
      val exactI = (tu(a) intersect tu(b)).size.toDouble
      assert(math.abs(eu - exactU) <= tol * exactU + 2.0,
        s"($a,$b) union est $eu vs exact $exactU")
      assert(math.abs(ei - exactI) <= tol * exactU + 2.0,
        s"($a,$b) intersect est $ei vs exact $exactI")
      assert(math.abs(ej - exactI / exactU) <= tol + 0.02,
        s"($a,$b) jaccard est $ej vs exact ${exactI / exactU}")
    }
  }

  test("sub-k groups answer EXACTLY (theta = full hash space)") {
    // restrict to a slice where every type has < 256 distinct users:
    // then every sketch is the full distinct hash set and the 'estimates'
    // must equal the exact counts
    import spark.implicits._
    val small = Tables.events(spark, sf).filter(col("user_id") < 100)
    val dir = java.nio.file.Files.createTempDirectory("theta_small").toString
    // write a reduced events fixture the operator can read
    small.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val est = Sketches.thetaOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(5), r.getDouble(6))).toMap
    val tu = small.select("event_type", "user_id").distinct().collect()
      .groupBy(_.getString(0)).map { case (t, rs) =>
        t -> rs.map(_.getLong(1)).toSet }
    est.foreach { case ((a, b), (theta, eu, ei)) =>
      assert(theta == (1L << 60), s"($a,$b) sketch unexpectedly full")
      assert(eu == (tu(a) union tu(b)).size.toDouble)
      assert(ei == (tu(a) intersect tu(b)).size.toDouble)
    }
  }

  test("sketch construction is replayable and order-insensitive") {
    val a = Sketches.thetaOverlap(spark, sf).collect().toSet
    val b = Sketches.thetaOverlap(spark, sf).collect().toSet
    assert(a == b)
  }
}
