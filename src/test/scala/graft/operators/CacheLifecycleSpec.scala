package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.GraftSqlShims
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the stacked-lazy-checkpoint contract (r11 ADVICE, medium):
  * RDD.doCheckpoint stops at the first marked RDD unless
  * spark.checkpoint.checkpointAllMarkedAncestors is set on the
  * constructing thread, so a covering action over a lazy checkpoint
  * derived from another lazy checkpoint must still finalize BOTH —
  * otherwise the ancestor's lineage never truncates and releasing its
  * upstream blocks turns block loss into a hard failure.
  */
class CacheLifecycleSpec extends AnyFunSuite {
  import SparkTestSession._

  private def checkpointRdd(df: DataFrame) =
    GraftSqlShims.analyzed(df).collectFirst {
      case lr: LogicalRDD => lr.rdd
    }.getOrElse(fail("no LogicalRDD under a localCheckpoint'ed frame"))

  test("control: without the ancestors flag, only the top of a lazy stack finalizes") {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.checkpoint.checkpointAllMarkedAncestors")
    sc.setLocalProperty("spark.checkpoint.checkpointAllMarkedAncestors", "false")
    try {
      val base = spark.range(64).select(col("id"), (col("id") * 2).as("x"))
      val a = base.localCheckpoint(eager = false,
        storageLevel = org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val b = a.select(col("id"), (col("x") + 1).as("y")).localCheckpoint(
        eager = false,
        storageLevel = org.apache.spark.storage.StorageLevel.DISK_ONLY)
      assert(b.count() === 64)
      val (aRdd, bRdd) = (checkpointRdd(a), checkpointRdd(b))
      assert(bRdd.isCheckpointed, "covering action must finalize the top frame")
      assert(!aRdd.isCheckpointed,
        "Spark contract this spec guards against: doCheckpoint stops at the " +
          "first marked RDD — if this starts passing, the default changed " +
          "and markAllAncestors may be droppable")
      CacheLifecycle.release(b); CacheLifecycle.release(a)
    } finally sc.setLocalProperty(
      "spark.checkpoint.checkpointAllMarkedAncestors", prev)
  }

  test("roundCheckpointLazy: two stacked lazy rounds both finalize at one covering action") {
    val base = spark.range(64).select(col("id"), (col("id") * 3).as("x"))
    val a = CacheLifecycle.roundCheckpointLazy(base)
    val b = CacheLifecycle.roundCheckpointLazy(
      a.select(col("id"), (col("x") + 1).as("y")))
    assert(b.count() === 64)
    val (aRdd, bRdd) = (checkpointRdd(a), checkpointRdd(b))
    assert(bRdd.isCheckpointed)
    assert(aRdd.isCheckpointed,
      "ancestor lazy round checkpoint must finalize under the same action")
    // both finalized → both releasable without dangling-lineage hazards
    CacheLifecycle.release(b); CacheLifecycle.release(a)
  }
}
