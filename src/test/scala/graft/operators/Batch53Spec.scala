package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession.{sf, spark}

/** Pin for batch 53: the Q7 trade-volume join keeps every dimension on
  * the broadcast side — the fact spine is the only shuffled join.
  */
class Batch53Spec extends AnyFunSuite {

  private def planOf(df: DataFrame): String = {
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("q67 broadcasts all dimensions; one shuffled spine join") {
    val p = planOf(Relational.q67TradeVolume(spark, sf))
    assert(!p.contains("CartesianProduct"))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, got $broadcasts")
    val shuffled = "SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).length
    assert(shuffled <= 1, s"more than one shuffled join:\n${p.take(2000)}")
  }

  test("q67 output is cross-border only, confined to the named pair") {
    val rows = Relational.q67TradeVolume(spark, sf).collect()
    assert(rows.nonEmpty)
    val pair = Set("NATION_13", "NATION_19")
    rows.foreach { r =>
      assert(r.getString(0) != r.getString(1), "domestic row leaked")
      assert(pair(r.getString(0)) && pair(r.getString(1)))
    }
    val dirs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(dirs.contains(("NATION_13", "NATION_19")) &&
      dirs.contains(("NATION_19", "NATION_13")), "bilateral flow missing")
  }
}
