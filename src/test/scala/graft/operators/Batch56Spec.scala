package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession.{sf, spark}

/** Pin for batch 56: the prefix-sum range join (linear, aggregate-only)
  * equals the match-materializing binned equi-join on the real fixture —
  * exact on the integer count, fp-tolerant on the pre-rounded double sum
  * — and its plan contains no nested-loop join (the binning/prefix
  * machinery must keep everything equi-join shaped).
  */
class Batch56Spec extends AnyFunSuite {

  test("prefix-sum range join == binned range join on the fixture") {
    val binned = Relational.q25RangeJoin(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val prefix = Relational.q25RangeJoinPrefix(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(prefix.keySet === binned.keySet)
    prefix.foreach { case (k, (n, sv)) =>
      val (bn, bsv) = binned(k)
      assert(n === bn, s"count mismatch for supplier $k")
      // the fixture's values are exact micro-units, so the prefix path
      // runs in its FIXED-POINT regime: prefix differences are exact and
      // the only divergence from the binned path is the binned side's own
      // double-sum association error — the rounded cents must be EQUAL
      // (this is what makes the driver's exact-hash gate deterministic)
      assert(sv === bsv, s"sum mismatch for supplier $k: $sv vs $bsv")
    }
  }

  test("prefix-sum range join plan has no nested-loop join") {
    val plan = Relational.q25RangeJoinPrefix(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }
}
