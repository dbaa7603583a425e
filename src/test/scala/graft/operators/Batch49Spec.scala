package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession.{sf, spark}

/** Pins for batch 49: the Matryoshka truncation-recall evaluation is
  * self-validating at the full dimension and bounded everywhere.
  */
class Batch49Spec extends AnyFunSuite {

  test("full-dimension arm reports recall 1.0 by construction") {
    val rows = Similarity.matryoshkaRecall(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.contains(64))
    assert(rows(64)._2 == 1.0, s"full-dim recall ${rows(64)._2}")
    assert(rows(64)._1 == 50L) // numQueries * k survivors
    rows.foreach { case (d, (hits, rec)) =>
      assert(hits >= 0L && hits <= 50L, s"dim $d hits $hits")
      assert(rec >= 0.0 && rec <= 1.0, s"dim $d recall $rec")
    }
  }

  test("prefix arms rank by genuinely truncated vectors (recall < 1 here)") {
    // the fixture's vectors are near-uniform: an 8-of-64 prefix carries
    // little of the cosine signal, so truncation must actually bite —
    // a 1.0 recall at dim 8 would mean the arm silently ranked full-dim
    val rows = Similarity.matryoshkaRecall(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(rows(8) < 1.0)
  }
}
