package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.operators.SparkTestSession.{sf, spark}

/** Pin for batch 55: the distributed BPE trainer's window-algebra merge
  * application equals a SEQUENTIAL reference implementation (the
  * left-to-right greedy scan the islands-parity trick replaces), round
  * by round, on the real fixture corpus.
  */
class Batch55Spec extends AnyFunSuite {

  /** Reference trainer: plain sequential greedy merging on the driver. */
  private def referenceTrain(rounds: Int): Seq[(Int, String, String, Long, Long)] = {
    var docs: Array[Array[String]] = Tables.documents(spark, sf)
      .select(lower(col("text"))).collect()
      .map(_.getString(0).trim.split("\\s+").filter(_.nonEmpty))
    val out = Seq.newBuilder[(Int, String, String, Long, Long)]
    for (r <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      docs.foreach { d =>
        var i = 0
        while (i < d.length - 1) {
          counts((d(i), d(i + 1))) = counts.getOrElse((d(i), d(i + 1)), 0L) + 1
          i += 1
        }
      }
      val ((a, b), c) = counts.toSeq
        .sortBy { case ((x, y), n) => (-n, x, y) }.head
      docs = docs.map { d =>
        val nb = Array.newBuilder[String]
        var i = 0
        while (i < d.length) {
          if (i < d.length - 1 && d(i) == a && d(i + 1) == b) {
            nb += s"${a}_$b"; i += 2 // greedy: consume both, no overlap
          } else { nb += d(i); i += 1 }
        }
        nb.result()
      }
      out += ((r, a, b, c, docs.map(_.length.toLong).sum))
    }
    out.result()
  }

  test("distributed islands-parity application == sequential greedy scan") {
    val got = Features.bpeTrain(spark, sf, rounds = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    val expected = referenceTrain(3)
    assert(got == expected,
      s"distributed $got\nreference  $expected")
  }
}
