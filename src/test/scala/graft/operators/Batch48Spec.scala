package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.operators.SparkTestSession.{sf, spark}

/** Pins for batch 48: scene-cut detection replays from a driver-side
  * recomputation of the frame-energy grid, and the cut set is exactly
  * the above-threshold lag deltas.
  */
class Batch48Spec extends AnyFunSuite {

  private def energiesOf(text: String, nFrames: Int = 16,
                         frameBytes: Int = 16): Array[Int] = {
    val bytes = text.getBytes("UTF-8")
    Array.tabulate(nFrames) { i =>
      val off = (bytes.length.toLong * i / nFrames).toInt
      val end = math.min(off + frameBytes, bytes.length)
      (off until end).map(bytes(_) & 0xFF).sum
    }
  }

  test("scene cuts equal the driver-recomputed energy-jump set") {
    val tau = 150
    val got = Multimodal.sceneCuts(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getInt(2), r.getInt(3)))
      .toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val expected = docs.flatMap { case (id, text) =>
      val e = energiesOf(text)
      (1 until e.length).collect {
        case i if math.abs(e(i) - e(i - 1)) > tau =>
          (id, i) -> (e(i), e(i) - e(i - 1))
      }
    }.toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("frame fan-out happens after the kernel: one UDF call per payload") {
    // the plan must evaluate the energy kernel on the payload row and
    // posexplode its result — never explode first and re-hash per frame
    val p = Multimodal.sceneCuts(spark, sf).queryExecution
      .optimizedPlan.toString
    assert(p.contains("Generate"), "expected a posexplode Generate node")
    val generateLine = p.linesIterator.find(_.contains("Generate")).get
    assert(generateLine.toLowerCase.contains("posexplode"))
  }
}
