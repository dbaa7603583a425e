package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession.{sf, spark}

class CountMinAggSpec extends AnyFunSuite {

  test("CMS estimates dominate exact counts and stay inside the ε bound") {
    CountMinAgg.register(spark)
    val terms = graft.Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.tokens(lower(col("text"))))
        .as("term"))
      .select(col("term"), xxhash64(col("term")).as("h"))
    // distributed build: sketch merged across shuffle partitions
    val sketch = terms.agg(call_function("graft_cms", col("h")))
      .collect()(0).getSeq[Long](0).toArray
    val exact = terms.groupBy("term", "h").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val n = exact.map(_._2).sum
    assert(exact.nonEmpty)
    exact.foreach { case (h, cnt) =>
      val est = CountMinAgg.estimate(sketch, h)
      assert(est >= cnt, s"CMS underestimated: $est < $cnt") // hard guarantee
      // ε ≈ e/width; generous 4·N/width band (fixture vocab ≪ width, so
      // collisions are rare and est is usually exact)
      assert(est - cnt <= math.max(4L * n / CountMinAgg.DefaultWidth, 2L),
        s"CMS overestimate out of band: $est vs $cnt (N=$n)")
    }
    // total mass per sketch row equals the stream length
    (0 until CountMinAgg.DefaultDepth).foreach { r =>
      val rowSum = sketch.slice(r * CountMinAgg.DefaultWidth,
        (r + 1) * CountMinAgg.DefaultWidth).sum
      assert(rowSum === n, s"row $r mass $rowSum != $n")
    }
  }

  test("streaming sketch equals the batch sketch when the source drains") {
    CountMinAgg.register(spark)
    val batch = graft.Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.tokens(lower(col("text"))))
        .as("term"))
      .select(xxhash64(col("term")).as("h"))
      .agg(call_function("graft_cms", col("h")))
      .collect()(0).getSeq[Long](0).toArray
    val streamed = graft.streaming.StreamOps.streamingSketch(spark, sf)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("merge associativity: partitioned build equals single-partition build") {
    CountMinAgg.register(spark)
    val terms = graft.Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
      .select(xxhash64(col("term")).as("h"))
    val many = terms.repartition(7).agg(call_function("graft_cms", col("h")))
      .collect()(0).getSeq[Long](0)
    val one = terms.coalesce(1).agg(call_function("graft_cms", col("h")))
      .collect()(0).getSeq[Long](0)
    assert(many === one)
  }
}
