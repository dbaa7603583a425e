package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.SparkTestSession.spark

class MinHashAggSpec extends AnyFunSuite {

  test("graft_minhash equals the per-permutation min of permutedHash columns") {
    MinHashAgg.register(spark, 8)
    import spark.implicits._
    val df = Seq((1L, 11L), (1L, 22L), (1L, -33L), (2L, 44L), (2L, Long.MinValue + 7))
      .toDF("id", "tok")
    val viaAgg = df.groupBy("id")
      .agg(call_function("graft_minhash", col("tok")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val mins = TextFunctions.permCoeffs(8)
      .map(c => min(TextFunctions.permutedHash(col("tok"), c)))
    val viaCols = df.groupBy("id")
      .agg(array(mins: _*).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaAgg === viaCols)
    assert(viaAgg(1L).length === 8)
  }

  test("graft_minhash signatures agree across partition counts (merge path)") {
    MinHashAgg.register(spark, 8)
    import spark.implicits._
    val rows = (1 to 500).map(i => ((i % 7).toLong, i * 2654435761L))
    val one = rows.toDF("id", "tok").repartition(1).groupBy("id")
      .agg(call_function("graft_minhash", col("tok")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val many = rows.toDF("id", "tok").repartition(13).groupBy("id")
      .agg(call_function("graft_minhash", col("tok")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(one === many)
  }
}
