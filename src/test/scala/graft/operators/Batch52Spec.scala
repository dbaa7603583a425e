package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.functions.TextFunctions.tokens
import graft.operators.SparkTestSession.{sf, spark}

/** Pins for batches 51-52: the streaming DQ monitor equals the batch
  * check suite per window; the Heaps curve is monotone and exact at its
  * endpoints; the Zipf fit behaves like a frequency law should.
  */
class Batch52Spec extends AnyFunSuite {

  test("stream_dq_monitor equals the batch conditional-sum suite per window") {
    val streamed = graft.streaming.StreamOps.streamingDqMonitor(spark, sf)
      .collect().map(r => r.getTimestamp(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getBoolean(6))).toMap
    val batch = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("w"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("c1"),
        sum(when(col("value") <= 0.0 || col("value") > 1000.0, 1L)
          .otherwise(0L)).as("c2"),
        sum(when(!col("event_type").isin(
          "click", "view", "signup", "purchase", "error"), 1L)
          .otherwise(0L)).as("c3"),
        sum(when(col("user_id").isNull || col("user_id") < 0L, 1L)
          .otherwise(0L)).as("c4"))
      .collect().map(r => r.getTimestamp(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(streamed.nonEmpty && streamed.keySet == batch.keySet)
    streamed.foreach { case (w, (n, c1, c2, c3, c4, clear)) =>
      assert((n, c1, c2, c3, c4) == batch(w))
      assert(clear == (c1 + c2 + c3 + c4 == 0L))
    }
  }

  test("vocab growth is monotone and exact at the endpoints") {
    val rows = TextOps.vocabGrowth(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.length == 4)
    rows.sliding(2).foreach { case Array((_, t1, v1), (_, t2, v2)) =>
      assert(t2 >= t1 && v2 >= v1, "curve must be monotone")
    }
    // last checkpoint exceeds the corpus size → exact totals
    val docs = Tables.documents(spark, sf)
    val totalTokens = docs.select(sum(size(tokens(lower(col("text"))))))
      .collect()(0).getLong(0)
    val totalVocab = docs
      .select(explode(tokens(lower(col("text")))).as("t"))
      .select(countDistinct("t")).collect()(0).getLong(0)
    val last = rows.last
    assert(last._2 == totalTokens && last._3 == totalVocab)
  }

  test("zipf fit: negative slope, bounded magnitude, n = topR") {
    val r = TextOps.zipfSlope(spark, sf).collect()(0)
    assert(r.getLong(0) > 0)
    val slope = r.getDouble(1)
    assert(slope < 0.0, s"rank-frequency slope must be negative: $slope")
    assert(slope > -5.0, s"implausible slope: $slope")
  }
}
