package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession.{sf, spark}

class StreamingSpec extends AnyFunSuite {

  test("streaming tumbling agg equals the batch equivalent") {
    import org.apache.spark.sql.functions._
    val streamed = StreamOps.tumblingWindowAgg(spark, sf)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = graft.Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batch)
  }

  test("stream-static join equals the batch decontamination overlap counts") {
    import org.apache.spark.sql.functions._
    val streamed = StreamOps.streamStaticJoin(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.operators.TextOps.decontaminate(spark, sf)
      .filter(col("contaminated"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming sessions are a subset of batch sessions; only tail sessions withheld") {
    val batch = Sessionize.batch(spark, sf)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3))).toSet
    val streamed = Sessionize.streaming(spark, sf)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3))).toSet
    assert(streamed.subsetOf(batch),
      s"streaming emitted sessions not found in batch: ${streamed.diff(batch).take(3)}")
    // the stream withholds at most one open session per user at EOF
    val users = graft.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(batch.size - streamed.size <= users)
    assert(streamed.nonEmpty)
  }
}
