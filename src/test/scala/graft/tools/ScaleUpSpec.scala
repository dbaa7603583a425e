package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession.{sf, spark}

/** The scaled fixture is only useful if replication preserves operator
  * structure — these invariants are what SCALE.md's scaling exponents
  * rest on.
  */
class ScaleUpSpec extends AnyFunSuite {

  test("ScaleUp doubles tables with per-replica integrity and disjoint content") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dst = Files.createTempDirectory("graft-sf2x").toString
    ScaleUp.run(spark, sf, dst, 2)

    def cnt(d: String, t: String): Long =
      spark.read.parquet(s"$d/$t.parquet").count()
    // dimensions fixed; everything else exactly ×2
    assert(cnt(dst, "region") === cnt(sf, "region"))
    assert(cnt(dst, "nation") === cnt(sf, "nation"))
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
      "events", "documents", "embeddings"))
      assert(cnt(dst, t) === 2 * cnt(sf, t), s"table $t not doubled")

    // referential integrity holds across the whole scaled fixture
    val orders = spark.read.parquet(s"$dst/orders.parquet")
    val customer = spark.read.parquet(s"$dst/customer.parquet")
    assert(orders.join(customer,
      orders("o_custkey") === customer("c_custkey"), "left_anti").count() === 0,
      "orders reference missing customers")
    val lineitem = spark.read.parquet(s"$dst/lineitem.parquet")
    assert(lineitem.join(orders,
      lineitem("l_orderkey") === orders("o_orderkey"), "left_anti").count() === 0,
      "lineitems reference missing orders")

    // replica documents are DISJOINT in content (suffixed tokens): the
    // distinct-text count doubles — no cross-replica exact duplicates
    val docs = spark.read.parquet(s"$dst/documents.parquet")
    val origDistinct = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").distinct().count()
    assert(docs.select("text").distinct().count() === 2 * origDistinct)

    // replica embeddings are fresh vectors, not coincident copies
    val emb = spark.read.parquet(s"$dst/embeddings.parquet")
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val joined = emb.as("a").join(emb.as("b"),
        col("a.vec_id") + lit(n) === col("b.vec_id"))
      .filter(col("a.embedding") === col("b.embedding"))
    assert(joined.count() === 0, "replica embeddings coincide with originals")

    // single flat file per table — the streaming pathGlobFilter contract
    for (t <- Seq("documents", "events"))
      assert(new java.io.File(s"$dst/$t.parquet").isFile, s"$t not a flat file")

    // events.ts must be a NATIVE timestamp in the scaled fixture (SQL
    // oracles do year/day/interval arithmetic on it directly)
    assert(spark.read.parquet(s"$dst/events.parquet").schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
  }
}
