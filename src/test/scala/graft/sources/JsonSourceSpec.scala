package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession.{sf, spark}

class JsonSourceSpec extends AnyFunSuite {

  test("JSONL write/read roundtrips the documents table exactly") {
    val dir = Files.createTempDirectory("graft-jsonl").toString + "/docs"
    val docs = graft.Tables.documents(spark, sf)
    JsonSource.write(docs, dir, partitions = 3)
    val back = JsonSource.read(spark, docs.schema, Seq(dir))
    assert(back.schema === docs.schema)
    val a = docs.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = back.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a === b)
    // shard layout: the writer produced the requested split count
    assert(new java.io.File(dir).list().count(_.startsWith("part-")) === 3)
  }

  test("explicit-schema read prunes columns and needs no inference pass") {
    val dir = Files.createTempDirectory("graft-jsonl2").toString + "/docs"
    val docs = graft.Tables.documents(spark, sf)
    JsonSource.write(docs, dir)
    val projected = JsonSource.read(spark, docs.schema, Seq(dir))
      .select("doc_id", "lang")
    val readSchema = projected.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && !readSchema.contains("text"),
      s"json scan did not prune: $readSchema")
    assert(projected.count() === docs.count())
  }

  test("ORC roundtrips exactly and pushes filters to the scan") {
    // ORC is the second columnar format Spark ships natively (the avro
    // CONNECTOR is absent offline — format breadth stops at what the
    // runtime genuinely provides)
    val dir = Files.createTempDirectory("graft-orc").toString + "/lineitem"
    val li = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_quantity")
    li.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema === li.schema)
    assert(back.count() === li.count())
    val filtered = back.filter(col("l_quantity") > 25.0)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"),
      s"orc scan did not push the filter: ${plan.take(1200)}")
    assert(filtered.count() === li.filter(col("l_quantity") > 25.0).count())
  }

  test("FAILFAST surfaces corrupt lines; PERMISSIVE tolerates them") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-jsonl3").toString
    val f = new java.io.File(dir, "bad.jsonl")
    val w = new java.io.PrintWriter(f)
    w.println("""{"doc_id": 1, "lang": "en"}""")
    w.println("""{"doc_id": oops""")
    w.close()
    val schema = Seq((1L, "en")).toDF("doc_id", "lang").schema
    val permissive = JsonSource.read(spark, schema, Seq(f.getPath)).collect()
    assert(permissive.length === 2) // corrupt row nulls out, scan survives
    assertThrows[org.apache.spark.SparkException] {
      JsonSource.read(spark, schema, Seq(f.getPath), mode = "FAILFAST").collect()
    }
  }
}
