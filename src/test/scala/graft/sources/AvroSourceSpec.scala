package graft.sources

import java.io.File
import java.nio.ByteBuffer
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord, GenericRecordBuilder}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession.spark

class AvroSourceSpec extends AnyFunSuite {

  private def writeAvro(dir: File, name: String, schema: Schema,
                        records: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new File(dir, name))
    records.foreach(w.append)
    w.close()
  }

  private val schema: Schema = SchemaBuilder.record("Doc").fields()
    .requiredLong("id")
    .requiredString("text")
    .requiredDouble("score")
    .requiredBoolean("kept")
    .optionalInt("rank")
    .name("payload").`type`().bytesType().noDefault()
    .name("tags").`type`().array().items().stringType().noDefault()
    .endRecord()

  private def rec(id: Long, text: String, score: Double, kept: Boolean,
                  rank: java.lang.Integer, payload: Array[Byte],
                  tags: Seq[String]): GenericRecord =
    new GenericRecordBuilder(schema)
      .set("id", id).set("text", text).set("score", score).set("kept", kept)
      .set("rank", rank).set("payload", ByteBuffer.wrap(payload))
      .set("tags", new GenericData.Array(
        schema.getField("tags").schema(), tags.asJava))
      .build()

  test("reads primitives, nullable union, bytes, and arrays round-trip") {
    val dir = Files.createTempDirectory("graft_avro").toFile
    writeAvro(dir, "part-0.avro", schema, Seq(
      rec(1L, "alpha", 0.5, true, 7, Array[Byte](1, 2, 3), Seq("a", "b")),
      rec(2L, "beta", -1.25, false, null, Array[Byte](), Seq())))

    val df = AvroSource.read(spark, dir.toString)
    // schema mapping: names, types, nullability of the union field
    val f = df.schema.fields.map(x => x.name -> x).toMap
    assert(f("id").dataType.typeName == "long")
    assert(f("text").dataType.typeName == "string")
    assert(f("rank").nullable)
    assert(f("payload").dataType.typeName == "binary")
    assert(f("tags").dataType.typeName == "array")

    val rows = df.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "alpha")
    assert(rows(0).getDouble(2) == 0.5 && rows(0).getBoolean(3))
    assert(rows(0).getInt(4) == 7)
    assert(rows(0).getAs[Array[Byte]](5).toSeq == Seq[Byte](1, 2, 3))
    assert(rows(0).getSeq[String](6) == Seq("a", "b"))
    assert(rows(1).isNullAt(4), "missing rank must surface as null")
    assert(rows(1).getAs[Array[Byte]](5).isEmpty)
  }

  test("reads a multi-file directory as one table and supports SQL over it") {
    val dir = Files.createTempDirectory("graft_avro_multi").toFile
    writeAvro(dir, "part-0.avro", schema,
      (1L to 50L).map(i => rec(i, s"doc $i", i * 0.1, i % 2 == 0, i.toInt,
        Array[Byte](i.toByte), Seq(s"t${i % 3}"))))
    writeAvro(dir, "part-1.avro", schema,
      (51L to 80L).map(i => rec(i, s"doc $i", i * 0.1, i % 2 == 0, i.toInt,
        Array[Byte](i.toByte), Seq(s"t${i % 3}"))))

    val df = AvroSource.read(spark, dir.toString)
    assert(df.count() == 80)
    // the frame is a first-class citizen: aggregates/filters compose
    val kept = df.filter(org.apache.spark.sql.functions.col("kept")).count()
    assert(kept == 40)
    df.createOrReplaceTempView("avro_docs")
    val n = spark.sql(
      "SELECT count(*) FROM avro_docs WHERE score > 4.0").collect()(0).getLong(0)
    assert(n == 40)
  }

  test("unsupported avro shapes fail fast with the field named") {
    val bad = SchemaBuilder.record("Bad").fields()
      .name("m").`type`().map().values().stringType().noDefault()
      .endRecord()
    val e = intercept[IllegalArgumentException] {
      AvroSource.sparkSchema(bad)
    }
    assert(e.getMessage.contains("m"))
  }
}
