package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession.spark

class SourcesSpec extends AnyFunSuite {

  test("JDBC table sink + source round-trip (embedded Derby)") {
    val dbDir = Files.createTempDirectory("graft-jdbc")
      .resolve("tablesdb").toString
    val url = s"jdbc:derby:$dbDir;create=true"
    val agg = graft.Tables.events(spark, graft.operators.SparkTestSession.sf)
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
    agg.write.mode("overwrite").jdbc(url, "event_counts", new java.util.Properties)
    val back = spark.read.jdbc(url, "event_counts", new java.util.Properties)
    assert(back.columns.toSet === Set("event_type", "cnt"))
    val a = agg.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = back.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a === b)
  }

  private def tmpDir = Files.createTempDirectory("graft-csv").toString

  test("S1: headerless CSV with full schema, multi-file union, nrows, gzip") {
    val dir = tmpDir
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.csv"),
      "1,x,2020-01-01 00:00:00\n2,y,2020-01-02 12:30:00\n")
    // gzip member (compression inferred from extension)
    val gz = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$dir/b.csv.gz"))
    gz.write("3,z,2021-06-15 08:00:00\n".getBytes)
    gz.close()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("tag", StringType),
      StructField("ts", TimestampType)))
    val df = CsvSource.readFull(spark, schema,
      Seq(s"$dir/a.csv", s"$dir/b.csv.gz"))
    assert(df.count() === 3)
    assert(df.schema === schema)
    assert(df.filter(year(col("ts")) === 2021).count() === 1)
    assert(CsvSource.readFull(spark, schema, Seq(s"$dir/a.csv"),
      nrows = Some(1)).count() === 1)
  }

  test("S3: header + partial schema casts declared columns, infers the rest") {
    val dir = tmpDir
    Files.writeString(java.nio.file.Paths.get(s"$dir/h.csv"),
      "id,price,note\n1,2.5,hello\n2,3.5,world\n")
    val partial = StructType(Seq(StructField("price", FloatType)))
    val df = CsvSource.readPartial(spark, partial, Seq(s"$dir/h.csv"))
    assert(df.schema("price").dataType === FloatType)
    assert(df.schema("id").dataType === IntegerType) // inferred
    assert(df.count() === 2)
  }

  test("S4: skipRows drops the first N rows in file order") {
    val dir = tmpDir
    Files.writeString(java.nio.file.Paths.get(s"$dir/s.csv"),
      (1 to 100).map(i => s"$i").mkString("\n"))
    val schema = StructType(Seq(StructField("id", IntegerType)))
    val df = CsvSource.readFull(spark, schema, Seq(s"$dir/s.csv"))
    val skipped = CsvSource.skipRows(df, 40)
    assert(skipped.count() === 60)
    assert(skipped.agg(min("id")).collect()(0).getInt(0) === 41)
  }

  test("S5: unionByName aligns differing column sets") {
    import spark.implicits._
    val a = Seq((1, "x")).toDF("id", "tag")
    val b = Seq((2, 9.5)).toDF("id", "score")
    val u = CsvSource.unionByName(Seq(a, b))
    assert(u.columns.toSet === Set("id", "tag", "score"))
    assert(u.count() === 2)
  }
}
