package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession.{sf, spark}

class SegmentSourceSpec extends AnyFunSuite {

  private def withSegments[T](nFiles: Int)(f: java.nio.file.Path => T): T = {
    val dir = Files.createTempDirectory("graft_segspec_")
    try {
      SegmentSource.write(
        graft.Tables.documents(spark, sf).select("doc_id", "text"), dir, nFiles)
      f(dir)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("stats pruning skips non-intersecting files and stays sound") {
    withSegments(8) { dir =>
      val seg = spark.read.format("graft-segments").load(dir.toString)
      val full = seg.count()
      val docs = graft.Tables.documents(spark, sf)
      assert(full === docs.count())
      // a tight range must plan FEWER partitions than files on disk
      val lo = full / 4
      val hi = full / 2
      val got = seg.filter(col("doc_id") >= lo && col("doc_id") <= hi)
        .agg(count(lit(1)), sum(length(col("text")))).collect()(0)
      val (total, survivors) = SegmentSource.lastPlanned.get()
      assert(total === 8)
      assert(survivors < total, s"no files pruned: $survivors/$total")
      // soundness: identical to the parquet-side answer
      val exp = docs.filter(col("doc_id") >= lo && col("doc_id") <= hi)
        .agg(count(lit(1)), sum(length(col("text")))).collect()(0)
      assert(got === exp)
    }
  }

  test("column pruning reaches the reader; text survives a TSV round-trip") {
    withSegments(4) { dir =>
      val seg = spark.read.format("graft-segments").load(dir.toString)
      val plan = seg.select("doc_id").queryExecution.executedPlan.toString
      assert(plan.contains("columns=[doc_id]"), plan.take(1500))
      // full-fidelity round-trip including the escaped characters
      val back = seg.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      val orig = graft.Tables.documents(spark, sf)
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
        .sortBy(_._1)
      assert(back.toSeq === orig.toSeq)
    }
  }

  test("streaming source ingests each generation exactly once across a restart") {
    val inDir = Files.createTempDirectory("graft_segst_in_")
    val outDir = Files.createTempDirectory("graft_segst_out_").toString + "/out"
    val ckpt = Files.createTempDirectory("graft_segst_ckpt_").toString
    try {
      val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
      def commitGen(slice: org.apache.spark.sql.DataFrame): Unit =
        slice.repartitionByRange(3, col("doc_id"))
          .sortWithinPartitions("doc_id")
          .write.format("graft-segments").mode("append").save(inDir.toString)
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      def drain(): Unit = {
        val q = ss.readStream.format("graft-segments").load(inDir.toString)
          .writeStream.format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      commitGen(docs.filter(col("doc_id") % 2 === 0))
      drain() // restart boundary: the checkpointed GENERATION offset
      commitGen(docs.filter(col("doc_id") % 2 =!= 0))
      drain()
      val out = ss.read.parquet(outDir).select("doc_id")
        .collect().map(_.getLong(0))
      assert(out.length === out.distinct.length,
        "a generation was ingested twice")
      assert(out.length.toLong === docs.count(), "a generation was dropped")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(inDir.toFile)
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(outDir).getParentFile)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    }
  }

  test("escape round-trips tabs, newlines, carriage returns, backslashes") {
    for (s <- Seq("a\tb", "line1\nline2", "back\\slash", "mix\\t\t\n\\n", "",
        "cr\rlf", "crlf\r\n", "\r", "trail\r"))
      assert(SegmentSource.unescape(SegmentSource.escape(s)) === s)
  }

  test("carriage-return text survives the connector round-trip") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_seg_cr_")
    try {
      val rows = Seq((1L, "dos\r\nline"), (2L, "bare\rcr"), (3L, "plain"))
      rows.toDF("doc_id", "text").repartition(1)
        .write.format("graft-segments").mode("append").save(dir.toString)
      val back = spark.read.format("graft-segments").load(dir.toString)
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      assert(back.toSeq === rows)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
