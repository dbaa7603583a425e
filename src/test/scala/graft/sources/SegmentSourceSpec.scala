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

  test("escape round-trips tabs, newlines, and backslashes") {
    for (s <- Seq("a\tb", "line1\nline2", "back\\slash", "mix\\t\t\n\\n", ""))
      assert(SegmentSource.unescape(SegmentSource.escape(s)) === s)
  }
}
