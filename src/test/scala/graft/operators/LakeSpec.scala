package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Transaction-log table semantics: version isolation, atomic publish
  * artifacts, carry-forward file reuse, and merged-schema reads.
  */
class LakeSpec extends AnyFunSuite {
  import SparkTestSession._

  test("time travel: v1 reads its original rows after the v2 upsert") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft_lake_spec_")
    try {
      val v1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("k", "v")
      Lake.commit(v1, table, 1)
      val v2 = Lake.readVersion(spark, table, 1)
        .filter(col("k") =!= 2).unionByName(Seq((2L, "BETA2")).toDF("k", "v"))
      Lake.commit(v2, table, 2)
      val r1 = Lake.readVersion(spark, table, 1).orderBy("k").collect()
      assert(r1.map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
      val r2 = Lake.readVersion(spark, table, 2).orderBy("k").collect()
      assert(r2.map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((1L, "alpha"), (2L, "BETA2"), (3L, "gamma")))
      // no torn manifests left behind by the atomic publish
      val stray = Files.list(table).iterator()
      while (stray.hasNext) {
        val n = stray.next().getFileName.toString
        assert(!n.endsWith(".tmp"), s"unpublished manifest $n")
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(table.toFile)
  }

  test("carry-forward publishes old files without rewriting them") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft_lake_cf_")
    try {
      Lake.commit(Seq((1L, "a")).toDF("k", "v"), table, 1)
      val v1Files = Lake.liveFiles(table, 1)
      // append-only commit: new slice + untouched v1 files carried forward
      Lake.commit(Seq((2L, "b")).toDF("k", "v"), table, 2,
        carryForward = v1Files)
      assert(v1Files.toSet.subsetOf(Lake.liveFiles(table, 2).toSet))
      val r2 = Lake.readVersion(spark, table, 2).orderBy("k").collect()
      assert(r2.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(table.toFile)
  }

  test("fixture demos: rewritten counts and null-lang bucket line up") {
    val tt = Lake.timeTravel(spark, sf).orderBy("version").collect()
    assert(tt.length == 2)
    assert(tt(0).getLong(2) == 0, "v1 must hold no rewritten text")
    assert(tt(1).getLong(2) > 0, "v2 upsert must rewrite some rows")
    val evo = Lake.schemaEvolution(spark, sf).collect()
    val nullBucket = evo.filter(_.isNullAt(0))
    assert(nullBucket.length == 1 && nullBucket(0).getLong(1) > 0,
      "gen1 rows must surface as NULL lang")
  }

  test("change feed applied to v1 reconstructs v2 (the changelog invariant)") {
    import graft.Tables
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    // the same version definitions the operator commits through storage
    val v1 = docs.filter(col("doc_id") % 2 === 0)
    val rep = docs.filter(col("doc_id") % 3 === 0)
      .withColumn("text", upper(col("text")))
    val v2 = v1.filter(!(col("doc_id") % 10 === 4 && col("doc_id") % 3 =!= 0))
      .join(rep.select("doc_id"), Seq("doc_id"), "left_anti")
      .unionByName(rep)
    val feed = Lake.changeFeed(spark, sf)
    // every update emits exactly one pre- and one post-image
    val pre = feed.filter(col("change_type") === "update_preimage").count()
    val post = feed.filter(col("change_type") === "update_postimage").count()
    assert(pre === post && pre > 0)
    assert(feed.filter(col("change_type") === "insert").count() > 0)
    assert(feed.filter(col("change_type") === "delete").count() > 0)
    // apply: v1 minus (deleted ∪ updated) keys, plus inserts and postimages
    val removedKeys = feed
      .filter(col("change_type").isin("delete", "update_preimage"))
      .select("doc_id")
    val added = feed
      .filter(col("change_type").isin("insert", "update_postimage"))
      .select("doc_id", "text")
    val reconstructed = v1.join(removedKeys, Seq("doc_id"), "left_anti")
      .unionByName(added)
    val a = reconstructed.collect().map(_.toString).sorted
    val b = v2.collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)
  }
}
