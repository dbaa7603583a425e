package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Dev profiler for the shingle-pair dedup family: times each pipeline
  * stage with its own action so a slow suite entry can be attributed to a
  * stage instead of guessed at. Test-scoped (run via `sbt
  * "Test/runMain graft.tools.ProfileDedup"`) — not part of the shipped
  * surface.
  */
object ProfileDedup {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $name%-32s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-prof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warm-up: JVM/codegen/parquet init
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$dir/region.parquet").count()

    val docs = Tables.documents(spark, dir)
    time("docs.count")(docs.count())

    val sh = Dedup.shinglePairsOf(docs)
    time("shinglePairs count")(sh.count())
    time("shinglePairs count again")(sh.count())

    val shP = sh.persist()
    time("shinglePairs persist+count")(shP.count())

    val docFreq = shP.groupBy("sh").agg(count(lit(1)).as("df"))
    time("docFreq agg")(docFreq.count())

    val arrays = shP.groupBy("doc_id")
      .agg(sort_array(collect_list(col("sh"))).as("shs"), count(lit(1)).as("n"))
    time("shingleArrays agg")(arrays.count())

    // prefix index: join + groupBy collect_list + slice + posexplode
    val tau = Dedup.JaccardThreshold
    val prefix = shP.join(docFreq, "sh")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("ranked"))
      .select(col("doc_id"), size(col("ranked")).as("n"),
        posexplode(slice(col("ranked"), lit(1),
          (size(col("ranked")) - ceil(lit(tau) * size(col("ranked"))) + 1).cast("int")))
          .as(Seq("pos0", "t")))
      .select(col("doc_id"), col("t.sh").as("sh"), col("n"),
        (col("pos0") + 1).as("pos"))
    time("prefixIndex")(prefix.count())
    val pk = prefix.persist()
    time("prefixIndex persist+count")(pk.count())

    val alpha = tau / (1 + tau)
    val candidates = pk.as("a")
      .join(pk.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
          greatest(col("a.n"), col("b.n")) * tau <= least(col("a.n"), col("b.n")) &&
          lit(1) + least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos")) >=
            ceil((col("a.n") + col("b.n")) * alpha))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    time("candidate join (pre-distinct)")(candidates.count())
    val cd = candidates.distinct()
    time("candidates distinct")(cd.count())

    // full pipeline as shipped, fresh session scope
    time("ngramJaccard full (memoized)")(Dedup.ngramJaccard(spark, dir).count())
    Dedup.releasePairs()
    time("incremental full")(Dedup.incremental(spark, dir).count())
    time("containment full")(Dedup.containment(spark, dir).count())

    spark.stop()
  }
}
