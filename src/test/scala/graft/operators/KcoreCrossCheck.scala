package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** k-core cross-validation at scales where the DuckDB stacked-CTE
  * oracle is intractable (at sf1 its chained self-join replay exhausted
  * >79 GB of spill): compute the same bounded-round peel with TWO
  * independent implementations — the distributed broadcast-filter
  * operator and an exact DRIVER-side peel-to-fixpoint over collected
  * edges (node/edge counts at sf1 — 200k / 5.6M — fit a driver easily;
  * the collect lives HERE, in a dev check, never in the operator) —
  * and compare survivor sets and degrees exactly. Test-scoped dev main:
  * `sbt "Test/runMain graft.operators.KcoreCrossCheck <sfDir>"`.
  */
object KcoreCrossCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(65)
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-kcore-crosscheck")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "10000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val distributed = Graph.kcore(spark, dir, k = k).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // independent edge build + exact driver peel to fixpoint
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .repartition(spark.sparkContext.defaultParallelism)
      .distinct()
    val pairs = li.as("a").join(li.as("b"), Seq("l_orderkey"))
      .filter(col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    var adj = pairs.flatMap { case (s, d) => Seq(s -> d, d -> s) }
      .groupBy(_._1).map { case (n, es) =>
        n -> scala.collection.mutable.Set(es.map(_._2): _*) }
    var changed = true
    while (changed) {
      val dead = adj.collect { case (n, ns) if ns.size < k => n }.toSet
      changed = dead.nonEmpty
      if (changed)
        adj = adj.collect { case (n, ns) if !dead(n) =>
          n -> (ns --= dead) }
    }
    val exact = adj.map { case (n, ns) => n -> ns.size.toLong }

    val onlyD = distributed.keySet -- exact.keySet
    val onlyE = exact.keySet -- distributed.keySet
    val degMismatch = distributed.keySet.intersect(exact.keySet)
      .count(n => distributed(n) != exact(n))
    println(s"[kcore-crosscheck] dir=$dir k=$k " +
      s"distributed=${distributed.size} exact=${exact.size} " +
      s"onlyDistributed=${onlyD.size} onlyExact=${onlyE.size} " +
      s"degMismatches=$degMismatch")
    val ok = onlyD.isEmpty && onlyE.isEmpty && degMismatch == 0 &&
      distributed.nonEmpty
    println(if (ok) "[kcore-crosscheck] OK — formulations agree exactly"
      else "[kcore-crosscheck] MISMATCH")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
