package graft.tools

/** Dev A/B probe for the iterative graph operators' regime split
  * (broadcast-hinted vs plain shuffle join for the node-sized state
  * frames): runs both paths of pagerank and label propagation on a
  * warmed family cache and prints per-rep wall times, so the
  * [[graft.operators.Graph]] crossover caps are set from measurements,
  * not guesses. (The r7 probe compared the since-deleted driver-map UDF
  * path against the broadcast join and measured parity at 8g — the
  * record that justified deleting it.)
  *
  * Usage: runMain graft.tools.RegimeProbe <sfDir> [reps]
  */
object RegimeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = graft.GraftSession.builder("graft-regime-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime(); val n = body
      println(f"[probe] $tag%-22s rows=$n%-8d ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm the family cache so both regimes measure their own work only
    graft.operators.Graph.buildPairs(spark, dir).count()
    for (i <- 1 to reps) {
      time(s"label_prop bcast#$i")(
        graft.operators.Graph.labelPropagation(spark, dir).count())
      time(s"label_prop shuffle#$i")(
        graft.operators.Graph.labelPropagation(spark, dir, broadcastCap = 0L).count())
      time(s"pagerank bcast#$i")(
        graft.operators.Graph.pagerank(spark, dir).count())
      time(s"pagerank shuffle#$i")(
        graft.operators.Graph.pagerank(spark, dir, broadcastCap = 0L).count())
      time(s"kcore bcast#$i")(
        graft.operators.Graph.kcore(spark, dir).count())
      time(s"kcore shuffle#$i")(
        graft.operators.Graph.kcore(spark, dir, broadcastCap = 0L).count())
    }
    spark.stop()
  }
}
