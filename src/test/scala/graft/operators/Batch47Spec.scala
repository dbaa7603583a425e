package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession.{sf, spark}

/** Pins for batch 47: the bounded-round synchronous k-core equals the
  * true fixpoint core on a fixture where the cascade converges, the
  * early exit is round-count-invariant, and the output respects the
  * core invariants.
  */
class Batch47Spec extends AnyFunSuite {

  private val K = 65

  /** Exact k-core by driver-side peel-to-fixpoint over the same
    * co-purchase pairs the operator consumes (via its build entry).
    */
  private def exactCore(): Map[Long, Int] = {
    // rebuild the undirected pair set exactly as coPairs does
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val pairs = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    var adj = pairs.flatMap { case (s0, d0) => Seq(s0 -> d0, d0 -> s0) }
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    var changed = true
    while (changed) {
      val dead = adj.collect { case (n, ns) if ns.size < K => n }.toSet
      changed = dead.nonEmpty
      if (changed)
        adj = adj.collect { case (n, ns) if !dead(n) =>
          n -> (ns diff dead) }
    }
    adj.map { case (n, ns) => n -> ns.size }
  }

  test("bounded-round kcore equals the exact fixpoint core") {
    val got = Graph.kcore(spark, sf, k = K, rounds = 6).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = exactCore()
    assert(got.keySet == exact.keySet,
      s"survivor sets differ: +${got.keySet -- exact.keySet} -${exact.keySet -- got.keySet}")
    // the reported degree is the last-round test degree == the core
    // degree once converged
    got.foreach { case (n, d) => assert(d == exact(n).toLong) }
    assert(got.nonEmpty)
  }

  test("early exit is round-count invariant past convergence") {
    val a = Graph.kcore(spark, sf, k = K, rounds = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Graph.kcore(spark, sf, k = K, rounds = 12).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("core invariants: every survivor meets the degree bar") {
    Graph.kcore(spark, sf, k = K, rounds = 6).collect().foreach { r =>
      assert(r.getLong(1) >= K.toLong)
    }
  }

  test("kcore broadcast and shuffle-join survivor regimes agree bit-for-bit") {
    // broadcastCap=0 forces the survivor filter through plain shuffle
    // joins — the 100×-node regime where a node-sized broadcast would
    // break the driver; both physical shapes must peel identically
    val viaBroadcast = Graph.kcore(spark, sf, k = K, rounds = 6).collect()
      .map(_.toString).sorted.toSeq
    val viaShuffle = Graph.kcore(spark, sf, k = K, rounds = 6,
        broadcastCap = 0L).collect()
      .map(_.toString).sorted.toSeq
    assert(viaBroadcast.nonEmpty)
    assert(viaBroadcast == viaShuffle)
  }
}
