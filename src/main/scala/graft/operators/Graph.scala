package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph analytics over the order→part co-purchase graph (parts that
  * appear in the same order are connected) — the two canonical
  * large-graph primitives a training-data platform leans on for corpus
  * link analysis: fixed-iteration PageRank (importance propagation, the
  * iterative join+agg pattern) and triangle counting (local clustering /
  * community density, the multi-way self-join pattern).
  *
  * Edge derivation is one grouped self-join on the order key. Fan-out per
  * order is quadratic in order size, but order size is bounded by the
  * schema (TPC-H-style orders hold ≤ 7 lines; a web-graph or basket
  * corpus at 100 TB would cap giant groups exactly like the dedup
  * family's hot-bucket guard). Both operators therefore scale as
  * O(Σ per-group size²) = O(edges), never O(n²).
  */
object Graph {

  /** Distinct undirected co-purchase pairs, canonically oriented
    * src < dst. One (orderkey-keyed) self-join plus a distinct — shared
    * by [[pagerank]] and [[triangles]] through the family cache, the
    * materialized edge-table shape every downstream graph pass reuses.
    */
  private def coPairs(s: SparkSession, dir: String): DataFrame =
    FamilyCache.get(s, dir, "copairs") {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      li.as("a").join(li.as("b"), Seq("l_orderkey"))
        .filter(col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .distinct()
    }

  /** PageRank over the symmetric co-purchase graph, `iters` fixed
    * iterations of r' = (1−d)/N + d·Σ r(u)/deg(u).
    *
    * The scale-defining choices:
    *  - the degree is joined onto the adjacency list ONCE and the result
    *    persisted pre-partitioned on `src` — every iteration's
    *    contribution join then reuses the same layout instead of
    *    re-shuffling the (edge-sized) adjacency each round; only the
    *    (node-sized) rank frame moves;
    *  - each iteration `localCheckpoint`s its node-sized rank frame, so
    *    the logical plan stays one-iteration deep (the ccPropagation
    *    lesson: nested iterative plans grow analyzer time without it);
    *  - N is the single scalar the plan needs, taken with one count
    *    action and embedded as a literal (the q41 quantile-literal
    *    pattern), so both engines divide by the identical double.
    *
    * The graph is symmetric, so every node has deg ≥ 1 and receives mass
    * — no dangling-mass correction term is needed. Output rank is scaled
    * by N (1.0 = uniform mass) before the 6-decimal round so the
    * comparison works in O(1) magnitudes at every corpus size.
    *
    * `damping` and `teleport` are separate parameters (not 1−d of each
    * other) so both land as the SAME parsed literals the SQL oracle
    * uses — `1.0 - 0.85` and the literal `0.15` differ by one ulp, and
    * the oracle contract here is "identical doubles", not "close".
    */
  def pagerank(s: SparkSession, dir: String, iters: Int = 3,
               damping: Double = 0.85, teleport: Double = 0.15): DataFrame = {
    val pairs = coPairs(s, dir)
    val edges = pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    val adj = edges.join(deg, col("src") === col("node"))
      .select(col("src"), col("dst"), col("deg"))
      .repartition(col("src"))
      .persist()
    try {
      val n = deg.count()
      var ranks = deg.select(col("node"), lit(1.0 / n).as("rank"))
        .localCheckpoint(true)
      for (_ <- 1 to iters) {
        ranks = adj.join(ranks, col("src") === col("node"))
          .groupBy(col("dst"))
          .agg((lit(teleport / n) +
            lit(damping) * sum(col("rank") / col("deg"))).as("rank"))
          .select(col("dst").as("node"), col("rank"))
          .localCheckpoint(true)
      }
      ranks.join(deg, Seq("node"))
        .select(col("node").as("part"),
          round(col("rank") * lit(n.toDouble), 6).as("pagerank"),
          col("deg"))
        .localCheckpoint(true)
    } finally adj.unpersist(false)
  }

  /** Per-node triangle counts via DEGREE-ORIENTED wedge closing (the
    * classic distributed-triangle trick — Suri & Vassilvitskii, WWW'11):
    * orient every edge from its lower-(deg, id) endpoint to the higher,
    * so each wedge is enumerated at its lowest-degree corner and the
    * join volume is Σ d_min(u)² — bounded even when hub nodes exist,
    * where the naive orientation pays Σ deg(hub)². Three shuffles total
    * (wedge join, closing join, corner count); each triangle is found
    * exactly once and credited to all three corners.
    */
  def triangles(s: SparkSession, dir: String): DataFrame = {
    val pairs = coPairs(s, dir)
    val deg = pairs.select(col("src").as("node"))
      .union(pairs.select(col("dst").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val withDeg = pairs
      .join(deg.select(col("node").as("src"), col("deg").as("ds")), Seq("src"))
      .join(deg.select(col("node").as("dst"), col("deg").as("dd")), Seq("dst"))
    // src < dst by construction, so the tie (ds == dd) orients src → dst
    val oriented = withDeg.select(
      when(col("ds") <= col("dd"), col("src")).otherwise(col("dst")).as("lo"),
      when(col("ds") <= col("dd"), col("dst")).otherwise(col("src")).as("hi"))
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.hi") === col("e2.lo"))
      .select(col("e1.lo").as("a"), col("e1.hi").as("b"), col("e2.hi").as("c"))
    val tri = wedges.join(oriented.as("e3"),
      col("a") === col("e3.lo") && col("c") === col("e3.hi"))
      .select(col("a"), col("b"), col("c"))
    val corners = tri.select(col("a").as("node"))
      .union(tri.select(col("b").as("node")))
      .union(tri.select(col("c").as("node")))
      .groupBy("node").agg(count(lit(1)).as("tri"))
    val out = deg.join(corners, Seq("node"), "left")
      .select(col("node").as("part"),
        coalesce(col("tri"), lit(0L)).as("triangles"), col("deg"))
    CacheLifecycle.materialize(out)
  }
}
