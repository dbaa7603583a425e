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
      // fixture parquet is single-row-group (unsplittable): round-robin
      // the narrow projection so the distinct/join run at session
      // parallelism (Tables.documents' pattern; a real cluster input
      // arrives pre-split and this is a no-op)
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"))
        .repartition(s.sparkContext.defaultParallelism)
        .distinct()
      li.as("a").join(li.as("b"), Seq("l_orderkey"))
        .filter(col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .distinct()
    }

  /** Undirected degree per node — node-cardinality-sized, consumed
    * repeatedly by both graph operators (adjacency build, rank init,
    * final projections), so it lives in the family cache: the profiled
    * first cut recomputed it four times inside pagerank alone (~7 s of
    * a 22 s query at sf0.1).
    */
  private def coDegrees(s: SparkSession, dir: String): DataFrame =
    FamilyCache.get(s, dir, "codeg") {
      val pairs = coPairs(s, dir)
      pairs.select(col("src").as("node"))
        .union(pairs.select(col("dst").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
    }

  /** Explicit build entry for the shared edge/degree tables — exists so
    * bench cost attribution is honest (dedup_build_pairs' pattern): it
    * sorts before every graph_* consumer, so their per-query times
    * measure their own work, not the shared co-occurrence build. Output
    * is the degree table (oracle-checkable).
    */
  def buildPairs(s: SparkSession, dir: String): DataFrame = {
    coPairs(s, dir).count()
    CacheLifecycle.materialize(coDegrees(s, dir))
  }

  /** PageRank over the symmetric co-purchase graph, `iters` fixed
    * iterations of r' = (1−d)/N + d·Σ r(u)/deg(u).
    *
    * The scale-defining choices:
    *  - the degree table is family-cached (node-sized, consumed by the
    *    adjacency build, rank init, N, and the final projection — the
    *    profiled first cut recomputed it four times), and the adjacency
    *    (edges ⋈ deg, via broadcast of deg) is persisted once;
    *  - every iteration joins the EDGE-sized adjacency with the
    *    NODE-sized rank frame — so the rank frame is `broadcast()` and
    *    the adjacency never moves or re-sorts (the first cut's
    *    sort-merge join re-sorted 2.4M adjacency rows per iteration);
    *    the per-iteration shuffle is only the map-side-combined
    *    contribution aggregate, node-sized after partials. Past
    *    broadcastable node counts (≳10⁸ nodes), flip to the
    *    co-partitioned join: pre-partition adjacency and ranks on the
    *    same key and the same volume argument holds;
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
    val deg = coDegrees(s, dir)
    val adj = edges.join(broadcast(deg), col("src") === col("node"))
      .select(col("src"), col("dst"), col("deg"))
      .persist()
    try {
      val n = deg.count()
      var ranks = deg.select(col("node"), lit(1.0 / n).as("rank"))
        .localCheckpoint(true)
      for (_ <- 1 to iters) {
        ranks = adj.join(broadcast(ranks), col("src") === col("node"))
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
    * where the naive orientation pays Σ deg(hub)².
    *
    * Plan discipline (the first cut was 15× slower than the final):
    *  - the wedge table is ~40× the edge table (49M wedges from 1.2M
    *    edges at sf0.1) and must NEVER shuffle or be recomputed: both
    *    the wedge join and the closing join BROADCAST the (persisted)
    *    oriented edge set — wedges stream map-side from the edge scan
    *    straight into the closing probe and the corner aggregation's
    *    partial phase; the only shuffle in the whole operator is the
    *    final (node-cardinality) count exchange. At edge sets past
    *    broadcast size, drop the hints and pre-partition `oriented` by
    *    lo/hi instead — the wedge volume argument is unchanged;
    *  - corners come from ONE pass — posexplode of the (a, b, c) array
    *    — where a 3-way union of projections would re-run the wedge
    *    pipeline three times (the r2 cache-leak lesson in plan form).
    */
  def triangles(s: SparkSession, dir: String): DataFrame = {
    val pairs = coPairs(s, dir)
    val deg = coDegrees(s, dir)
    val withDeg = pairs
      .join(deg.select(col("node").as("src"), col("deg").as("ds")), Seq("src"))
      .join(deg.select(col("node").as("dst"), col("deg").as("dd")), Seq("dst"))
    // src < dst by construction, so the tie (ds == dd) orients src → dst
    val oriented = withDeg.select(
      when(col("ds") <= col("dd"), col("src")).otherwise(col("dst")).as("lo"),
      when(col("ds") <= col("dd"), col("dst")).otherwise(col("src")).as("hi"))
      .persist()
    try {
      val corners = oriented.as("e1")
        .join(broadcast(oriented.as("e2")), col("e1.hi") === col("e2.lo"))
        .select(col("e1.lo").as("a"), col("e1.hi").as("b"), col("e2.hi").as("c"))
        .join(broadcast(oriented.as("e3")),
          col("a") === col("e3.lo") && col("c") === col("e3.hi"))
        .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("tri"))
      val out = deg.join(corners, Seq("node"), "left")
        .select(col("node").as("part"),
          coalesce(col("tri"), lit(0L)).as("triangles"), col("deg"))
      CacheLifecycle.materialize(out)
    } finally oriented.unpersist(false)
  }

  /** Link prediction — top-k strongest implicit links per node by
    * neighborhood overlap: common-neighbor count, Jaccard of neighbor
    * sets (cn / (d_a + d_c − cn)), and Adamic-Adar (Σ_b 1/ln deg(b) —
    * rare shared neighbors weigh more; deg(b) ≥ 2 for any common
    * neighbor, so the log never hits zero).
    *
    * Wedges enumerate at their CENTER here (both endpoints needed per
    * center, so the orientation trick doesn't apply — the volume is
    * Σ deg(b)²/2 by construction); the `cn ≥ 2` support floor then
    * drops the single-shared-neighbor noise pairs that dominate the raw
    * wedge set (~5× fewer rows into the ranking window), which is also
    * the semantically honest cut for recommendations. Ranking windows
    * partition per source node — local sorts.
    *
    * `candidateMod` scopes scoring to a deterministic WATCHLIST (both
    * endpoints ≡ 0 mod it) — the production serving shape: a link-
    * prediction pass scores a candidate batch against the graph, not
    * the full quadratic cross-product (dedup_incremental's batch-vs-
    * corpus framing). The default quarter-watchlist cuts wedge volume
    * 16× (the full-graph mode, candidateMod=1, measured 87 s Spark vs
    * 236 s DuckDB at sf0.1 — a 2.7× win, but too heavy for a per-round
    * gate on either engine).
    */
  def commonNeighbors(s: SparkSession, dir: String, k: Int = 5,
                      candidateMod: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = coPairs(s, dir)
    val deg = coDegrees(s, dir)
    val edges = pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
    val byCenter = edges.join(broadcast(deg), col("src") === col("node"))
      .filter(col("dst") % candidateMod === 0)
      .select(col("src").as("b"), col("dst").as("n"), col("deg").as("db"))
    // broadcast one side of the self-join: the filtered adjacency is
    // watchlist-sized (~edge count / candidateMod); the wedge stream then
    // flows map-side from the probe scan into the pair aggregate's
    // partials — the only exchange is the (a, c) pair shuffle
    val cn = byCenter.as("x").join(broadcast(byCenter.as("y")),
        col("x.b") === col("y.b") && col("x.n") < col("y.n"))
      .groupBy(col("x.n").as("a"), col("y.n").as("c"))
      .agg(count(lit(1)).as("cn"),
        round(sum(lit(1.0) / log(col("x.db"))), 6).as("aa"))
      .filter(col("cn") >= 2)
    val scored = cn
      .join(broadcast(deg.select(col("node").as("a"), col("deg").as("da"))), Seq("a"))
      .join(broadcast(deg.select(col("node").as("c"), col("deg").as("dc"))), Seq("c"))
      .select(col("a").as("part_a"), col("c").as("part_b"), col("cn"),
        round(col("cn") / (col("da") + col("dc") - col("cn")).cast("double"), 6)
          .as("jaccard"),
        col("aa"))
    val w = Window.partitionBy("part_a")
      .orderBy(col("jaccard").desc, col("cn").desc, col("part_b"))
    val out = scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
    CacheLifecycle.materialize(out, byCenter)
  }
}
