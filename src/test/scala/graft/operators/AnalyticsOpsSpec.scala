package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.functions.TextFunctions

/** Semantic pins for the round-5 analytics additions: cluster topics,
  * label outliers, n-gram novelty, robust stats, and the streaming
  * curation pipeline's batch equality.
  */
class AnalyticsOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("cluster topics: ranks are 1..n per cell, counts non-increasing") {
    val rows = Similarity.clusterTopics(spark, sf)
      .orderBy("cell", "rank").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (cell, rs) =>
      val ranks = rs.map(_.getInt(3)).toSeq
      assert(ranks == (1 to rs.length), s"cell $cell ranks $ranks")
      val counts = rs.sortBy(_.getInt(3)).map(_.getLong(2)).toSeq
      assert(counts == counts.sorted.reverse, s"cell $cell counts not sorted")
      assert(rs.length <= 5)
    }
  }

  test("label outliers: top-3 per label, ranked by descending distance") {
    val rows = Similarity.labelOutliers(spark, sf).collect()
    val labels = Tables.embeddings(spark, sf)
      .select("label").distinct().count()
    assert(rows.length <= labels * 3)
    rows.groupBy(_.getInt(1)).foreach { case (label, rs) =>
      val byRank = rs.sortBy(_.getInt(3))
      assert(byRank.map(_.getInt(3)).toSeq == (1 to rs.length))
      val dists = byRank.map(_.getDouble(2)).toSeq
      assert(dists == dists.sorted.reverse, s"label $label dists not desc")
      assert(dists.forall(_ >= 0.0))
    }
  }

  test("ngram novelty: bounded ratios, and a cloned doc zeroes both twins") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val nov = TextOps.ngramNoveltyOf(docs, 3).collect()
    assert(nov.nonEmpty)
    nov.foreach { r =>
      val (n, u, v) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(u <= n && v >= 0.0 && v <= 1.0, s"doc ${r.getLong(0)}: $n $u $v")
    }
    // clone one doc under a fresh id: every shingle of both copies now has
    // df >= 2, so both twins report novelty 0 while other docs only drop
    val base = docs.limit(1)
    val clone = base.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val cloned = TextOps.ngramNoveltyOf(docs.union(clone), 3)
      .filter(col("doc_id") === base.collect()(0).getLong(0) ||
        col("doc_id") >= 1000000L)
      .collect()
    assert(cloned.length == 2)
    cloned.foreach(r => assert(r.getDouble(3) == 0.0, s"twin ${r.getLong(0)}"))
  }

  test("robust stats: MAD and median agree with a hand computation") {
    import spark.implicits._
    val rows = Relational.q36RobustStats(spark, sf).collect()
    assert(rows.nonEmpty)
    // replay one group driver-side
    val flag = rows.head.getString(0)
    val qs = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === flag)
      .select("l_quantity").as[Double].collect().sorted
    def med(a: Array[Double]): Double = {
      val n = a.length
      if (n % 2 == 1) a(n / 2) else (a(n / 2 - 1) + a(n / 2)) / 2.0
    }
    val m = med(qs)
    val mad = med(qs.map(x => math.abs(x - m)).sorted)
    val got = rows.find(_.getString(0) == flag).get
    assert(math.abs(got.getDouble(1) - m) < 1e-6, s"median ${got.getDouble(1)} vs $m")
    assert(math.abs(got.getDouble(2) - mad) < 1e-6, s"mad ${got.getDouble(2)} vs $mad")
  }

  test("resample: complete daily spine, counts reconcile, gaps fill") {
    val rows = Relational.q37Resample(spark, sf).collect()
    val types = Tables.events(spark, sf).select("event_type").distinct().count()
    assert(rows.length % types == 0, "spine is not a full grid")
    val perType = rows.groupBy(_.getString(0))
    assert(perType.size == types)
    // counts on the spine reconcile with the raw table
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == total)
    // pct_change row-over-row consistency: cnt(prev) > 0 implies defined
    perType.values.foreach { rs =>
      val sorted = rs.sortBy(_.getDate(1).toString)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          if (a.getLong(2) > 0)
            assert(!b.isNullAt(4), s"missing pct_change after nonzero day")
        case _ =>
      }
    }
  }

  test("mmr: k unique picks from the arm, led by the top-relevance doc") {
    val mmr = Similarity.mmrRerank(spark, sf).collect()
    assert(mmr.length == 10)
    val ids = mmr.map(_.getLong(1))
    assert(ids.distinct.length == ids.length, "duplicate picks")
    assert(mmr.map(_.getInt(0)).toSeq == (1 to 10))
    // rank 1 is the pure-relevance argmax (maxsim term is zero there)
    val top = Similarity.bruteForceTopK(spark, sf, numQueries = 1, k = 1)
      .collect()(0).getLong(1)
    assert(mmr.find(_.getInt(0) == 1).get.getLong(1) == top)
  }

  test("histogram: buckets bounded, counts reconcile with the table") {
    val rows = Relational.q38Histogram(spark, sf).collect()
    assert(rows.map(_.getInt(1)).forall(b => b >= 1 && b <= 20))
    assert(rows.map(_.getLong(2)).sum == Tables.lineitem(spark, sf).count())
    // bin_lo strictly increases with bucket within a flag
    rows.groupBy(_.getString(0)).values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(1))
      val los = sorted.map(_.getDouble(3)).toSeq
      assert(los == los.sorted && los.distinct.length == los.length)
    }
  }

  test("stream curate equals the batch quality-filter + distinct projection") {
    val streamed = graft.streaming.StreamOps.streamCurate(spark, sf)
      .select("fp", "lang", "n_tokens").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val t = TextFunctions.tokens(col("text"))
    val batch = Tables.documents(spark, sf)
      .select(col("lang"), TextFunctions.fingerprint(col("text")).as("fp"),
        size(t).as("n_tokens"),
        (size(array_distinct(t)) / size(t).cast("double")).as("dr"))
      .filter(col("n_tokens") >= 20 && col("dr") >= 0.3)
      .select("fp", "lang", "n_tokens").distinct().collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("unicode normalize undoes planted accents and case; nulls pass through") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The  Scan\tRuns Fast"), (2L, null.asInstanceOf[String]),
      (3L, "  Crème  BRÛLÉE  ")).toDF("doc_id", "text")
    val planted = docs.withColumn("text",
      translate(upper(col("text")), "AEO", "ÁÉÖ"))
    val out = TextOps.normalizeDocs(planted).orderBy("doc_id").collect()
    assert(out(0).getString(1) == "the scan runs fast")
    assert(out(1).isNullAt(1))
    assert(out(2).getString(1) == "creme brulee")
    assert(out(2).getInt(2) == "creme brulee".length)
  }

  test("blocklist counts flagged tokens and keeps only clean docs") {
    import spark.implicits._
    val docs = Seq((1L, "a slow big slow day"), (2L, "all clean here"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextOps.blocklistFilter(docs).orderBy("doc_id").collect()
    assert(out(0).getInt(1) == 5 && out(0).getInt(2) == 3 && out(0).getInt(3) == 0)
    assert(out(1).getInt(2) == 0 && out(1).getInt(3) == 1)
    assert(out(2).getInt(1) == 0 && out(2).getInt(3) == 1)
  }

  test("skew profile: ranked shares descend, cumulative share runs the sum") {
    val rows = Relational.q40SkewProfile(spark, sf).orderBy("rank").collect()
    val nKeysTotal = rows(0).getLong(5)
    assert(rows.length == math.min(20L, nKeysTotal).toInt)
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length))
    val cnts = rows.map(_.getLong(2)).toSeq
    assert(cnts == cnts.sorted.reverse)
    var run = 0.0
    rows.foreach { r =>
      run += r.getDouble(3)
      assert(math.abs(r.getDouble(4) - run) < 1e-4,
        s"rank ${r.getInt(0)} cum ${r.getDouble(4)} vs $run")
    }
    val total = Tables.events(spark, sf).count()
    assert(nKeysTotal > 0 && nKeysTotal <= total)
  }

  test("quantile buckets partition all rows into four near-equal depths") {
    val out = Relational.q41QuantileBucket(spark, sf).collect()
    val n = Tables.lineitem(spark, sf).count()
    assert(out.map(_.getLong(2)).sum == n)
    val byBucket = out.groupBy(_.getInt(1)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(byBucket.keySet == Set(1, 2, 3, 4))
    byBucket.values.foreach(c =>
      assert(math.abs(c - n / 4.0) < n * 0.02, s"bucket depth $c of $n"))
  }

  test("stream anomaly equals the batch z-score filter") {
    val streamed = graft.streaming.StreamOps.streamAnomaly(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val ev = Tables.events(spark, sf)
    val stats = ev.groupBy("event_type")
      .agg(avg("value").as("mu"), stddev_samp("value").as("sigma"))
    val batch = ev.join(broadcast(stats), Seq("event_type"))
      .withColumn("z", (col("value") - col("mu")) / col("sigma"))
      .filter(abs(col("z")) > 3.0)
      .select(col("event_id"), col("event_type"), round(col("z"), 4).as("z"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("retention cohorts: offset 0 is full retention, cells bounded by cohort") {
    val rows = Relational.q42RetentionCohort(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (off, ret) = (r.getInt(1), r.getDouble(3))
      assert(off >= 0 && ret > 0 && ret <= 1.0, s"offset $off retention $ret")
      if (off == 0) assert(ret == 1.0, "every user is active in their own first week")
    }
  }

  test("co-occurrence jaccard agrees with a driver-side set recount") {
    val rows = Relational.q43Cooccurrence(spark, sf).collect()
    assert(rows.nonEmpty)
    val baskets = Tables.events(spark, sf)
      .select("user_id", "event_type").distinct().collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (sa, sb) = (baskets(a), baskets(b))
      val inter = sa.intersect(sb).size
      assert(r.getLong(2) == inter, s"$a x $b count")
      val expected = BigDecimal(inter.toDouble / (sa.size + sb.size - inter))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - expected) < 1e-9, s"$a x $b jaccard")
    }
  }

  test("dedup eval metrics reconcile with the two pair sets") {
    val m = Dedup.dedupEvalMetrics(spark, sf).collect()(0)
    val truth = Dedup.ngramJaccard(spark, sf).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val arm = Dedup.simhashPairsPortable(spark, sf).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(m.getLong(0) == truth.size && m.getLong(1) == arm.size)
    assert(m.getLong(2) == truth.intersect(arm).size)
    val (p, rec) = (m.getDouble(3), m.getDouble(4))
    assert(p >= 0 && p <= 1 && rec >= 0 && rec <= 1)
  }

  test("lake-materialized streaming upsert equals the in-memory CDC view") {
    val viaLake = graft.streaming.StreamOps.streamLakeUpsert(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3),
        r.getDouble(4), r.getLong(5))).toSet
    val viaState = graft.streaming.StreamOps.streamMergeUpsert(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3),
        r.getDouble(4), r.getLong(5))).toSet
    assert(viaLake == viaState && viaLake.nonEmpty)
  }

  test("decile lift: ten near-equal cuts reconciling to the row count") {
    val rows = Relational.q45DecileLift(spark, sf).orderBy("decile").collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10))
    val n = Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == n)
    rows.foreach(r => assert(math.abs(r.getLong(1) - n / 10.0) <= 1.0,
      s"decile ${r.getInt(0)} size ${r.getLong(1)}"))
    rows.foreach(r => assert(r.getDouble(3) > 0))
  }

  test("decile lift: window and distributed-rank regimes agree exactly") {
    // windowRowCap=0 forces the range-partition + rank-reconstruction
    // path on the same fixture the window path serves — identical
    // (decile, n, avg_actual, lift) rows pin the regime split as a
    // purely physical choice
    val viaWindow = Relational.q45DecileLift(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val viaRanks = Relational.q45DecileLift(spark, sf, windowRowCap = 0L)
      .collect().map(_.toString).sorted.toSeq
    assert(viaRanks.nonEmpty)
    assert(viaRanks == viaWindow)
  }

  test("chi-square cells reconcile: totals, nonnegative contribs, summed stat") {
    val rows = Drift.chiSquare(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == n)
    rows.foreach(r => assert(r.getDouble(4) >= 0.0))
    val chi2 = rows(0).getDouble(5)
    assert(rows.forall(_.getDouble(5) == chi2))
    val summed = rows.map(_.getDouble(4)).sum
    assert(math.abs(summed - chi2) < 1e-2, s"$summed vs $chi2")
  }

  test("psi buckets cover both snapshots and the stat sums the contribs") {
    val rows = Drift.psi(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == docs)
    val psi = rows(0).getDouble(4)
    assert(psi >= 0.0, "PSI is a sum of (p-q)ln(p/q) terms, each >= 0")
    assert(math.abs(rows.map(_.getDouble(3)).sum - psi) < 1e-4)
  }

  test("transition matrix rows are proper distributions over observed pairs") {
    val rows = Relational.q47TransitionMatrix(spark, sf).collect()
    assert(rows.nonEmpty)
    val byFrom = rows.groupBy(_.getString(0))
    byFrom.foreach { case (from, rs) =>
      val pSum = rs.map(_.getDouble(3)).sum
      assert(math.abs(pSum - 1.0) < 1e-4, s"$from rows sum to $pSum")
    }
    val totalTransitions = rows.map(_.getLong(2)).sum
    val ev = Tables.events(spark, sf)
    val users = ev.select("user_id").distinct().count()
    assert(totalTransitions == ev.count() - users,
      "each user contributes (events - 1) transitions")
  }

  test("string agg yields sorted, comma-joined members per group") {
    val rows = Relational.q48StringAgg(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val members = r.getString(1).split(",").toSeq
      assert(members == members.sorted, s"${r.getString(0)} unsorted")
      assert(members.size == r.getLong(2))
    }
  }

  test("streak islands: longest streak bounded by active days, recount spot check") {
    val rows = Relational.q50StreakIslands(spark, sf).collect()
    assert(rows.nonEmpty)
    val activeDays = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getDate(1).toLocalDate).toSet).toMap
    rows.foreach { r =>
      val days = activeDays(r.getLong(0))
      assert(r.getLong(1) <= days.size)
      // recount longest consecutive run driver-side
      val sorted = days.toSeq.sorted
      var (best, cur) = (1L, 1L)
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          cur = if (b.toEpochDay - a.toEpochDay == 1) cur + 1 else 1
          best = math.max(best, cur)
        case _ =>
      }
      assert(r.getLong(1) == best, s"user ${r.getLong(0)}: ${r.getLong(1)} vs $best")
    }
  }

  test("centroid drift reconciles with a driver-side mean recompute") {
    val rows = Similarity.embDriftCentroid(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(1) >= 0))
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => (r.getInt(2), r.getLong(0),
        r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble)))
    val byLabel = vecs.groupBy(_._1)
    rows.foreach { r =>
      val label = r.getInt(0)
      val (ref, cur) = byLabel(label).partition(_._2 % 2 == 0)
      assert(r.getLong(2) == ref.size && r.getLong(3) == cur.size)
      val dim = ref.head._3.length
      val shift = math.sqrt((0 until dim).map { i =>
        val d = ref.map(_._3(i)).sum / ref.size - cur.map(_._3(i)).sum / cur.size
        d * d
      }.sum)
      assert(math.abs(r.getDouble(1) - shift) < 1e-4, s"label $label")
    }
  }

  test("incremental rollup merge equals the one-shot recompute") {
    val merged = Relational.q39IncrementalRollup(spark, sf)
    val o = Tables.orders(spark, sf)
    val direct = o.groupBy(col("o_orderstatus"),
        year(col("o_orderdate")).as("yr"))
      .agg(round(sum("o_totalprice"), 2).as("total_price"),
        count(lit(1)).as("n_orders"))
      .withColumn("avg_price", round(col("total_price") / col("n_orders"), 4))
    val m = merged.collect().map(r => (r.getString(0), r.getInt(1)) ->
      (r.getDouble(2), r.getLong(3), r.getDouble(4))).toMap
    val d = direct.collect().map(r => (r.getString(0), r.getInt(1)) ->
      (r.getDouble(2), r.getLong(3), r.getDouble(4))).toMap
    assert(m.keySet == d.keySet && m.nonEmpty)
    m.foreach { case (k, (ts, n, av)) =>
      val (ts2, n2, av2) = d(k)
      assert(n == n2, s"$k counts")
      assert(math.abs(ts - ts2) < 1e-6 && math.abs(av - av2) < 1e-6, s"$k sums")
    }
  }
}
