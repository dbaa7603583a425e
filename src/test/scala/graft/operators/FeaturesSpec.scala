package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.functions.TextFunctions

/** Semantic pins for the feature-engineering surface: scaler moments,
  * leave-one-out identity, and BPE pair-count ground truth.
  */
class FeaturesSpec extends AnyFunSuite {
  import SparkTestSession._

  test("scaled features: z-scores centered, min-max bounded to [0,1]") {
    val out = Features.scaleFeatures(spark, sf).cache()
    try {
      val m = out.agg(avg("z_price"), avg("z_qty"), min("mm_price"),
        max("mm_price")).collect()(0)
      assert(math.abs(m.getDouble(0)) < 1e-3 && math.abs(m.getDouble(1)) < 1e-3)
      assert(m.getDouble(2) == 0.0 && m.getDouble(3) == 1.0)
      val n = Tables.lineitem(spark, sf).count()
      assert(out.count() == n)
    } finally out.unpersist()
  }

  test("LOO encoding satisfies (sum - y) / (n - 1) against raw aggregates") {
    val o = Tables.orders(spark, sf)
    val enc = Features.targetEncodeLoo(spark, sf)
    val joined = enc.join(o.select("o_orderkey", "o_totalprice"), "o_orderkey")
    val stats = o.groupBy("o_orderpriority")
      .agg(sum("o_totalprice").as("t_sum"), count(lit(1)).as("t_n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val sample = joined.orderBy("o_orderkey").limit(200).collect()
    assert(sample.nonEmpty)
    sample.foreach { r =>
      val (tSum, tN) = stats(r.getString(1))
      val expected =
        if (tN == 1) null
        else BigDecimal((tSum - r.getDouble(3)) / (tN - 1).toDouble)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (expected == null) assert(r.isNullAt(2))
      else assert(math.abs(r.getDouble(2) - expected.asInstanceOf[Double]) < 1e-9,
        s"orderkey ${r.getLong(0)}")
    }
  }

  test("covariance matrix: diagonal equals variance, upper triangle only") {
    val out = Similarity.covarianceMatrix(spark, sf).collect()
    assert(out.length == 36)
    out.foreach(r => assert(r.getInt(0) <= r.getInt(1)))
    val diag = out.filter(r => r.getInt(0) == r.getInt(1))
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    val vars = Tables.embeddings(spark, sf)
      .select((0 until 8).map(i =>
        round(var_samp(element_at(col("embedding"), i + 1).cast("double")), 6)
          .as(s"v$i")): _*).collect()(0)
    (0 until 8).foreach(i =>
      assert(math.abs(diag(i) - vars.getDouble(i)) < 1e-9, s"dim $i"))
    diag.values.foreach(v => assert(v >= 0.0))
  }

  test("eval metrics: recall recomputed from the arms, all scores bounded") {
    val out = Similarity.evalMetrics(spark, sf).collect()
    assert(out.length == 10)
    val truth = Similarity.bruteForceTopK(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val arm = Similarity.annLsh(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    out.foreach { r =>
      val q = r.getLong(0)
      val (rec, mrr, ndcg) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(rec >= 0 && rec <= 1 && mrr >= 0 && mrr <= 1 &&
        ndcg >= 0 && ndcg <= 1.0 + 1e-9, s"query $q bounds")
      val expected = arm.getOrElse(q, Set.empty).intersect(truth(q)).size.toDouble /
        truth(q).size
      assert(math.abs(rec - expected) < 1e-6, s"query $q recall")
      if (rec == 0.0) assert(mrr == 0.0 && ndcg == 0.0)
    }
  }

  test("histogram-refinement quantiles equal the exact percentile aggregate") {
    val li = Tables.lineitem(spark, sf)
    val qs = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
    val fast = graft.functions.StatFunctions.exactQuantiles(
      li, "l_extendedprice", qs)
    val exact = li.agg(expr(
      s"percentile(l_extendedprice, array(${qs.mkString("D,")}D))"))
      .collect()(0).getAs[scala.collection.Seq[Double]](0)
    qs.indices.foreach(i =>
      assert(fast(i) == exact(i), s"q=${qs(i)}: ${fast(i)} vs ${exact(i)}"))
    // heavy-duplicate column: refinement hits a zero-width bucket
    import spark.implicits._
    val dupes = (Seq.fill(5000)(7.0) ++ Seq(1.0, 2.0, 3.0)).toDF("v")
    val fd = graft.functions.StatFunctions.exactQuantiles(
      dupes, "v", Seq(0.5, 0.99), nBuckets = 4, maxCollect = 100)
    assert(fd.toSeq == Seq(7.0, 7.0))
  }

  test("PCA projection: projected covariance is diag(top eigenvalues)") {
    val out = Similarity.pcaProject(spark, sf).cache()
    try {
      val n = Tables.embeddings(spark, sf).count()
      assert(out.count() == n)
      val stats = out.agg(
        var_samp("pc1"), var_samp("pc2"), covar_samp("pc1", "pc2"),
        avg("pc1"), avg("pc2")).collect()(0)
      val (v1, v2, c12) = (stats.getDouble(0), stats.getDouble(1),
        stats.getDouble(2))
      // centered projection: means ~ 0
      assert(math.abs(stats.getDouble(3)) < 1e-4 &&
        math.abs(stats.getDouble(4)) < 1e-4)
      // top component captures at least as much variance; cross-cov ~ 0
      assert(v1 >= v2 - 1e-9, s"$v1 < $v2")
      assert(math.abs(c12) < 1e-3, s"pc1/pc2 not decorrelated: $c12")
      // eigenvalues of the 8-dim covariance reproduce the variances
      val cells = Similarity.covarianceMatrix(spark, sf).collect()
      val m = Array.ofDim[Double](8, 8)
      cells.foreach { r =>
        m(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
        m(r.getInt(1))(r.getInt(0)) = r.getDouble(2)
      }
      val (vals, _) = Similarity.jacobiEigen(m)
      val top = vals.sorted.reverse.take(2)
      assert(math.abs(v1 - top(0)) < 1e-2, s"$v1 vs ${top(0)}")
      assert(math.abs(v2 - top(1)) < 1e-2, s"$v2 vs ${top(1)}")
    } finally out.unpersist()
  }

  test("persisted ANN index serves exactly the in-memory LSH results") {
    val served = Similarity.annIndexPersist(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val mem = Similarity.annLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(served == mem && served.nonEmpty)
  }

  test("hashed feature vectors: slots sum to token count per doc") {
    val rows = Features.hashFeatures(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val slotSum = (2 until 18).map(r.getLong).sum
      assert(slotSum == r.getLong(1), s"doc ${r.getLong(0)}")
    }
  }

  test("SCD-2 history: versions sequence, exactly one current per key") {
    val rows = Relational.q51Scd2History(spark, sf).collect()
    assert(rows.nonEmpty)
    val byKey = rows.groupBy(r => (r.getLong(0), r.getString(1)))
    byKey.foreach { case (k, rs) =>
      val sorted = rs.sortBy(_.getInt(6))
      assert(sorted.map(_.getInt(6)).toSeq == (1 to rs.length), s"$k versions")
      assert(rs.count(_.getInt(7) == 1) == 1, s"$k current rows")
      sorted.init.zip(sorted.tail).foreach { case (a, b) =>
        assert(a.getTimestamp(5) == b.getTimestamp(3),
          s"$k interval chain broken")
      }
    }
  }

  test("BPE pair counts match a hand recount for the top pair") {
    val top = Features.bpePairCounts(spark, sf).collect()
    assert(top.length == 20)
    assert(top.map(_.getInt(2)).toSeq == (1 to 20))
    val counts = top.map(_.getLong(1)).toSeq
    assert(counts == counts.sorted.reverse)
    // recount the top pair straight from the token stream
    val pair = top(0).getString(0)
    val recount = Tables.documents(spark, sf)
      .select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("p"))
      .filter(col("p") === pair).count()
    assert(recount == top(0).getLong(1), s"pair $pair")
  }
}
