package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Statistical helpers matching pandas/DuckDB numeric semantics where they
  * differ from Spark's built-ins (SURVEY.md §7.2/§7.3 trap #1).
  */
object StatFunctions {

  /** Bias-corrected sample skewness G1 = g1 * sqrt(n(n-1)) / (n-2).
    *
    * pandas `Series.skew()` (reference: plasticc multi-agg,
    * /root/reference/timedf_benchmarks/plasticc/plasticc_pandas_modin.py:31-40)
    * and DuckDB `skewness()` both return the bias-corrected sample skewness;
    * Spark's `skewness()` returns the population moment g1 = m3 / m2^1.5.
    * Composing the correction from built-ins keeps the whole aggregation
    * inside a single hash-aggregate with codegen — no UDAF needed.
    * Returns null for n <= 2 (pandas/DuckDB behavior).
    */
  def skewSample(c: Column): Column = {
    val n = count(c).cast("double")
    when(n > 2, skewness(c) * sqrt(n * (n - lit(1.0))) / (n - lit(2.0)))
  }

  /** Exact global quantiles by distributed histogram refinement — the
    * classic iterative-selection algorithm (the shape BlinkDB-style
    * engines use for exact order statistics without a global sort):
    *
    *  1. one scan for (n, min, max);
    *  2. one scan builds an equi-width bucket histogram (map-side
    *     combinable; `nBuckets` rows reach the driver);
    *  3. the driver locates each needed 0-based rank's bucket from the
    *     cumulative counts; over-full buckets re-histogram recursively
    *     (each round shrinks the range `nBuckets`-fold);
    *  4. one final scan collects ONLY the located buckets' values
    *     (≈ n/nBuckets rows each), sorted driver-side for the exact
    *     rank values.
    *
    * Interpolation replays `quantile_cont`/Spark `percentile` exactly:
    * pos = (n−1)·q, v = lo·(⌈pos⌉ − pos) + hi·(pos − ⌊pos⌋) on the same
    * doubles — so downstream bucket comparisons are engine-portable.
    * Versus the built-in exact `percentile` aggregate this never builds
    * a value→count map of the column's distinct values (the cost that
    * makes a global percentile over a high-cardinality double column
    * slow and memory-heavy): every pass is a narrow scan, shuffle-free,
    * and the driver holds `nBuckets` longs plus a few bucket loads.
    */
  def exactQuantiles(df: org.apache.spark.sql.DataFrame, column: String,
                     qs: Seq[Double], nBuckets: Int = 8192,
                     maxCollect: Int = 262144): Array[Double] = {
    val c = col(column).cast("double")
    val n = df.agg(count(c)).collect()(0).getLong(0)
    // quantiles of an empty column don't exist — return an EMPTY array
    // (SQL's quantile_cont returns NULL on zero rows). Returning NaN
    // sentinels instead would let a caller silently bucket a non-empty
    // frame against them (Spark's nan-safe ordering ranks NaN GREATER
    // than every numeric, so `col <= NaN` is always true and every row
    // lands in bucket 1); the empty array makes any positional
    // destructuring fail loudly at the call site instead.
    if (n == 0) return Array.empty[Double]
    val positions = qs.map(q => (n - 1) * q)
    val ranks = positions.flatMap(p =>
      Seq(math.floor(p).toLong, math.ceil(p).toLong)).distinct.sorted
    // resolve ranks (0-based within `sub` + `before` rows below it) to
    // values; `sub` always holds an EXACT membership set (refinement
    // filters on the parent's bucket expression, never re-derived range
    // bounds, so boundary values can't migrate between buckets)
    def resolve(sub: org.apache.spark.sql.DataFrame, before: Long,
                want: Seq[Long], depth: Int): Map[Long, Double] = {
      require(depth < 12, s"quantile refinement depth exceeded on $column")
      val bounds = sub.agg(min(c).as("lo"), max(c).as("hi")).collect()(0)
      val (lo, hi) = (bounds.getDouble(0), bounds.getDouble(1))
      if (lo == hi) return want.map(_ -> lo).toMap
      val width = hi - lo
      val bucket = least(floor((c - lo) / width * nBuckets).cast("int"),
        lit(nBuckets - 1))
      val hist = sub.groupBy(bucket.as("b")).agg(count(lit(1)).as("cnt"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val cum = new Array[Long](nBuckets + 1) // rows before bucket i
      (0 until nBuckets).foreach(i => cum(i + 1) = cum(i) + hist.getOrElse(i, 0L))
      val byBucket = want.groupBy(r =>
        (0 until nBuckets).find(i => r - before < cum(i + 1)).get)
      val (small, big) = byBucket.partition {
        case (b, _) => hist.getOrElse(b, 0L) <= maxCollect
      }
      val fetched: Map[Long, Double] =
        if (small.isEmpty) Map.empty
        else {
          val keep = small.keySet
          val rows = sub.select(bucket.as("b"), c.as("v"))
            .filter(col("b").isin(keep.toSeq: _*))
            .collect().map(r => (r.getInt(0), r.getDouble(1)))
          val sortedByBucket = rows.groupBy(_._1).view
            .mapValues(_.map(_._2).sorted).toMap
          small.flatMap { case (b, rs) =>
            rs.map { r =>
              val idx = (r - before - cum(b)).toInt
              r -> sortedByBucket(b)(idx)
            }
          }
        }
      val refined = big.flatMap { case (b, rs) =>
        resolve(sub.filter(bucket === b), before + cum(b), rs, depth + 1)
      }
      fetched ++ refined
    }
    val rankValues = resolve(df.filter(c.isNotNull), 0L, ranks, 0)
    positions.map { p =>
      val (fl, ce) = (math.floor(p), math.ceil(p))
      val (lo, hi) = (rankValues(fl.toLong), rankValues(ce.toLong))
      // the weighted-sum grouping is the one BOTH Spark's percentile and
      // DuckDB's quantile_cont evaluate — lo + frac·(hi−lo) differs by
      // 1 ulp on real data and would break the oracle contract
      if (fl == ce) lo else lo * (ce - p) + hi * (p - fl)
    }.toArray
  }
}
