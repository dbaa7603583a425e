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
}
