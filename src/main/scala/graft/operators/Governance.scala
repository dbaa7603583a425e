package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-governance audits a training-data platform runs before a corpus
  * ships: re-identification risk over quasi-identifier combinations.
  * (The scrub/redact side of governance lives in TextOps — text_scrub,
  * text_redact_pii; this module covers the relational side.)
  */
object Governance {

  /** k-anonymity audit (Sweeney, IJUFKS 2002): group the table by its
    * quasi-identifier tuple — here (market segment, nation, account-
    * balance band) — and flag every equivalence class smaller than `k`
    * for suppression, with the class's re-identification risk 1/|class|.
    *
    * One hash shuffle on the quasi-identifier key; the flag and risk are
    * map-side projections over the (class-cardinality-sized) aggregate.
    * At 100 TB the class table is vanishingly smaller than the corpus
    * (bounded by the QI-combination count), so the suppression list
    * broadcast-joins back against the full table — the same
    * broadcast-purge shape as Dedup.purge.
    */
  def kAnonymity(s: SparkSession, dir: String, k: Long = 5): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_mktsegment"),
        col("c_nationkey"),
        floor(col("c_acctbal") / lit(1000.0)).cast("long").as("acct_band"))
      .groupBy("c_mktsegment", "c_nationkey", "acct_band")
      .agg(count(lit(1)).as("group_size"))
      .select(col("c_mktsegment"), col("c_nationkey"), col("acct_band"),
        col("group_size"),
        (col("group_size") < k).as("suppress"),
        round(lit(1.0) / col("group_size"), 6).as("reid_risk"))

  /** l-diversity audit (Machanavajjhala et al., TKDD 2007) — the
    * follow-up question k-anonymity can't answer: a class of 50 rows is
    * useless cover if they all share one sensitive value. Classes are
    * the (nation, balance-band) quasi-identifier pairs; the sensitive
    * attribute is the market segment; a class is l-diverse when it
    * holds ≥ `l` distinct sensitive values.
    *
    * count_distinct inside the class aggregate is the whole operator —
    * one shuffle; Spark expands it to a two-phase distinct-then-count
    * (exact, scales with class × distinct-value cardinality, which the
    * sensitive attribute bounds by definition).
    */
  def lDiversity(s: SparkSession, dir: String, l: Long = 3): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_nationkey"),
        floor(col("c_acctbal") / lit(1000.0)).cast("long").as("acct_band"),
        col("c_mktsegment"))
      .groupBy("c_nationkey", "acct_band")
      .agg(count(lit(1)).as("group_size"),
        countDistinct("c_mktsegment").as("l_distinct"))
      .select(col("c_nationkey"), col("acct_band"), col("group_size"),
        col("l_distinct"), (col("l_distinct") >= l).as("diverse"))
}
