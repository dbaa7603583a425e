package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Distribution-drift statistics — the data-quality monitors a production
  * pipeline runs between snapshots/segments before trusting a batch:
  * chi-square independence over a contingency table and the Population
  * Stability Index over bucketed distributions. Both reduce to small
  * count aggregates (cells × categories, never corpus-sized) with
  * broadcast marginals — the map-side shape at any scale.
  */
object Drift {

  /** Chi-square contingency analysis of event mix vs day-of-week — "does
    * the event-type distribution depend on the weekday?". One (type, dow)
    * count aggregate over the scan; marginals and the grand total derive
    * from the CELLS (already tiny) and broadcast back; expected counts,
    * per-cell contributions, and the repeated total statistic are pure
    * arithmetic on exact integers, so both engines compute the same
    * doubles (rounded where division order could differ in the last ulp).
    */
  def chiSquare(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(s, dir)
      .groupBy(col("event_type"), dayofweek(col("ts")).as("dow"))
      .agg(count(lit(1)).as("o"))
    val rowTot = cells.groupBy("event_type").agg(sum("o").as("row_n"))
    val colTot = cells.groupBy("dow").agg(sum("o").as("col_n"))
    val grand = cells.agg(sum("o").as("n"))
    val withE = cells
      .join(broadcast(rowTot), Seq("event_type"))
      .join(broadcast(colTot), Seq("dow"))
      .crossJoin(broadcast(grand))
      .withColumn("e", col("row_n").cast("double") * col("col_n") / col("n"))
      .withColumn("contrib",
        (col("o") - col("e")) * (col("o") - col("e")) / col("e"))
    val chi2 = withE.agg(round(sum("contrib"), 4).as("chi2"))
    withE.crossJoin(broadcast(chi2))
      .select(col("event_type"), col("dow"), col("o"),
        round(col("e"), 4).as("e"),
        round(col("contrib"), 6).as("contrib"), col("chi2"))
  }

  /** Population Stability Index between two corpus snapshots (the
    * production drift gate; PSI > 0.2 conventionally blocks a batch):
    * reference = even doc_ids, current = odd (stand-ins for yesterday/
    * today), distributions over `nb` equi-width n_chars buckets from
    * GLOBAL bounds so both sides share bucket edges. PSI = Σ (p_cur −
    * p_ref)·ln(p_cur / p_ref) with probabilities clamped at `eps` (the
    * standard empty-bucket guard, spelled identically in the oracle).
    * Shape: one bounds row broadcast, one (side, bucket) count, pure
    * arithmetic after — two narrow passes.
    */
  def psi(s: SparkSession, dir: String, nb: Int = 10,
          eps: Double = 1e-6): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars").cast("double").as("x"))
    val bounds = docs.agg(min("x").as("lo"), max("x").as("hi"))
    // degenerate axis (every doc the same length → hi == lo) collapses
    // to bucket 1 instead of an ANSI divide-by-zero; inert on any real
    // spread, mirrored in the oracle
    val bucketed = docs.crossJoin(broadcast(bounds))
      .select((col("doc_id") % 2 === 0).cast("int").as("is_ref"),
        least(floor((col("x") - col("lo")) * nb /
          greatest(col("hi") - col("lo"), lit(1e-12)))
          .cast("int") + 1, lit(nb)).as("bucket"))
    val cnt = bucketed.groupBy("bucket")
      .agg(sum(col("is_ref")).as("n_ref"),
        sum(lit(1) - col("is_ref")).as("n_cur"))
    val tot = cnt.agg(sum("n_ref").as("t_ref"), sum("n_cur").as("t_cur"))
    val p = cnt.crossJoin(broadcast(tot))
      .withColumn("p_ref", greatest(col("n_ref") / col("t_ref"), lit(eps)))
      .withColumn("p_cur", greatest(col("n_cur") / col("t_cur"), lit(eps)))
      .withColumn("contrib",
        (col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")))
    val total = p.agg(round(sum("contrib"), 6).as("psi"))
    p.crossJoin(broadcast(total))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        round(col("contrib"), 6).as("contrib"), col("psi"))
  }
}
