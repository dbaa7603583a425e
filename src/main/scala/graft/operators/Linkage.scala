package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Probabilistic record linkage (Fellegi & Sunter, "A theory for record
  * linkage", JASA 1969) — the entity-resolution scoring pass every
  * training-data pipeline runs when merging user/author/customer records
  * from multiple sources. Three stages, all declarative:
  *
  *  1. BLOCK: candidate pairs only within (nation, account-balance band)
  *    blocks — the all-pairs square never materializes, and block size is
  *    tunable independent of corpus size (the `dedup_fuzzy_names`
  *    blocking discipline applied to structured records).
  *  2. COMPARE: a fixed agreement vector per pair — name edit distance,
  *    nation equality (always true inside these blocks), balance
  *    proximity — each a codegen'd scalar expression.
  *  3. SCORE: Fellegi–Sunter log-odds weights per agreement/disagreement
  *    (literal m/u-derived constants, exactly representable halves and
  *    quarters so both engines sum identical doubles), thresholded into
  *    match / possible / non-match.
  *
  * Output is the top-scored pairs (deterministic (score desc, id, id)
  * TakeOrdered) — the review queue a linkage pipeline actually emits.
  */
object Linkage {

  /** FS weights: agreement w_a = log2(m/u), disagreement
    * w_d = log2((1-m)/(1-u)), pre-derived to exact binary fractions.
    */
  private val NameAgree = 4.0; private val NameDis = -1.0
  private val BalAgree = 2.0; private val BalDis = -0.75
  private val NationAgree = 1.5

  def customerPairs(s: SparkSession, dir: String, k: Int = 50,
                    maxNameDist: Int = 2, balTol: Double = 100.0,
                    bandWidth: Double = 500.0): DataFrame = {
    val c = Tables.customer(s, dir)
      .select(col("c_custkey").as("id"), col("c_name").as("name"),
        col("c_nationkey").as("nation"), col("c_acctbal").as("bal"))
      .withColumn("band", floor(col("bal") / bandWidth).cast("long"))
    val a = c.select(col("id").as("id_a"), col("name").as("name_a"),
      col("nation"), col("bal").as("bal_a"), col("band"))
    val b = c.select(col("id").as("id_b"), col("name").as("name_b"),
      col("nation"), col("bal").as("bal_b"), col("band"))
    val pairs = a.join(b, Seq("nation", "band"))
      .filter(col("id_a") < col("id_b"))
    val nameDist = levenshtein(col("name_a"), col("name_b"))
    val scored = pairs
      .withColumn("name_dist", nameDist)
      .withColumn("bal_diff", abs(col("bal_a") - col("bal_b")))
      .withColumn("score",
        when(col("name_dist") <= maxNameDist, lit(NameAgree))
          .otherwise(lit(NameDis)) +
          lit(NationAgree) + // blocks guarantee nation agreement
          when(col("bal_diff") <= balTol, lit(BalAgree))
            .otherwise(lit(BalDis)))
      .withColumn("cls",
        when(col("score") >= 7.0, lit("match"))
          .when(col("score") >= 4.0, lit("possible"))
          .otherwise(lit("non_match")))
      .select(col("id_a"), col("id_b"), col("name_dist"),
        round(col("bal_diff"), 2).as("bal_diff"), col("score"), col("cls"))
    scored.orderBy(col("score").desc, col("id_a"), col("id_b")).limit(k)
  }
}
