package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.expressions.DotProduct
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Deduplication operators for training-data pipelines, over the `documents`
  * fixture. Scale notes per operator:
  *
  *  - Exact dedup is a hash shuffle on the dedup key (min-id survivor).
  *  - Exact n-gram Jaccard uses an *inverted-index join* on shingles — only
  *    documents sharing at least one shingle ever meet, so cost is
  *    Σ_shingle df(shingle)², not n². (At 100 TB you'd cap df per shingle —
  *    a shingle shared by millions of docs carries no signal.)
  *  - MinHash+LSH replaces the shingle join with a band-bucket join:
  *    candidates are pairs agreeing on ≥1 of b bands of r minhashes —
  *    expected cost is linear in data + output. Candidates are then
  *    verified with exact Jaccard. Signatures are computed as 32 codegen'd
  *    `min()` aggregates over exploded (doc, shingle-hash) rows — map-side
  *    partial aggregation, no interpreted array lambdas in the hot path.
  *  - SimHash buckets on 16-bit chunks of a 64-bit signature (pigeonhole:
  *    hamming ≤ 3 pairs must agree on ≥1 of 4 chunks); the signature is 64
  *    codegen'd vote-sum aggregates over exploded token hashes.
  *  - Embedding near-dup thresholds cosine similarity; the all-pairs form
  *    here is the small-side verifier (dot product unrolled into codegen) —
  *    the scale path is Similarity.annLsh's bucketed candidate generation.
  */
object Dedup {

  val ShingleK = 3
  val JaccardThreshold = 0.5
  val NumPerm = 32
  val NumBands = 16 // r = 2 → P(candidate | j=0.5) = 1-(1-0.25)^16 ≈ 0.99

  /** Exact duplicate groups by text: deterministic survivor (min doc_id) +
    * group size. One shuffle on the text hash.
    */
  def exact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(col("text"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")

  /** Per-document distinct shingles, exploded to (doc_id, shingle) pairs. */
  private def shinglePairs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(shingles(col("text"), ShingleK)).as("sh"))

  /** Exact-Jaccard verification of candidate pairs via a join-based
    * intersection count on the inverted index (fully codegen'd hash joins +
    * aggregate; per-pair array intersection would run interpreted). Only
    * pairs with nonzero intersection survive the join, which is fine: a
    * zero-overlap pair cannot clear any positive threshold.
    */
  private def verifyJaccard(sh: DataFrame, sizes: DataFrame,
                            candidates: DataFrame): DataFrame = {
    val inter = candidates
      .join(sh.as("a"), col("id_a") === col("a.doc_id"))
      .select(col("id_a"), col("id_b"), col("a.sh").as("sh_a"))
      .join(sh.as("b"),
        col("id_b") === col("b.doc_id") && col("sh_a") === col("b.sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("c"))
    inter
      .join(sizes.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("id_b") === col("sb.doc_id"))
      .withColumn("jaccard",
        round(col("c") / (col("sa.n") + col("sb.n") - col("c")), 6))
      .filter(col("jaccard") >= JaccardThreshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact n-gram Jaccard near-duplicate pairs (id_a < id_b, jaccard ≥ τ)
    * with PPJoin-style prefix filtering (Xiao et al., "Efficient similarity
    * joins for near duplicate detection", WWW 2008):
    *
    *  1. rank each document's shingles by ascending global document
    *     frequency (rarest first, deterministic shingle tie-break);
    *  2. keep only the prefix of length |d| − ⌈τ·|d|⌉ + 1 — any pair with
    *     J ≥ τ must share a prefix shingle (overlap ≥ τ·|A∪B| ≥ τ·max sizes);
    *  3. candidate-join on prefix shingles with the length filter
    *     τ·max(|a|,|b|) ≤ min(|a|,|b|);
    *  4. verify candidates with the exact intersection count from the full
    *     inverted index.
    *
    * Exact result, but the quadratic inverted-index join runs only over
    * rare prefix shingles instead of every shingle.
    */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = shinglePairs(s, dir).persist()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val docFreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    val prefix = sh.join(docFreq, "sh")
      .withColumn("pos", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("sh"))))
      .join(sizes, "doc_id")
      .filter(col("pos") <= col("n") - ceil(lit(JaccardThreshold) * col("n")) + 1)
      .select("doc_id", "sh", "n", "pos")
    // PPJoin position filter: a prefix match at positions (pa, pb) bounds
    // the overlap by 1 + min(|a|−pa, |b|−pb); J ≥ τ requires overlap ≥
    // ⌈τ/(1+τ)·(|a|+|b|)⌉. Aggregating min positions per pair keeps the
    // bound tight and replaces the distinct().
    val alpha = JaccardThreshold / (1 + JaccardThreshold)
    val candidates = prefix.as("a")
      .join(prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
          greatest(col("a.n"), col("b.n")) * JaccardThreshold <=
            least(col("a.n"), col("b.n")))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(min(col("a.pos")).as("pa"), min(col("b.pos")).as("pb"),
        first(col("a.n")).as("na"), first(col("b.n")).as("nb"))
      .filter(lit(1) + least(col("na") - col("pa"), col("nb") - col("pb")) >=
        ceil((col("na") + col("nb")) * alpha))
      .select("id_a", "id_b")
    verifyJaccard(sh, sizes, candidates)
  }

  /** MinHash signatures per document: explode shingles, base-hash each, then
    * NumPerm codegen'd min-aggregates (one per permutation). Documents with
    * fewer than ShingleK tokens have no shingles and drop out (they cannot
    * near-duplicate anything at this granularity).
    */
  def minhashSignatures(s: SparkSession, dir: String): DataFrame =
    minhashSignaturesFrom(shinglePairs(s, dir))

  private def minhashSignaturesFrom(sh: DataFrame): DataFrame = {
    val hashed = sh.withColumn("h", baseHash(col("sh")))
    val mins = permCoeffs(NumPerm).zipWithIndex.map { case (ab, i) =>
      min(permutedHash(col("h"), ab)).as(s"m$i")
    }
    hashed.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .withColumn("sig", array((0 until NumPerm).map(i => col(s"m$i")): _*))
      .select(col("doc_id"), col("sig"),
        lshBands(col("sig"), NumPerm, NumBands).as("bands"))
  }

  /** MinHash+LSH near-dup pairs: band-bucket join → distinct candidates →
    * exact-Jaccard verification on the candidate pairs only.
    */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val sh = shinglePairs(s, dir).persist()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val bands = minhashSignaturesFrom(sh)
      .select(col("doc_id"),
        posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
      .persist()
    val candidates = bands.as("a")
      .join(bands.as("b"), Seq("band_idx", "band_hash"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    verifyJaccard(sh, sizes, candidates)
  }

  /** SimHash near-dup pairs: 64-bit signature from exploded token hashes
    * (64 codegen'd vote sums), candidates from 4×16-bit chunk buckets,
    * verified by exact hamming distance ≤ 3.
    */
  def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    val tokenHashes = Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val votes = (0 until 64).map(b => sum(simhashVote(col("h"), b)).as(s"v$b"))
    val sigs = tokenHashes.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        simhashFromVotes((0 until 64).map(b => col(s"v$b"))).as("sig"))
    val chunks = sigs.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("sig"), i * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("chunk_idx", "chunk")))
    chunks.as("a")
      .join(chunks.as("b"), Seq("chunk_idx", "chunk"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        hamming64(col("a.sig"), col("b.sig")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
  }

  /** Embedding cosine near-duplicates: all-pairs cosine ≥ τ on the
    * `embeddings` fixture, with the dot product unrolled into a codegen'd
    * expression. The n² form is the correctness baseline; candidate
    * generation at scale lives in Similarity.annLsh.
    */
  def embeddingCosine(s: SparkSession, dir: String, threshold: Double = 0.45): DataFrame = {
    DotProduct.register(s)
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", sqrt(call_function("graft_dot", col("v"), col("v"))))
    // graft_dot is a native codegen'd loop, so Catalyst is free to push the
    // threshold into the pair-join condition — the predicate evaluates one
    // compiled loop per candidate pair, filtering before projection.
    e.as("a")
      .join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cosine", round(
        call_function("graft_dot", col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"), col("cosine"))
  }
}
