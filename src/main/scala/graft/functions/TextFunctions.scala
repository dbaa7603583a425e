package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the large-scale pipeline operators
  * (dedup, fingerprinting, quality scoring). Everything here is composed
  * from codegen'd built-ins and higher-order functions — no UDFs — so the
  * expressions stay inside whole-stage codegen and scale linearly.
  */
object TextFunctions {

  /** Whitespace tokenization; empty input → empty array (not [""]). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Distinct word k-shingles ("w1 w2 w3") of the token array.
    * Documents shorter than k tokens yield an empty set.
    */
  def shingles(text: Column, k: Int): Column = {
    val w = tokens(text)
    when(size(w) >= k,
      array_distinct(transform(sequence(lit(1), size(w) - (k - 1)), i =>
        concat_ws(" ", (0 until k).map(j => element_at(w, i + j)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Mersenne prime 2^31 − 1: the modulus for the minhash permutation
    * family h_i(x) = (a_i·x + b_i) mod p — the standard construction from
    * Broder's "On the resemblance and containment of documents" (1997).
    */
  val MinhashPrime: Long = 2147483647L

  /** Deterministic permutation coefficients (any fixed odd multipliers work;
    * derived from a splitmix-style integer scramble of the index).
    */
  def permCoeffs(numPerm: Int): Seq[(Long, Long)] =
    (0 until numPerm).map { i =>
      val z = (i.toLong + 1) * 0x9E3779B97F4A7C15L
      val a = math.abs(z % (MinhashPrime - 1)) + 1 // 1..p-1
      val b = math.abs((z >> 17) % MinhashPrime) // 0..p-1
      (a, b)
    }

  /** Per-element permuted hash h_i(x) = (a_i·(x mod p) + b_i) mod p for one
    * minhash permutation, in Column form. The production signature path is
    * the custom `graft_minhash` TypedImperativeAggregate
    * (expressions.MinHashAgg — one aggregate, primitive buffer, identical
    * arithmetic); this Column variant documents the construction and pins
    * the aggregate's correctness in tests. NOTE: array-lambda
    * (`transform`) based signatures are CodegenFallback in Spark —
    * interpreted per row — so explode→aggregate is the scale path either
    * way.
    */
  def permutedHash(token: Column, coeff: (Long, Long)): Column =
    pmod(pmod(token, lit(MinhashPrime)) * coeff._1 + coeff._2, lit(MinhashPrime))

  /** LSH band keys: split the signature into `numBands` rows of width
    * r = numPerm/numBands, hash each row (band index is salted in so bands
    * never collide across positions). Returns array<long> of band hashes.
    */
  def lshBands(sig: Column, numPerm: Int, numBands: Int): Column = {
    val r = numPerm / numBands
    require(r * numBands == numPerm, "numBands must divide numPerm")
    val bands = (0 until numBands).map { bi =>
      xxhash64(lit(bi), concat_ws(",", slice(sig, bi * r + 1, r)))
    }
    array(bands: _*)
  }

  /** Packed SimHash bit-count term in Column form: bits 4g..4g+3 of the
    * token hash, each as a 16-bit count field of one long (caps at 65,535
    * tokens per document). The production signature path is the custom
    * `graft_simhash` TypedImperativeAggregate (expressions.SimHashAgg —
    * whole signature in one aggregate); this Column construction
    * documents the counting rule and pins the aggregate's correctness in
    * tests.
    */
  def simhashPackedVotes(tokenHash: Column, group: Int): Column =
    (0 until 4).map { k =>
      shiftright(tokenHash, group * 4 + k).bitwiseAND(1) * lit(1L << (16 * k))
    }.reduce(_ + _)

  /** Assemble the 64-bit signature from 16 packed count sums + the token
    * count: bit b is set iff more than half the token hashes set bit b
    * (2·count > n ⟺ the ±1 vote sum is positive). Disjoint bit
    * contributions combine with +, which equals OR here (including the
    * sign bit: two's-complement add wraps).
    */
  def simhashFromPacked(packed: Seq[Column], nTokens: Column): Column =
    (0 until 64).map { b =>
      val cnt = shiftrightunsigned(packed(b / 4), 16 * (b % 4)).bitwiseAND(0xFFFFL)
      when(cnt * 2 > nTokens, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Engine-portable 60-bit token hash: the first 15 hex chars of md5,
    * parsed as an integer. Any SQL oracle can replay it (hex parse +
    * horner fold), unlike xxhash64 — which remains the cheaper
    * production-cluster choice where verification is done differently.
    * 60 bits keep the value positive in a signed 64-bit long on every
    * engine.
    */
  def portableTokenHash(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Normalized-text fingerprint: lowercase, collapse non-alnum runs to
    * single spaces, hash. Two documents differing only in case /
    * punctuation / whitespace get the same fingerprint. md5 keeps the
    * fingerprint engine-portable (verifiable against any SQL oracle); at
    * cluster scale a 64-bit xxhash64 of the same normalized text is the
    * cheaper drop-in (8 bytes vs 32, one pass, no digest state).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9]+", " ").cast("binary"))
}
