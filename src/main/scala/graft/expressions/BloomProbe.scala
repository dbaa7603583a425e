package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain

/** Registration shim for Spark's native `BloomFilterMightContain`
  * predicate — the codegen'd probe expression the engine itself uses for
  * runtime row-level filtering (InjectRuntimeFilter), but which is not in
  * the public function registry. Registering it as
  * `graft_bloom_might_contain(bloom_bytes, hash64)` lets operators apply
  * a pre-built Bloom filter as a whole-stage-codegen map-side predicate
  * instead of a per-row Scala UDF.
  *
  * Contract (mirrors the engine's own usage): the first argument must be
  * a FOLDABLE binary — the serialized `org.apache.spark.util.sketch
  * .BloomFilter` (the expression deserializes it once per task, not per
  * row); the second a 64-bit hash of the probed value, with the SAME hash
  * applied on the build side (`putLong`) — graft uses `xxhash64` on both.
  */
object BloomProbe {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
}
