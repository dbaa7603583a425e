package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media (image/audio/video) modeled as opaque
  * `binary` payload columns with a typed metadata struct alongside. The
  * Spark-side machinery — schema, batch shape, partition-parallel feature
  * extraction — is real; the actual media decode is STUBBED with a
  * deterministic fake (this container has no image/audio codecs), clearly
  * marked below. Swapping in a real decoder changes only `fakeDecode`.
  */
object Multimodal {

  /** Build a (id, payload binary, meta struct) frame from documents — the
    * canonical multimodal layout: payload is the raw media bytes, meta is
    * typed (mime, n_bytes).
    */
  def asBinaryPayload(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        length(col("text").cast("binary")).as("n_bytes")).as("meta"))

  /** ======= STUB: deterministic fake "decode + feature extract" =======
    * A real implementation would decode payload bytes (JPEG/WAV/...) and
    * emit fixed-size features per record via partition-parallel batch UDFs.
    * The fake derives features purely from the bytes (lengths, hashes,
    * leading byte) so results are deterministic and the distributed
    * plumbing (projection width, partitioning, no shuffle) is identical.
    */
  def extractFeatures(payload: DataFrame): DataFrame =
    payload.select(
      col("doc_id"),
      col("meta.mime").as("mime"),
      col("meta.n_bytes").as("n_bytes"),
      crc32(col("payload")).as("checksum"),
      xxhash64(col("payload")).as("content_hash"),
      // "thumbnail": first 8 bytes as hex — stands in for a decoded preview
      hex(substring(col("payload"), 1, 8)).as("head_hex"))

  /** End-to-end multimodal pipeline on the fixtures: payloadize → extract. */
  def pipeline(s: SparkSession, dir: String): DataFrame =
    extractFeatures(asBinaryPayload(s, dir))
}
