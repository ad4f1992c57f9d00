package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque media record: binary payload + typed metadata — the storage
  * model for image/audio/video columns at 100 TB (payload stays a
  * parquet binary chunk; metadata is columnar and prunable). */
final case class MediaRecord(
    doc_id: Long,
    media_type: String,
    payload: Array[Byte],
    n_chars: Long)

/** Decoded-media features. In a production pipeline these come from a
  * real decoder (JPEG dims, audio duration, ...); here the decode step
  * is STUBBED deterministically (see [[Multimodal.decodeStub]]). */
final case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Long,
    content_md5: String,
    fake_width: Int,
    fake_height: Int)

/** Per-record decode outcome: features when the payload decodes, a
  * typed error otherwise — a real codec fails on real data, and a 100 TB
  * pipeline must account for every failure instead of throwing away the
  * task (one bad blob must never kill a 10⁹-row partition). */
final case class MediaDecodeResult(
    doc_id: Long,
    content_md5: Option[String],
    error: Option[String])

/** Multimodal-column plumbing (north-star extension; BASELINE.json:6):
  * treat media as opaque `binary` columns with typed metadata, and run
  * decode / feature-extraction as a partition-batched typed map.
  *
  * The Spark-side mechanics — schema, Encoders, partition batch shape,
  * per-partition decoder initialization — are real and tested; ONLY the
  * media decode itself is a deterministic stub (this container ships no
  * image/audio codecs). Swap `decodeStub` for a real codec without
  * touching the dataflow: mapPartitions hands each task an iterator so
  * the decoder (like a Pandas-UDF batch model) is initialized once per
  * partition, not once per row.
  */
object Multimodal {

  /** Pack text rows as opaque binary payloads + metadata — stands in
    * for reading real media blobs; the binary column is genuinely
    * BinaryType in the schema. */
  def packBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("text/plain").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      col("n_chars"))

  /** STUB decoder — deterministic fake features derived from payload
    * bytes + metadata. A real implementation would parse the media
    * container here. Marked stub by contract: fake_width/fake_height
    * are synthetic. */
  private def decodeStub(md5: java.security.MessageDigest)(r: MediaRecord): MediaFeatures = {
    md5.reset()
    val digest = md5.digest(r.payload).map("%02x".format(_)).mkString
    MediaFeatures(
      doc_id = r.doc_id,
      media_type = r.media_type,
      n_bytes = r.payload.length.toLong,
      content_md5 = digest,
      fake_width = (32 + r.n_chars % 480).toInt,
      fake_height = (32 + (r.n_chars * 7) % 480).toInt)
  }

  /** Partition-batched feature extraction: one decoder instance per
    * partition, streamed over the iterator (constant memory per task
    * regardless of partition size). */
  def extractFeatures(spark: SparkSession, packed: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    packed.as[MediaRecord].mapPartitions { it =>
      val md5 = java.security.MessageDigest.getInstance("MD5") // per-partition init
      it.map(decodeStub(md5))
    }
  }

  /** Deterministic corpus corruption for exercising the decode error
    * path: every `everyNth` doc's payload is truncated to
    * floor(n_chars / 2) bytes — strictly fewer bytes than the declared
    * char count, which the decoder must reject. */
  def corruptPayloads(packed: DataFrame, everyNth: Long = 50): DataFrame =
    packed.withColumn("payload",
      when(col("doc_id") % everyNth === 0 && col("n_chars") > 0,
        expr("substring(payload, 1, cast(floor(n_chars / 2) as int))"))
        .otherwise(col("payload")))

  /** Decode with per-record error accounting — the honest failure mode
    * of the stub codec: a payload carrying fewer bytes than its declared
    * character count cannot be a complete text/plain body, so it yields
    * NULL features plus a typed error instead of an exception. Rows
    * never disappear and tasks never die on bad blobs; downstream
    * filters on `error IS NULL` (or aggregates the error histogram). */
  def decodeWithErrors(spark: SparkSession, packed: DataFrame): Dataset[MediaDecodeResult] = {
    import spark.implicits._
    packed.as[MediaRecord].mapPartitions { it =>
      val md5 = java.security.MessageDigest.getInstance("MD5") // per-partition init
      it.map { r =>
        if (r.payload.length < r.n_chars)
          MediaDecodeResult(r.doc_id, None, Some("TRUNCATED_PAYLOAD"))
        else {
          md5.reset()
          val digest = md5.digest(r.payload).map("%02x".format(_)).mkString
          MediaDecodeResult(r.doc_id, Some(digest), None)
        }
      }
    }
  }

  /** Distinct byte k-grams of an opaque binary payload, as (doc_id, s)
    * shingle rows with `s` BINARY — the deterministic content feature
    * the near-dup tier fingerprints, defined for ARBITRARY binary with
    * no charset assumption; for a real media pipeline this is the
    * stand-in for a perceptual feature extractor (pHash blocks, audio
    * chroma frames), which slots into the same (doc_id, s) contract.
    *
    * byteK = 16 measured: byte 4-grams are vocabulary-correlated
    * across unrelated payloads (123 k candidate pairs on 500 docs),
    * 16-byte windows decorrelate to 20 k while planted near-dups stay
    * at J ≥ 0.8 with nothing between 0.5 and 0.8.
    *
    * Shape: explode(sequence) + a TOP-LEVEL binary substring — all
    * codegen'd. The natural HOF spelling (transform over a hex
    * rendering) runs the lambda interpreted and carries 2× strings,
    * measured 10.4 s vs 1.6 s here for the same 1.4 M grams at sf0.1;
    * gram REPRESENTATION is engine-internal (the output contract is
    * the pair set), so the oracle's hex-substring grams and these
    * binary grams induce identical pairs (the round-18 probe pinned
    * the two gram multisets equal before the hex form was dropped;
    * docs/EXPERIMENTS.md). */
  def payloadShingles(packed: DataFrame, byteK: Int = 16): DataFrame =
    packed.select(col("doc_id"), col("payload"))
      .filter(length(col("payload")) >= byteK)
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(1), length(col("payload")) - (byteK - 1))).as("i"))
      .select(col("doc_id"), expr(s"substring(payload, i, $byteK)").as("s"))
      .distinct()

  /** Binary-payload NEAR-duplicate pairs (VERDICT r8 #6 — the
    * perceptual-hash-style dedup tier over opaque media columns):
    * byte-16-gram features → 64-bit SimHash fingerprint → 4-bit-band
    * bucket join (pigeonhole-complete for hamming ≤ 15) → hamming
    * refine → EXACT byte-gram Jaccard verify — [[Dedup]]'s banded
    * machinery verbatim on payload features
    * ([[Dedup.simhashDedupFromShingles]]), never all-pairs. The
    * output contract is the exact Jaccard set, so the quadratic oracle
    * the engine never runs can replay it in SQL; only candidate
    * GENERATION is approximate, and DedupSpec pins planted-pair
    * recall through the banding. Exact byte-level duplicates are the
    * md5 groupBy ([[extractFeatures]]' content_md5); this tier is for
    * payloads that differ in a bounded fraction of their content. */
  def mediaNearDup(packed: DataFrame, maxHamming: Int = 15,
      threshold: Double = 0.8, words: Int = 1, byteK: Int = 16): DataFrame = {
    // the gram stream feeds the fingerprint aggregate AND all four
    // verify-stage consumers — checkpoint it once (measured: the
    // recomputed form spent ~half the query re-generating grams)
    val (sh, _, _) = Iterate.ckpt(payloadShingles(packed, byteK))
    Dedup.simhashDedupFromShingles(sh, maxHamming, threshold, words)
  }

  /** Frame sampling for time-based media: one row per sampled frame,
    * deterministic frame count from metadata (stub for container
    * duration). explode keeps this fully distributed — no driver loop. */
  def sampleFrames(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      explode(sequence(lit(0L), col("n_chars") % 10)).as("frame_idx"))
}
