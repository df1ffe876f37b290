package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Multimodal (binary) column pipeline for training-data preparation.
  *
  * Media rides as an opaque `binary` column with typed metadata — the
  * pattern that scales: bytes never round-trip through JVM object graphs,
  * scans prune to metadata columns unless features are actually computed,
  * and decode/feature-extract runs batched per partition.
  *
  * The actual image/audio decode is STUBBED (no codec libraries in this
  * environment): [[FakeDecoder]] produces deterministic pseudo-features
  * from the bytes. Everything AROUND the stub — schema, batching,
  * partition-parallel execution, feature vector shape — is real and
  * tested; swapping FakeDecoder for a JNI/javacv decoder changes one
  * function.
  */
object Multimodal {

  case class MediaRecord(media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      features: Array[Long])

  val FeatureDim = 8

  /** STUB decoder: stands in for image decode + feature extraction.
    * Deterministic in the bytes; replace with a real codec at the same
    * signature. A real implementation would decode `bytes` (JPEG/PNG/...)
    * and pool activations or pixel statistics into the feature vector.
    *
    * The stand-in "pooling" is strided octet sums — feature i sums every
    * octet at position ≡ i (mod dim). Chosen because it is the same KIND of
    * reduction a real extractor performs (channel pooling) while being
    * plain byte arithmetic, so the whole pipeline is oracle-checkable in
    * SQL (unlike a seeded-hash pseudo-feature). */
  object FakeDecoder {
    def features(bytes: Array[Byte], dim: Int = FeatureDim): Array[Long] = {
      val out = new Array[Long](dim)
      var j = 0
      while (j < bytes.length) {
        // ??? real decode goes here — strided octet pooling stands in
        out(j % dim) += (bytes(j) & 0xff).toLong
        j += 1
      }
      out
    }
  }

  /** Synthesize a media table from the documents corpus (UTF-8 bytes as the
    * opaque payload) — the environment ships no binary fixtures, and the
    * plumbing is payload-agnostic by design. */
  def mediaFromDocuments(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"), lit("text").as("kind"),
        encode(col("text"), "UTF-8").as("bytes"),
        lit(0).as("width"), lit(0).as("height"))
      .as[MediaRecord]
  }

  /** Batched per-partition feature extraction — the mapInPandas-shaped
    * plumbing (iterator-of-batches in, iterator-of-batches out), here as
    * mapPartitions so the decode amortizes any per-batch setup (model
    * load, codec init) once per partition, not per row. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup happens HERE (once), e.g. codec/model init
      it.map { m =>
        MediaFeatures(m.media_id, m.kind, m.bytes.length.toLong,
          FakeDecoder.features(m.bytes))
      }
    }
  }

  /** Frame sampling plumbing: split the payload into fixed-size chunks and
    * keep every `stride`-th one (what frame extraction does to video;
    * here over opaque bytes). */
  def sampleFrames(media: Dataset[MediaRecord], chunkSize: Int = 64,
      stride: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      m.bytes.grouped(chunkSize).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (chunk, idx) => (m.media_id, idx, chunk.length, chunk) }
    }.toDF("media_id", "frame_idx", "frame_bytes_len", "frame_bytes")
  }

  /** Query mm02: frame-sampling plumbing over the corpus (every 4th
    * 64-byte chunk), emitting per-frame sizes. */
  def frameSampleQuery(s: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaFromDocuments(s, dir))
      .select(col("media_id"), col("frame_idx"),
        col("frame_bytes_len").cast("long").as("frame_len"))
      .orderBy(col("media_id"), col("frame_idx"))

  /** Query mm01: feature extraction over the corpus. Features are exploded
    * to scalar columns for a stable parquet schema. */
  def mediaFeaturesQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    extractFeatures(mediaFromDocuments(s, dir))
      .toDF()
      .select(
        col("media_id"), col("kind"), col("n_bytes"),
        element_at(col("features"), 1).as("f0"),
        element_at(col("features"), 2).as("f1"),
        element_at(col("features"), 3).as("f2"))
      .orderBy(col("media_id"))
  }
}
