package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{spark, sf0001}

class MultimodalSpec extends AnyFunSuite {

  test("feature extraction: full coverage, fixed dim, deterministic") {
    val media = Multimodal.mediaFromDocuments(spark, sf0001)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == media.count())
    assert(feats.forall(_.features.length == Multimodal.FeatureDim))
    // strided octet pooling: each feature is a sum of octets, and together
    // they partition the payload — their total equals the sum of all bytes
    assert(feats.forall(f => f.features.forall(v => v >= 0L && v <= 255L * f.n_bytes)))
    val media0 = media.collect().map(m => m.media_id -> m.bytes).toMap
    assert(feats.forall(f =>
      f.features.sum == media0(f.media_id).map(b => (b & 0xff).toLong).sum))
    val again = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(feats.forall(f => again(f.media_id) == f.features.toSeq))
  }

  test("n_bytes matches the payload length") {
    val feats = Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(spark, sf0001))
    val docs = graft.core.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "octet_length(text) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(feats.collect().forall(f => docs(f.media_id) == f.n_bytes))
  }

  test("frame sampling keeps every stride-th fixed-size chunk") {
    val frames = Multimodal.sampleFrames(
      Multimodal.mediaFromDocuments(spark, sf0001), chunkSize = 64, stride = 4)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(1) % 4 == 0))
    assert(rows.filter(_.getInt(1) > 0).forall(r => r.getInt(2) <= 64))
  }

  test("embed top-k: well-formed ranking; identical payloads embed identically") {
    // ranking invariants over the corpus
    val rows = Multimodal.mediaEmbedTopK(spark, sf0001).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.size == 20)
    byQuery.values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).sameElements(1L to sorted.length))
      val cs = sorted.map(_.getDouble(2))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
    // byte-identical payloads => identical embeddings => cosine exactly 1
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRecord(0L, "img", "same payload bytes".getBytes, 0, 0),
      Multimodal.MediaRecord(1L, "img", "same payload bytes".getBytes, 0, 0),
      Multimodal.MediaRecord(2L, "img", "other content here!".getBytes, 0, 0)
    ).toDS()
    val f = Multimodal.extractFeatures(media).collect()
      .map(m => m.media_id -> m.features.toSeq).toMap
    assert(f(0L) == f(1L) && f(0L) != f(2L))
  }
}
