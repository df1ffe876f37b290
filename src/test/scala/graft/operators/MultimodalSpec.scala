package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{spark, sf0001}

class MultimodalSpec extends AnyFunSuite {

  test("image path decodes a real PNG through javax.imageio") {
    // known 2x2 checkerboard, hand-built, encoded and decoded for real
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setSample(0, 0, 0, 255)
    img.getRaster.setSample(1, 0, 0, 0)
    img.getRaster.setSample(0, 1, 0, 0)
    img.getRaster.setSample(1, 1, 0, 255)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    // it really is a PNG container (magic bytes), not a raw buffer
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val decoded = Multimodal.ImageDecoder.decode(png)
    assert(decoded.getWidth == 2 && decoded.getHeight == 2)
    assert(decoded.getRaster.getSample(0, 0, 0) == 255)
    assert(decoded.getRaster.getSample(1, 0, 0) == 0)
    // pooled features: dim 8 > 4 px, so each pixel lands in its own slot
    val (nPx, fs) = Multimodal.ImageDecoder.features(png)
    assert(nPx == 4L)
    assert(fs.toSeq == Seq(255L, 0L, 0L, 255L, 0L, 0L, 0L, 0L))
    // corrupt payloads fail fast instead of decoding to garbage
    intercept[IllegalArgumentException] {
      Multimodal.ImageDecoder.decode("not an image at all".getBytes)
    }
  }

  test("audio path decodes a real WAV through javax.sound.sampled") {
    val payload = "hello audio world".getBytes("UTF-8")
    val wav = Multimodal.AudioFixtures.pcm16Wav(payload)
    // it really is a RIFF/WAVE container (magic bytes), not a raw buffer
    assert(wav(0) == 'R' && wav(1) == 'I' && wav(2) == 'F' && wav(3) == 'F')
    assert(wav(8) == 'W' && wav(9) == 'A' && wav(10) == 'V' && wav(11) == 'E')
    // lossless round-trip: decoded samples equal the known sample function
    val pcm = Multimodal.AudioDecoder.pcm(wav)
    assert(pcm.length == payload.length)
    payload.indices.foreach { i =>
      assert(pcm(i) == Multimodal.AudioFixtures.sample(payload(i), i), s"sample $i")
    }
    // the position salt makes the signal actually cross zero
    assert(pcm.exists(_ > 0) && pcm.exists(_ < 0))
    // corrupt payloads fail fast instead of decoding to silence
    intercept[IllegalArgumentException] {
      Multimodal.AudioDecoder.pcm("not audio at all".getBytes)
    }
  }

  test("PNG fixtures round-trip: decoded features equal the pixel function") {
    val media = Multimodal.imageMediaFromDocuments(spark, sf0001)
    val texts = graft.core.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val feats = Multimodal.extractImageFeatures(media).collect()
    assert(feats.length == texts.size)
    feats.foreach { f =>
      assert(f.n_px == 256L) // from the DECODED image, not metadata
      val payload = texts(f.media_id).getBytes("UTF-8")
      val expect = new Array[Long](Multimodal.FeatureDim)
      (0 until 256).foreach { i =>
        val v = if (payload.isEmpty) 0L else (payload(i % payload.length) & 0xff).toLong
        expect(i % Multimodal.FeatureDim) += v
      }
      assert(f.features.toSeq == expect.toSeq, s"media ${f.media_id}")
    }
  }

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

  test("mm02 round-12: GIF container round-trip decodes the exact written frames") {
    // the written GIF is a REAL multi-frame container: the JDK reader
    // must recover every frame's pixels exactly (lossless 256-gray
    // palette), matching the fixtures' per-frame pixel function
    val payload = "graft gif frame fixture payload 0123456789".getBytes("UTF-8")
    val gif = Multimodal.GifFixtures.grayAnimatedGif(payload)
    val frames = Multimodal.GifDecoder.frames(gif)
    assert(frames.length == Multimodal.GifFrameCount)
    for (f <- frames.indices; i <- 0 until 16 * 16) {
      val expected = payload(
        (i + Multimodal.GifPixelStep * f) % payload.length) & 0xff
      val got = frames(f).getRGB(i % 16, i / 16) & 0xff
      assert(got == expected, s"frame $f pixel $i: $got != $expected")
    }
    // empty payload decodes to all-zero frames, not a crash
    val empty = Multimodal.GifDecoder.frames(
      Multimodal.GifFixtures.grayAnimatedGif(Array.empty[Byte]))
    assert(empty.forall(Multimodal.GifDecoder.pixelSum(_) == 0L))
    // undecodable bytes fail fast
    intercept[Exception] {
      Multimodal.GifDecoder.frames("not a gif at all".getBytes)
    }
    // the query equals a driver recompute of the sampled frames' sums
    val got = Multimodal.frameSampleQuery(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = (for {
      (id, text) <- docs
      bytes = text.getBytes("UTF-8")
      f <- 0 until Multimodal.GifFrameCount
      if f % Multimodal.GifFrameStride == 0
    } yield {
      val sum = (0 until 256).map(i =>
        if (bytes.isEmpty) 0L
        else (bytes((i + Multimodal.GifPixelStep * f) % bytes.length) & 0xff).toLong).sum
      (id, f.toLong, 256L, sum)
    }).sortBy(t => (t._1, t._2))
    assert(got.toSeq == expected.toSeq)
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

  test("aHash64: bits follow the block-vs-global mean rule; odd dims fail") {
    // left half black, right half bright: exactly the right-half blocks
    // (bx >= 4) exceed the global mean
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 16)
      img.getRaster.setSample(x, y, 0, if (x < 8) 0 else 200)
    val h = Multimodal.ImageDecoder.aHash64(img)
    val expect = (0 until 64).foldLeft(0L) { (acc, b) =>
      if (b % 8 >= 4) acc | (1L << b) else acc
    }
    assert(h == expect)
    // a flat image has no block above the mean — hash 0
    val flat = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 16) flat.getRaster.setSample(x, y, 0, 77)
    assert(Multimodal.ImageDecoder.aHash64(flat) == 0L)
    intercept[IllegalArgumentException] {
      Multimodal.ImageDecoder.aHash64(new java.awt.image.BufferedImage(
        10, 10, java.awt.image.BufferedImage.TYPE_BYTE_GRAY))
    }
  }

  test("quarantine: corrupt containers become verdict rows, clean rows survive") {
    import spark.implicits._
    import Multimodal._
    // one clean + one corrupt container per codec family
    val junk = "definitely not a media container".getBytes("UTF-8")
    val truncPng = ImageFixtures.grayPng("hello world".getBytes).take(20)
    val images = Seq(
      MediaRecord(1L, "image", ImageFixtures.grayPng("clean doc".getBytes), 16, 16),
      MediaRecord(2L, "image", junk, 16, 16),
      MediaRecord(3L, "image", truncPng, 16, 16)).toDS()
    val imgRows = imageFeatureRows(images).collect()
    assert(imgRows.length == 3)
    val (imgOk, imgBad) = imgRows.partition(_.err.isEmpty)
    assert(imgOk.map(_.media_id).toSet == Set(1L) && imgOk.head.n_px.contains(256L))
    assert(imgBad.map(_.media_id).toSet == Set(2L, 3L) &&
      imgBad.forall(r => r.n_px.isEmpty && r.err.exists(_.nonEmpty)))

    // GIF: undecodable bytes AND a wrong-frame-count (but valid) container
    val shortGif = GifFixtures.grayAnimatedGif("x".getBytes, frames = 3)
    val gifs = Seq(
      MediaRecord(1L, "video", GifFixtures.grayAnimatedGif("clean doc".getBytes), 16, 16),
      MediaRecord(2L, "video", junk, 16, 16),
      MediaRecord(3L, "video", shortGif, 16, 16)).toDS()
    val gifRows = gifFrameRows(gifs).collect()
    val gifOk = gifRows.filter(_.isNullAt(4))
    val gifBad = gifRows.filterNot(_.isNullAt(4))
    assert(gifOk.map(_.getLong(0)).toSet == Set(1L) &&
      gifOk.length == GifFrameCount / GifFrameStride)
    assert(gifBad.map(_.getLong(0)).toSet == Set(2L, 3L) &&
      gifBad.forall(_.isNullAt(1)))
    assert(gifBad.find(_.getLong(0) == 3L).get.getString(4).contains("expected"))

    // WAV
    val wavs = Seq(
      MediaRecord(1L, "audio", AudioFixtures.pcm16Wav("clean doc".getBytes), 0, 0),
      MediaRecord(2L, "audio", junk, 0, 0)).toDS()
    val wavRows = audioFrameRows(wavs, frameLen = 4).collect()
    val wavOk = wavRows.filter(_.isNullAt(5))
    val wavBad = wavRows.filterNot(_.isNullAt(5))
    assert(wavOk.nonEmpty && wavOk.forall(_.getLong(0) == 1L))
    assert(wavBad.map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("decode bomb guard: oversized headers quarantine BEFORE allocation") {
    import spark.implicits._
    import Multimodal._
    // a REAL png whose IHDR claims 60000x60000 (3.6 G samples): header
    // parses (CRC fixed up), so without the pre-decode cap the reader
    // would attempt a multi-GB raster allocation — an OutOfMemoryError
    // the quarantine's NonFatal wrapper deliberately does not catch
    val bomb = ImageFixtures.grayPng("x".getBytes).clone()
    def put32(a: Array[Byte], off: Int, v: Long): Unit = (0 to 3).foreach { i =>
      a(off + i) = ((v >>> (8 * (3 - i))) & 0xff).toByte
    }
    put32(bomb, 16, 60000L) // IHDR width
    put32(bomb, 20, 60000L) // IHDR height
    val crc = new java.util.zip.CRC32
    crc.update(bomb, 12, 4 + 13) // chunk type + IHDR payload
    put32(bomb, 29, crc.getValue)
    val e = intercept[IllegalArgumentException](ImageDecoder.decode(bomb))
    assert(e.getMessage.contains("bomb"))
    // and through the dataset path: an err verdict, not a dead executor
    val rows = imageFeatureRows(
      Seq(MediaRecord(1L, "image", bomb, 16, 16)).toDS()).collect()
    assert(rows.head.err.exists(_.contains("bomb")))

    // multi-frame axis: a container with more image descriptors than the
    // cap is rejected from the header scan, before any frame decodes
    val manyFrames = GifFixtures.grayAnimatedGif("x".getBytes,
      frames = MaxDecodeFrames + 1, w = 2, h = 2)
    val g = intercept[IllegalArgumentException](GifDecoder.frames(manyFrames))
    assert(g.getMessage.contains("bomb"))

    // cross-frame axis: every frame under the per-frame cap, but the
    // container's TOTAL exceeds the shared pixel budget (frames x pixels
    // is the product bomb the independent caps would admit) — rejected
    // from the running total before the overflow frame's pixels allocate
    val product = GifFixtures.grayAnimatedGif(Array.emptyByteArray,
      frames = 2, w = 6000, h = 6000) // 36M px/frame, 72M total > 64M cap
    val t = intercept[IllegalArgumentException](GifDecoder.frames(product))
    assert(t.getMessage.contains("across"))
  }

  test("quarantine: pair queries drop undecodable media instead of dying") {
    // mm09 on the clean corpus is EMPTY (the oracle's claim), and the
    // schema is the contract (media_id, kind, err)
    val q = Multimodal.mediaQuarantineQuery(spark, sf0001)
    assert(q.columns.toSeq == Seq("media_id", "kind", "err"))
    assert(q.count() == 0L)
  }

  test("mm04: banded candidates equal brute-force hamming (lossless at <=3)") {
    val got = Multimodal.imageNearDupQuery(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute force over the same decoded hashes — no banding
    val hashes = Multimodal.imageMediaFromDocuments(spark, sf0001).collect()
      .map(m => m.media_id ->
        Multimodal.ImageDecoder.aHash64(Multimodal.ImageDecoder.decode(m.bytes)))
      .toMap
    val ids = hashes.keys.toSeq.sorted
    val want = for {
      a <- ids; b <- ids if a < b
      d = java.lang.Long.bitCount(hashes(a) ^ hashes(b)).toLong
      if d <= 3
    } yield (a, b, d)
    assert(got.toSeq == want)
    assert(got.nonEmpty) // the fixture corpus has near-dup images
    // above 3 differing bits the 4-band pigeonhole guarantee is gone
    intercept[IllegalArgumentException] {
      Multimodal.imageNearDupQuery(spark, sf0001, maxHamming = 4)
    }
  }
}
