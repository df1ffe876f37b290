package graft.tools

/** Dev micro-probe (no Spark): isolates the GIF/PNG fixture codec's
  * per-row cost — registry lookup vs stream creation vs encode vs decode
  * — to size the mm-family optimization before touching the hot path. */
object MmProbe {
  def main(args: Array[String]): Unit = {
    javax.imageio.ImageIO.setUseCache(false)
    val payload = ("the quick brown fox jumps over the lazy dog " * 8).getBytes("UTF-8")
    val n = 2000
    def timed(label: String)(f: => Unit): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime(); f
      val dt = System.nanoTime() - t0
      println(f"[mmprobe] $label run$i: ${dt / 1e6}%.1f ms total, ${dt / 1e3 / n}%.2f us/row")
    }
    val png = graft.operators.Multimodal.ImageFixtures.grayPng(payload)
    val gif = graft.operators.Multimodal.GifFixtures.grayAnimatedGif(payload)

    timed("A_createImageInputStream_registry") {
      (1 to n).foreach { _ =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(png))
        iis.close()
      }
    }
    timed("B_MemoryCacheIIS_direct") {
      (1 to n).foreach { _ =>
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(png))
        iis.close()
      }
    }
    timed("C_getImageReaders_on_direct_iis") {
      (1 to n).foreach { _ =>
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(png))
        val it = javax.imageio.ImageIO.getImageReaders(iis)
        it.next().dispose(); iis.close()
      }
    }
    // cached reader, direct stream
    val pngReader = {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(png))
      val r = javax.imageio.ImageIO.getImageReaders(iis).next()
      iis.close(); r
    }
    timed("D_decode_cached_reader") {
      (1 to n).foreach { _ =>
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(png))
        pngReader.setInput(iis, true, false)
        pngReader.read(0)
        iis.close()
      }
    }
    timed("E_png_decode_current") {
      (1 to n).foreach(_ => graft.operators.Multimodal.ImageDecoder.features(png))
    }
    timed("F_png_encode_current") {
      (1 to n).foreach(_ => graft.operators.Multimodal.ImageFixtures.grayPng(payload))
    }
    // cached PNG writer + direct output stream
    val pngWriter = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    timed("G_png_encode_cached_writer") {
      (1 to n).foreach { _ =>
        val img = new java.awt.image.BufferedImage(16, 16,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val bos = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        pngWriter.setOutput(ios)
        pngWriter.write(img)
        ios.close()
      }
    }
    timed("H_gif_encode_current") {
      (1 to n).foreach(_ => graft.operators.Multimodal.GifFixtures.grayAnimatedGif(payload))
    }
    val gifWriter = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val grays = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    timed("I_gif_encode_cached_writer") {
      (1 to n).foreach { _ =>
        val bos = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        gifWriter.setOutput(ios)
        gifWriter.prepareWriteSequence(null)
        (0 until 8).foreach { f =>
          val img = new java.awt.image.BufferedImage(16, 16,
            java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
          gifWriter.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        }
        gifWriter.endWriteSequence()
        ios.close()
      }
    }
    timed("J_gif_decode_current") {
      (1 to n).foreach(_ => graft.operators.Multimodal.GifDecoder.frames(gif))
    }
    val gifReader = {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(gif))
      val r = javax.imageio.ImageIO.getImageReaders(iis).next()
      iis.close(); r
    }
    timed("K_gif_decode_cached_reader") {
      (1 to n).foreach { _ =>
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(gif))
        gifReader.setInput(iis, false, false)
        val cnt = gifReader.getNumImages(true)
        (0 until cnt).foreach(i => gifReader.read(i))
        iis.close()
      }
    }
  }
}
