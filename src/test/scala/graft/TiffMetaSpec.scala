package graft

import graft.operators.TiffMeta

class TiffMetaSpec extends SparkSpec {

  test("encode → parse round-trips dims, depth, channels; 62-byte closed form") {
    for ((w, h) <- Seq((1, 1), (640, 480), (65535, 1)); bps <- Seq(1, 8, 16);
         spp <- Seq(1, 3, 4)) {
      val bytes = TiffMeta.encode(w, h, bps, spp)
      assert(bytes.length == 62)
      val m = TiffMeta.parse(bytes)
      assert(m != null && !m.bigEndian && m.nIfdEntries == 4)
      assert(m.width == w && m.height == h &&
        m.bitsPerSample == bps && m.samplesPerPixel == spp)
    }
  }

  test("big-endian (MM) files parse through the same walk — ImageIO cross-check") {
    // write a real big-endian TIFF with the JDK writer and parse it
    val img = new java.awt.image.BufferedImage(31, 17,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 17; x <- 0 until 31) img.setRGB(x, y, (x * 31 + y) << 8)
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("tiff")
    assume(writers.hasNext, "JDK TIFF writer unavailable")
    val wr = writers.next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(img)
    wr.dispose(); ios.close()
    val m = TiffMeta.parse(bos.toByteArray)
    assert(m != null, "JDK-written TIFF must parse")
    assert(m.width == 31 && m.height == 17 && m.samplesPerPixel == 3 &&
      m.bitsPerSample == 8)
  }

  test("corrupt payloads fail loudly; non-TIFF returns null") {
    assert(TiffMeta.parse("not a tiff".getBytes) == null)
    val good = TiffMeta.encode(10, 10)
    assert(intercept[IllegalArgumentException] {
      TiffMeta.parse(good.take(30)) // IFD truncated
    }.getMessage.contains("overruns"))
    // an IFD missing the dims tags is rejected
    val noDims = good.clone()
    noDims(10) = 0x99.toByte; noDims(11) = 0x99.toByte // retag ImageWidth
    noDims(22) = 0x99.toByte; noDims(23) = 0x99.toByte // retag ImageLength
    assert(intercept[IllegalArgumentException] {
      TiffMeta.parse(noDims)
    }.getMessage.contains("ImageWidth"))
    intercept[IllegalArgumentException] { TiffMeta.encode(0, 5) }
    intercept[IllegalArgumentException] { TiffMeta.encode(5, 70000) }
  }

  test("extractTiffMeta: distributed walk, unknown passthrough") {
    import spark.implicits._
    val rows = Seq(
      (1L, TiffMeta.encode(800, 600, 8, 3)),
      (2L, graft.operators.PngCodec.encode(graft.operators.PngCodec.gradient(1L, 4, 4))),
      (3L, null.asInstanceOf[Array[Byte]]))
    val out = graft.operators.Multimodal.extractTiffMeta(
        rows.toDF("media_id", "data").repartition(2))
      .collect().map(f => f.mediaId -> f).toMap
    assert(out(1L).format == "tiff" && out(1L).width == 800 &&
      out(1L).byteLen == 62)
    assert(out(2L).format == "unknown", "a PNG must not parse as TIFF")
    assert(out(3L).format == "unknown" && out(3L).byteLen == 0)
  }
}
