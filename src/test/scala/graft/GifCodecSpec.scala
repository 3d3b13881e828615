package graft

import org.apache.spark.sql.functions._

import graft.operators.{GifCodec, Multimodal, PngCodec}

/** GIF codec correctness, cross-checked both directions against the
  * JDK's independent ImageIO GIF implementation (TEST-ONLY, like the
  * JPEG cross-oracle — no `javax.imageio` in main source). GIF is
  * lossless indexed color, so every comparison is pixel-EXACT. */
class GifCodecSpec extends SparkSpec {
  import spark.implicits._

  private def gradAt(id: Long, x: Int, y: Int): Int =
    ((id + x * 7L + y * 13L) % 256).toInt

  private def assertGradient(r: PngCodec.Raster, id: Long, w: Int, h: Int): Unit = {
    assert(r.width == w && r.height == h && r.channels == 3)
    for (y <- 0 until h; x <- 0 until w) {
      val v = gradAt(id, x, y)
      val o = (y * w + x) * 3
      assert((r.pixels(o) & 0xff) == v && (r.pixels(o + 1) & 0xff) == v &&
        (r.pixels(o + 2) & 0xff) == v, s"pixel ($x,$y)")
    }
  }

  test("encodeGradient → decode round-trips pixels exactly; size is the closed form") {
    for ((id, w, h) <- Seq((7L, 33, 21), (1L, 1, 1), (42L, 255, 3), (9L, 8, 300))) {
      val bytes = GifCodec.encodeGradient(id, w, h)
      assert(bytes.length == GifCodec.gradientByteSize(w, h), s"${w}x$h")
      assertGradient(GifCodec.decode(bytes), id, w, h)
    }
  }

  test("interlaced encode decodes to the identical visual raster") {
    for ((id, w, h) <- Seq((3L, 40, 25), (11L, 17, 9), (5L, 6, 4))) {
      val plain = GifCodec.decode(GifCodec.encodeGradient(id, w, h))
      val inter = GifCodec.decode(GifCodec.encodeGradient(id, w, h, interlaced = true))
      assert(plain.pixels.sameElements(inter.pixels), s"${w}x$h")
    }
  }

  test("cross-oracle: ImageIO reads our bytes pixel-identically, both layouts") {
    for (interlaced <- Seq(false, true); (id, w, h) <- Seq((13L, 31, 18), (2L, 9, 40))) {
      val bytes = GifCodec.encodeGradient(id, w, h, interlaced)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null && img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val v = gradAt(id, x, y)
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) == v && ((rgb >> 8) & 0xff) == v &&
          (rgb & 0xff) == v, s"interlaced=$interlaced pixel ($x,$y)")
      }
    }
  }

  test("cross-oracle: our decoder reads ImageIO's REAL-LZW bytes pixel-identically") {
    // ImageIO writes genuinely compressed LZW with code-width growth —
    // the path the literal-code gradient never exercises. The write
    // path converts colors (TYPE_BYTE_GRAY goes through a linear-gray
    // colorspace), so the reference is ImageIO's OWN read-back of the
    // same bytes, compared pixel-exact against our decode.
    for ((id, w, h) <- Seq((21L, 64, 48), (8L, 130, 7))) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w) {
        val v = gradAt(id, x, y)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "gif", baos))
      val bytes = baos.toByteArray
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val r = GifCodec.decode(bytes)
      assert(r.width == w && r.height == h)
      var distinct = 0
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = ref.getRGB(x, y)
        val o = (y * w + x) * 3
        assert((r.pixels(o) & 0xff) == ((rgb >> 16) & 0xff) &&
          (r.pixels(o + 1) & 0xff) == ((rgb >> 8) & 0xff) &&
          (r.pixels(o + 2) & 0xff) == (rgb & 0xff), s"pixel ($x,$y)")
        if (x > 0 && ref.getRGB(x, y) != ref.getRGB(x - 1, y)) distinct += 1
      }
      // guard against a degenerate all-one-color write making the
      // comparison vacuous
      assert(distinct > w, "reference image unexpectedly flat")
    }
  }

  test("malformed payloads fail loudly; aHashAny maps them to null instead") {
    val good = GifCodec.encodeGradient(1L, 20, 10)
    intercept[IllegalArgumentException] { GifCodec.decode(good.take(40)) }
    intercept[IllegalArgumentException] { GifCodec.decode("GIF89a junk".getBytes) }
    val noFrame = good.take(13 + 768) ++ Array[Byte](0x3b)
    intercept[IllegalArgumentException] { GifCodec.decode(noFrame) }
    assert(Multimodal.aHashAny(good.take(40)) == null)
    assert(Multimodal.aHashAny(good) != null)
    // crafted 0xFFFF x 0xFFFF logical screen: w*h*3 would overflow Int
    // into NegativeArraySizeException (uncatchable by the null-mapping
    // arm) — must fail the require instead, and hash to null
    val crafted = good.clone()
    crafted(6) = 0xff.toByte; crafted(7) = 0xff.toByte
    crafted(8) = 0xff.toByte; crafted(9) = 0xff.toByte
    assert(intercept[IllegalArgumentException] { GifCodec.decode(crafted) }
      .getMessage.contains("implausible"))
    assert(Multimodal.aHashAny(crafted) == null)
  }

  test("parseDims and the cross-format hash space cover GIF") {
    val bytes = GifCodec.encodeGradient(5L, 24, 16)
    assert(Multimodal.parseDims(bytes) == (("gif", 24, 16)))
    // a BMP of the same gray gradient must hash IDENTICALLY (both
    // lossless, same visual pixels) — wait: encodeBmp uses the COLOR
    // gradient, so compare against the raster hash instead
    val viaRaster = Multimodal.aHashRaster(GifCodec.decode(bytes))
    assert(Multimodal.aHashAny(bytes) == viaRaster)
  }

  test("resizeGif: NN resample, re-indexed palette, pixel-exact vs the raster path") {
    for ((id, w, h, pct) <- Seq((4L, 40, 26, 50), (9L, 9, 31, 150), (2L, 3, 3, 100))) {
      val src = GifCodec.encodeGradient(id, w, h)
      val resized = GifCodec.resizeGif(src, pct)
      val expect = PngCodec.resize(GifCodec.decode(src), pct)
      assert(resized.length == GifCodec.gradientByteSize(expect.width, expect.height))
      val back = GifCodec.decode(resized)
      assert(back.width == expect.width && back.height == expect.height)
      assert(back.pixels.sameElements(expect.pixels), s"$id ${w}x$h@$pct%")
      // ImageIO agrees on the re-encoded bytes too
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
      assert(img.getWidth == expect.width && img.getHeight == expect.height)
    }
  }

  test("animated GIF: metadata walk, first-frame decode, closed-form size") {
    for ((id, w, h, nf, d) <- Seq((5L, 21, 13, 3, 10), (9L, 6, 8, 1, 0), (2L, 30, 5, 4, 35))) {
      val bytes = GifCodec.encodeAnimated(id, w, h, nf, d)
      assert(bytes.length == GifCodec.animatedByteSize(w, h, nf))
      val m = GifCodec.parseMeta(bytes)
      assert(m == GifCodec.GifMeta(w, h, nf, nf > 1, nf.toLong * d * 10), m.toString)
      // decode returns the FIRST frame (seed = id), ignoring the rest
      assertGradient(GifCodec.decode(bytes), id, w, h)
      // ImageIO agrees on the container's first frame
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img.getWidth == w && img.getHeight == h)
    }
    // single-frame static images report no animation and zero duration
    val m1 = GifCodec.parseMeta(GifCodec.encodeGradient(3L, 10, 10))
    assert(m1 == GifCodec.GifMeta(10, 10, 1, animated = false, 0L))
    intercept[IllegalArgumentException] {
      GifCodec.parseMeta(GifCodec.encodeAnimated(1L, 9, 9, 2, 10).take(900))
    }
  }

  test("encodeIndexed fails loudly past 256 distinct colors") {
    // a 17x16 full-color gradient raster: >256 distinct RGB triples
    val r = PngCodec.gradient(0L, 17, 16)
    intercept[IllegalArgumentException] { GifCodec.encodeIndexed(r) }
  }

  test("distributed encode → aHashAnyFrame: one hash space, mixed layouts") {
    val dims = Seq((1L, 33, 21), (2L, 40, 25), (3L, 17, 9))
      .toDF("id", "w", "h")
    val hashed = Multimodal.aHashAnyFrame(
      Multimodal.encodeGifFrame(dims, "id", "w", "h", interlaceEvery = 2))
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    for ((id, w, h) <- Seq((1L, 33, 21), (2L, 40, 25), (3L, 17, 9))) {
      val expect = Multimodal.aHashRaster(
        GifCodec.decode(GifCodec.encodeGradient(id, w, h)))
      assert(hashed(id) == expect, s"id=$id")
    }
  }
}
