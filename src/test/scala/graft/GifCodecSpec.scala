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

  test("decodeFrame: every animation frame decodes as displayed; out of range fails with the count") {
    val (id, w, h, nf) = (5L, 14, 9, 4)
    val anim = GifCodec.encodeAnimated(id, w, h, nf, delayCs = 3)
    // full-screen disposal-0 frames: displayed frame k IS the gradient
    // with seed id+k — byte-compare against the single-frame encode
    for (k <- 0 until nf) {
      val got = GifCodec.decodeFrame(anim, k)
      val expect = GifCodec.decode(GifCodec.encodeGradient(id + k, w, h))
      assert(got.pixels.sameElements(expect.pixels), s"frame $k")
    }
    assert(GifCodec.decode(anim).pixels
      .sameElements(GifCodec.decodeFrame(anim, 0).pixels))
    val e = intercept[IllegalArgumentException] { GifCodec.decodeFrame(anim, nf) }
    assert(e.getMessage.contains(s"only $nf frames"))
    intercept[IllegalArgumentException] { GifCodec.decodeFrame(anim, -1) }
  }

  test("decodeFrame composites transparency and disposal (GCE honored mid-animation)") {
    // Hand-build a 3-frame 4x3 GIF over a 4-entry palette:
    //   frame 0: full-screen solid color 1
    //   frame 1: 2x2 rect at (1,1), disposal 2 (restore bg), one
    //            TRANSPARENT pixel that must show frame 0's color
    //   frame 2: 1x1 at (0,0) color 3, disposal 0
    // Displayed frame 2 = bg-restored rect area + frame-0 remnants +
    // the new pixel: every composite rule participates.
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes)
    out.write(4); out.write(0); out.write(3); out.write(0) // 4x3 screen
    out.write(0x80 | 1) // GCT, 4 entries (2 bits)
    out.write(0)        // background index 0
    out.write(0)
    val palette = Array(10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    palette.foreach(out.write)
    def gce(disposal: Int, transparentIdx: Int): Unit = {
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write((disposal << 2) | (if (transparentIdx >= 0) 1 else 0))
      out.write(0); out.write(0)
      out.write(if (transparentIdx >= 0) transparentIdx else 0)
      out.write(0)
    }
    // uncompressed-style LZW: minCode 2 → codes 3 bits+, clear=4, end=5.
    // Emit clear + literals + end, 8 pixels max per clear to keep the
    // code width at the initial 3 bits (dict grows by one per literal).
    def frame(left: Int, top: Int, fw: Int, fh: Int, idx: Seq[Int]): Unit = {
      out.write(0x2c)
      out.write(left); out.write(0); out.write(top); out.write(0)
      out.write(fw); out.write(0); out.write(fh); out.write(0)
      out.write(0) // no local table, not interlaced
      out.write(2) // LZW min code size
      val bits = new java.io.ByteArrayOutputStream()
      var acc = 0L; var nb = 0
      def put(c: Int): Unit = { acc |= (c.toLong << nb); nb += 3
        while (nb >= 8) { bits.write((acc & 0xff).toInt); acc >>= 8; nb -= 8 } }
      // clear before EVERY literal: the dictionary never grows past 6,
      // so the 3-bit code width is safe under both standard and
      // early-change width-bump decoders
      idx.foreach { i => put(4); put(i) }
      put(5)
      if (nb > 0) bits.write((acc & 0xff).toInt)
      val data = bits.toByteArray
      out.write(data.length); out.write(data, 0, data.length); out.write(0)
    }
    gce(0, -1); frame(0, 0, 4, 3, Seq.fill(12)(1))
    gce(2, 2);  frame(1, 1, 2, 2, Seq(3, 2, 3, 3)) // index 2 transparent
    gce(0, -1); frame(0, 0, 1, 1, Seq(3))
    out.write(0x3b)
    val gif = out.toByteArray
    def rgb(r: PngCodec.Raster, x: Int, y: Int): Seq[Int] = {
      val o = (y * 4 + x) * 3
      Seq(r.pixels(o) & 0xff, r.pixels(o + 1) & 0xff, r.pixels(o + 2) & 0xff)
    }
    val c = Array(Seq(10, 20, 30), Seq(40, 50, 60), Seq(70, 80, 90), Seq(100, 110, 120))
    val f0 = GifCodec.decodeFrame(gif, 0)
    for (x <- 0 until 4; y <- 0 until 3) assert(rgb(f0, x, y) == c(1))
    val f1 = GifCodec.decodeFrame(gif, 1)
    assert(rgb(f1, 1, 1) == c(3) && rgb(f1, 2, 2) == c(3)) // opaque rect pixels
    assert(rgb(f1, 2, 1) == c(1)) // transparent pixel: frame 0 shows through
    assert(rgb(f1, 0, 0) == c(1)) // outside the rect: untouched
    val f2 = GifCodec.decodeFrame(gif, 2)
    assert(rgb(f2, 0, 0) == c(3)) // the new pixel
    for ((x, y) <- Seq((1, 1), (2, 1), (1, 2), (2, 2)))
      assert(rgb(f2, x, y) == c(0), s"($x,$y) not restored to background")
    assert(rgb(f2, 3, 0) == c(1)) // frame-0 remnant survives disposal 2
  }

  test("blankFirst animation: identical closed-form size, solid splash, content mid-frame") {
    val (id, w, h, nf) = (9L, 16, 12, 3)
    val blank = GifCodec.encodeAnimated(id, w, h, nf, 2, blankFirst = true)
    assert(blank.length == GifCodec.animatedByteSize(w, h, nf))
    assert(blank.length == GifCodec.encodeAnimated(id, w, h, nf, 2).length)
    val f0 = GifCodec.decodeFrame(blank, 0)
    assert(f0.pixels.forall(_ == 0))
    assert(Multimodal.aHashRaster(f0) == 0L)
    val mid = GifCodec.decodeFrame(blank, nf / 2)
    assert(Multimodal.aHashRaster(mid) != 0L)
    assert(mid.pixels.sameElements(
      GifCodec.decode(GifCodec.encodeGradient(id + nf / 2, w, h)).pixels))
  }

  test("encoder size math rejects dims whose product overflows Int") {
    intercept[IllegalArgumentException] { GifCodec.gradientByteSize(65535, 65535) }
    intercept[IllegalArgumentException] { GifCodec.animatedByteSize(65535, 65535, 2) }
    intercept[IllegalArgumentException] { GifCodec.encodeGradient(1L, 65535, 65535) }
    intercept[IllegalArgumentException] {
      GifCodec.encodeAnimated(1L, 65535, 65535, 2, 0)
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
