package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, PngCodec, WebpCodec}

/** [[graft.operators.WebpCodec]] — VP8L decode/encode: round-trips
  * through every encode path (plain, subtract-green, all predictor
  * modes, color transform, packed + unpacked palettes), pinned
  * distance-map entries, signed fixed-point delta identities,
  * container metadata, and a REAL third-party stream (the ALPH chunk
  * of CPython's test-suite `python.webp`, encoded by Google's libwebp
  * — decodes through the full entropy/LZ77/cache machinery). */
class WebpCodecSpec extends AnyFunSuite {

  private def pixelsOf(r: PngCodec.Raster): Seq[Int] = {
    // RGB triples regardless of channel count (alpha checked separately)
    (0 until r.width * r.height).flatMap { i =>
      val o = i * r.channels
      Seq(r.pixels(o) & 0xff, r.pixels(o + 1) & 0xff, r.pixels(o + 2) & 0xff)
    }
  }

  private def assertSamePixels(a: PngCodec.Raster, b: PngCodec.Raster): Unit = {
    assert(a.width === b.width && a.height === b.height)
    assert(pixelsOf(a) === pixelsOf(b))
  }

  test("plain and subtract-green round-trips, odd dims") {
    for ((w, h) <- Seq((16, 16), (17, 5), (1, 1), (3, 29))) {
      val img = WebpCodec.grayGradient(7L, w, h)
      for (sg <- Seq(false, true)) {
        val bytes = WebpCodec.encode(img, subtractGreen = sg)
        assert(WebpCodec.isWebp(bytes))
        val back = WebpCodec.decode(bytes)
        assertSamePixels(img, back)
        // decoded alpha is the encoder's constant 0xff
        assert((0 until w * h).forall(i => (back.pixels(i * 4 + 3) & 0xff) == 0xff))
      }
    }
  }

  test("all 14 predictor modes round-trip on gradient and noisy rasters") {
    def noisy(w: Int, h: Int): PngCodec.Raster = {
      // deterministic high-variance pixels exercise the clamp paths
      // and the top-right wraparound at x = w-1
      val px = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        px((y * w + x) * 3 + c) =
          (((x * 131 + y * 197 + c * 89) ^ (x * y + 31)) & 0xff).toByte
      PngCodec.Raster(w, h, 3, px)
    }
    for (mode <- 0 to 13; img <- Seq(WebpCodec.grayGradient(3L, 13, 9), noisy(13, 9))) {
      val back = WebpCodec.decode(WebpCodec.encodePredicted(img, mode))
      assertSamePixels(img, back)
    }
  }

  test("color-transform round-trip incl. negative coefficients") {
    val img = WebpCodec.grayGradient(11L, 12, 7)
    for ((g2r, g2b, r2b) <- Seq((23, 0xef, 41), (0x80, 0x7f, 0xff), (1, 2, 3))) {
      val back = WebpCodec.decode(
        WebpCodec.encodeColorTransformed(img, g2r, g2b, r2b))
      assertSamePixels(img, back)
    }
  }

  test("palette round-trips: packed widths (2/4/16 colors) and unpacked 256") {
    for (size <- Seq(2, 4, 16, 250)) {
      val pal = Array.tabulate(size)(i =>
        0xff000000 | ((i * 7 % 256) << 16) | ((i * 13 % 256) << 8) | (i * 29 % 256))
      val w = 21; val h = 6 // non-multiple of pixels-per-byte
      def idx(x: Int, y: Int): Int = (x * 3 + y * 5) % size
      val back = WebpCodec.decode(WebpCodec.encodeIndexed(w, h, pal, idx))
      assert(back.width === w && back.height === h)
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 4
        val p = pal(idx(x, y))
        assert((back.pixels(o) & 0xff) === ((p >>> 16) & 0xff), s"($x,$y) R")
        assert((back.pixels(o + 1) & 0xff) === ((p >>> 8) & 0xff), s"($x,$y) G")
        assert((back.pixels(o + 2) & 0xff) === (p & 0xff), s"($x,$y) B")
      }
    }
  }

  test("distance map: pinned spec entries; ctDelta signed identities") {
    val m = WebpCodec.DistanceMap
    assert(m.length === 120)
    assert(m.take(10).toSeq === Seq((0, 1), (1, 0), (1, 1), (-1, 1), (0, 2),
      (2, 0), (1, 2), (-1, 2), (2, 1), (-2, 1)))
    assert(m.distinct.length === 120)
    assert(m.forall { case (dx, dy) => dx >= -8 && dx <= 7 && dy >= 0 })
    // signed 3.5 fixed point: 0xff = −1, 0x80 = −128
    assert(WebpCodec.ctDelta(32, 32) === 32)       // (32·32)>>5
    assert(WebpCodec.ctDelta(0xff, 32) === -1)     // (−1·32)>>5
    assert(WebpCodec.ctDelta(0x80, 0x7f) === -508) // (−128·127)>>5
  }

  // CPython test-suite fixture (Lib/test/test_email/data/python.webp,
  // PSF-licensed): VP8X + ALPH (method 1 = headless VP8L) + lossy VP8.
  // A REAL libwebp-encoded lossless stream for the decoder to chew.
  private val pythonWebpB64 =
    """UklGRqgBAABXRUJQVlA4WAoAAAAQAAAADwAADwAAQUxQSMMAAAABJ6KokSTleucYX+ffKpmImP90
      |cY3gJjDi4Yt3MsjBEVyDKzDosHgVjnhRNcEIDAJPkqBqsFUZHNa2bUYvTsZ2PLbtd/uvKa4hov9J
      |0f2PkPe6REkkGzolkTTzFG0Ox9PlFiD0CxS+kOGDtxoynjaCfx0pfk52CPuInrOR75lzRugygtv4
      |zEiy90UwfSD9NheMITJWLaXWayO8XeOlWRXVnIGk2W6WdYoYMQ+KqixQNPowgt+6a1BSKbUtz+lU
      |FAoBAAAAVlA4IL4AAACQAgCdASoQABAAAwA0JbACdDBPCIUMfAMdCCz96AD+/XSg/QKbH4r3Q3yc
      |N/bSDK/T/zVo4u6nvclvG/SqxWOuup+XhN9BojvaW+Tv+MvxvX/hr/o/5Qns9LtmX/+qKdl/yWzn
      |huasl7nkxvSTI4xf3Y85VSB/lU/8Ofj/b9JrA+ifvIOYZm2x1RP/dhfmsf5diuSfR7+z+r/+HR3z
      |Eo/+XM/B+vkYw73Pzx+ROaAB/ZoBSzEs3rzZe6qsAAAA""".stripMargin.replaceAll("\\s", "")

  private lazy val pythonWebp: Array[Byte] =
    java.util.Base64.getDecoder.decode(pythonWebpB64)

  test("real file: container metadata of CPython's python.webp") {
    val m = WebpCodec.parseMeta(pythonWebp)
    assert(m.format === "vp8") // lossy color payload
    assert(m.width === 16 && m.height === 16)
    assert(m.hasAlpha)
    assert(!m.hasAnim)
    assert(m.chunkList === Seq("VP8X", "ALPH", "VP8 "))
    // the Multimodal dispatch sees it too
    assert(Multimodal.parseDims(pythonWebp) === (("webp", 16, 16)))
    // lossy pixels DECODE since round 16 (Vp8Codec — pixel-exact vs
    // libwebp, see WebpLossySpec) and hash like any other raster
    val r = WebpCodec.decode(pythonWebp)
    assert(r.width === 16 && r.height === 16 && r.channels === 4)
    assert(Multimodal.aHashAny(pythonWebp) != null)
  }

  test("real file: the libwebp-encoded ALPH stream decodes through the full machinery") {
    val cs = WebpCodec.chunks(pythonWebp)
    val (_, off, sz) = cs.find(_._1 == "ALPH").get
    val alpha = WebpCodec.decodeAlpha(pythonWebp, off, sz, 16, 16)
    assert(alpha.length === 256)
    assert(alpha.forall(a => a >= 0 && a <= 255))
    // regression pins from the first successful decode: the plane is a
    // real logo mask — mixed values, opaque mass, exact checksums
    // (the position-weighted sum catches any pixel-order slip)
    assert(alpha.zipWithIndex.map { case (a, i) => (i + 1L) * a }.sum
      === 4742262L)
    assert(alpha.sum === 38971)
    assert(alpha.count(_ == 255) === 109)
    assert(alpha.count(_ == 0) === 43)
    assert(alpha.take(4).toSeq === Seq(0, 0, 0, 0))
  }

  test("round-trip through the Multimodal frame encoder variants") {
    // every (id % 5) variant decodes back to the shared gradient
    for (id <- 0L to 9L) {
      val bytes = WebpCodec.encodeGradientVariant(id, 24, 15)
      val back = WebpCodec.decode(bytes)
      assertSamePixels(WebpCodec.grayGradient(id, 24, 15), back)
      val (fmt, w, h) = Multimodal.parseDims(bytes)
      assert((fmt, w, h) === (("webp", 24, 15)))
      assert(Multimodal.aHashAny(bytes) != null)
    }
  }

  test("animated WebP: VP8X/ANIM/ANMF round-trip, per-frame decode, census") {
    val bytes = WebpCodec.encodeAnimated(7L, 20, 12, nFrames = 3,
      frameDurMs = 40, loopCount = 2)
    val m = WebpCodec.parseMeta(bytes)
    assert(m.format === "anim")
    assert(m.width === 20 && m.height === 12)
    assert(m.hasAnim && m.hasAlpha)
    assert(m.nFrames === 3)
    assert(m.durationMs === 120L)
    assert(m.loopCount === 2)
    assert(m.chunkList === Seq("VP8X", "ANIM", "ANMF", "ANMF", "ANMF"))
    // every frame decodes to its own gradient (the cycling encode
    // paths land on different variants per frame)
    for (f <- 0 until 3)
      assertSamePixels(WebpCodec.grayGradient(7L + f, 20, 12),
        WebpCodec.decodeAnimFrame(bytes, f))
    intercept[IllegalArgumentException] {
      WebpCodec.decodeAnimFrame(bytes, 3)
    }
    // still images report a zero animation census
    val still = WebpCodec.parseMeta(WebpCodec.encode(
      WebpCodec.grayGradient(1L, 8, 8)))
    assert(still.nFrames === 0 && still.durationMs === 0L &&
      still.loopCount === 0)
  }

  test("corrupt sizes fail loudly: Int-overflow outer chunk, negative ANMF sub-chunk") {
    // outer chunk size near Int.MaxValue: the bound check must run in
    // Long — an Int sum overflows negative and would pass (ADVICE r15)
    val bb = java.nio.ByteBuffer.allocate(20)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(12)
      .put("WEBP".getBytes("US-ASCII"))
      .put("VP8L".getBytes("US-ASCII")).putInt(0x7ffffffc)
    val ex = intercept[IllegalArgumentException] {
      WebpCodec.parseMeta(bb.array())
    }
    assert(ex.getMessage.contains("truncated"))
    // corrupt inner ANMF sub-chunk size (sign bit set): the frame walk
    // must throw, never hang or index out of bounds
    val anim = WebpCodec.encodeAnimated(7L, 20, 12, nFrames = 2,
      frameDurMs = 40, loopCount = 0)
    val (_, off, _) = WebpCodec.chunks(anim).find(_._1 == "ANMF").get
    val bad = anim.clone()
    bad(off + 16 + 7) = 0x80.toByte // embedded chunk's LE32 size top byte
    val ex2 = intercept[IllegalArgumentException] {
      WebpCodec.decodeAnimFrame(bad, 0)
    }
    assert(ex2.getMessage.contains("ANMF sub-chunk"))
  }

  test("loud contracts: truncated, non-webp, bad palette index") {
    intercept[IllegalArgumentException] {
      WebpCodec.parseMeta("RIFFxxxxWAVE".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      WebpCodec.decode(pythonWebp.take(40)) // truncated chunk walk
    }
    intercept[IllegalArgumentException] {
      WebpCodec.encodeIndexed(4, 4, Array(0xff000000), (_, _) => 1)
    }
  }
}
