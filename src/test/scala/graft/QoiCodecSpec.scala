package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, PngCodec, QoiCodec}

/** QOI codec laws. No second QOI implementation exists in this
  * environment, so correctness is pinned three independent ways:
  * hand-assembled byte-level vectors for each op straight from the
  * one-page spec, exact decode∘encode identity, and cross-FORMAT
  * raster equality against the ImageIO-cross-checked PNG path. */
class QoiCodecSpec extends AnyFunSuite {

  private def header(w: Int, h: Int, ch: Int, cs: Int = 0): Array[Byte] =
    Array[Byte]('q', 'o', 'i', 'f',
      (w >>> 24).toByte, (w >>> 16).toByte, (w >>> 8).toByte, w.toByte,
      (h >>> 24).toByte, (h >>> 16).toByte, (h >>> 8).toByte, h.toByte,
      ch.toByte, cs.toByte)

  private val endMarker = Array[Byte](0, 0, 0, 0, 0, 0, 0, 1)

  test("hand vector: RGB op + RUN decode to the spec'd pixels") {
    // 3x1: RGB(10,20,30) then RUN of 2 (tag 0xc0 | (2-1))
    val bytes = header(3, 1, 3) ++
      Array[Byte](0xfe.toByte, 10, 20, 30, (0xc0 | 1).toByte) ++ endMarker
    val r = QoiCodec.decode(bytes)
    assert(r.width == 3 && r.height == 1 && r.channels == 3)
    assert(r.pixels.toSeq == Seq[Byte](10, 20, 30, 10, 20, 30, 10, 20, 30))
  }

  test("hand vector: DIFF and LUMA apply biased wrapping deltas") {
    // start (0,0,0,255): DIFF(+1,+1,+1) -> (1,1,1); LUMA dg=+10, dr-dg=-2,
    // db-dg=+3 -> (+8,+10,+13) -> (9,11,14)
    val diff = (0x40 | (3 << 4) | (3 << 2) | 3).toByte // each delta +1 (bias 2)
    val luma = Array[Byte]((0x80 | (10 + 32)).toByte, (((-2 + 8) << 4) | (3 + 8)).toByte)
    val bytes = header(2, 1, 3) ++ Array(diff) ++ luma ++ endMarker
    val r = QoiCodec.decode(bytes)
    assert(r.pixels.toSeq == Seq[Byte](1, 1, 1, 9, 11, 14))
  }

  test("hand vector: INDEX recalls an earlier pixel via the 64-slot hash") {
    // px A = RGB(4,4,4): slot = (4*3+4*5+4*7+255*11)%64 = (60+2805)%64
    val slotA = (4 * 3 + 4 * 5 + 4 * 7 + 255 * 11) % 64
    // px B = RGB(100,0,0) then INDEX(slotA) must restore A
    val bytes = header(3, 1, 3) ++
      Array[Byte](0xfe.toByte, 4, 4, 4, 0xfe.toByte, 100, 0, 0, slotA.toByte) ++ endMarker
    val r = QoiCodec.decode(bytes)
    assert(r.pixels.toSeq == Seq[Byte](4, 4, 4, 100, 0, 0, 4, 4, 4))
  }

  test("hand vector: RGBA changes alpha; DIFF keeps it") {
    val bytes = header(2, 1, 4) ++
      Array[Byte](0xff.toByte, 1, 2, 3, 128.toByte,
        (0x40 | (2 << 4) | (2 << 2) | 2).toByte) ++ endMarker // DIFF(0,0,0)
    val r = QoiCodec.decode(bytes)
    assert(r.pixels.toSeq == Seq[Byte](1, 2, 3, 128.toByte, 1, 2, 3, 128.toByte))
  }

  test("decode∘encode is the identity on adversarial rasters") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 40) {
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(40)
      val ch = if (trial % 2 == 0) 3 else 4
      val px = new Array[Byte](w * h * ch)
      trial % 4 match {
        case 0 => rnd.nextBytes(px) // noise: RGB/RGBA ops dominate
        case 1 => () // all zeros: one long run
        case 2 => // small-delta walk: DIFF/LUMA ops dominate
          var v = 0
          px.indices.foreach { i => v = (v + rnd.nextInt(5) - 2) & 0xff; px(i) = v.toByte }
        case _ => // tiny palette: INDEX ops dominate
          px.indices.foreach(i => px(i) = (rnd.nextInt(3) * 85).toByte)
      }
      val raster = PngCodec.Raster(w, h, ch, px)
      val back = QoiCodec.decode(QoiCodec.encode(raster))
      assert(back.width == w && back.height == h && back.channels == ch)
      assert(back.pixels.sameElements(px), s"trial $trial ${w}x$h ch=$ch")
    }
  }

  test("cross-format: QOI and PNG decode the same pixels identically") {
    // the PNG path is ImageIO-cross-checked; equal rasters through both
    // containers pin the QOI decode against an independent chain
    val w = 33; val h = 17
    val px = Array.tabulate(w * h * 3)(i => ((i * 31 + 7) % 256).toByte)
    val raster = PngCodec.Raster(w, h, 3, px)
    val viaQoi = QoiCodec.decode(QoiCodec.encode(raster))
    val viaPng = PngCodec.decode(PngCodec.encode(raster))
    assert(viaQoi.pixels.sameElements(viaPng.pixels))
    // and the shared hash space agrees
    val hQ = Multimodal.aHashAny(QoiCodec.encode(raster))
    val hP = Multimodal.aHashAny(PngCodec.encode(raster))
    assert(hQ != null && hQ == hP)
  }

  test("parseDims dispatch recognizes qoi") {
    val bytes = QoiCodec.encodeGradient(3L, 24, 16, alpha = false)
    assert(Multimodal.parseDims(bytes) == (("qoi", 24, 16)))
  }

  test("encoder run-length cap: 62-pixel runs split correctly") {
    val px = new Array[Byte](200 * 3) // 200 identical pixels: runs 62+62+62+14... minus first literal
    val raster = PngCodec.Raster(200, 1, 3, px)
    val enc = QoiCodec.encode(raster)
    assert(QoiCodec.decode(enc).pixels.sameElements(px))
  }

  test("corrupt payloads fail loudly, never hang") {
    val good = QoiCodec.encodeGradient(1L, 16, 16, alpha = true)
    intercept[IllegalArgumentException](QoiCodec.decode(good.dropRight(3))) // no end marker
    val badMagic = good.clone(); badMagic(0) = 'x'
    intercept[IllegalArgumentException](QoiCodec.decode(badMagic))
    val badCh = good.clone(); badCh(12) = 7
    intercept[IllegalArgumentException](QoiCodec.decode(badCh))
    val badEnd = good.clone(); badEnd(badEnd.length - 1) = 0
    intercept[IllegalArgumentException](QoiCodec.decode(badEnd))
    // 3-bit-flip fuzz: decode either succeeds or throws IllegalArgument
    val rnd = new scala.util.Random(99)
    (0 until 2000).foreach { _ =>
      val m = good.clone()
      (0 until 3).foreach { _ =>
        val i = rnd.nextInt(m.length)
        m(i) = (m(i) ^ (1 << rnd.nextInt(8))).toByte
      }
      try { QoiCodec.decode(m); () }
      catch { case _: IllegalArgumentException => () }
    }
  }
}
