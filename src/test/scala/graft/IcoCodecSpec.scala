package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{IcoCodec, Multimodal, PHash, PngCodec}

/** ICO (favicon) decode: DIB + PNG entries, AND-mask alpha, largest-
  * entry selection, hash-space joins, and loud fences. */
class IcoCodecSpec extends AnyFunSuite {

  test("two-entry fixture: DIB pixels equal the gradient, PNG entry the half gradient") {
    val id = 6L; val w = 20; val h = 14
    val ico = IcoCodec.encodeGradient(id, w, h)
    val es = IcoCodec.parse(ico)
    assert(es.length == 2)
    assert(es(0).width == w && es(0).height == h && es(0).bpp == 24 && !es(0).png)
    assert(es(1).width == w / 2 && es(1).height == h / 2 && es(1).png)
    val dib = IcoCodec.decodeEntry(ico, 0)
    assert(dib.width == w && dib.height == h && dib.channels == 4)
    val g = PngCodec.gradient(id, w, h)
    for (y <- 0 until h; x <- 0 until w) {
      val d4 = (y * w + x) * 4
      val d3 = (y * w + x) * 3
      assert(dib.pixels(d4) == g.pixels(d3) && dib.pixels(d4 + 1) == g.pixels(d3 + 1)
        && dib.pixels(d4 + 2) == g.pixels(d3 + 2), s"($x,$y)")
      assert((dib.pixels(d4 + 3) & 0xff) == 255)
    }
    val png = IcoCodec.decodeEntry(ico, 1)
    val gh = PngCodec.gradient(id, w / 2, h / 2)
    assert(png.width == w / 2 && png.height == h / 2)
    for (i <- 0 until (w / 2) * (h / 2))
      assert(png.pixels(i * png.channels) == gh.pixels(i * 3))
  }

  test("decodeLargest picks the bigger DIB entry; favicon joins the hash space") {
    val id = 11L; val w = 24; val h = 16
    val ico = IcoCodec.encodeGradient(id, w, h)
    val big = IcoCodec.decodeLargest(ico)
    assert(big.width == w && big.height == h)
    val pngTwin = PngCodec.encode(PngCodec.gradient(id, w, h))
    assert(Multimodal.aHashAny(ico).longValue ==
      Multimodal.aHashAny(pngTwin).longValue)
    assert(PHash.phashAny(ico).longValue == PHash.phashAny(pngTwin).longValue)
    assert(Multimodal.parseDims(ico) == (("ico", w, h)))
  }

  test("AND mask bits turn 24bpp pixels transparent") {
    val ico = IcoCodec.encodeGradient(2L, 8, 4)
    // the DIB payload starts at offset 38 (6 + 32 directory bytes);
    // AND mask of stored row 0 (visual bottom row) starts after the
    // 40-byte header + 4 XOR rows of stride 24
    val andOff = 38 + 40 + 4 * 24
    val patched = ico.clone()
    patched(andOff) = 0x80.toByte // stored row 0, x=0 → visual (0, 3)
    val r = IcoCodec.decodeEntry(patched, 0)
    assert((r.pixels(((3 * 8) + 0) * 4 + 3) & 0xff) == 0)
    assert((r.pixels(((3 * 8) + 1) * 4 + 3) & 0xff) == 255)
  }

  test("fences and corruption fail loudly") {
    val ico = IcoCodec.encodeGradient(3L, 16, 8)
    intercept[IllegalArgumentException](IcoCodec.parse("nope".getBytes))
    intercept[IllegalArgumentException](IcoCodec.decodeEntry(ico, 7))
    // entry payload overrun
    val trunc = java.util.Arrays.copyOfRange(ico, 0, 60)
    intercept[IllegalArgumentException](IcoCodec.parse(trunc))
    // 16bpp DIB refused: patch the bit depth inside the DIB header
    val bad = ico.clone()
    bad(38 + 14) = 16
    intercept[IllegalArgumentException](IcoCodec.decodeEntry(bad, 0))
    // undoubled height refused
    val odd = ico.clone()
    odd(38 + 8) = 15 // biHeight 16 → 15 (not 2*h)
    intercept[IllegalArgumentException](IcoCodec.decodeEntry(odd, 0))
  }
}
