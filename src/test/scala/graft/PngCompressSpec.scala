package graft

import java.io.ByteArrayInputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PngCodec

/** The compressing PNG writer (adaptive filters + full deflate) against
  * our own decoder AND the JDK's independent ImageIO PNG reader. */
class PngCompressSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int, ch: Int): PngCodec.Raster = {
    val px = new Array[Byte](w * h * ch)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * ch
        px(o) = ((x * 7 + 3) % 256).toByte
        px(o + 1) = ((y * 11 + 9) % 256).toByte
        px(o + 2) = ((x + y * 5) % 256).toByte
        if (ch == 4) px(o + 3) = (255 - ((x + y) % 96)).toByte
        x += 1
      }
      y += 1
    }
    PngCodec.Raster(w, h, ch, px)
  }

  test("roundtrip through our own decoder, RGB and RGBA") {
    Seq(gradient(40, 30, 3), gradient(33, 17, 4), gradient(1, 1, 3)).foreach { img =>
      val back = PngCodec.decode(PngCodec.encodeCompressed(img))
      assert(back.width == img.width && back.height == img.height)
      assert(back.pixels.sameElements(img.pixels))
    }
  }

  test("ImageIO (independent implementation) decodes our compressed PNG pixel-exactly") {
    val img = gradient(37, 23, 3)
    val bytes = PngCodec.encodeCompressed(img)
    val bi = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
    assert(bi != null, "ImageIO rejected the stream")
    assert(bi.getWidth == 37 && bi.getHeight == 23)
    var y = 0
    while (y < 23) {
      var x = 0
      while (x < 37) {
        val o = (y * 37 + x) * 3
        val rgb = bi.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) == (img.pixels(o) & 0xff), s"r at $x,$y")
        assert(((rgb >> 8) & 0xff) == (img.pixels(o + 1) & 0xff), s"g at $x,$y")
        assert((rgb & 0xff) == (img.pixels(o + 2) & 0xff), s"b at $x,$y")
        x += 1
      }
      y += 1
    }
  }

  test("compressed output is strictly smaller than the stored encoder on gradients") {
    val img = gradient(64, 48, 3)
    val c = PngCodec.encodeCompressed(img).length
    val s = PngCodec.encode(img).length
    assert(c < s, s"compressed $c !< stored $s")
    assert(c < s / 2, s"expected >2x win on a smooth gradient, got $s -> $c")
  }

  test("deterministic bytes; adversarial rasters roundtrip") {
    val img = gradient(20, 20, 4)
    assert(PngCodec.encodeCompressed(img).sameElements(PngCodec.encodeCompressed(img)))
    val rnd = new scala.util.Random(5)
    (0 until 20).foreach { t =>
      val w = 1 + rnd.nextInt(50); val h = 1 + rnd.nextInt(50)
      val ch = if (t % 2 == 0) 3 else 4
      val px = new Array[Byte](w * h * ch)
      if (t % 3 != 0) rnd.nextBytes(px) // noise and all-zero cases
      val img2 = PngCodec.Raster(w, h, ch, px)
      assert(PngCodec.decode(PngCodec.encodeCompressed(img2)).pixels.sameElements(px))
    }
  }
}
