package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, PHash, PngCodec}

/** DCT perceptual hash: implementation cross-checks (separable DCT vs
  * a direct quadruple-loop reference), container invariance in the
  * shared hash space, discriminativity, and the null-dispatch
  * contract. */
class PHashSpec extends AnyFunSuite {

  private def flipRows(r: PngCodec.Raster): PngCodec.Raster = {
    val px = new Array[Byte](r.width * r.height * r.channels)
    val stride = r.width * r.channels
    for (y <- 0 until r.height)
      System.arraycopy(r.pixels, (r.height - 1 - y) * stride, px, y * stride, stride)
    PngCodec.Raster(r.width, r.height, r.channels, px)
  }

  test("separable DCT matches a direct non-separable reference") {
    for (id <- Seq(1L, 9L, 42L)) {
      val r = PngCodec.gradient(id, 40, 28)
      val g = PHash.gray32(r)
      // direct D(u,v) = sum_{x,y} C(u,x) C(v,y) g(x,y)
      val d = Array.ofDim[Long](64)
      for (v <- 0 until 8; u <- 0 until 8) {
        var s = 0L
        for (y <- 0 until 32; x <- 0 until 32)
          s += PHash.CosTable(u)(x).toLong * PHash.CosTable(v)(y) * g(y * 32 + x)
        d(v * 8 + u) = s
      }
      val sorted = d.clone(); java.util.Arrays.sort(sorted)
      val med = sorted(31)
      var want = 0L
      for (i <- 0 until 64) if (d(i) > med) want |= (1L << i)
      assert(PHash.phashRaster(r) == want, s"id=$id")
    }
  }

  test("the same visual image hashes identically as BMP bytes, PNG bytes, raster") {
    for (id <- Seq(3L, 17L); w = 44; h = 30) {
      val bmpBytes = Multimodal.encodeBmp(id, w, h)
      // encodeBmp stores formula rows bottom-up → its VISUAL image is
      // the flipped formula raster; a PNG of that same visual image:
      val visual = flipRows(PngCodec.gradient(id, w, h))
      val pngBytes = PngCodec.encode(visual)
      val viaBmp = PHash.phashAny(bmpBytes)
      val viaPng = PHash.phashAny(pngBytes)
      val viaRaster = PHash.phashRaster(visual)
      assert(viaBmp != null && viaBmp.longValue == viaPng.longValue)
      assert(viaBmp.longValue == viaRaster)
    }
  }

  test("top-down and bottom-up BMP encodings of one visual image hash equal") {
    val id = 5L; val w = 33; val h = 21
    val bottomUp = Multimodal.encodeBmp(id, w, h)
    // rebuild as top-down: negate height, reverse stored row order
    val stride = Multimodal.bmpRowSize(w)
    val topDown = bottomUp.clone()
    val nh = -h
    topDown(22) = (nh & 0xff).toByte
    topDown(23) = ((nh >> 8) & 0xff).toByte
    topDown(24) = ((nh >> 16) & 0xff).toByte
    topDown(25) = ((nh >> 24) & 0xff).toByte
    for (y <- 0 until h)
      System.arraycopy(bottomUp, 54 + (h - 1 - y) * stride, topDown, 54 + y * stride, stride)
    assert(PHash.phashAny(bottomUp).longValue == PHash.phashAny(topDown).longValue)
  }

  test("structure-keyed: dims change the hash, near-brightness shifts mostly don't") {
    // the gradient's id enters only the B channel as +id — close to a
    // global brightness shift, which pHash (structure) largely ignores
    // while different DIMS (different low-frequency structure) split
    val sameDims = (0L until 40L).map(id =>
      PHash.phashAny(Multimodal.encodeBmp(id, 48, 32)).longValue)
    assert(sameDims.distinct.size < 10, s"got ${sameDims.distinct.size}")
    val varyDims = (0 until 40).map(i =>
      PHash.phashAny(Multimodal.encodeBmp(7L, 20 + i, 16 + (i * 3) % 29)).longValue)
    assert(varyDims.distinct.size > 30, s"got ${varyDims.distinct.size}")
  }

  test("unknown and undecodable payloads hash to null, never throw") {
    assert(PHash.phashAny("not an image".getBytes) == null)
    assert(PHash.phashAny(Array[Byte]()) == null)
    val truncated = java.util.Arrays.copyOfRange(
      PngCodec.encode(PngCodec.gradient(1L, 16, 16)), 0, 40)
    assert(PHash.phashAny(truncated) == null)
  }

  test("cosine table is the pinned fixed-point DCT basis") {
    assert(PHash.CosTable(0).forall(_ == PHash.Scale)) // k=0 row: cos(0)=1
    assert(PHash.CosTable(4)(0) == Math.round(
      PHash.Scale * math.cos(math.Pi * 4.0 / 64.0)).toInt)
    assert(PHash.cosTableSqlValues.split("\\), \\(").length == 256)
  }
}
