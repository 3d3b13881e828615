package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{JpegCodec, PngCodec}

/** JpegCodec correctness, pinned two independent ways: self round-trip
  * bounds (near-lossless tables → DCT rounding only) and a CROSS-CODEC
  * oracle — the JDK's ImageIO JPEG implementation (an independent
  * decoder/encoder lineage) must agree with ours within the tolerance
  * that different conformant IDCT/upsampling implementations are
  * allowed (T.81 never mandates one IDCT). ImageIO is used in TESTS
  * only — the library itself stays pure byte math. */
class JpegCodecSpec extends AnyFunSuite {

  /** Smooth RGB gradient — JPEG-friendly (no sharp edges, so codec
    * implementation differences like chroma-upsample filters stay
    * small), still exercising all three channels independently. */
  private def smooth(w: Int, h: Int): PngCodec.Raster = {
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val d = (y * w + x) * 3
      px(d) = (x * 255 / math.max(1, w - 1)).toByte
      px(d + 1) = (y * 255 / math.max(1, h - 1)).toByte
      px(d + 2) = ((x + y) * 255 / math.max(1, w + h - 2)).toByte
    }
    PngCodec.Raster(w, h, 3, px)
  }

  private def maxAndMeanDiff(a: Array[Byte], b: Array[Byte]): (Int, Double) = {
    require(a.length == b.length, s"${a.length} != ${b.length}")
    var mx = 0
    var sum = 0L
    var i = 0
    while (i < a.length) {
      val d = math.abs((a(i) & 0xff) - (b(i) & 0xff))
      if (d > mx) mx = d
      sum += d
      i += 1
    }
    (mx, sum.toDouble / a.length)
  }

  private def toRaster(img: java.awt.image.BufferedImage): PngCodec.Raster = {
    val w = img.getWidth; val h = img.getHeight
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val d = (y * w + x) * 3
      px(d) = ((rgb >> 16) & 0xff).toByte
      px(d + 1) = ((rgb >> 8) & 0xff).toByte
      px(d + 2) = (rgb & 0xff).toByte
    }
    PngCodec.Raster(w, h, 3, px)
  }

  private def toBuffered(r: PngCodec.Raster): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      r.width, r.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until r.height; x <- 0 until r.width) {
      val d = (y * r.width + x) * 3
      img.setRGB(x, y, ((r.pixels(d) & 0xff) << 16) |
        ((r.pixels(d + 1) & 0xff) << 8) | (r.pixels(d + 2) & 0xff))
    }
    img
  }

  test("4:4:4 near-lossless round-trip: decode(encode(x)) within DCT rounding") {
    val img = smooth(37, 23) // non-multiple-of-8 dims exercise edge padding
    val bytes = JpegCodec.encode(img)
    val back = JpegCodec.decode(bytes)
    assert(back.width == 37 && back.height == 23 && back.channels == 3)
    val (mx, mean) = maxAndMeanDiff(back.pixels, img.pixels)
    assert(mx <= 3 && mean <= 1.0, s"max=$mx mean=$mean")
  }

  test("4:2:0 round-trip on smooth content stays close; dims exact") {
    val img = smooth(40, 28)
    val back = JpegCodec.decode(JpegCodec.encode(img, subsample = 2))
    assert(back.width == 40 && back.height == 28)
    val (mx, mean) = maxAndMeanDiff(back.pixels, img.pixels)
    // chroma is box-downsampled then nearest-upsampled: smooth content
    // moves by at most a few counts
    assert(mx <= 12 && mean <= 2.0, s"max=$mx mean=$mean")
  }

  test("cross-oracle: the JDK ImageIO decoder reads our bytes the same way") {
    for (sub <- Seq(1, 2)) {
      val img = smooth(48, 32)
      val bytes = JpegCodec.encode(img, subsample = sub)
      val theirs = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(theirs != null, "ImageIO failed to parse our JPEG")
      assert(theirs.getWidth == 48 && theirs.getHeight == 32)
      val ours = JpegCodec.decode(bytes)
      val (mx, mean) = maxAndMeanDiff(ours.pixels, toRaster(theirs).pixels)
      // two conformant decoders of the SAME file: differences are
      // IDCT/rounding/upsample implementation slack only
      assert(mx <= 16 && mean <= 2.0, s"sub=$sub max=$mx mean=$mean")
    }
  }

  test("cross-oracle: we decode ImageIO-written JPEGs (real-world bytes)") {
    val img = toBuffered(smooth(64, 48))
    val out = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(0.9f)
    writer.setOutput(javax.imageio.ImageIO.createImageOutputStream(out))
    writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    writer.dispose()
    val bytes = out.toByteArray
    val ours = JpegCodec.decode(bytes)
    assert(ours.width == 64 && ours.height == 48)
    val theirs = toRaster(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    val (mx, mean) = maxAndMeanDiff(ours.pixels, theirs.pixels)
    assert(mx <= 24 && mean <= 2.5, s"max=$mx mean=$mean")
  }

  test("grayscale (1-component) JPEGs decode with replicated channels") {
    val w = 32; val h = 24
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val g = (x * 255 / (w - 1) + y) % 256
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", out)
    val ours = JpegCodec.decode(out.toByteArray)
    assert(ours.width == w && ours.height == h && ours.channels == 3)
    // replicated channels: R == G == B everywhere
    for (i <- 0 until w * h)
      assert(ours.pixels(3 * i) == ours.pixels(3 * i + 1) &&
        ours.pixels(3 * i + 1) == ours.pixels(3 * i + 2))
    // and close to what ImageIO itself decodes — compare RAW gray
    // samples (getRGB on TYPE_BYTE_GRAY applies a gray→sRGB colorspace
    // conversion that neither decoder's Y values went through)
    val theirImg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.toByteArray))
    var mx = 0
    var sum = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs((ours.pixels(3 * (y * w + x)) & 0xff) -
        theirImg.getRaster.getSample(x, y, 0))
      mx = math.max(mx, d)
      sum += d
    }
    val mean = sum.toDouble / (w * h)
    assert(mx <= 8 && mean <= 1.5, s"max=$mx mean=$mean")
  }

  test("parseDimsJpeg reads SOF dims; resize halves them; encode is deterministic") {
    val img = smooth(30, 20)
    val bytes = JpegCodec.encode(img)
    assert(JpegCodec.parseDimsJpeg(bytes) == ((30, 20)))
    assert(JpegCodec.parseDimsJpeg("not a jpeg".getBytes) == null)
    val resized = JpegCodec.resizeJpeg(bytes, 50)
    assert(JpegCodec.parseDimsJpeg(resized) == ((15, 10)))
    assert(JpegCodec.encode(img).sameElements(bytes)) // bit-stable
  }

  test("restart intervals: round-trip and ImageIO both read DRI/RSTn streams") {
    val img = smooth(56, 40) // 7x5 = 35 MCUs at 4:4:4 → several restarts
    for (ri <- Seq(1, 3, 8)) {
      val bytes = JpegCodec.encode(img, restartInterval = ri)
      val back = JpegCodec.decode(bytes)
      val (mx, mean) = maxAndMeanDiff(back.pixels, img.pixels)
      assert(mx <= 3 && mean <= 1.0, s"ri=$ri max=$mx mean=$mean")
      // the independent decoder must accept the marker structure too
      val theirs = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(theirs != null && theirs.getWidth == 56 && theirs.getHeight == 40, s"ri=$ri")
      val (mx2, mean2) = maxAndMeanDiff(back.pixels, toRaster(theirs).pixels)
      assert(mx2 <= 16 && mean2 <= 2.0, s"ri=$ri max=$mx2 mean=$mean2")
    }
  }

  test("property: 4:4:4 near-lossless round-trip bounds hold for ARBITRARY content") {
    // quant=1 leaves only DCT forward/inverse rounding, which is
    // content-independent — random noise (the worst case for a DCT
    // codec) must round-trip as tightly as smooth gradients
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 8) {
      val w = 9 + rnd.nextInt(40)
      val h = 9 + rnd.nextInt(40)
      val px = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val img = PngCodec.Raster(w, h, 3, px)
      val back = JpegCodec.decode(JpegCodec.encode(img))
      val (mx, mean) = maxAndMeanDiff(back.pixels, img.pixels)
      assert(mx <= 4 && mean <= 1.2, s"trial=$trial ${w}x$h max=$mx mean=$mean")
    }
  }

  test("unsupported and corrupt inputs fail loudly, never wrong pixels") {
    val bytes = JpegCodec.encode(smooth(16, 16))
    // truncate mid-entropy-stream
    intercept[IllegalArgumentException] {
      JpegCodec.decode(java.util.Arrays.copyOf(bytes, bytes.length - 20))
    }
    // not a JPEG at all
    intercept[IllegalArgumentException] { JpegCodec.decode("BM garbage".getBytes) }
    // flip SOF0 to SOF2 (progressive) — must refuse, not mis-decode;
    // find the real SOF marker by walking segments (0xFFC0 bytes can
    // legitimately appear inside entropy data or tables)
    var off = 2
    var sofAt = -1
    while (sofAt < 0) {
      val m = bytes(off + 1) & 0xff
      if (m == 0xc0) sofAt = off
      else off += 2 + (((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff))
    }
    // SOF0 flipped to SOF2: claims progressive but carries a baseline
    // full-band scan — structurally invalid (a progressive DC scan
    // must have Se = 0), and must fail loudly, not decode wrong pixels
    val prog = bytes.clone(); prog(sofAt + 1) = 0xc2.toByte
    intercept[IllegalArgumentException] { JpegCodec.decode(prog) }
    // arithmetic-coded SOFs remain honestly unsupported
    val arith = bytes.clone(); arith(sofAt + 1) = 0xc9.toByte
    assert(intercept[IllegalArgumentException] { JpegCodec.decode(arith) }
      .getMessage.contains("SOF"))
  }

  /** True iff marker FFxx appears in the header walk (markers cannot
    * occur unescaped inside entropy data, so a byte-pair scan is safe). */
  private def hasMarker(bytes: Array[Byte], m: Int): Boolean =
    bytes.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == m)

  /** ImageIO-encode `img` at quality 0.9, optionally progressive. */
  private def imageIoJpeg(img: java.awt.image.BufferedImage, prog: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    if (prog) params.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(0.9f)
    writer.setOutput(javax.imageio.ImageIO.createImageOutputStream(out))
    writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    writer.dispose()
    out.toByteArray
  }

  test("progressive cross-oracle: we decode ImageIO-written SOF2 JPEGs") {
    for ((w, h) <- Seq((64, 48), (17, 9))) {
      val img = toBuffered(smooth(w, h))
      val bytes = imageIoJpeg(img, prog = true)
      // the JDK writer's default progression uses successive
      // approximation, so this exercises DC/AC first AND refine scans
      assert(hasMarker(bytes, 0xc2), "ImageIO did not write SOF2")
      val ours = JpegCodec.decode(bytes)
      assert(ours.width == w && ours.height == h)
      // strongest pin: libjpeg's progressive mode reorganizes ONLY the
      // entropy coding — the quantized coefficients are identical to
      // the sequential encoding at the same settings, so our decodes
      // of the two byte streams must agree exactly
      val seqBytes = imageIoJpeg(img, prog = false)
      assert(!hasMarker(seqBytes, 0xc2))
      val oursSeq = JpegCodec.decode(seqBytes)
      val (mxSeq, _) = maxAndMeanDiff(ours.pixels, oursSeq.pixels)
      assert(mxSeq == 0, s"${w}x$h progressive vs sequential decode max=$mxSeq")
      // and ImageIO's own decode agrees within conformant-decoder slack
      // (chroma upsample filters differ; small images amplify the mean)
      val theirs = toRaster(
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      val (mx, mean) = maxAndMeanDiff(ours.pixels, theirs.pixels)
      assert(mx <= 24 && mean <= 6.5, s"${w}x$h max=$mx mean=$mean")
    }
  }

  test("progressive cross-oracle: grayscale SOF2 (single-component DC scans) decodes") {
    val w = 33; val h = 21
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val g = (x * 255 / (w - 1) + y * 3) % 256
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    writer.setOutput(javax.imageio.ImageIO.createImageOutputStream(out))
    writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    writer.dispose()
    val bytes = out.toByteArray
    assert(hasMarker(bytes, 0xc2), "ImageIO did not write SOF2")
    val ours = JpegCodec.decode(bytes)
    assert(ours.width == w && ours.height == h && ours.channels == 3)
    val theirImg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var mx = 0
    for (y <- 0 until h; x <- 0 until w)
      mx = math.max(mx, math.abs((ours.pixels(3 * (y * w + x)) & 0xff) -
        theirImg.getRaster.getSample(x, y, 0)))
    assert(mx <= 8, s"max=$mx")
  }

  test("encodeProgressive: same coefficients as baseline — decodes pixel-identical") {
    for (sub <- Seq(1, 2); (w, h) <- Seq((48, 32), (17, 9), (8, 8), (1, 1))) {
      val img = smooth(w, h)
      val prog = JpegCodec.encodeProgressive(img, subsample = sub)
      assert(hasMarker(prog, 0xc2), "no SOF2 in progressive output")
      val seq = JpegCodec.encode(img, subsample = sub)
      val a = JpegCodec.decode(prog)
      val b = JpegCodec.decode(seq)
      assert(a.width == w && a.height == h)
      val (mx, _) = maxAndMeanDiff(a.pixels, b.pixels)
      assert(mx == 0, s"sub=$sub ${w}x$h progressive decode diverged, max=$mx")
    }
  }

  test("cross-oracle: ImageIO reads our progressive bytes the same way") {
    for (sub <- Seq(1, 2)) {
      val img = smooth(48, 32)
      val bytes = JpegCodec.encodeProgressive(img, subsample = sub)
      val theirs = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(theirs != null, "ImageIO failed to parse our progressive JPEG")
      assert(theirs.getWidth == 48 && theirs.getHeight == 32)
      val ours = JpegCodec.decode(bytes)
      val (mx, mean) = maxAndMeanDiff(ours.pixels, toRaster(theirs).pixels)
      assert(mx <= 16 && mean <= 2.0, s"sub=$sub max=$mx mean=$mean")
    }
  }

  test("encode rejects dimensions beyond the 16-bit SOF fields") {
    val wide = PngCodec.Raster(70000, 1, 3, new Array[Byte](70000 * 3))
    assert(intercept[IllegalArgumentException] { JpegCodec.encode(wide) }
      .getMessage.contains("65535"))
    val tall = PngCodec.Raster(1, 70000, 3, new Array[Byte](70000 * 3))
    intercept[IllegalArgumentException] { JpegCodec.encode(tall) }
  }

  test("EXIF orientation: write → parse round-trips all 8; decode unaffected") {
    val base = JpegCodec.encode(PngCodec.gradient(3L, 17, 11))
    assert(JpegCodec.exifOrientation(base) == 1) // no APP1 at all
    for (o <- 1 to 8) {
      val tagged = JpegCodec.withExifOrientation(base, o)
      assert(JpegCodec.exifOrientation(tagged) == o)
      // the APP1 insert must not disturb dims parsing or pixel decode
      assert(JpegCodec.parseDimsJpeg(tagged) == (17, 11))
      assert(JpegCodec.decode(tagged).pixels
        .sameElements(JpegCodec.decode(base).pixels))
    }
    intercept[IllegalArgumentException] { JpegCodec.withExifOrientation(base, 0) }
    intercept[IllegalArgumentException] { JpegCodec.withExifOrientation(base, 9) }
  }

  test("EXIF orientation: big-endian TIFF parses; malformed EXIF degrades to 1") {
    val base = JpegCodec.encode(PngCodec.gradient(4L, 9, 9))
    // hand-build a BIG-endian (MM) APP1 with orientation 7
    val tiff = Array[Byte](
      'M', 'M', 0, 42, 0, 0, 0, 8, // big-endian, magic, IFD0 at 8
      0, 1, // one entry
      0x01, 0x12, 0, 3, 0, 0, 0, 1, // tag 0x0112, SHORT, count 1
      0, 7, 0, 0, // value 7 (big-endian SHORT in first two bytes)
      0, 0, 0, 0)
    val payload = "Exif".getBytes ++ Array[Byte](0, 0) ++ tiff
    val segLen = 2 + payload.length
    val mm = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe1.toByte,
      ((segLen >> 8) & 0xff).toByte, (segLen & 0xff).toByte) ++
      payload ++ base.drop(2)
    assert(JpegCodec.exifOrientation(mm) == 7)
    // corrupt byte-order mark (tiff[0], absolute 12) → 1, never a throw
    val bad = mm.clone(); bad(12) = 'X'
    assert(JpegCodec.exifOrientation(bad) == 1)
    // orientation value out of range (SHORT low byte at tiff[19]) → 1
    val oor = mm.clone(); oor(12 + 19) = 99.toByte
    assert(JpegCodec.exifOrientation(oor) == 1)
    // truncated mid-APP1 → 1, never a throw
    assert(JpegCodec.exifOrientation(mm.take(20)) == 1)
  }

  test("decode rejects implausible SOF dims before any allocation math can overflow") {
    // hand-built FFD8 + SOF0 declaring 65535x65535: the plane and
    // progressive-coefficient sizes (w*h*...) would wrap Int — decode
    // must fail the require, not NegativeArraySize/AIOOBE later
    val b = Array[Int](
      0xff, 0xd8,
      0xff, 0xc0, 0x00, 0x0b, // SOF0, length 11
      8,                       // precision
      0xff, 0xff,              // height 65535
      0xff, 0xff,              // width 65535
      1,                       // one component
      1, 0x11, 0).map(_.toByte)
    assert(intercept[IllegalArgumentException] { JpegCodec.decode(b) }
      .getMessage.contains("implausible"))
  }
}
