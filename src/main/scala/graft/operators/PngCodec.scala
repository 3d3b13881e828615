package graft.operators

import java.util.zip.{Adler32, CRC32, Inflater}

/** Minimal PNG codec over PUBLIC byte layouts — the W3C PNG spec
  * (chunk framing, IHDR/IDAT/IEND, the five scanline filters) and the
  * zlib/deflate RFCs 1950/1951 (stream framing, stored blocks).
  *
  * No imaging library: chunk framing, zlib framing, STORED-block
  * deflate (both directions) and all five scanline filters are
  * implemented directly as byte math. Inflating COMPRESSED deflate
  * blocks (fixed/dynamic Huffman) delegates to
  * `java.util.zip.Inflater` — the JDK's own zlib binding, present on
  * every JVM; a compression primitive, not an image codec. JPEG (DCT +
  * arithmetic/Huffman entropy coding over frequency space) remains out
  * of reach without a real codec library, which is what
  * [[Multimodal.resizeStub]] still fences.
  *
  * Supported pixel formats: 8-bit truecolor (color type 2, RGB) and
  * truecolor-alpha (color type 6, RGBA), non-interlaced — the dominant
  * PNG classes in web corpora; everything else fails loudly rather
  * than decode wrong pixels.
  */
object PngCodec {

  /** Decoded raster: tightly-packed rows, `channels` bytes per pixel
    * (3 = RGB, 4 = RGBA), no filter bytes. */
  final case class Raster(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  private val Sig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def putBe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >>> 24) & 0xff).toByte
    b(off + 1) = ((v >>> 16) & 0xff).toByte
    b(off + 2) = ((v >>> 8) & 0xff).toByte
    b(off + 3) = (v & 0xff).toByte
  }

  /** Paeth predictor (PNG spec §6.6): the neighbor closest to
    * left + up − upleft, ties resolved left, up, upleft. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Inflate a zlib stream of known decompressed size. STORED blocks
    * (BTYPE 00 — what [[encode]] writes) are decoded by hand per RFC
    * 1951 §3.2.4 (byte-aligned: header byte, LEN/NLEN LE16, raw copy);
    * the moment a compressed block appears, the whole stream is handed
    * to the JDK Inflater instead (restart is safe — nothing was
    * emitted outside `out`, which is overwritten). */
  private def inflate(z: Array[Byte], expected: Int): Array[Byte] = {
    require(z.length >= 2, "zlib stream too short")
    val out = new Array[Byte](expected)
    var zo = 2
    var n = 0
    var fin = false
    var stored = true
    while (stored && !fin) {
      require(zo < z.length, "truncated zlib stream")
      val hdr = z(zo) & 0xff
      if (((hdr >> 1) & 3) != 0) stored = false
      else {
        fin = (hdr & 1) == 1
        require(zo + 5 <= z.length, "truncated stored-block header")
        val len = (z(zo + 1) & 0xff) | ((z(zo + 2) & 0xff) << 8)
        val nlen = (z(zo + 3) & 0xff) | ((z(zo + 4) & 0xff) << 8)
        require((len ^ nlen) == 0xffff, "corrupt stored block (LEN/NLEN mismatch)")
        require(n + len <= expected, "stored blocks exceed the expected raster size")
        require(zo + 5 + len <= z.length, "truncated stored-block payload")
        System.arraycopy(z, zo + 5, out, n, len)
        n += len
        zo += 5 + len
      }
    }
    if (!stored) {
      val inf = new Inflater()
      inf.setInput(z)
      n = 0
      try {
        while (n < expected && !inf.finished()) {
          val got = inf.inflate(out, n, expected - n)
          require(got > 0 || inf.finished(), "truncated or corrupt zlib stream")
          n += got
        }
      } finally inf.end()
    }
    require(n == expected, s"decompressed $n bytes, expected $expected")
    out
  }

  /** Parse and fully decode a PNG: chunk walk, zlib inflate, unfilter
    * each scanline per its filter byte. Ancillary chunks are skipped;
    * malformed or unsupported inputs fail loudly. */
  def decode(bytes: Array[Byte]): Raster = {
    require(bytes != null && bytes.length > 8 &&
      java.util.Arrays.equals(bytes, 0, 8, Sig, 0, 8), "not a PNG payload")
    var off = 8
    var w = 0
    var h = 0
    var colorType = -1
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && off + 8 <= bytes.length) {
      val len = be32(bytes, off)
      require(len >= 0 && off.toLong + 12L + len <= bytes.length,
        s"truncated chunk at offset $off")
      val typ = new String(bytes, off + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      typ match {
        case "IHDR" =>
          w = be32(bytes, off + 8)
          h = be32(bytes, off + 12)
          val bitDepth = bytes(off + 16) & 0xff
          colorType = bytes(off + 17) & 0xff
          val interlace = bytes(off + 20) & 0xff
          require(bitDepth == 8, s"unsupported bit depth $bitDepth (8-bit only)")
          require(colorType == 2 || colorType == 6,
            s"unsupported color type $colorType (truecolor 2 / truecolor-alpha 6 only)")
          require(interlace == 0, "interlaced (Adam7) PNG not supported")
        case "IDAT" => idat.write(bytes, off + 8, len)
        case "IEND" => done = true
        case _ => ()
      }
      off += 12 + len
    }
    require(w > 0 && h > 0 && colorType >= 0, "missing or empty IHDR")
    val ch = if (colorType == 2) 3 else 4
    val stride = w * ch
    val raw = inflate(idat.toByteArray, h * (stride + 1))
    val out = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val ft = raw(y * (stride + 1)) & 0xff
      val src = y * (stride + 1) + 1
      val dst = y * stride
      var x = 0
      while (x < stride) {
        val fx = raw(src + x) & 0xff
        val a = if (x >= ch) out(dst + x - ch) & 0xff else 0
        val b = if (y > 0) out(dst - stride + x) & 0xff else 0
        val c = if (x >= ch && y > 0) out(dst - stride + x - ch) & 0xff else 0
        val rec = ft match {
          case 0 => fx
          case 1 => fx + a
          case 2 => fx + b
          case 3 => fx + ((a + b) >> 1)
          case 4 => fx + paeth(a, b, c)
          case other =>
            throw new IllegalArgumentException(s"bad filter type $other at row $y")
        }
        out(dst + x) = (rec & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Raster(w, h, ch, out)
  }

  private def writeChunk(out: Array[Byte], off: Int, typ: String, data: Array[Byte]): Int = {
    putBe32(out, off, data.length)
    var i = 0
    while (i < 4) { out(off + 4 + i) = typ.charAt(i).toByte; i += 1 }
    System.arraycopy(data, 0, out, off + 8, data.length)
    val crc = new CRC32()
    crc.update(out, off + 4, 4 + data.length)
    putBe32(out, off + 8 + data.length, crc.getValue.toInt)
    off + 12 + data.length
  }

  /** Serialize a [[Raster]] as a spec-valid PNG. The zlib stream uses
    * hand-written STORED deflate blocks (RFC 1951 §3.2.4), so the
    * output is deterministic byte-for-byte and the file size is a
    * closed form of the dims — `63 + raw + 5·⌈raw/65535⌉` with
    * `raw = height·(1 + width·channels)` — which the SQL oracle
    * recomputes. Rows are written filter-0 (decode accepts all five). */
  def encode(img: Raster): Array[Byte] = {
    require(img.width > 0 && img.height > 0, s"bad dims ${img.width}x${img.height}")
    require(img.channels == 3 || img.channels == 4, s"bad channels ${img.channels}")
    require(img.pixels.length == img.width * img.height * img.channels, "pixel size mismatch")
    val stride = img.width * img.channels
    val raw = new Array[Byte](img.height * (stride + 1))
    var y = 0
    while (y < img.height) {
      raw(y * (stride + 1)) = 0
      System.arraycopy(img.pixels, y * stride, raw, y * (stride + 1) + 1, stride)
      y += 1
    }
    val nBlocks = (raw.length + 65534) / 65535
    val z = new Array[Byte](2 + nBlocks * 5 + raw.length + 4)
    // zlib header: CMF 0x78 (deflate, 32k window), FLG 0x01 — no preset
    // dictionary, (CMF·256 + FLG) % 31 == 0 as RFC 1950 requires
    z(0) = 0x78.toByte
    z(1) = 0x01.toByte
    var zo = 2
    var ro = 0
    while (ro < raw.length) {
      val len = math.min(65535, raw.length - ro)
      z(zo) = if (ro + len == raw.length) 1.toByte else 0.toByte // BFINAL, BTYPE 00
      z(zo + 1) = (len & 0xff).toByte
      z(zo + 2) = ((len >> 8) & 0xff).toByte
      z(zo + 3) = (~len & 0xff).toByte
      z(zo + 4) = ((~len >> 8) & 0xff).toByte
      System.arraycopy(raw, ro, z, zo + 5, len)
      zo += 5 + len
      ro += len
    }
    val ad = new Adler32()
    ad.update(raw)
    putBe32(z, zo, ad.getValue.toInt)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, img.width)
    putBe32(ihdr, 4, img.height)
    ihdr(8) = 8
    ihdr(9) = if (img.channels == 3) 2 else 6
    val out = new Array[Byte](8 + 25 + (12 + z.length) + 12)
    System.arraycopy(Sig, 0, out, 0, 8)
    var o = writeChunk(out, 8, "IHDR", ihdr)
    o = writeChunk(out, o, "IDAT", z)
    o = writeChunk(out, o, "IEND", Array.emptyByteArray)
    assert(o == out.length, s"size bookkeeping off: $o != ${out.length}")
    out
  }

  /** Nearest-neighbor resample — the same floor index math as
    * [[Multimodal.resizeBmp24]], channel-count agnostic. */
  def resize(img: Raster, scalePercent: Int): Raster = {
    require(scalePercent > 0, s"scalePercent must be positive, got $scalePercent")
    val nw = math.max(1, img.width * scalePercent / 100)
    val nh = math.max(1, img.height * scalePercent / 100)
    val ch = img.channels
    val out = new Array[Byte](nw * nh * ch)
    var y = 0
    while (y < nh) {
      val sy = y * img.height / nh
      var x = 0
      while (x < nw) {
        val s = (sy * img.width + x * img.width / nw) * ch
        val d = (y * nw + x) * ch
        var k = 0
        while (k < ch) { out(d + k) = img.pixels(s + k); k += 1 }
        x += 1
      }
      y += 1
    }
    Raster(nw, nh, ch, out)
  }

  /** Decode → nearest-neighbor resample → re-encode: the REAL PNG
    * resize path (real inflate, real unfilter, real pixel math). */
  def resizePng(bytes: Array[Byte], scalePercent: Int): Array[Byte] =
    encode(resize(decode(bytes), scalePercent))

  /** Deterministic RGB gradient raster — the same per-pixel formulas as
    * [[Multimodal.encodeBmp]] (which stores them B,G,R) — so gate/test
    * payloads are reproducible everywhere. */
  def gradient(id: Long, width: Int, height: Int): Raster = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val px = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val d = (y * width + x) * 3
        px(d) = ((x * 7 + y * 3) & 0xff).toByte // R
        px(d + 1) = ((x ^ y) & 0xff).toByte // G
        px(d + 2) = ((x + y + id) & 0xff).toByte // B
        x += 1
      }
      y += 1
    }
    Raster(width, height, 3, px)
  }
}
