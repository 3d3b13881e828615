package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Gzip

/** Gzip codec laws. The JDK's GZIPOutputStream/GZIPInputStream is an
  * INDEPENDENT implementation (zlib-derived C under the JVM), so
  * cross-checking both directions pins our RFC 1952/1951 reading
  * against a second party, not against ourselves. */
class GzipSpec extends AnyFunSuite {

  private def jdkGzip(raw: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(raw)
    g.close()
    bos.toByteArray
  }

  private def jdkGunzip(gz: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(gz))
    val bos = new ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    var n = in.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
    in.close()
    bos.toByteArray
  }

  private val samples: Seq[Array[Byte]] = Seq(
    "".getBytes(UTF_8),
    "a".getBytes(UTF_8),
    "hello world".getBytes(UTF_8),
    ("the quick brown fox jumps over the lazy dog " * 40).getBytes(UTF_8),
    Array.tabulate(70000)(i => (i % 251).toByte), // spans two stored blocks
    Array.fill(500)(0x1f.toByte), // payload full of gzip magic bytes
    ("aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa" * 100).getBytes(UTF_8)) // max-length matches

  test("roundtrip: our gzip (both modes) -> our gunzip is identity") {
    samples.foreach { raw =>
      assert(Gzip.gunzip(Gzip.gzip(raw, stored = true)).sameElements(raw))
      assert(Gzip.gunzip(Gzip.gzip(raw)).sameElements(raw))
    }
  }

  test("cross-oracle: our gzip decodes under the JDK, both modes") {
    samples.foreach { raw =>
      assert(jdkGunzip(Gzip.gzip(raw, stored = true)).sameElements(raw))
      assert(jdkGunzip(Gzip.gzip(raw)).sameElements(raw))
    }
  }

  test("cross-oracle: JDK gzip (dynamic-Huffman deflate) decodes under ours") {
    samples.foreach { raw =>
      assert(Gzip.gunzip(jdkGzip(raw)).sameElements(raw))
    }
  }

  test("stored-mode size is the closed form 18 + n + 5*ceil(n/65535), min one block") {
    samples.foreach { raw =>
      assert(Gzip.gzip(raw, stored = true).length.toLong == Gzip.storedGzipSize(raw.length.toLong))
    }
  }

  test("LZ77 compressor actually compresses repetitive text") {
    val raw = ("key agg row scan slow fast table value part hash " * 50).getBytes(UTF_8)
    val lz = Gzip.gzip(raw)
    assert(lz.length < raw.length / 3,
      s"expected >3x compression on repetitive text, got ${raw.length} -> ${lz.length}")
  }

  test("deterministic: equal payloads gzip to equal bytes (dedup-safe)") {
    val raw = "determinism pin".getBytes(UTF_8)
    assert(Gzip.gzip(raw).sameElements(Gzip.gzip(raw)))
    assert(Gzip.gzip(raw, stored = true).sameElements(Gzip.gzip(raw, stored = true)))
  }

  test("multi-member streams concatenate; members exposes boundaries") {
    val a = "first member ".getBytes(UTF_8)
    val b = "second".getBytes(UTF_8)
    val blob = Gzip.gzip(a) ++ Gzip.gzip(b, stored = true)
    assert(Gzip.gunzip(blob).sameElements(a ++ b))
    val ms = Gzip.members(blob)
    assert(ms.size == 2)
    assert(ms(0).start == 0 && ms(0).end == Gzip.gzip(a).length)
    assert(ms(1).end == blob.length)
    assert(ms(0).payload.sameElements(a) && ms(1).payload.sameElements(b))
  }

  test("optional header fields parse: FNAME surfaces, FHCRC verifies") {
    // hand-build a member with FNAME + FHCRC around a stored deflate body
    val raw = "named".getBytes(UTF_8)
    val body = {
      val m = Gzip.gzip(raw, stored = true)
      java.util.Arrays.copyOfRange(m, 10, m.length) // deflate + trailer
    }
    val name = "file.txt".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val head = new ByteArrayOutputStream()
    head.write(Array(0x1f, 0x8b, 8, 0x0a, 0, 0, 0, 0, 0, 0xff).map(_.toByte)) // FLG: FNAME|FHCRC
    head.write(name); head.write(0)
    val hb = head.toByteArray
    val crc = new java.util.zip.CRC32(); crc.update(hb)
    val out = new ByteArrayOutputStream()
    out.write(hb)
    out.write((crc.getValue & 0xff).toInt); out.write(((crc.getValue >> 8) & 0xff).toInt)
    out.write(body)
    val m = Gzip.gunzipMember(out.toByteArray, 0)
    assert(m.fname.contains("file.txt"))
    assert(m.payload.sameElements(raw))
  }

  test("corruption fails loudly: CRC, ISIZE, magic, reserved FLG, trailing garbage") {
    val good = Gzip.gzip("payload under test".getBytes(UTF_8))
    val badCrc = good.clone(); badCrc(good.length - 6) = (badCrc(good.length - 6) ^ 1).toByte
    assertThrows[IllegalArgumentException](Gzip.gunzip(badCrc))
    val badIsize = good.clone(); badIsize(good.length - 1) = 0x7f.toByte
    assertThrows[IllegalArgumentException](Gzip.gunzip(badIsize))
    val badMagic = good.clone(); badMagic(0) = 0x1e.toByte
    assertThrows[IllegalArgumentException](Gzip.gunzip(badMagic))
    val badFlg = good.clone(); badFlg(3) = 0x80.toByte
    assertThrows[IllegalArgumentException](Gzip.gunzip(badFlg))
    assertThrows[IllegalArgumentException](Gzip.gunzip(good ++ Array[Byte](1, 2, 3)))
    assertThrows[IllegalArgumentException](Gzip.gunzip(good.dropRight(3)))
  }

  // ---- dynamic-Huffman encode (gzipAuto) --------------------------------

  test("gzipAuto roundtrips under our gunzip AND the independent JDK") {
    samples.foreach { raw =>
      val gz = Gzip.gzipAuto(raw)
      assert(Gzip.gunzip(gz).sameElements(raw))
      assert(jdkGunzip(gz).sameElements(raw))
    }
  }

  test("gzipAuto never exceeds the fixed or stored encodings") {
    samples.foreach { raw =>
      val auto = Gzip.gzipAuto(raw).length
      assert(auto <= Gzip.gzip(raw).length)
      assert(auto <= Gzip.gzip(raw, stored = true).length)
    }
  }

  test("dynamic block beats fixed on skewed-alphabet text") {
    // heavily skewed literal distribution: dynamic's per-input code
    // lengths must win over the fixed 8/9-bit table
    // skewed literals with no LZ structure (seeded, deterministic):
    // half the bytes are 'e', the rest spread over 30 rare symbols, in
    // pseudo-random order so matches stay short and literal coding
    // dominates the bit count
    val rnd = new scala.util.Random(42)
    val shuffled = Array.fill(4000) {
      if (rnd.nextBoolean()) 'e'.toByte else (97 + rnd.nextInt(30)).toByte
    }
    val dyn = Gzip.gzipAuto(shuffled).length
    val fix = Gzip.gzip(shuffled).length
    assert(dyn < fix, s"dynamic $dyn !< fixed $fix")
    assert(jdkGunzip(Gzip.gzipAuto(shuffled)).sameElements(shuffled))
  }

  test("gzipAuto is deterministic (dedup-safe)") {
    val raw = ("mixed content 123 " * 64).getBytes(UTF_8)
    assert(Gzip.gzipAuto(raw).sameElements(Gzip.gzipAuto(raw)))
  }

  test("gzipAuto ratio on natural text is within 15% of the JDK's zlib -6") {
    val text = ("Deduplicating training data makes language models better. " +
      "The quick brown fox jumps over the lazy dog; " +
      "pack my box with five dozen liquor jugs. ") * 200
    val raw = text.getBytes(UTF_8)
    val ours = Gzip.gzipAuto(raw).length.toDouble
    val jdk = jdkGzip(raw).length.toDouble
    assert(ours <= jdk * 1.15, s"ours $ours vs jdk $jdk")
  }

  test("fuzz: random and structured payloads roundtrip through gzipAuto") {
    val rnd = new scala.util.Random(0xd1ce)
    (0 until 60).foreach { k =>
      val n = rnd.nextInt(20000)
      val raw =
        if (k % 3 == 0) Array.fill(n)(rnd.nextInt(256).toByte) // incompressible
        else if (k % 3 == 1) Array.fill(n)(rnd.nextInt(4).toByte) // tiny alphabet
        else Array.tabulate(n)(i => ((i / 7) % 13).toByte) // runs
      val gz = Gzip.gzipAuto(raw)
      assert(Gzip.gunzip(gz).sameElements(raw))
      assert(jdkGunzip(gz).sameElements(raw))
    }
  }

  test("gzipAutoStats' closed-form sizes equal the real encodings") {
    (samples ++ Seq("tiny".getBytes(UTF_8))).foreach { raw =>
      val (gz, dynLen, fixedLen, storedLen) = Gzip.gzipAutoStats(raw)
      assert(fixedLen + 18 == Gzip.gzip(raw).length, s"fixed closed form off at n=${raw.length}")
      assert(storedLen + 18 == Gzip.gzip(raw, stored = true).length)
      assert(gz.length == 18 + math.min(dynLen, math.min(fixedLen, storedLen)))
      assert(jdkGunzip(gz).sameElements(raw))
    }
  }

  test("package-merge lengths satisfy Kraft equality and the bit limit") {
    val rnd = new scala.util.Random(0xbeef)
    (0 until 50).foreach { _ =>
      val n = 2 + rnd.nextInt(284)
      val freq = new Array[Long](n)
      (0 until n).foreach(i => freq(i) = if (rnd.nextInt(4) == 0) 0 else rnd.nextInt(10000).toLong + 1)
      if (freq.count(_ > 0) >= 2) {
        // 2^limit must fit the used-symbol count (9 bits covers 286)
        val limit = 9 + rnd.nextInt(7)
        val lens = Gzip.limitedLengths(freq, limit)
        assert(lens.max <= limit)
        // optimal prefix code over >= 2 symbols is complete: Kraft sum == 1
        val kraft = lens.filter(_ > 0).map(l => 1.0 / (1L << l)).sum
        assert(math.abs(kraft - 1.0) < 1e-12, s"kraft $kraft")
        assert(freq.indices.forall(i => (freq(i) > 0) == (lens(i) > 0)))
      }
    }
  }
}
