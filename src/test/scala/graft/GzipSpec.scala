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
}
