package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZipCodec
import graft.operators.ZipCodec.Entry

/** Cross-checked against the JDK's independent ZipInput/OutputStream
  * in both directions (the ImageIO precedent: an independent
  * implementation already in the JVM, not a library dependency). */
class ZipCodecSpec extends AnyFunSuite {

  private val entries = Seq(
    Entry("a.txt", "alpha content".getBytes(UTF_8)),
    Entry("dir/b.txt", ("repeat me " * 200).getBytes(UTF_8)), // compressible
    Entry("empty.bin", Array.emptyByteArray),
    Entry("binary.dat", Array.tabulate(4096)(i => ((i * 31 + 7) % 251).toByte)),
    Entry("uni-ñames/文.txt", "unicode näme".getBytes(UTF_8)))

  test("roundtrip: encode -> decode preserves names, order, bytes") {
    val back = ZipCodec.decode(ZipCodec.encode(entries))
    assert(back.map(_.name) == entries.map(_.name))
    back.zip(entries).foreach { case (g, w) =>
      assert(g.data.sameElements(w.data), s"member ${w.name} corrupted")
    }
  }

  test("compressible members really deflate; incompressible store") {
    val enc = ZipCodec.encode(entries)
    assert(enc.length <
      entries.map(_.data.length).sum + 200 * entries.size,
      "archive shows no compression at all")
  }

  test("JDK ZipInputStream reads our archives") {
    val in = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(ZipCodec.encode(entries)),
      UTF_8)
    val got = Iterator.continually(in.getNextEntry)
      .takeWhile(_ != null)
      .map(e => (e.getName, in.readAllBytes().toSeq))
      .toSeq
    assert(got.map(_._1) == entries.map(_.name))
    got.zip(entries).foreach { case ((n, d), w) =>
      assert(d == w.data.toSeq, s"member $n corrupted for the JDK reader")
    }
  }

  test("we read JDK ZipOutputStream archives (incl. data-descriptor members)") {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.util.zip.ZipOutputStream(bos, UTF_8)
    entries.foreach { e =>
      out.putNextEntry(new java.util.zip.ZipEntry(e.name))
      out.write(e.data)
      out.closeEntry()
    }
    out.close()
    // ZipOutputStream streams with bit-3 data descriptors: local
    // headers carry zero sizes, the central directory is authoritative
    val back = ZipCodec.decode(bos.toByteArray)
    assert(back.map(_.name) == entries.map(_.name))
    back.zip(entries).foreach { case (g, w) =>
      assert(g.data.sameElements(w.data), s"member ${w.name} corrupted")
    }
  }

  test("archive comment tail: EOCD found by backwards scan") {
    val enc = ZipCodec.encode(entries.take(2))
    // rewrite the comment length and append a comment
    val comment = "trailing archive comment".getBytes(UTF_8)
    val withComment = enc.clone()
    withComment(withComment.length - 2) = (comment.length & 0xff).toByte
    withComment(withComment.length - 1) = ((comment.length >>> 8) & 0xff).toByte
    val full = withComment ++ comment
    val back = ZipCodec.decode(full)
    assert(back.map(_.name) == entries.take(2).map(_.name))
  }

  test("corruption and unsupported features fail loudly by name") {
    val enc = ZipCodec.encode(entries.take(2))
    // flip a payload byte -> CRC mismatch
    val bad = enc.clone()
    bad(35) = (bad(35) ^ 0x20).toByte
    val e1 = intercept[IllegalArgumentException](ZipCodec.decode(bad))
    assert(e1.getMessage.contains("CRC") || e1.getMessage.contains("deflate") ||
      e1.getMessage.contains("declared"), e1.getMessage)
    // no EOCD at all
    val e2 = intercept[IllegalArgumentException](
      ZipCodec.decode(Array.fill(64)(0x11.toByte)))
    assert(e2.getMessage.contains("end-of-central-directory"))
    // encryption flag set in the central directory
    val eocdAt = enc.length - 22
    val cdStart = ((enc(eocdAt + 16) & 0xff) | ((enc(eocdAt + 17) & 0xff) << 8) |
      ((enc(eocdAt + 18) & 0xff) << 16) | ((enc(eocdAt + 19) & 0xff) << 24))
    val encFlag = enc.clone()
    encFlag(cdStart + 8) = (encFlag(cdStart + 8) | 0x01).toByte
    val e3 = intercept[IllegalArgumentException](ZipCodec.decode(encFlag))
    assert(e3.getMessage.contains("encrypted"))
  }

  test("truncation sweep fails loudly, never an index error") {
    val enc = ZipCodec.encode(entries.take(3))
    for (cut <- 0 until enc.length) {
      try {
        ZipCodec.decode(java.util.Arrays.copyOf(enc, cut)); ()
      } catch { case _: IllegalArgumentException => () }
    }
  }
}
