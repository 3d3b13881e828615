package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Decompress, Lz4}

/** Cross-checked against the SYSTEM lz4 binary in both directions —
  * the real tool's frames (several levels and block sizes, block
  * checksums on) exercise our full frame walk, while our frames
  * exercise its strictness on our greedy block encoder. */
class Lz4Spec extends AnyFunSuite {

  private def haveLz4: Boolean =
    try { new ProcessBuilder("lz4", "--version").start().waitFor(); true }
    catch { case _: java.io.IOException => false }

  private def run(cmd: Seq[String], input: Array[Byte]): Array[Byte] = {
    val p = new ProcessBuilder(cmd: _*).start()
    val out = new java.io.ByteArrayOutputStream()
    val err = new java.io.ByteArrayOutputStream()
    val feeder = new Thread(() => {
      p.getOutputStream.write(input); p.getOutputStream.close()
    })
    val drainer = new Thread(() => {
      val buf = new Array[Byte](8192)
      var n = p.getErrorStream.read(buf)
      while (n >= 0) { err.write(buf, 0, n); n = p.getErrorStream.read(buf) }
    })
    feeder.start(); drainer.start()
    val buf = new Array[Byte](8192)
    var n = p.getInputStream.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = p.getInputStream.read(buf) }
    feeder.join(); drainer.join()
    assert(p.waitFor() == 0,
      s"${cmd.mkString(" ")} failed: ${new String(err.toByteArray, UTF_8)}")
    out.toByteArray
  }

  private val samples: Seq[Array[Byte]] = Seq(
    Array.emptyByteArray,
    "x".getBytes(UTF_8),
    "hello lz4 world".getBytes(UTF_8),
    ("key agg row scan slow fast table value part hash " * 50).getBytes(UTF_8),
    ("the quick brown fox jumps over the lazy dog. " * 4000).getBytes(UTF_8),
    Array.tabulate(300000)(i => ((i * 17 + (i >> 7)) % 253).toByte), // > 4 blocks
    Array.fill(70000)(7.toByte), // long run crossing a block boundary
    Array.tabulate(256)(_.toByte))

  // --- XXH32 (spec test vectors: xxHash reference doc) ------------------

  test("xxh32 known-answer vectors") {
    // published reference values for seed 0
    assert(Lz4.xxh32(Array.emptyByteArray, 0, 0) == 0x02cc5d05)
    val abc = "abc".getBytes(UTF_8)
    assert(Lz4.xxh32(abc, 0, 3) == 0x32d153ff)
    val long = "Nobody inspects the spammish repetition".getBytes(UTF_8)
    assert(Lz4.xxh32(long, 0, long.length) == 0xe2293b2f)
  }

  // --- our encoder -> our decoder ---------------------------------------

  test("roundtrip: compressed encode -> decode is identity") {
    samples.foreach { raw =>
      assert(Lz4.decode(Lz4.encode(raw)).sameElements(raw),
        s"roundtrip failed at ${raw.length} bytes")
    }
  }

  test("roundtrip: stored encode -> decode; closed-form size") {
    samples.foreach { raw =>
      val st = Lz4.encodeStored(raw)
      assert(st.length == Lz4.storedSize(raw.length),
        s"storedSize mismatch at ${raw.length} bytes: ${st.length}")
      assert(Lz4.decode(st).sameElements(raw))
    }
  }

  test("repetitive input compresses well below stored size") {
    val raw = ("the quick brown fox jumps over the lazy dog. " * 4000).getBytes(UTF_8)
    assert(Lz4.encode(raw).length < raw.length / 10)
  }

  test("concatenated frames decode as concatenated content; skippable frames skip") {
    val a = "first frame ".getBytes(UTF_8)
    val b = "second frame".getBytes(UTF_8)
    val skip = Array[Byte](0x50, 0x2a, 0x4d.toByte, 0x18, 3, 0, 0, 0, 9, 9, 9)
    val cat = Lz4.encode(a) ++ skip ++ Lz4.encode(b)
    assert(new String(Lz4.decode(cat), UTF_8) == "first frame second frame")
    // skippable-only stream carries no data frame -> loud failure
    val e = intercept[IllegalArgumentException](Lz4.decode(skip))
    assert(e.getMessage.contains("no LZ4 data frame"))
  }

  test("legacy magic and dictionary frames rejected by name") {
    val legacy = Array[Byte](0x02, 0x21, 0x4c, 0x18)
    val e1 = intercept[IllegalArgumentException](Lz4.decode(legacy))
    assert(e1.getMessage.contains("legacy"))
    val withDict = Lz4.encode("payload".getBytes(UTF_8))
    withDict(4) = (withDict(4) | 0x01).toByte // set DictID flag (HC now stale, but dict check fires first)
    val e2 = intercept[IllegalArgumentException](Lz4.decode(withDict))
    assert(e2.getMessage.contains("dictionary") || e2.getMessage.contains("DictID"))
  }

  test("corruption detected: content checksum, descriptor checksum, offset bounds") {
    val raw = ("corpus shard line " * 100).getBytes(UTF_8)
    val enc = Lz4.encode(raw)
    val badSum = enc.clone()
    badSum(badSum.length - 1) = (badSum(badSum.length - 1) ^ 0x7f).toByte
    val e1 = intercept[IllegalArgumentException](Lz4.decode(badSum))
    assert(e1.getMessage.contains("content checksum"))
    val badHc = enc.clone()
    badHc(14) = (badHc(14) ^ 0x55).toByte // HC byte (after magic + FLG+BD+8-byte size)
    val e2 = intercept[IllegalArgumentException](Lz4.decode(badHc))
    assert(e2.getMessage.contains("descriptor checksum"))
  }

  test("truncation sweep: every prefix fails loudly, never mis-decodes") {
    val raw = ("truncate me " * 50).getBytes(UTF_8)
    val enc = Lz4.encode(raw)
    for (cut <- 1 until enc.length) {
      try {
        val got = Lz4.decode(java.util.Arrays.copyOf(enc, cut))
        assert(false, s"truncation at $cut decoded ${got.length} bytes silently")
      } catch { case _: IllegalArgumentException => () }
    }
  }

  // --- cross-oracle against the system binary ---------------------------

  test("system lz4 decodes our frames (all samples)") {
    assume(haveLz4)
    samples.foreach { raw =>
      assert(run(Seq("lz4", "-d", "-c"), Lz4.encode(raw)).sameElements(raw),
        s"system lz4 rejected our frame at ${raw.length} bytes")
      assert(run(Seq("lz4", "-d", "-c"), Lz4.encodeStored(raw)).sameElements(raw),
        s"system lz4 rejected our stored frame at ${raw.length} bytes")
    }
  }

  test("we decode system lz4 frames (levels, block sizes, block checksums)") {
    assume(haveLz4)
    val variants = Seq(
      Seq("lz4", "-1", "-c"),
      Seq("lz4", "-9", "-c"),
      Seq("lz4", "-1", "-B4", "-c"), // 64 KiB blocks: multi-block on big samples
      Seq("lz4", "-5", "-B5", "-BX", "-c"), // block checksums on
      Seq("lz4", "-1", "-BD", "-B4", "-c")) // LINKED blocks
    for (cmd <- variants; raw <- samples) {
      val enc = run(cmd, raw)
      assert(Lz4.decode(enc).sameElements(raw),
        s"${cmd.mkString(" ")} frame failed at ${raw.length} bytes")
    }
  }

  // --- dispatch ----------------------------------------------------------

  test("Decompress sniffs and routes lz4") {
    val raw = "sniff my frame".getBytes(UTF_8)
    assert(Decompress.sniff(Lz4.encode(raw)) == "lz4")
    val (fmt, out) = Decompress.auto(Lz4.encode(raw))
    assert(fmt == "lz4" && out.sameElements(raw))
  }
}
