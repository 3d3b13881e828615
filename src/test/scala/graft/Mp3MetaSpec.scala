package graft

import graft.operators.Mp3Meta

class Mp3MetaSpec extends SparkSpec {

  private val KbpsV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Rates = Array(44100, 48000, 32000)

  test("encode → parse round-trips every (bitrate, samplerate) combination") {
    for (bi <- 1 to 14; si <- 0 to 2; n <- Seq(1, 3, 9)) {
      val m = Mp3Meta.parse(Mp3Meta.encode(n, bi, si))
      assert(m != null)
      assert(m.nFrames == n && m.sampleRate == Rates(si) && m.channels == 1)
      assert(m.bitrateKbps == KbpsV1L3(bi), s"bi=$bi")
      assert(m.durationMs == n.toLong * 1152 * 1000 / Rates(si))
      assert(!m.vbr)
    }
  }

  test("frame length matches the closed form 144000·kbps/sr") {
    for (bi <- 1 to 14; si <- 0 to 2) {
      val bytes = Mp3Meta.encode(5, bi, si)
      assert(bytes.length == 5 * (144000 * KbpsV1L3(bi) / Rates(si)))
    }
  }

  test("ID3v2 prefix and ID3v1 trailer are skipped") {
    val core = Mp3Meta.encode(4, 9, 0)
    // ID3v2: "ID3" v2.3, no flags, syncsafe size 130 (2 chunks of 0x01, 0x02)
    val id3v2 = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0x01, 0x02) ++
      new Array[Byte]((1 << 7) + 2)
    val id3v1 = Array[Byte]('T', 'A', 'G') ++ new Array[Byte](125)
    val m = Mp3Meta.parse(id3v2 ++ core ++ id3v1)
    assert(m != null && m.nFrames == 4 && m.bitrateKbps == 128)
  }

  test("mixed-bitrate stream reports vbr and the exact average") {
    val vbr = Mp3Meta.encode(2, 5, 1) ++ Mp3Meta.encode(2, 9, 1)
    val m = Mp3Meta.parse(vbr)
    assert(m.nFrames == 4 && m.vbr)
    assert(m.bitrateKbps == (2 * 64 + 2 * 128) / 4)
  }

  test("a Xing tag in frame 1 marks the stream VBR") {
    val bytes = Mp3Meta.encode(3, 14, 0) // 320 kbps: room for the tag
    // MPEG-1 mono Layer III: tag sits after 4-byte header + 17-byte side info
    val p = 4 + 17
    for ((c, i) <- "Xing".zipWithIndex) bytes(p + i) = c.toByte
    // flags: frames-field present; declared frame count 3
    bytes(p + 4) = 0; bytes(p + 5) = 0; bytes(p + 6) = 0; bytes(p + 7) = 1
    bytes(p + 8) = 0; bytes(p + 9) = 0; bytes(p + 10) = 0; bytes(p + 11) = 3
    val m = Mp3Meta.parse(bytes)
    assert(m.vbr && m.nFrames == 3)
  }

  test("a LAME 'Info' tag (CBR convention) does NOT mark the stream VBR") {
    val bytes = Mp3Meta.encode(3, 14, 0)
    val p = 4 + 17 // MPEG-1 mono L3: header + side info
    for ((c, i) <- "Info".zipWithIndex) bytes(p + i) = c.toByte
    bytes(p + 4) = 0; bytes(p + 5) = 0; bytes(p + 6) = 0; bytes(p + 7) = 1
    bytes(p + 8) = 0; bytes(p + 9) = 0; bytes(p + 10) = 0; bytes(p + 11) = 3
    val m = Mp3Meta.parse(bytes)
    assert(!m.vbr && m.nFrames == 3)
  }

  test("1-3 trailing garbage bytes fail loudly (no silent desync)") {
    val good = Mp3Meta.encode(3, 9, 0)
    for (extra <- 1 to 3) {
      val e = intercept[IllegalArgumentException] {
        Mp3Meta.parse(good ++ Array.fill[Byte](extra)(0x55))
      }
      assert(e.getMessage.contains("trailing"), s"extra=$extra")
    }
  }

  test("ID3v2.4 footer flag adds 10 bytes to the skipped prefix") {
    val core = Mp3Meta.encode(2, 9, 0)
    // v2.4, footer flag 0x10, syncsafe size 20, then 20 tag bytes + 10 footer
    val tag = Array[Byte]('I', 'D', '3', 4, 0, 0x10, 0, 0, 0, 20) ++
      new Array[Byte](20) ++
      (Array[Byte]('3', 'D', 'I', 4, 0, 0x10, 0, 0, 0, 20))
    val m = Mp3Meta.parse(tag ++ core)
    assert(m != null && m.nFrames == 2)
  }

  test("corrupt streams fail loudly; non-MP3 returns null") {
    assert(Mp3Meta.parse("not audio at all".getBytes) == null)
    val good = Mp3Meta.encode(3, 9, 0)
    // truncated trailing frame
    assert(intercept[IllegalArgumentException] {
      Mp3Meta.parse(good.dropRight(10))
    }.getMessage.contains("truncated"))
    // mid-stream desync (corrupt the second frame's sync byte)
    val frameLen = good.length / 3
    val bad = good.clone(); bad(frameLen) = 0x00
    assert(intercept[IllegalArgumentException] {
      Mp3Meta.parse(bad)
    }.getMessage.contains("sync"))
    // illegal bitrate index 15 in frame 2
    val b15 = good.clone(); b15(frameLen + 2) = 0xf0.toByte
    assert(intercept[IllegalArgumentException] { Mp3Meta.parse(b15) }
      .getMessage.contains("bitrate"))
    // encoder rejects out-of-range spec
    intercept[IllegalArgumentException] { Mp3Meta.encode(0, 9, 0) }
    intercept[IllegalArgumentException] { Mp3Meta.encode(1, 15, 0) }
    intercept[IllegalArgumentException] { Mp3Meta.encode(1, 9, 3) }
  }

  test("MPEG-2 and Layer I headers parse with their own tables") {
    // hand-built MPEG-2 Layer III mono frame: sync=0x7ff ver=10 layer=01
    // noCRC → 0xff 0xf3; bitrate idx 5 (40 kbps), sr idx 0 (22050), mono
    val sr2 = 22050
    val len2 = 576 / 8 * 40 * 1000 / sr2 // 130 bytes
    val f2 = new Array[Byte](len2)
    f2(0) = 0xff.toByte; f2(1) = 0xf3.toByte
    f2(2) = ((5 << 4) | (0 << 2)).toByte; f2(3) = 0xc0.toByte
    val m2 = Mp3Meta.parse(f2)
    assert(m2.sampleRate == sr2 && m2.nFrames == 1 && m2.bitrateKbps == 40)
    assert(m2.durationMs == 576L * 1000 / sr2)
    // MPEG-1 Layer I stereo: sync ver=11 layer=11 noCRC → 0xff 0xff;
    // bitrate idx 3 (96 kbps), sr idx 0 (44100), stereo (mode 00)
    val len1 = (12 * 96 * 1000 / 44100) * 4 // 104 bytes
    val f1 = new Array[Byte](len1)
    f1(0) = 0xff.toByte; f1(1) = 0xff.toByte
    f1(2) = ((3 << 4) | (0 << 2)).toByte; f1(3) = 0x00
    val m1 = Mp3Meta.parse(f1)
    assert(m1.sampleRate == 44100 && m1.channels == 2 && m1.bitrateKbps == 96)
    assert(m1.durationMs == 384L * 1000 / 44100)
  }

  test("extractMp3Meta: distributed walk, unknown-format passthrough") {
    import spark.implicits._
    val rows = Seq(
      (1L, Mp3Meta.encode(4, 9, 1)),
      (2L, "junk payload".getBytes),
      (3L, null.asInstanceOf[Array[Byte]]),
      (4L, Mp3Meta.encode(2, 3, 2)))
    val out = graft.operators.Multimodal.extractMp3Meta(
        rows.toDF("media_id", "data").repartition(3))
      .collect().map(f => f.mediaId -> f).toMap
    assert(out(1L).format == "mp3" && out(1L).nFrames == 4 &&
      out(1L).sampleRate == 48000 && out(1L).bitrateKbps == 128)
    assert(out(2L).format == "unknown" && out(2L).byteLen == 12)
    assert(out(3L).format == "unknown" && out(3L).byteLen == 0)
    assert(out(4L).format == "mp3" && out(4L).sampleRate == 32000 &&
      out(4L).bitrateKbps == 48)
  }
}
