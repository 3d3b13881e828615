package graft

import graft.operators.{FlacMeta, Mp3Meta}

class FlacMetaSpec extends SparkSpec {

  test("encode → parse round-trips across rates, channels, depths") {
    for (sr <- Seq(8000, 22050, 44100, 96000); ch <- 1 to 2;
         bps <- Seq(8, 16, 24); n <- Seq(0L, 1000L, 48000L, (1L << 35))) {
      val m = FlacMeta.parse(FlacMeta.encode(n, sr, ch, bps))
      assert(m != null)
      assert(m.totalSamples == n && m.sampleRate == sr &&
        m.channels == ch && m.bitsPerSample == bps)
      assert(m.durationMs == n * 1000 / sr)
    }
  }

  test("skeleton size is the 42-byte closed form") {
    assert(FlacMeta.encode(1234, 44100, 2).length == 42)
  }

  test("extra metadata blocks are skipped; STREAMINFO must come first") {
    val base = FlacMeta.encode(5000, 32000, 1)
    // un-set the last-block flag, append a PADDING block (type 1) as last
    val withPad = base.clone()
    withPad(4) = 0x00 // STREAMINFO no longer last
    val pad = Array[Byte](0x81.toByte, 0, 0, 3, 0, 0, 0)
    val m = FlacMeta.parse(withPad ++ pad)
    assert(m.totalSamples == 5000 && m.sampleRate == 32000)
    // a stream whose first block is NOT STREAMINFO fails loudly
    val wrongFirst = withPad.clone()
    wrongFirst(4) = 0x01 // type 1 (padding) first
    assert(intercept[IllegalArgumentException] {
      FlacMeta.parse(wrongFirst ++ pad)
    }.getMessage.contains("STREAMINFO"))
  }

  test("corrupt payloads fail loudly; non-FLAC returns null; probes are disjoint") {
    assert(FlacMeta.parse("not flac".getBytes) == null)
    val good = FlacMeta.encode(5000, 32000, 1)
    assert(intercept[IllegalArgumentException] {
      FlacMeta.parse(good.take(20)) // truncated STREAMINFO
    }.getMessage.contains("overruns"))
    intercept[IllegalArgumentException] { FlacMeta.encode(-1, 32000, 1) }
    intercept[IllegalArgumentException] { FlacMeta.encode(1, 0, 1) }
    intercept[IllegalArgumentException] { FlacMeta.encode(1, 32000, 9) }
    // format probes never cross: an MP3 is not FLAC and vice versa
    val mp3 = Mp3Meta.encode(2, 9, 0)
    assert(!FlacMeta.isFlac(mp3) && FlacMeta.parse(mp3) == null)
    assert(!Mp3Meta.isMp3(good) && Mp3Meta.parse(good) == null)
  }

  test("extractFlacMeta: distributed mixed-format corpus, unknown passthrough") {
    import spark.implicits._
    val rows = Seq(
      (1L, FlacMeta.encode(44100, 44100, 2)),
      (2L, Mp3Meta.encode(3, 9, 0)),
      (3L, null.asInstanceOf[Array[Byte]]))
    val out = graft.operators.Multimodal.extractFlacMeta(
        rows.toDF("media_id", "data").repartition(2))
      .collect().map(f => f.mediaId -> f).toMap
    assert(out(1L).format == "flac" && out(1L).durationMs == 1000 &&
      out(1L).channels == 2 && out(1L).byteLen == 42)
    assert(out(2L).format == "unknown" && out(2L).byteLen > 0)
    assert(out(3L).format == "unknown" && out(3L).byteLen == 0)
  }
}
