package graft

import graft.operators.OggMeta

class OggMetaSpec extends SparkSpec {

  test("encode → parse round-trips samples, channels, pre-skip math") {
    for (samples <- Seq(0L, 480L, 48000L, 2880000L); ch <- 1 to 2;
         db <- Seq(1, 40, 255)) {
      val m = OggMeta.parse(OggMeta.encode(samples, ch, 312, 48000L, db))
      assert(m != null)
      assert(m.channels == ch && m.preSkip == 312 && m.inputSampleRate == 48000L)
      assert(m.nPages == 2 && m.lastGranule == 312L + samples)
      assert(m.durationMs == samples * 1000 / 48000)
    }
  }

  test("size is the closed form 75 + dataBytes") {
    assert(OggMeta.encode(1000, 2, 312, 48000L, 40).length == 115)
  }

  test("a granule of -1 (no completed packet) does not become the duration") {
    val base = OggMeta.encode(48000L, 1, 0, 48000L, 10)
    // splice a granule=-1 page between head and data pages
    val mid = new java.io.ByteArrayOutputStream()
    mid.write("OggS".getBytes); mid.write(0); mid.write(0)
    for (_ <- 0 until 8) mid.write(0xff) // granule -1
    for (_ <- 0 until 12) mid.write(0)   // serial + seq + crc
    mid.write(1); mid.write(3)           // one 3-byte segment
    mid.write(1); mid.write(2); mid.write(3)
    val headLen = 28 + 19
    val spliced = base.take(headLen) ++ mid.toByteArray ++ base.drop(headLen)
    val m = OggMeta.parse(spliced)
    assert(m.nPages == 3 && m.durationMs == 1000L,
      s"granule -1 must be skipped, got $m")
  }

  test("corrupt payloads fail loudly; non-Ogg returns null") {
    assert(OggMeta.parse("not an ogg stream".getBytes) == null)
    val good = OggMeta.encode(1000, 1, 0, 48000L, 10)
    assert(intercept[IllegalArgumentException] {
      OggMeta.parse(good.dropRight(3))
    }.getMessage.contains("overruns"))
    val desync = good.clone(); desync(47 + 1) = 'x'.toByte // corrupt page-2 capture
    assert(intercept[IllegalArgumentException] {
      OggMeta.parse(desync)
    }.getMessage.toLowerCase.contains("oggs"))
    // a Vorbis-style first packet is rejected, not misread
    val vorb = good.clone()
    "vorbis  ".zipWithIndex.foreach { case (c, i) => vorb(28 + i) = c.toByte }
    assert(intercept[IllegalArgumentException] {
      OggMeta.parse(vorb)
    }.getMessage.contains("OpusHead"))
    intercept[IllegalArgumentException] { OggMeta.encode(-1, 1, 0, 48000L) }
    intercept[IllegalArgumentException] { OggMeta.encode(1, 0, 0, 48000L) }
    intercept[IllegalArgumentException] { OggMeta.encode(1, 1, 0, 48000L, 256) }
  }

  test("extractOpusMeta: distributed walk, unknown passthrough") {
    import spark.implicits._
    val rows = Seq(
      (1L, OggMeta.encode(96000L, 2, 312, 48000L, 33)),
      (2L, graft.operators.Mp3Meta.encode(2, 9, 0)),
      (3L, null.asInstanceOf[Array[Byte]]))
    val out = graft.operators.Multimodal.extractOpusMeta(
        rows.toDF("media_id", "data").repartition(2))
      .collect().map(f => f.mediaId -> f).toMap
    assert(out(1L).format == "opus" && out(1L).durationMs == 2000 &&
      out(1L).channels == 2 && out(1L).byteLen == 75 + 33)
    assert(out(2L).format == "unknown")
    assert(out(3L).format == "unknown" && out(3L).byteLen == 0)
  }

  test("Vorbis: encodeVorbis → parseAudio round-trips at the stream rate") {
    for (sr <- Seq(44100L, 48000L, 8000L); ch <- 1 to 2) {
      val m = OggMeta.parseAudio(OggMeta.encodeVorbis(sr * 3, ch, sr, 50))
      assert(m != null && m.codec == "vorbis")
      // granules at the STREAM rate → exactly 3000 ms regardless of sr
      assert(m.durationMs == 3000 && m.channels == ch &&
        m.sampleRate == sr && m.preSkip == 0 && m.nPages == 2)
    }
    assert(OggMeta.encodeVorbis(1000, 2, 44100, 40).length == 86 + 40)
  }

  test("parseAudio dispatches Opus too; parse() still rejects Vorbis loudly") {
    val opus = OggMeta.encode(48000, 2, 312, 48000L, 40)
    val a = OggMeta.parseAudio(opus)
    assert(a.codec == "opus" && a.durationMs == 1000 && a.preSkip == 312)
    val vorb = OggMeta.encodeVorbis(44100, 2, 44100L, 40)
    assert(intercept[IllegalArgumentException] {
      OggMeta.parse(vorb)
    }.getMessage.contains("vorbis"))
    // an Ogg stream of a third codec fails loudly in BOTH entry points
    val theora = vorb.clone()
    theora(28 + 0) = 0x80.toByte // corrupt the packet-type byte
    assert(intercept[IllegalArgumentException] {
      OggMeta.parseAudio(theora)
    }.getMessage.contains("neither"))
  }

  test("corrupt Vorbis id headers fail loudly") {
    val good = OggMeta.encodeVorbis(44100, 2, 44100L, 40)
    // nonzero version
    val v = good.clone(); v(28 + 7) = 1
    assert(intercept[IllegalArgumentException] { OggMeta.parseAudio(v) }
      .getMessage.contains("version"))
    // zero sample rate
    val z = good.clone()
    z(28 + 12) = 0; z(28 + 13) = 0; z(28 + 14) = 0; z(28 + 15) = 0
    assert(intercept[IllegalArgumentException] { OggMeta.parseAudio(z) }
      .getMessage.contains("rate"))
    // framing bit unset
    val f = good.clone(); f(28 + 29) = 0
    assert(intercept[IllegalArgumentException] { OggMeta.parseAudio(f) }
      .getMessage.contains("framing"))
  }

  test("extractOggAudioMeta: mixed Opus/Vorbis/alien corpus dispatches cleanly") {
    import spark.implicits._
    val media = Seq(
      (1L, OggMeta.encode(96000, 2, 312, 48000L, 33)),
      (2L, OggMeta.encodeVorbis(88200, 1, 44100L, 25)),
      (3L, graft.operators.Mp3Meta.encode(3, 9, 0))
    ).toDF("media_id", "data")
    val out = graft.operators.Multimodal.extractOggAudioMeta(media)
      .collect().map(f => f.mediaId -> f).toMap
    assert(out(1L).format == "opus" && out(1L).durationMs == 2000 &&
      out(1L).sampleRate == 48000L && out(1L).byteLen == 75 + 33)
    assert(out(2L).format == "vorbis" && out(2L).durationMs == 2000 &&
      out(2L).channels == 1 && out(2L).byteLen == 86 + 25)
    assert(out(3L).format == "unknown" && out(3L).durationMs == 0)
  }
}
