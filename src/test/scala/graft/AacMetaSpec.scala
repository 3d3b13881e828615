package graft

import graft.operators.{AacMeta, Mp3Meta, Mp4Meta}

class AacMetaSpec extends SparkSpec {

  private val Rates = Array(
    96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350)
  private val Chans = Array(0, 1, 2, 3, 4, 5, 6, 8)

  test("encode → parse round-trips every (srIdx, chanCfg) combination") {
    for (si <- 0 to 12; cc <- 1 to 7; n <- Seq(1, 4, 9)) {
      val bytes = AacMeta.encode(n, si, cc, payloadBytes = 100)
      assert(bytes.length == n * 107)
      val m = AacMeta.parse(bytes)
      assert(m != null, s"si=$si cc=$cc")
      assert(m.nFrames == n && m.sampleRate == Rates(si) &&
        m.channels == Chans(cc) && m.profile == 1 && !m.vbr)
      assert(m.durationMs == n.toLong * 1024 * 1000 / Rates(si))
      assert(m.bitrateKbps ==
        (n.toLong * 107 * 8 * Rates(si) / (n.toLong * 1024 * 1000)).toInt)
    }
  }

  test("mixed frame lengths report vbr") {
    val b = AacMeta.encode(2, 4, 2, 100) ++ AacMeta.encode(3, 4, 2, 200)
    val m = AacMeta.parse(b)
    assert(m.nFrames == 5 && m.vbr)
  }

  test("probe disjointness: MP3, M4A, FLAC and WAV payloads are not ADTS") {
    assert(!AacMeta.isAdts(Mp3Meta.encode(3, 9, 0)))
    assert(!AacMeta.isAdts(Mp4Meta.encodeM4a(1000, 44100, 2)))
    assert(AacMeta.parse(Mp3Meta.encode(3, 9, 0)) == null)
    // and the reverse: ADTS is not MP3 (layer bits 0 vs nonzero)
    assert(!Mp3Meta.isMp3(AacMeta.encode(3, 4, 2, 50)))
  }

  test("corrupt streams fail loudly; non-ADTS returns null") {
    assert(AacMeta.parse("not audio at all".getBytes) == null)
    val good = AacMeta.encode(3, 4, 2, 50)
    assert(intercept[IllegalArgumentException] {
      AacMeta.parse(good.dropRight(10))
    }.getMessage.contains("truncated"))
    // trailing garbage
    for (extra <- 1 to 3)
      assert(intercept[IllegalArgumentException] {
        AacMeta.parse(good ++ Array.fill[Byte](extra)(0x11))
      }.getMessage.contains("trailing"), s"extra=$extra")
    // mid-stream desync
    val bad = good.clone(); bad(57) = 0x00 // frame 2 sync byte
    assert(intercept[IllegalArgumentException] {
      AacMeta.parse(bad)
    }.getMessage.contains("sync"))
    // sample-rate change mid-stream
    val mix = AacMeta.encode(1, 4, 2, 50) ++ AacMeta.encode(1, 5, 2, 50)
    assert(intercept[IllegalArgumentException] {
      AacMeta.parse(mix)
    }.getMessage.contains("sample-rate"))
    // reserved sampling_frequency_index 13 in frame 1: the stream IS
    // ADTS-shaped (sync + layer 0), so it must fail LOUDLY, not be
    // silently mislabeled "unknown"
    val r13 = good.clone(); r13(2) = ((1 << 6) | (13 << 2)).toByte
    assert(AacMeta.isAdts(r13))
    assert(intercept[IllegalArgumentException] { AacMeta.parse(r13) }
      .getMessage.contains("reserved"))
    // in-band-PCE channel config 0: same — loud, not silent
    val pce = good.clone(); pce(2) = (1 << 6 | 4 << 2).toByte; pce(3) = (good(3) & 0x3f).toByte
    assert(AacMeta.isAdts(pce))
    assert(intercept[IllegalArgumentException] { AacMeta.parse(pce) }
      .getMessage.contains("PCE"))
  }

  test("ID3v2-tagged AAC parses as AAC — the tag never steals it for MP3") {
    val core = AacMeta.encode(4, 4, 2, 64)
    val id3 = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0x01, 0x02) ++
      new Array[Byte]((1 << 7) + 2)
    val tagged = id3 ++ core
    // MP3 no longer claims a bare ID3 prefix; AAC skips the tag
    assert(!Mp3Meta.isMp3(tagged) && AacMeta.isAdts(tagged))
    val m = AacMeta.parse(tagged)
    assert(m != null && m.nFrames == 4 && m.sampleRate == 44100)
    // and conversely an ID3-tagged MP3 still routes to MP3, not AAC
    val mp3tagged = id3 ++ Mp3Meta.encode(3, 9, 0)
    assert(Mp3Meta.isMp3(mp3tagged) && !AacMeta.isAdts(mp3tagged))
    assert(Mp3Meta.parse(mp3tagged).nFrames == 3)
    // bitrate must count AUDIO bytes only, not the tag: the tagged and
    // untagged forms of one stream report the same bitrate
    assert(m.bitrateKbps == AacMeta.parse(core).bitrateKbps)
    // the common tagger output writes BOTH a v2 prefix and a v1 trailer
    val id3v1 = Array[Byte]('T', 'A', 'G') ++ new Array[Byte](125)
    val doubleTagged = id3 ++ core ++ id3v1
    val dm = AacMeta.parse(doubleTagged)
    assert(dm != null && dm.nFrames == 4 &&
      dm.bitrateKbps == AacMeta.parse(core).bitrateKbps)
  }

  test("M4A: audio-track fields parse; video MP4s are NOT M4A-shaped") {
    val m = Mp4Meta.parseAudio(Mp4Meta.encodeM4a(2500, 44100, 2))
    assert(m != null)
    assert(m.durationMs == 2500 && m.sampleRate == 44100 &&
      m.channels == 2 && m.nTracks == 1 && m.codec == "mp4a")
    // closed-form skeleton size
    assert(Mp4Meta.encodeM4a(2500, 44100, 2).length == 381)
    // a video-only MP4 has no 'soun' track → null, not a zeroed struct
    assert(Mp4Meta.parseAudio(Mp4Meta.encode(2500, 640, 480)) == null)
    // and the M4A skeleton still walks as a BMFF container for the
    // video-shaped reader (duration right, dims zero)
    val v = Mp4Meta.parse(Mp4Meta.encodeM4a(2500, 44100, 2))
    assert(v.durationMs == 2500 && v.width == 0 && v.height == 0 &&
      v.nTracks == 1)
  }

  test("M4A parses regardless of hdlr/minf order inside mdia") {
    val orig = Mp4Meta.encodeM4a(2500, 44100, 2)
    // encodeM4a layout: mdia payload at 248 = mdhd(32) + hdlr(33) + minf(68).
    // Rebuild as mdhd + minf + hdlr — ISO 14496-12 allows either order.
    val reordered = orig.slice(0, 280) ++ orig.slice(313, 381) ++ orig.slice(280, 313)
    assert(reordered.length == orig.length)
    val m = Mp4Meta.parseAudio(reordered)
    assert(m != null && m.durationMs == 2500 && m.sampleRate == 44100 &&
      m.channels == 2 && m.codec == "mp4a")
  }

  test("WavCodec.meta: header-only fields agree with the full decode") {
    import graft.operators.WavCodec
    for (ch <- 1 to 2; enc <- Seq[WavCodec.Audio => Array[Byte]](
        WavCodec.encode, WavCodec.encodePcm8, WavCodec.encodeMuLaw,
        WavCodec.encodeALaw)) {
      val bytes = enc(WavCodec.signal(7L, 120, ch, 8000))
      val full = WavCodec.decode(bytes)
      val m = WavCodec.meta(bytes)
      assert(m.sampleRate == full.sampleRate && m.channels == full.channels &&
        m.frames == full.frames.toLong && m.durationMs == full.durationMs)
    }
    // truncated data chunk fails loudly in the header walk too
    val good = WavCodec.encode(WavCodec.signal(1L, 50, 2, 8000))
    assert(intercept[IllegalArgumentException] {
      WavCodec.meta(good.dropRight(3))
    }.getMessage.contains("truncated"))
  }

  test("distributed AAC + M4A extraction over a mixed-format corpus") {
    import spark.implicits._
    val media = Seq(
      (1L, AacMeta.encode(4, 4, 2, 64)),
      (2L, Mp3Meta.encode(3, 9, 0)),       // not ADTS → unknown
      (3L, Mp4Meta.encodeM4a(1200, 48000, 1)),
      (4L, Mp4Meta.encode(900, 320, 240))  // video MP4 → unknown for M4A
    ).toDF("media_id", "data")
    val aac = graft.operators.Multimodal.extractAacMeta(media)
      .collect().map(f => f.mediaId -> f.format).toMap
    assert(aac == Map(1L -> "aac", 2L -> "unknown", 3L -> "unknown", 4L -> "unknown"))
    val m4a = graft.operators.Multimodal.extractM4aMeta(media)
      .collect().map(f => f.mediaId -> f.format).toMap
    assert(m4a == Map(1L -> "unknown", 2L -> "unknown", 3L -> "m4a", 4L -> "unknown"))
    val a1 = graft.operators.Multimodal.extractAacMeta(media)
      .filter(_.mediaId == 1L).head()
    assert(a1.nFrames == 4 && a1.sampleRate == 44100 && a1.channels == 2)
  }

  test("extractAudioMeta: one call dispatches all seven audio shapes") {
    import spark.implicits._
    import graft.operators.{FlacMeta, OggMeta, WavCodec, Multimodal}
    val media = Seq(
      (1L, WavCodec.encode(WavCodec.signal(1L, 80, 2, 8000))),
      (2L, Mp3Meta.encode(4, 9, 0)),
      (3L, AacMeta.encode(4, 4, 2, 64)),
      (4L, FlacMeta.encode(44100, 44100, 2)),
      (5L, OggMeta.encode(96000, 2, 312, 48000L, 40)),
      (6L, OggMeta.encodeVorbis(88200, 1, 44100L, 40)),
      (7L, Mp4Meta.encodeM4a(1200, 48000, 1)),
      (8L, Mp4Meta.encode(900, 320, 240)),      // video MP4 → unknown
      (9L, "plain text".getBytes)               // alien → unknown
    ).toDF("media_id", "data")
    val out = Multimodal.extractAudioMeta(media)
      .collect().map(f => f.mediaId -> f).toMap
    assert(out.map { case (k, v) => k -> v.format } == Map(
      1L -> "wav", 2L -> "mp3", 3L -> "aac", 4L -> "flac", 5L -> "opus",
      6L -> "vorbis", 7L -> "m4a", 8L -> "unknown", 9L -> "unknown"))
    assert(out(1L).durationMs == 10 && out(1L).sampleRate == 8000L &&
      out(1L).channels == 2)
    assert(out(4L).durationMs == 1000 && out(5L).durationMs == 2000 &&
      out(6L).durationMs == 2000 && out(7L).durationMs == 1200)
    assert(out(8L).durationMs == 0 && out(8L).sampleRate == 0L)
  }
}
