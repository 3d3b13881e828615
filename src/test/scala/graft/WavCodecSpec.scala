package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, WavCodec}

class WavCodecSpec extends SparkSpec {
  import spark.implicits._

  test("encode → decode round-trips samples exactly; size is the closed form") {
    val a = WavCodec.signal(9L, frames = 123, channels = 2, sampleRate = 8000)
    val bytes = WavCodec.encode(a)
    assert(bytes.length == 44 + 2 * 123 * 2)
    val back = WavCodec.decode(bytes)
    assert(back.channels == 2 && back.sampleRate == 8000 && back.frames == 123)
    assert(back.samples.sameElements(a.samples))
    assert(back.durationMs == 123L * 1000 / 8000)
  }

  test("decimate keeps every k-th frame bit-exactly, all channels; rate divides") {
    val a = WavCodec.signal(4L, frames = 11, channels = 2, sampleRate = 8000)
    val d = WavCodec.decimate(a, 4)
    assert(d.sampleRate == 2000 && d.frames == 3) // ceil(11/4)
    for (f <- 0 until 3; c <- 0 until 2)
      assert(d.samples(f * 2 + c) == a.samples(f * 4 * 2 + c), s"frame $f ch $c")
    intercept[IllegalArgumentException] { WavCodec.decimate(a, 3) } // 8000 % 3 != 0
  }

  test("chunk walk skips unknown chunks and honors RIFF word alignment") {
    val a = WavCodec.signal(1L, frames = 5, channels = 1, sampleRate = 4000)
    val base = WavCodec.encode(a)
    // splice an odd-length LIST chunk between fmt and data: parser must
    // skip it including the alignment pad byte
    val extra = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 'x', 'y', 'z', 0)
    val spliced = base.take(36) ++ extra ++ base.drop(36)
    // fix the RIFF size field
    val riffLen = spliced.length - 8
    spliced(4) = (riffLen & 0xff).toByte; spliced(5) = ((riffLen >> 8) & 0xff).toByte
    spliced(6) = ((riffLen >> 16) & 0xff).toByte; spliced(7) = ((riffLen >> 24) & 0xff).toByte
    val back = WavCodec.decode(spliced)
    assert(back.samples.sameElements(a.samples))
  }

  test("unsupported encodings fail loudly") {
    val bytes = WavCodec.encode(WavCodec.signal(1L, 4, 1, 4000))
    val float32 = bytes.clone(); float32(20) = 3 // format tag 3 = IEEE float
    assert(intercept[IllegalArgumentException] { WavCodec.decode(float32) }
      .getMessage.contains("PCM"))
    val wideUlaw = bytes.clone(); wideUlaw(20) = 7 // mu-law claims 16-bit
    assert(intercept[IllegalArgumentException] { WavCodec.decode(wideUlaw) }
      .getMessage.contains("G.711"))
    val wideAlaw = bytes.clone(); wideAlaw(20) = 6 // A-law claims 16-bit
    assert(intercept[IllegalArgumentException] { WavCodec.decode(wideAlaw) }
      .getMessage.contains("G.711"))
    val bits24 = bytes.clone(); bits24(34) = 24
    assert(intercept[IllegalArgumentException] { WavCodec.decode(bits24) }
      .getMessage.contains("8/16-bit"))
    intercept[IllegalArgumentException] { WavCodec.decode(bytes.take(30)) }
    intercept[IllegalArgumentException] { WavCodec.decode("RIFFjunk".getBytes) }
  }

  test("mu-law companding: byte round-trip over all 256 codes; known anchors") {
    // decode→encode is the identity on every byte except 0x7f: the
    // spec's negative zero decodes to 0 and re-encodes as positive
    // zero 0xff
    for (b <- 0 until 256 if b != 0x7f)
      assert(WavCodec.linearToUlaw(WavCodec.ulawToLinear(b)) == b, s"byte $b")
    assert(WavCodec.ulawToLinear(0x7f) == 0)
    assert(WavCodec.linearToUlaw(0) == 0xff)
    // G.711 extremes: code 0x00 is the largest negative step
    assert(WavCodec.ulawToLinear(0x00) == -32124)
    assert(WavCodec.ulawToLinear(0x80) == 32124)
    // clipping: anything past the ladder top lands on the extreme code
    assert(WavCodec.linearToUlaw(32767) == 0x80)
    assert(WavCodec.linearToUlaw(-32768) == 0x00)
  }

  test("A-law companding: byte round-trip over all 256 codes; known anchors") {
    // unlike mu-law there is NO negative-zero collapse: decode→encode
    // is the identity on every byte
    for (b <- 0 until 256)
      assert(WavCodec.linearToAlaw(WavCodec.alawToLinear(b)) == b, s"byte $b")
    // G.711 Table 1a anchors: smallest steps ±8, extremes ±32256
    assert(WavCodec.alawToLinear(0xd5) == 8)
    assert(WavCodec.alawToLinear(0x55) == -8)
    assert(WavCodec.alawToLinear(0xaa) == 32256)
    assert(WavCodec.alawToLinear(0x2a) == -32256)
    // clipping: past the ladder top lands on the extreme code
    assert(WavCodec.linearToAlaw(32767) == 0xaa)
    assert(WavCodec.linearToAlaw(-32768) == 0x2a)
    // quantization error bounded by the largest A-law step (1024)
    for (s <- -32768 to 32767 by 97) {
      val q = WavCodec.alawToLinear(WavCodec.linearToAlaw(s))
      assert(math.abs(q - s) <= 1024, s"sample $s → $q")
    }
  }

  test("encodeALaw → decode quantizes through the companding ladder; size closed form") {
    val a = WavCodec.signal(9L, frames = 45, channels = 2, sampleRate = 8000)
    val bytes = WavCodec.encodeALaw(a)
    assert(bytes.length == 44 + 45 * 2)
    assert((bytes(20) & 0xff) == 6) // format tag: A-law
    val back = WavCodec.decode(bytes)
    assert(back.channels == 2 && back.sampleRate == 8000 && back.frames == 45)
    for (i <- a.samples.indices)
      assert(back.samples(i) ==
        WavCodec.alawToLinear(WavCodec.linearToAlaw(a.samples(i).toInt)),
        s"sample $i")
  }

  test("a data chunk ending mid-frame fails loudly (never silent truncation)") {
    // stereo mu-law with an ODD data length: 16-bit-PCM's len%2 check
    // would never catch it; the frame-alignment require must
    val stereo = WavCodec.encodeMuLaw(WavCodec.signal(3L, 10, 2, 8000))
    val trunc = stereo.take(stereo.length - 1).clone()
    // patch RIFF + data lengths so only the FRAME alignment is at fault
    def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
      b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
    }
    putLe32(trunc, 4, trunc.length - 8)
    putLe32(trunc, 40, 19)
    assert(intercept[IllegalArgumentException] { WavCodec.decode(trunc) }
      .getMessage.contains("partial frame"))
  }

  test("encodePcm8 → decode floors samples to 256-multiples; size closed form") {
    val a = WavCodec.signal(5L, frames = 60, channels = 2, sampleRate = 8000)
    val bytes = WavCodec.encodePcm8(a)
    assert(bytes.length == 44 + 60 * 2)
    val back = WavCodec.decode(bytes)
    assert(back.channels == 2 && back.sampleRate == 8000 && back.frames == 60)
    for (i <- a.samples.indices)
      assert(back.samples(i) == (a.samples(i) >> 8) << 8, s"sample $i")
  }

  test("encodeMuLaw → decode quantizes through the companding ladder; size closed form") {
    val a = WavCodec.signal(6L, frames = 45, channels = 1, sampleRate = 8000)
    val bytes = WavCodec.encodeMuLaw(a)
    assert(bytes.length == 44 + 45)
    val back = WavCodec.decode(bytes)
    assert(back.channels == 1 && back.sampleRate == 8000 && back.frames == 45)
    for (i <- a.samples.indices)
      assert(back.samples(i) ==
        WavCodec.ulawToLinear(WavCodec.linearToUlaw(a.samples(i).toInt)),
        s"sample $i")
    // quantization error is bounded by the ladder's largest step
    for (i <- a.samples.indices)
      assert(math.abs(back.samples(i) - a.samples(i)) <= 1024, s"sample $i")
  }

  test("distributed pcm8/mulaw encode → features, stats replayed from the formulas") {
    val spec = Seq((1L, 40, 1, 8000), (2L, 33, 2, 16000)).toDF("id", "frames", "ch", "rate")
    def sig(id: Long, n: Int) =
      (0 until n).map(i => (((id * 7 + i.toLong * 13) % 65536) - 32768).toInt)
    val f8 = Multimodal.extractAudioFeatures(
      Multimodal.encodeWavFrame(spec, "id", "frames", "ch", "rate", codec = "pcm8"))
      .collect().map(f => f.mediaId -> f).toMap
    val fu = Multimodal.extractAudioFeatures(
      Multimodal.encodeWavFrame(spec, "id", "frames", "ch", "rate", codec = "mulaw"))
      .collect().map(f => f.mediaId -> f).toMap
    for ((id, frames, ch, rate) <- Seq((1L, 40, 1, 8000), (2L, 33, 2, 16000))) {
      val s = sig(id, frames * ch)
      val d8 = s.map(v => (v >> 8) << 8)
      val du = s.map(v => WavCodec.ulawToLinear(WavCodec.linearToUlaw(v)))
      assert(f8(id).byteLen == 44L + frames * ch && f8(id).sampleRate == rate)
      assert(f8(id).sumSamples == d8.map(_.toLong).sum, s"pcm8 id=$id")
      assert(f8(id).peakAbs == d8.map(math.abs).max, s"pcm8 id=$id")
      assert(fu(id).byteLen == 44L + frames * ch)
      assert(fu(id).sumSamples == du.map(_.toLong).sum, s"mulaw id=$id")
      assert(fu(id).peakAbs == du.map(math.abs).max, s"mulaw id=$id")
    }
    intercept[IllegalArgumentException] {
      Multimodal.encodeWavFrame(spec, "id", "frames", "ch", "rate", codec = "flac")
    }
  }

  test("corrupt chunk length near 2^31 fails cleanly — no Int overflow past the check") {
    val bytes = WavCodec.encode(WavCodec.signal(1L, 4, 1, 4000))
    val bad = bytes.clone()
    // fmt chunk length field (bytes 16..19, little-endian) → 0x7ffffff0:
    // off + 8 + len overflows Int to negative, which would sail past an
    // Int-arithmetic truncation check into a huge allocation
    bad(16) = 0xf0.toByte; bad(17) = 0xff.toByte
    bad(18) = 0xff.toByte; bad(19) = 0x7f.toByte
    assert(intercept[IllegalArgumentException] { WavCodec.decode(bad) }
      .getMessage.contains("truncated"))
  }

  test("distributed encode → features → decimate → features, stats replayed exactly") {
    val spec = Seq((1L, 40, 1, 8000), (2L, 33, 2, 16000), (3L, 7, 1, 4000))
      .toDF("id", "frames", "ch", "rate")
    val media = Multimodal.encodeWavFrame(spec, "id", "frames", "ch", "rate").repartition(3)
    val feats = Multimodal.extractAudioFeatures(media).collect()
      .map(f => f.mediaId -> f).toMap
    // driver-side replay of the signal formula
    def replay(id: Long, frames: Int, ch: Int) = {
      val s = (0 until frames * ch).map(i => (((id * 7 + i.toLong * 13) % 65536) - 32768).toInt)
      (s.map(math.abs).max, s.map(_.toLong).sum)
    }
    for ((id, frames, ch, rate) <- Seq((1L, 40, 1, 8000), (2L, 33, 2, 16000), (3L, 7, 1, 4000))) {
      val f = feats(id)
      val (peak, sum) = replay(id, frames, ch)
      assert(f.format == "wav" && f.channels == ch && f.sampleRate == rate)
      assert(f.nFrames == frames && f.byteLen == 44 + 2L * frames * ch)
      assert(f.peakAbs == peak && f.sumSamples == sum, s"id=$id")
    }
    val dec = Multimodal.extractAudioFeatures(
      Multimodal.decimateWavFrame(media, 2)).collect().map(f => f.mediaId -> f).toMap
    assert(dec(1L).nFrames == 20 && dec(1L).sampleRate == 4000)
    assert(dec(2L).nFrames == 17 && dec(2L).sampleRate == 8000) // ceil(33/2)
    assert(dec(3L).nFrames == 4 && dec(3L).sampleRate == 2000)
    // non-audio payloads pass through as unknown with zeroed stats
    val mixed = Seq((9L, "not audio".getBytes)).toDF("media_id", "data")
    val u = Multimodal.extractAudioFeatures(mixed).collect()(0)
    assert(u.format == "unknown" && u.nFrames == 0 && u.sumSamples == 0)
  }

  test("IMA ADPCM: header-seeded frames exact, smooth signals tracked, blocks independent") {
    // smooth ramp: slope 16/sample — the adaptive step locks on fast
    val frames = 114 // two 57-sample blocks
    val ramp = WavCodec.Audio(1, 8000,
      Array.tabulate[Short](frames)(i => ((i * 16) - 900).toShort))
    val dec = WavCodec.decode(WavCodec.encodeImaAdpcm(ramp, samplesPerBlock = 57))
    assert(dec.channels == 1 && dec.sampleRate == 8000 && dec.frames == frames)
    assert(dec.samples(0) == ramp.samples(0)) // block 0 header seed
    assert(dec.samples(57) == ramp.samples(57)) // block 1 header seed — independence
    val errs = (0 until frames).map(i => math.abs(dec.samples(i) - ramp.samples(i)))
    assert(errs.max <= 64, s"max err ${errs.max}")
    assert(errs.sum.toDouble / frames <= 16.0, s"mean err ${errs.sum.toDouble / frames}")
  }

  test("IMA ADPCM: decode matches an independent transcription of the reference algorithm") {
    val a = WavCodec.signal(21L, 57, 1, 8000)
    val bytes = WavCodec.encodeImaAdpcm(a, samplesPerBlock = 57)
    val got = WavCodec.decode(bytes).samples
    // independent decoder: read the block directly off the bytes
    val dataOff = 60 + 4 // header 60, block header 4
    var pred = ((bytes(60) & 0xff) | (bytes(61) << 8)).toShort.toInt
    var idx = bytes(62) & 0xff
    val want = scala.collection.mutable.ArrayBuffer[Int](pred)
    for (j <- 0 until 56) {
      val n = if ((j & 1) == 0) bytes(dataOff + j / 2) & 0xf
        else (bytes(dataOff + j / 2) >> 4) & 0xf
      val step = WavCodec.ImaStepTable(idx)
      var dq = step >> 3
      if ((n & 4) != 0) dq += step
      if ((n & 2) != 0) dq += step >> 1
      if ((n & 1) != 0) dq += step >> 2
      pred = math.max(-32768, math.min(32767, if ((n & 8) != 0) pred - dq else pred + dq))
      idx = math.max(0, math.min(88, idx + WavCodec.ImaIndexTable(n & 7)))
      want += pred
    }
    assert(got.map(_.toInt).toSeq == want.toSeq)
  }

  test("IMA ADPCM: stereo chunks interleave per channel, each decoding as its mono twin") {
    val frames = 57
    val l = Array.tabulate[Short](frames)(i => ((i * 23) - 500).toShort)
    val r = Array.tabulate[Short](frames)(i => (2000 - i * 31).toShort)
    val stereo = WavCodec.Audio(2, 8000,
      Array.tabulate[Short](frames * 2)(i => if (i % 2 == 0) l(i / 2) else r(i / 2)))
    val dec = WavCodec.decode(WavCodec.encodeImaAdpcm(stereo, samplesPerBlock = 57))
    val decL = WavCodec.decode(WavCodec.encodeImaAdpcm(
      WavCodec.Audio(1, 8000, l), samplesPerBlock = 57)).samples
    val decR = WavCodec.decode(WavCodec.encodeImaAdpcm(
      WavCodec.Audio(1, 8000, r), samplesPerBlock = 57)).samples
    assert((0 until frames).forall(i => dec.samples(2 * i) == decL(i)))
    assert((0 until frames).forall(i => dec.samples(2 * i + 1) == decR(i)))
  }

  test("IMA ADPCM: meta, fact chunk, and loud-failure contracts") {
    val a = WavCodec.signal(5L, 114, 1, 16000)
    val bytes = WavCodec.encodeImaAdpcm(a, samplesPerBlock = 57)
    val m = WavCodec.meta(bytes)
    assert(m.formatTag == 17 && m.frames == 114 && m.sampleRate == 16000)
    assert(bytes.length == 60 + 2 * 32)
    // corrupt step index > 88
    val badIdx = bytes.clone(); badIdx(62) = 89.toByte
    intercept[IllegalArgumentException](WavCodec.decode(badIdx))
    // partial block: truncate the data chunk length coherently
    intercept[IllegalArgumentException](
      WavCodec.encodeImaAdpcm(WavCodec.signal(5L, 100, 1, 8000), samplesPerBlock = 57))
    // 3+ channels refused
    intercept[IllegalArgumentException](
      WavCodec.encodeImaAdpcm(WavCodec.signal(5L, 57, 3, 8000), samplesPerBlock = 57))
  }
}
