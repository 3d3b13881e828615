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
    val ulaw = bytes.clone(); ulaw(20) = 7 // format tag 7 = mu-law
    assert(intercept[IllegalArgumentException] { WavCodec.decode(ulaw) }
      .getMessage.contains("PCM"))
    val eightBit = bytes.clone(); eightBit(34) = 8
    assert(intercept[IllegalArgumentException] { WavCodec.decode(eightBit) }
      .getMessage.contains("16-bit"))
    intercept[IllegalArgumentException] { WavCodec.decode(bytes.take(30)) }
    intercept[IllegalArgumentException] { WavCodec.decode("RIFFjunk".getBytes) }
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
}
