package graft

import graft.operators.{FlacCodec, FlacMeta, WavCodec}

class FlacCodecSpec extends SparkSpec {

  private def tone(frames: Int, ch: Int, rate: Int = 8000, seed: Long = 7L): WavCodec.Audio =
    WavCodec.signal(seed, frames, ch, rate)

  private def noisy(frames: Int, ch: Int): WavCodec.Audio = {
    // LCG noise — worst case for prediction, exercises high rice params
    var st = 99L
    val s = new Array[Short](frames * ch)
    var i = 0
    while (i < s.length) {
      st = st * 6364136223846793005L + 1442695040888963407L
      s(i) = ((st >>> 33) & 0xffff).toShort
      i += 1
    }
    WavCodec.Audio(ch, 16000, s)
  }

  test("round-trip: fixed mode, mono and stereo, partial last block") {
    for ((frames, ch) <- Seq((4096, 1), (5000, 2), (100, 1), (16, 1))) {
      val a = tone(frames, ch)
      val flac = FlacCodec.encode(a, blockSize = 1024)
      val d = FlacCodec.decodeFull(flac)
      assert(d.md5Matched, s"md5 must be present and verified ($frames x $ch)")
      assert(d.audio.channels == ch && d.audio.sampleRate == a.sampleRate)
      assert(d.audio.samples.toSeq == a.samples.toSeq, s"samples differ ($frames x $ch)")
    }
  }

  test("round-trip: verbatim and lpc modes, mid/side stereo") {
    val a = tone(3000, 2)
    for (mode <- Seq("verbatim", "lpc", "fixed");
         st <- Seq("independent", "ms")) {
      val flac = FlacCodec.encode(a, blockSize = 512, mode = mode, stereo = st)
      val d = FlacCodec.decodeFull(flac)
      assert(d.md5Matched)
      assert(d.audio.samples.toSeq == a.samples.toSeq, s"mode=$mode stereo=$st")
    }
  }

  test("round-trip: incompressible noise (rice escape / high params) and constant signal") {
    val n = noisy(2048, 2)
    val d = FlacCodec.decodeFull(FlacCodec.encode(n, blockSize = 256))
    assert(d.md5Matched && d.audio.samples.toSeq == n.samples.toSeq)
    val c = WavCodec.Audio(1, 8000, Array.fill(1000)(123.toShort))
    val dc = FlacCodec.decodeFull(FlacCodec.encode(c, blockSize = 192))
    assert(dc.md5Matched && dc.audio.samples.toSeq == c.samples.toSeq)
    // constant signal must actually take the CONSTANT subframe path:
    // 1000 samples in 6 frames within ~100 bytes of headers
    assert(FlacCodec.encode(c, blockSize = 192).length < 200)
  }

  test("compression is real: tonal signal well under 2 bytes/sample") {
    val a = tone(8192, 1)
    val flac = FlacCodec.encode(a)
    assert(flac.length < a.samples.length * 2 * 3 / 4,
      s"${flac.length} bytes for ${a.samples.length * 2} bytes of PCM")
  }

  test("FlacMeta parses FlacCodec output (duration/rate/channels/totals)") {
    val a = tone(44100, 2, rate = 44100)
    val m = FlacMeta.parse(FlacCodec.encode(a))
    assert(m.sampleRate == 44100 && m.channels == 2 &&
      m.bitsPerSample == 16 && m.totalSamples == 44100 && m.durationMs == 1000)
  }

  test("corruption fails loudly: flipped bits in header, payload, md5") {
    val a = tone(2000, 1)
    val good = FlacCodec.encode(a, blockSize = 512)
    // frame data byte -> CRC-16 (or rice structure) failure
    val p1 = good.clone(); p1(good.length - 10) = (p1(good.length - 10) ^ 0x40).toByte
    val e1 = intercept[Exception](FlacCodec.decodeFull(p1))
    assert(e1.isInstanceOf[IllegalArgumentException], s"got $e1")
    // md5 byte in STREAMINFO -> md5 mismatch named loudly
    val p2 = good.clone(); p2(8 + 18) = (p2(8 + 18) ^ 0x01).toByte
    val e2 = intercept[IllegalArgumentException](FlacCodec.decodeFull(p2))
    assert(e2.getMessage.contains("MD5"))
    // sync byte -> sync failure
    val firstFrame = 42 // magic(4) + header(4) + streaminfo(34)
    val p3 = good.clone(); p3(firstFrame) = 0x00
    intercept[IllegalArgumentException](FlacCodec.decodeFull(p3))
  }

  test("mutation sweep: decoder fails loudly (IAE), never an index/negative-size error") {
    val a = tone(600, 2)
    val good = FlacCodec.encode(a, blockSize = 256, stereo = "ms")
    var st = 4242L
    var loud = 0
    for (_ <- 0 until 2000) {
      st = st * 6364136223846793005L + 1442695040888963407L
      val pos = (((st >>> 33) % good.length).toInt + good.length) % good.length
      val bit = ((st >>> 13) % 8).toInt
      val m = good.clone()
      m(pos) = (m(pos) ^ (1 << bit)).toByte
      try { FlacCodec.decodeFull(m); () }
      catch {
        case _: IllegalArgumentException => loud += 1
        case e: Throwable => fail(s"mutation at $pos bit $bit leaked ${e.getClass}: ${e.getMessage}")
      }
    }
    assert(loud > 0, "sweep never hit a detectable corruption — fixture too small?")
  }

  test("subset fences: non-16-bit streams rejected by name") {
    // hand-build a STREAMINFO claiming 24-bit
    val skel = FlacMeta.encode(1000, 8000, 1, bitsPerSample = 24)
    val e = intercept[IllegalArgumentException](FlacCodec.decode(skel))
    assert(e.getMessage.contains("16-bit"))
  }

  test("empty audio encodes and decodes to zero samples") {
    val a = WavCodec.Audio(1, 8000, Array.empty[Short])
    val d = FlacCodec.decodeFull(FlacCodec.encode(a))
    assert(d.audio.samples.isEmpty)
  }
}
