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

  test("round-trip: incompressible noise (high method-0 rice params) and constant signal") {
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

  // ---- hand-crafted bitstreams for the two decode paths the encoder
  // never emits (escape partitions; the 5-bit Rice method). The frames
  // are built bit-by-bit here, with CRC-8/CRC-16 from the codec's own
  // (package-visible) implementations, and STREAMINFO carries the real
  // MD5 of the expected PCM so decodeFull's signature check stays hot.

  private final class BW {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def add(v: Int, bits: Int): Unit = {
      var k = bits - 1
      while (k >= 0) {
        acc = (acc << 1) | ((v >> k) & 1)
        n += 1
        if (n == 8) { out.write(acc & 0xff); acc = 0; n = 0 }
        k -= 1
      }
    }
    def addUnary(q: Int): Unit = { var k = 0; while (k < q) { add(0, 1); k += 1 }; add(1, 1) }
    def bytes: Array[Byte] = { if (n != 0) add(0, 8 - n); out.toByteArray }
  }

  /** One mono 16-bit FIXED-order-0 frame (samples == residuals);
    * `residual` writes the residual section for `samples`. */
  private def craftFrame(frameNo: Int, samples: Array[Short],
      residual: (BW, Array[Short]) => Unit): Array[Byte] = {
    require(frameNo < 128 && samples.length >= 16 && samples.length <= 256)
    val h = new BW
    h.add(0xff, 8); h.add(0xf8, 8)
    h.add(6, 4) // block-size code 6: 8-bit (size-1) follows the coded number
    h.add(0, 4) // sample rate: from STREAMINFO
    h.add(0, 4) // channel assignment: 1 channel
    h.add(4, 3) // sample-size code 4: 16-bit
    h.add(0, 1)
    h.add(frameNo, 8)           // coded frame number (single byte < 0x80)
    h.add(samples.length - 1, 8)
    val header = h.bytes
    val b = new BW
    b.add(0, 1); b.add(8, 6); b.add(0, 1) // subframe: FIXED order 0, no wasted bits
    residual(b, samples)
    val body = b.bytes
    val frame = new java.io.ByteArrayOutputStream()
    frame.write(header)
    frame.write(FlacCodec.crc8(header, 0, header.length))
    frame.write(body)
    val pre = frame.toByteArray
    val c16 = FlacCodec.crc16(pre, 0, pre.length)
    frame.write((c16 >> 8) & 0xff); frame.write(c16 & 0xff)
    frame.toByteArray
  }

  /** Wrap frames in fLaC magic + STREAMINFO with the PCM's real MD5. */
  private def craftStream(blockSize: Int, pcm: Array[Short],
      frames: Seq[Array[Byte]]): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    pcm.foreach { v => md.update((v & 0xff).toByte); md.update(((v >> 8) & 0xff).toByte) }
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    def w16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    w16(blockSize); w16(blockSize)
    out.write(0); out.write(0); out.write(0) // min frame size: unknown
    out.write(0); out.write(0); out.write(0) // max frame size: unknown
    val sr = 8000
    out.write((sr >> 12) & 0xff); out.write((sr >> 4) & 0xff)
    out.write(((sr & 0xf) << 4) | (0 << 1) | ((16 - 1) >> 4)) // 1 channel
    out.write((((16 - 1) & 0xf) << 4) | 0)
    out.write(0); out.write(0)
    out.write((pcm.length >> 8) & 0xff); out.write(pcm.length & 0xff)
    out.write(md.digest())
    frames.foreach(out.write)
    out.toByteArray
  }

  test("hand-crafted stream: escape partitions (raw residuals), incl. raw=0") {
    // 32 samples, partition order 1: partition 0 escapes to 9-bit raw
    // two's-complement residuals, partition 1 escapes to raw=0 (all zero)
    val s = (Array.tabulate(16)(i => (i * 31 - 250).toShort) ++
      Array.fill(16)(0.toShort))
    val frame = craftFrame(0, s, (bw, smp) => {
      bw.add(0, 2)  // residual method 0 (4-bit params)
      bw.add(1, 4)  // partition order 1 -> two partitions of 16
      bw.add(15, 4) // partition 0: escape code
      bw.add(9, 5)  // 9 raw bits per residual
      (0 until 16).foreach(i => bw.add(smp(i) & 0x1ff, 9))
      bw.add(15, 4) // partition 1: escape code
      bw.add(0, 5)  // raw=0 -> residuals are all zero, no bits read
    })
    val d = FlacCodec.decodeFull(craftStream(32, s, Seq(frame)))
    assert(d.md5Matched, "STREAMINFO md5 must verify on the crafted stream")
    assert(d.audio.samples.toSeq == s.toSeq)
  }

  test("hand-crafted stream: 5-bit rice method (method 1), params 13 and 16") {
    // method 1's escape is 31, so params 15..30 are expressible only
    // here; param 13 with +/-30000 samples also drives unary quotients
    // up to 7 under method 1
    def rice1(param: Int)(bw: BW, smp: Array[Short]): Unit = {
      bw.add(1, 2)      // residual method 1 (5-bit params)
      bw.add(0, 4)      // partition order 0
      bw.add(param, 5)
      smp.foreach { v =>
        val u = (v.toLong << 1) ^ (v.toLong >> 63) // zigzag
        bw.addUnary((u >>> param).toInt)
        bw.add((u & ((1L << param) - 1)).toInt, param)
      }
    }
    val s1 = Array.tabulate(16)(i => (i * 4000 - 30000).toShort)
    val s2 = Array.tabulate(16)(i => (i * 137 - 1000).toShort)
    val stream = craftStream(16, s1 ++ s2,
      Seq(craftFrame(0, s1, rice1(13)), craftFrame(1, s2, rice1(16))))
    val d = FlacCodec.decodeFull(stream)
    assert(d.md5Matched, "STREAMINFO md5 must verify on the crafted stream")
    assert(d.audio.samples.toSeq == (s1 ++ s2).toSeq)
  }
}
