package graft.operators

/** Ogg/Opus container METADATA parsing — RFC 3533 (Ogg framing) and
  * RFC 7845 (Opus-in-Ogg mapping), both public. Completes the audio
  * metadata tier: WAV carries PCM features, MP3/FLAC/Opus carry
  * metadata-level filtering and dedup keys; PCM decode of compressed
  * codecs stays fenced per the corpus policy at
  * `Multimodal.extractAudioFeatures`.
  *
  * Parsed structure:
  *  - every page: "OggS" capture, version 0, header-type flags,
  *    64-bit granule position, serial, sequence, CRC (not verified —
  *    metadata walk, not payload integrity), segment table;
  *  - first page's first packet must be "OpusHead" (RFC 7845 §5.1):
  *    version, channel count, pre-skip (16 LE), input sample rate
  *    (32 LE);
  *  - duration = (last granule − pre-skip) / 48 kHz (Opus granules
  *    are ALWAYS 48 kHz regardless of input rate, RFC 7845 §4).
  * Non-Ogg payloads → null; corrupt pages fail loudly.
  */
object OggMeta {

  final case class OpusMeta(
      durationMs: Long, channels: Int, preSkip: Int, inputSampleRate: Long,
      nPages: Int, lastGranule: Long)

  /** True iff the payload leads with an OggS capture pattern. */
  def isOgg(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 27 &&
      bytes(0) == 'O' && bytes(1) == 'g' && bytes(2) == 'g' && bytes(3) == 'S'

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def le64(b: Array[Byte], off: Int): Long =
    le32(b, off) | (le32(b, off + 4) << 32)

  /** Parse Opus-in-Ogg metadata; null for non-Ogg payloads, loud
    * failure for structurally corrupt ones. */
  def parse(bytes: Array[Byte]): OpusMeta = {
    if (!isOgg(bytes)) return null
    var off = 0
    var nPages = 0
    var lastGranule = 0L
    var channels = 0
    var preSkip = 0
    var inputRate = 0L
    var sawHead = false
    while (off < bytes.length) {
      require(off + 27 <= bytes.length, s"truncated page header at offset $off")
      require(bytes(off) == 'O' && bytes(off + 1) == 'g' &&
        bytes(off + 2) == 'g' && bytes(off + 3) == 'S',
        s"lost OggS capture at offset $off")
      require((bytes(off + 4) & 0xff) == 0, "unsupported Ogg version")
      val granule = le64(bytes, off + 6)
      val nSegs = bytes(off + 26) & 0xff
      require(off + 27 + nSegs <= bytes.length, s"truncated segment table at offset $off")
      var bodyLen = 0
      var i = 0
      while (i < nSegs) { bodyLen += bytes(off + 27 + i) & 0xff; i += 1 }
      val body = off + 27 + nSegs
      require(body + bodyLen <= bytes.length, s"page body overruns at offset $off")
      if (nPages == 0) {
        // RFC 7845 §5.1: the ID header is the FIRST packet of the FIRST page
        require(bodyLen >= 19, "first page too short for an OpusHead packet")
        val magic = new String(bytes, body, 8, java.nio.charset.StandardCharsets.US_ASCII)
        require(magic == "OpusHead", s"first packet is not OpusHead (got '$magic')")
        require((bytes(body + 8) & 0xf0) == 0, "unsupported OpusHead major version")
        channels = bytes(body + 9) & 0xff
        require(channels > 0, "OpusHead channel count must be positive")
        preSkip = le16(bytes, body + 10)
        inputRate = le32(bytes, body + 12)
        sawHead = true
      }
      // granule −1 marks a page with no completed packets — skip it
      if (granule != -1L) lastGranule = granule
      nPages += 1
      off = body + bodyLen
    }
    require(sawHead, "no pages found")
    val samples = math.max(0L, lastGranule - preSkip)
    OpusMeta(samples * 1000L / 48000L, channels, preSkip, inputRate,
      nPages, lastGranule)
  }

  /** Minimal spec-valid Opus-in-Ogg skeleton: page 0 = OpusHead (BOS),
    * page 1 = one data segment of `dataBytes` 0xA5 filler with the
    * final granule position (EOS). Size closed form:
    * `28 + 19 + 28 + dataBytes` (dataBytes ≤ 255). CRCs are left zero
    * (the metadata walk does not verify them; real demuxers would). */
  def encode(samples: Long, channels: Int, preSkip: Int,
      inputSampleRate: Long, dataBytes: Int = 40): Array[Byte] = {
    require(samples >= 0 && channels >= 1 && channels <= 8 && preSkip >= 0 &&
      preSkip <= 0xffff && inputSampleRate > 0 && dataBytes >= 1 && dataBytes <= 255,
      s"bad spec samples=$samples ch=$channels preSkip=$preSkip rate=$inputSampleRate")
    val out = new java.io.ByteArrayOutputStream()
    def page(headerType: Int, granule: Long, seq: Int, segLen: Int): Unit = {
      out.write('O'); out.write('g'); out.write('g'); out.write('S')
      out.write(0) // version
      out.write(headerType)
      for (i <- 0 until 8) out.write(((granule >> (8 * i)) & 0xff).toInt)
      for (i <- 0 until 4) out.write((0x47524654 >> (8 * i)) & 0xff) // serial
      for (i <- 0 until 4) out.write((seq >> (8 * i)) & 0xff)
      for (_ <- 0 until 4) out.write(0) // CRC zero
      out.write(1) // one segment
      out.write(segLen)
    }
    // page 0: BOS (0x02), granule 0, OpusHead (19 bytes)
    page(0x02, 0L, 0, 19)
    "OpusHead".foreach(c => out.write(c.toInt))
    out.write(1) // version
    out.write(channels)
    out.write(preSkip & 0xff); out.write((preSkip >> 8) & 0xff)
    for (i <- 0 until 4) out.write(((inputSampleRate >> (8 * i)) & 0xff).toInt)
    out.write(0); out.write(0) // output gain 0
    out.write(0) // mapping family 0
    // page 1: EOS (0x04), final granule = preSkip + samples
    page(0x04, preSkip.toLong + samples, 1, dataBytes)
    for (i <- 0 until dataBytes) out.write(0xa5)
    val r = out.toByteArray
    assert(r.length == 28 + 19 + 28 + dataBytes,
      s"size bookkeeping off: ${r.length}")
    r
  }
}
