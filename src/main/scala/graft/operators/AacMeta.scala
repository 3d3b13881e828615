package graft.operators

/** AAC-in-ADTS (ISO 13818-7 / 14496-3, public specs) METADATA parsing —
  * after MP3 the most common crawl audio class, and round-9's largest
  * remaining modality hole. Scope mirrors [[Mp3Meta]]: what a 100 TB
  * curation pipeline filters on — duration, sample rate, channel
  * config, profile, average bitrate — lives in the fixed-layout 7/9-byte
  * ADTS frame headers this parses by hand; PCM sample DECODE (the AAC
  * filterbank) stays honestly fenced, with the policy documented at the
  * [[Multimodal.extractAudioFeatures]] ingest.
  *
  * ADTS header layout (bits, ISO 13818-7 §6.2):
  *   syncword(12)=0xFFF  id(1)  layer(2)=0  protection_absent(1)
  *   profile(2)  sampling_frequency_index(4)  private(1)
  *   channel_configuration(3)  original(1)  home(1)
  *   copyright_id_bit(1)  copyright_id_start(1)
  *   aac_frame_length(13)  adts_buffer_fullness(11)
  *   number_of_raw_data_blocks_in_frame(2)
  * plus a 16-bit CRC when protection_absent = 0. Each raw data block is
  * 1024 samples; frame length covers the header.
  *
  * Desync, truncation, trailing garbage, reserved sample-rate indexes
  * and PCE-carried channel configs (config 0) all fail loudly — a crawl
  * wrapper decides the null-vs-throw policy, exactly as with the image
  * codecs.
  */
object AacMeta {

  /** Parsed stream metadata. `bitrateKbps` is the exact average
    * (total bits over exact duration, rounded down); `vbr` is true when
    * frame byte lengths differ (ADTS has no CBR tag — AAC frames are
    * naturally variable-length, so equal-length frames are the
    * deterministic-filler / test-stream signature). */
  final case class AacStreamMeta(
      durationMs: Long, sampleRate: Int, channels: Int, nFrames: Long,
      bitrateKbps: Int, profile: Int, vbr: Boolean)

  /** sampling_frequency_index 0..12 — ISO 14496-3 table 1.18;
    * 13/14 reserved, 15 escape (forbidden in ADTS). */
  private val SampleRates = Array(
    96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350)

  /** channel_configuration → output channel count (config 7 = 7.1). */
  private val Channels = Array(0, 1, 2, 3, 4, 5, 6, 8)

  private final case class Frame(
      profile: Int, sampleRate: Int, channels: Int, frameBytes: Int,
      samples: Int)

  private def parseHeader(b: Array[Byte], off: Int): Frame = {
    require(off + 7 <= b.length, s"truncated ADTS header at offset $off")
    val b0 = b(off) & 0xff
    val b1 = b(off + 1) & 0xff
    require(b0 == 0xff && (b1 & 0xf0) == 0xf0,
      f"lost ADTS frame sync at offset $off (0x$b0%02x 0x$b1%02x)")
    require(((b1 >> 1) & 3) == 0, "ADTS layer bits must be 0")
    val protAbsent = b1 & 1
    val b2 = b(off + 2) & 0xff
    val profile = (b2 >> 6) & 3
    val srIdx = (b2 >> 2) & 0xf
    require(srIdx < SampleRates.length,
      s"reserved/escape sampling_frequency_index $srIdx at offset $off")
    val b3 = b(off + 3) & 0xff
    val chanCfg = ((b2 & 1) << 2) | ((b3 >> 6) & 3)
    require(chanCfg != 0,
      "channel_configuration 0 (in-band PCE) not supported — fails loudly")
    val frameLen = ((b3 & 3) << 11) | ((b(off + 4) & 0xff) << 3) |
      ((b(off + 5) & 0xff) >> 5)
    val headerLen = if (protAbsent == 1) 7 else 9
    require(frameLen >= headerLen,
      s"aac_frame_length $frameLen shorter than its own header")
    val rdb = (b(off + 6) & 3) + 1 // raw data blocks, 1..4
    Frame(profile, SampleRates(srIdx), Channels(chanCfg), frameLen,
      rdb * 1024)
  }

  /** True iff the payload is ADTS-shaped: the 0xFFF sync with layer
    * bits 00 at offset 0 OR after an ID3v2 prefix (ID3 tags are
    * container-agnostic — ID3+ADTS is routine crawl audio). The check
    * is STRUCTURAL only (sync + layer), deliberately not validating
    * sample-rate index or channel config: a synced layer-0 stream with
    * a reserved rate or an in-band-PCE channel config IS an AAC stream
    * and must fail loudly in [[parse]], not be silently mislabeled
    * "unknown". MP3 probes stay disjoint — an MPEG audio frame always
    * has nonzero layer bits. */
  def isAdts(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 7 && {
      val off = try Mp3Meta.skipId3v2(bytes) catch { case _: Exception => return false }
      off + 7 <= bytes.length &&
        (bytes(off) & 0xff) == 0xff && ((bytes(off + 1) & 0xff) & 0xf6) == 0xf0
    }

  /** Parse stream metadata by walking every ADTS frame (after an
    * optional ID3v2 prefix). Null for payloads that are not ADTS at
    * all; loud failure for corrupt/truncated/unsupported streams
    * (mid-stream desync, partial trailing frame, trailing garbage,
    * reserved sample-rate index, in-band-PCE channel config 0). */
  def parse(bytes: Array[Byte]): AacStreamMeta = {
    if (!isAdts(bytes)) return null
    val start = Mp3Meta.skipId3v2(bytes)
    var off = start
    // strip an ID3v1 trailer ("TAG" + 125 bytes) if present — common
    // tagger output writes BOTH v2 prefix and v1 trailer (same handling
    // as Mp3Meta.parse; without it a valid double-tagged AAC would fail
    // the trailing-bytes check)
    val end =
      if (bytes.length - start >= 128 + 7 &&
        bytes(bytes.length - 128) == 'T' && bytes(bytes.length - 127) == 'A' &&
        bytes(bytes.length - 126) == 'G') bytes.length - 128
      else bytes.length
    var nFrames = 0L
    var samples = 0L
    var sampleRate = 0
    var channels = 0
    var profile = 0
    var lenMin = Int.MaxValue
    var lenMax = 0
    while (off + 7 <= end) {
      val f = parseHeader(bytes, off)
      require(off + f.frameBytes <= end,
        s"truncated trailing frame at offset $off (${end - off} of ${f.frameBytes} bytes)")
      if (nFrames == 0L) {
        sampleRate = f.sampleRate
        channels = f.channels
        profile = f.profile
      } else {
        require(f.sampleRate == sampleRate,
          "sample-rate change mid-stream not supported")
        require(f.channels == channels,
          "channel-config change mid-stream not supported")
      }
      nFrames += 1
      samples += f.samples
      lenMin = math.min(lenMin, f.frameBytes)
      lenMax = math.max(lenMax, f.frameBytes)
      off += f.frameBytes
    }
    require(nFrames > 0, "no ADTS frames found")
    require(off == end,
      s"${end - off} trailing non-frame bytes after the last ADTS frame")
    val durationMs = samples * 1000L / sampleRate
    AacStreamMeta(
      durationMs = durationMs,
      sampleRate = sampleRate,
      channels = channels,
      nFrames = nFrames,
      // exact average over the AUDIO bytes only (ID3 prefix/trailer
      // excluded): total bits / exact seconds = bits·sr / samples·1000
      bitrateKbps = ((end - start).toLong * 8L * sampleRate / (samples * 1000L)).toInt,
      profile = profile,
      vbr = lenMin != lenMax)
  }

  /** Emit a deterministic spec-valid ADTS stream: `nFrames` AAC-LC
    * frames at sample-rate index `srIdx` (0–12), channel config
    * `chanCfg` (1–7), one raw data block (1024 samples) per frame,
    * `payloadBytes` of filler after each 7-byte header (no CRC), filler
    * bytes `(frame·193 + i·29) & 0xff`. Total size is the closed form
    * `nFrames · (7 + payloadBytes)`, so gates can predict size,
    * duration and bitrate in SQL. */
  def encode(nFrames: Int, srIdx: Int, chanCfg: Int,
      payloadBytes: Int): Array[Byte] = {
    require(nFrames > 0, s"nFrames must be positive, got $nFrames")
    require(srIdx >= 0 && srIdx <= 12, s"bad sample-rate index $srIdx")
    require(chanCfg >= 1 && chanCfg <= 7, s"bad channel config $chanCfg")
    require(payloadBytes >= 0 && payloadBytes <= 8184,
      s"bad payload size $payloadBytes")
    val frameLen = 7 + payloadBytes
    val out = new Array[Byte](nFrames * frameLen)
    var fr = 0
    while (fr < nFrames) {
      val o = fr * frameLen
      out(o) = 0xff.toByte
      out(o + 1) = 0xf1.toByte // MPEG-4, layer 0, no CRC
      // profile LC (01) | srIdx(4) | private 0 | chanCfg bit 2
      out(o + 2) = ((1 << 6) | (srIdx << 2) | ((chanCfg >> 2) & 1)).toByte
      // chanCfg low 2 | orig/home/cib/cis 0 | frameLen high 2
      out(o + 3) = (((chanCfg & 3) << 6) | ((frameLen >> 11) & 3)).toByte
      out(o + 4) = ((frameLen >> 3) & 0xff).toByte
      // frameLen low 3 | buffer fullness high 5 (0x7FF = VBR signal-free)
      out(o + 5) = (((frameLen & 7) << 5) | 0x1f).toByte
      out(o + 6) = 0xfc.toByte // fullness low 6 = all-ones | rdb-1 = 0
      var i = 7
      while (i < frameLen) {
        out(o + i) = ((fr * 193 + i * 29) & 0xff).toByte
        i += 1
      }
      fr += 1
    }
    out
  }
}
