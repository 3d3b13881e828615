package graft.operators

/** FLAC container METADATA parsing (the xiph.org FLAC format spec —
  * public) — the lossless-audio leg of the metadata tier, same scope
  * split as [[Mp3Meta]]/[[Mp4Meta]]: duration, sample rate, channels
  * and bit depth come from the mandatory STREAMINFO block's fixed bit
  * layout. Sample DECODE (rice-coded fixed/LPC residuals) lives in
  * [[FlacCodec]] — the former fence fell once the decode could be
  * done honestly (spec-exact, MD5-verified).
  *
  * Layout parsed by hand: "fLaC" magic, then metadata blocks — 1-byte
  * header (bit 7 = last-block flag, bits 0–6 = type; type 0 =
  * STREAMINFO, spec-mandated FIRST) + 24-bit big-endian length.
  * STREAMINFO is 34 bytes; the packed tail is
  * sampleRate(20) | channels−1(3) | bps−1(5) | totalSamples(36).
  */
object FlacMeta {

  final case class FlacInfo(
      durationMs: Long, sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long)

  /** True iff the payload leads with the fLaC magic. */
  def isFlac(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 8 &&
      bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C'

  /** Parse STREAMINFO; null for non-FLAC payloads, loud failure for
    * structurally corrupt ones. */
  def parse(bytes: Array[Byte]): FlacInfo = {
    if (!isFlac(bytes)) return null
    var off = 4
    var info: FlacInfo = null
    var last = false
    var first = true
    while (!last) {
      require(off + 4 <= bytes.length, s"truncated block header at offset $off")
      val h = bytes(off) & 0xff
      last = (h & 0x80) != 0
      val typ = h & 0x7f
      require(typ != 127, "invalid metadata block type 127")
      val len = ((bytes(off + 1) & 0xff) << 16) | ((bytes(off + 2) & 0xff) << 8) |
        (bytes(off + 3) & 0xff)
      require(off + 4 + len <= bytes.length, s"block overruns payload at offset $off")
      if (first) {
        require(typ == 0, s"first metadata block must be STREAMINFO, got type $typ")
        require(len == 34, s"STREAMINFO must be 34 bytes, got $len")
        val p = off + 4
        def u(i: Int): Int = bytes(p + i) & 0xff
        val sampleRate = (u(10) << 12) | (u(11) << 4) | (u(12) >> 4)
        require(sampleRate > 0, "STREAMINFO sample rate must be positive")
        val channels = ((u(12) >> 1) & 7) + 1
        val bps = (((u(12) & 1) << 4) | (u(13) >> 4)) + 1
        val totalSamples = ((u(13) & 0xfL) << 32) | (u(14).toLong << 24) |
          (u(15).toLong << 16) | (u(16).toLong << 8) | u(17).toLong
        info = FlacInfo(totalSamples * 1000L / sampleRate, sampleRate,
          channels, bps, totalSamples)
        first = false
      }
      off += 4 + len
    }
    require(info != null, "no STREAMINFO block")
    info
  }

  /** Minimal spec-valid FLAC skeleton: magic + STREAMINFO (last-block
    * flag set, zero MD5/frame bounds). 42 bytes, deterministic
    * byte-for-byte — gates predict size and duration in closed form. */
  def encode(totalSamples: Long, sampleRate: Int, channels: Int,
      bitsPerSample: Int = 16): Array[Byte] = {
    require(totalSamples >= 0 && totalSamples < (1L << 36), s"bad totalSamples $totalSamples")
    require(sampleRate > 0 && sampleRate < (1 << 20), s"bad sampleRate $sampleRate")
    require(channels >= 1 && channels <= 8, s"bad channels $channels")
    require(bitsPerSample >= 4 && bitsPerSample <= 32, s"bad bps $bitsPerSample")
    val out = new Array[Byte](4 + 4 + 34)
    out(0) = 'f'; out(1) = 'L'; out(2) = 'a'; out(3) = 'C'
    out(4) = 0x80.toByte // last block, type 0 (STREAMINFO)
    out(5) = 0; out(6) = 0; out(7) = 34
    val p = 8
    // min/max block size: the spec's 16..65535 range — use 4096
    out(p) = 0x10; out(p + 1) = 0x00
    out(p + 2) = 0x10; out(p + 3) = 0x00
    // min/max frame size 0 = unknown (bytes 4..9 stay zero)
    out(p + 10) = ((sampleRate >> 12) & 0xff).toByte
    out(p + 11) = ((sampleRate >> 4) & 0xff).toByte
    out(p + 12) = (((sampleRate & 0xf) << 4) | (((channels - 1) & 7) << 1) |
      (((bitsPerSample - 1) >> 4) & 1)).toByte
    out(p + 13) = ((((bitsPerSample - 1) & 0xf) << 4) |
      ((totalSamples >> 32) & 0xf)).toInt.toByte
    out(p + 14) = ((totalSamples >> 24) & 0xff).toByte
    out(p + 15) = ((totalSamples >> 16) & 0xff).toByte
    out(p + 16) = ((totalSamples >> 8) & 0xff).toByte
    out(p + 17) = (totalSamples & 0xff).toByte
    // MD5 bytes 18..33 stay zero (unknown)
    out
  }
}
