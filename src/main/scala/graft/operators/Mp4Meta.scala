package graft.operators

/** MP4 / ISO Base Media File Format (ISO 14496-12, public spec)
  * METADATA parsing — the video leg of the multimodal tier. Frame
  * DECODE stays honestly out of scope (H.264/H.265/AV1 are true video
  * codecs); what a 100 TB curation pipeline actually filters on —
  * duration, presentation dimensions, track count — lives in plain
  * big-endian box structures this parses by hand:
  *
  *   ftyp                      brand tag (validated)
  *   moov                      container
  *     mvhd                    timescale + duration (v0 and v1)
  *     trak/tkhd               track id + 16.16 fixed-point w×h
  *
  * The encoder writes a minimal spec-valid skeleton (ftyp + moov with
  * mvhd and one video tkhd) — the deterministic test/gate payload; a
  * real crawl MP4 parses through the same box walk, with unknown boxes
  * (mdat, udta, free...) skipped by size. 64-bit extended box sizes
  * are handled; malformed structures fail loudly.
  *
  * Pixel/sample access for video = [[Multimodal.sampleFrames]] byte
  * strides over the opaque payload, as the brief prescribes.
  */
object Mp4Meta {

  /** Parsed container metadata. Dimensions come from the FIRST track
    * with nonzero tkhd width/height (the video track by convention). */
  final case class VideoMeta(
      durationMs: Long, width: Int, height: Int, nTracks: Int)

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
  private def be64(b: Array[Byte], off: Int): Long =
    (be32(b, off) << 32) | be32(b, off + 4)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** True iff the payload leads with an ftyp box (the MP4 signature). */
  def isMp4(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 && tag(bytes, 4) == "ftyp"

  /** Walk `[start, end)` as a box sequence, invoking `f(type, payloadStart,
    * payloadEnd)` per box. Handles 64-bit sizes and size-0 (to end). */
  private def walk(bytes: Array[Byte], start: Int, end: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var off = start
    while (off + 8 <= end) {
      val size32 = be32(bytes, off)
      val typ = tag(bytes, off + 4)
      val (payload, boxEnd) =
        if (size32 == 1L) {
          require(off + 16 <= end, "truncated 64-bit box header")
          val size64 = be64(bytes, off + 8)
          require(size64 >= 16 && off + size64 <= end, s"bad 64-bit box size $size64")
          (off + 16, off + size64.toInt)
        } else if (size32 == 0L) (off + 8, end)
        else {
          require(size32 >= 8 && off + size32 <= end, s"bad box size $size32 for '$typ'")
          (off + 8, off + size32.toInt)
        }
      f(typ, payload, boxEnd)
      off = boxEnd
    }
  }

  /** Parse duration/dims/tracks; null for non-MP4 payloads, loud
    * failure for structurally corrupt ones. */
  def parse(bytes: Array[Byte]): VideoMeta = {
    if (!isMp4(bytes)) return null
    var durationMs = -1L
    var w = 0
    var h = 0
    var tracks = 0
    walk(bytes, 0, bytes.length) { (typ, p, e) =>
      if (typ == "moov") {
        walk(bytes, p, e) { (t2, p2, e2) =>
          t2 match {
            case "mvhd" =>
              // the declared box size may be "valid" yet smaller than
              // the version's fixed layout — require the fields we
              // read actually fit (v0 reads through p2+20, v1 p2+32)
              require(e2 - p2 >= 20, "truncated mvhd")
              val ver = bytes(p2) & 0xff
              require(ver != 1 || e2 - p2 >= 32, "truncated mvhd v1")
              val (timescale, duration) =
                if (ver == 1) (be32(bytes, p2 + 20), be64(bytes, p2 + 24))
                else (be32(bytes, p2 + 12), be32(bytes, p2 + 16))
              require(timescale > 0, "mvhd timescale must be positive")
              durationMs = duration * 1000L / timescale
            case "trak" =>
              tracks += 1
              walk(bytes, p2, e2) { (t3, p3, e3) =>
                if (t3 == "tkhd" && w == 0 && h == 0) {
                  // v0 layout through width+height = 84 bytes, v1 = 96
                  require(e3 - p3 >= 84, "truncated tkhd")
                  val ver = bytes(p3) & 0xff
                  require(ver != 1 || e3 - p3 >= 96, "truncated tkhd v1")
                  val dimsOff = p3 + (if (ver == 1) 88 else 76) // after matrix
                  val tw = (be32(bytes, dimsOff) >> 16).toInt   // 16.16 fixed
                  val th = (be32(bytes, dimsOff + 4) >> 16).toInt
                  if (tw > 0 && th > 0) { w = tw; h = th }
                }
              }
            case _ => ()
          }
        }
      }
    }
    require(durationMs >= 0, "missing moov/mvhd")
    VideoMeta(durationMs, w, h, tracks)
  }

  /** Audio-track metadata for M4A / audio-in-BMFF payloads — the
    * round-9 gap where M4A parsed fine as ISO-BMFF but was only ever
    * reported video-shaped. Fields come from the spec boxes:
    * mvhd duration, mdia/hdlr handler 'soun', and the
    * stbl/stsd AudioSampleEntry (channelcount + 16.16 samplerate,
    * ISO 14496-12 §12.2.3). `codec` is the sample-entry format tag
    * ("mp4a" for AAC-in-M4A). */
  final case class AudioTrackMeta(
      durationMs: Long, sampleRate: Int, channels: Int, nTracks: Int,
      codec: String)

  /** Parse the FIRST audio ('soun' handler) track's sample-entry
    * fields. Null for non-MP4 payloads AND for MP4s with no audio
    * track (a video-only MP4 is not an M4A — callers dispatch on
    * this); structurally corrupt boxes fail loudly. */
  def parseAudio(bytes: Array[Byte]): AudioTrackMeta = {
    if (!isMp4(bytes)) return null
    var durationMs = -1L
    var tracks = 0
    var sampleRate = 0
    var channels = 0
    var codec: String = null
    walk(bytes, 0, bytes.length) { (typ, p, e) =>
      if (typ == "moov") walk(bytes, p, e) { (t2, p2, e2) =>
        t2 match {
          case "mvhd" =>
            require(e2 - p2 >= 20, "truncated mvhd")
            val ver = bytes(p2) & 0xff
            require(ver != 1 || e2 - p2 >= 32, "truncated mvhd v1")
            val (timescale, duration) =
              if (ver == 1) (be32(bytes, p2 + 20), be64(bytes, p2 + 24))
              else (be32(bytes, p2 + 12), be32(bytes, p2 + 16))
            require(timescale > 0, "mvhd timescale must be positive")
            durationMs = duration * 1000L / timescale
          case "trak" =>
            tracks += 1
            walk(bytes, p2, e2) { (t3, p3, e3) =>
              if (t3 == "mdia") {
                // ISO 14496-12 does not mandate hdlr-before-minf order
                // inside mdia — resolve the handler in a FIRST pass so
                // an minf-first layout still dispatches correctly.
                var isAudio = false
                walk(bytes, p3, e3) { (t4, p4, e4) =>
                  if (t4 == "hdlr") {
                    require(e4 - p4 >= 12, "truncated hdlr")
                    isAudio = tag(bytes, p4 + 8) == "soun"
                  }
                }
                // second pass walks EVERY track's minf/stbl/stsd so
                // structurally corrupt boxes still fail loudly even on
                // non-audio tracks; audio FIELDS are only captured for
                // the 'soun' handler
                walk(bytes, p3, e3) { (t4, p4, e4) =>
                  if (t4 == "minf") walk(bytes, p4, e4) { (t5, p5, e5) =>
                    if (t5 == "stbl") walk(bytes, p5, e5) { (t6, p6, e6) =>
                      if (t6 == "stsd") {
                        require(e6 - p6 >= 8, "truncated stsd")
                        require(be32(bytes, p6 + 4) >= 1, "empty stsd")
                        if (isAudio && codec == null) {
                          val entry = p6 + 8
                          // AudioSampleEntry: size+format(8) + reserved(6)
                          // + dri(2) + reserved(8) + chan(2) + bits(2)
                          // + predef(2) + reserved(2) + rate(4, 16.16)
                          require(e6 - entry >= 36, "truncated audio sample entry")
                          codec = tag(bytes, entry + 4)
                          channels = ((bytes(entry + 24) & 0xff) << 8) |
                            (bytes(entry + 25) & 0xff)
                          sampleRate = (be32(bytes, entry + 32) >> 16).toInt
                        }
                      }
                    }
                  }
                }
              }
            }
          case _ => ()
        }
      }
    }
    if (codec == null) return null // no audio track — not an M4A shape
    require(durationMs >= 0, "missing moov/mvhd")
    AudioTrackMeta(durationMs, sampleRate, channels, tracks, codec)
  }

  /** Minimal spec-valid MP4 skeleton: ftyp(isom) + moov(mvhd +
    * trak/tkhd). Deterministic byte-for-byte; size is the closed form
    * `24 (ftyp) + 8 (moov) + 108 (mvhd) + 8 (trak) + 92 (tkhd)` = 240. */
  def encode(durationMs: Long, width: Int, height: Int,
      timescale: Int = 1000): Array[Byte] = {
    require(durationMs >= 0 && width > 0 && height > 0 && timescale > 0,
      s"bad spec ${durationMs}ms ${width}x$height @$timescale")
    val out = new java.io.ByteArrayOutputStream()
    def be(v: Long, n: Int): Unit =
      for (i <- (n - 1) to 0 by -1) out.write(((v >> (8 * i)) & 0xff).toInt)
    def tagW(s: String): Unit = s.foreach(c => out.write(c.toInt))
    // ftyp: major isom, minor 0, compatible isom
    be(24, 4); tagW("ftyp"); tagW("isom"); be(0, 4); tagW("isom"); tagW("mp41")
    val duration = durationMs * timescale / 1000L
    be(8 + 108 + 8 + 92, 4); tagW("moov")
    // mvhd v0: 108 bytes total
    be(108, 4); tagW("mvhd"); be(0, 4) // version+flags
    be(0, 4); be(0, 4)                 // ctime mtime
    be(timescale.toLong, 4); be(duration, 4)
    be(0x00010000L, 4)                 // rate 1.0
    be(0x0100L, 2); be(0, 2)           // volume 1.0 + reserved
    be(0, 8)                           // reserved
    Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L)
      .foreach(be(_, 4))               // identity matrix
    for (_ <- 0 until 6) be(0, 4)      // pre_defined
    be(2, 4)                           // next_track_ID
    // trak > tkhd v0: 92 bytes
    be(8 + 92, 4); tagW("trak")
    be(92, 4); tagW("tkhd"); be(0x00000007L, 4) // v0 + enabled flags
    be(0, 4); be(0, 4)                 // ctime mtime
    be(1, 4); be(0, 4)                 // track id + reserved
    be(duration, 4)
    be(0, 8)                           // reserved
    be(0, 2); be(0, 2)                 // layer + alternate group
    be(0, 2); be(0, 2)                 // volume (video: 0) + reserved
    Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L)
      .foreach(be(_, 4))               // matrix
    be(width.toLong << 16, 4); be(height.toLong << 16, 4) // 16.16 fixed
    out.toByteArray
  }

  /** Minimal spec-valid M4A skeleton: ftyp(M4A ) + moov(mvhd +
    * trak(tkhd + mdia(mdhd + hdlr'soun' + minf(stbl(stsd(mp4a)))))).
    * Deterministic byte-for-byte; total size is the closed form
    * 24 + 8 + 108 + 8 + 92 + 8 + 32 + 33 + 8 + 8 + 16 + 36 = 381. */
  def encodeM4a(durationMs: Long, sampleRate: Int,
      channels: Int, timescale: Int = 1000): Array[Byte] = {
    require(durationMs >= 0 && sampleRate > 0 && sampleRate <= 0xffff &&
      channels >= 1 && channels <= 8 && timescale > 0,
      s"bad spec ${durationMs}ms ${sampleRate}Hz ${channels}ch @$timescale")
    val out = new java.io.ByteArrayOutputStream()
    def be(v: Long, n: Int): Unit =
      for (i <- (n - 1) to 0 by -1) out.write(((v >> (8 * i)) & 0xff).toInt)
    def tagW(s: String): Unit = s.foreach(c => out.write(c.toInt))
    be(24, 4); tagW("ftyp"); tagW("M4A "); be(0, 4); tagW("M4A "); tagW("mp42")
    val duration = durationMs * timescale / 1000L
    val stsd = 16 + 36
    val stbl = 8 + stsd
    val minf = 8 + stbl
    val hdlr = 33
    val mdhd = 32
    val mdia = 8 + mdhd + hdlr + minf
    val tkhd = 92
    val trak = 8 + tkhd + mdia
    be(8 + 108 + trak, 4); tagW("moov")
    // mvhd v0
    be(108, 4); tagW("mvhd"); be(0, 4)
    be(0, 4); be(0, 4)
    be(timescale.toLong, 4); be(duration, 4)
    be(0x00010000L, 4)
    be(0x0100L, 2); be(0, 2)
    be(0, 8)
    Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L)
      .foreach(be(_, 4))
    for (_ <- 0 until 6) be(0, 4)
    be(2, 4)
    // trak
    be(trak, 4); tagW("trak")
    // tkhd v0 — audio track: zero dims, volume 1.0
    be(tkhd, 4); tagW("tkhd"); be(0x00000007L, 4)
    be(0, 4); be(0, 4)
    be(1, 4); be(0, 4)
    be(duration, 4)
    be(0, 8)
    be(0, 2); be(0, 2)
    be(0x0100L, 2); be(0, 2)
    Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L)
      .foreach(be(_, 4))
    be(0, 4); be(0, 4) // width = height = 0 (audio)
    // mdia
    be(mdia, 4); tagW("mdia")
    // mdhd v0: media timescale = the sample rate (the M4A convention)
    be(mdhd, 4); tagW("mdhd"); be(0, 4)
    be(0, 4); be(0, 4)
    be(sampleRate.toLong, 4); be(durationMs * sampleRate / 1000L, 4)
    be(0x55c4L, 2); be(0, 2) // language 'und' + pre_defined
    // hdlr: handler 'soun', empty NUL name
    be(hdlr, 4); tagW("hdlr"); be(0, 4)
    be(0, 4); tagW("soun")
    be(0, 4); be(0, 4); be(0, 4) // reserved
    out.write(0) // name ""
    // minf > stbl > stsd
    be(minf, 4); tagW("minf")
    be(stbl, 4); tagW("stbl")
    be(stsd, 4); tagW("stsd"); be(0, 4); be(1, 4) // ver/flags + entry_count
    // mp4a AudioSampleEntry
    be(36, 4); tagW("mp4a")
    be(0, 4); be(0, 2) // reserved(6)
    be(1, 2)           // data_reference_index
    be(0, 8)           // reserved
    be(channels.toLong, 2); be(16, 2) // channelcount + samplesize
    be(0, 2); be(0, 2) // pre_defined + reserved
    be(sampleRate.toLong << 16, 4)    // 16.16 fixed
    out.toByteArray
  }
}
