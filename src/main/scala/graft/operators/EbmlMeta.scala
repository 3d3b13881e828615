package graft.operators

/** WebM / Matroska (EBML) container METADATA parsing — the public
  * Matroska/EBML specs (RFC 8794 EBML framing + the matroska.org
  * element registry). Completes the video-metadata tier next to
  * [[Mp4Meta]]: MP4 and WebM are the two dominant crawl video
  * containers. Same scope split: duration/dims/track-count for
  * filtering and dedup keys. Since round 16, VP8 keyframe DECODE is
  * real through [[WebmVideo]] (Cluster/SimpleBlock demux feeding
  * [[Vp8Codec]]); VP9/AV1 frame decode stays honestly out of scope.
  *
  * Parsed structure (element IDs from the registry):
  *   EBML 0x1A45DFA3 > DocType 0x4282 ("webm" | "matroska")
  *   Segment 0x18538067 (unknown-size handled: runs to EOF)
  *     Info 0x1549A966 > TimecodeScale 0x2AD7B1 (uint ns, default 1e6),
  *                       Duration 0x4489 (float32/float64, scale units)
  *     Tracks 0x1654AE6B > TrackEntry 0xAE > TrackType 0x83,
  *                       Video 0xE0 > PixelWidth 0xB0 / PixelHeight 0xBA
  * Unknown elements are skipped by size; malformed varints or
  * overrunning sizes fail loudly.
  */
object EbmlMeta {

  final case class WebmMeta(
      docType: String, durationMs: Long, width: Int, height: Int,
      nTracks: Int, nVideoTracks: Int)

  /** True iff the payload leads with the EBML magic. */
  def isEbml(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 4 &&
      (bytes(0) & 0xff) == 0x1a && (bytes(1) & 0xff) == 0x45 &&
      (bytes(2) & 0xff) == 0xdf && (bytes(3) & 0xff) == 0xa3

  /** EBML varint: leading-zero count of the first byte gives the
    * width. For IDs the marker bit is KEPT (registry IDs include it);
    * for sizes it is stripped. Returns (value, bytesRead). */
  private[operators] def readVarint(b: Array[Byte], off: Int, keepMarker: Boolean): (Long, Int) = {
    require(off < b.length, s"varint past end at offset $off")
    val first = b(off) & 0xff
    require(first != 0, s"invalid varint leading byte 0 at offset $off")
    val len = Integer.numberOfLeadingZeros(first) - 23 // 1..8
    // EBML/Matroska caps element IDs at 4 bytes (EBMLMaxIDLength 4);
    // a 5-8 byte "ID" is corruption and must fail loudly, not be
    // mis-parsed as a huge unknown element.
    require(!keepMarker || len <= 4,
      s"EBML element ID wider than 4 bytes at offset $off")
    require(off + len <= b.length, s"truncated varint at offset $off")
    var v: Long = if (keepMarker) first.toLong else (first & (0xff >>> len)).toLong
    var i = 1
    while (i < len) { v = (v << 8) | (b(off + i) & 0xff); i += 1 }
    (v, len)
  }

  /** All-ones size payload = "unknown size" (RFC 8794 §6.2). */
  private def isUnknownSize(v: Long, len: Int): Boolean =
    v == (1L << (7 * len)) - 1

  private[operators] def readUint(b: Array[Byte], off: Int, len: Int): Long = {
    require(len >= 1 && len <= 8, s"bad uint length $len")
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (b(off + i) & 0xff); i += 1 }
    v
  }

  private def readFloat(b: Array[Byte], off: Int, len: Int): Double = len match {
    case 4 => java.lang.Float.intBitsToFloat(readUint(b, off, 4).toInt).toDouble
    case 8 => java.lang.Double.longBitsToDouble(readUint(b, off, 8))
    case other => throw new IllegalArgumentException(s"bad float length $other")
  }

  /** Walk the children of [start, end), calling f(id, payloadStart,
    * payloadEnd). Unknown-size children run to the enclosing end. */
  private[operators] def walk(b: Array[Byte], start: Int, end: Int)(
      f: (Long, Int, Int) => Unit): Unit = {
    var off = start
    while (off < end) {
      val (id, idLen) = readVarint(b, off, keepMarker = true)
      val (sz, szLen) = readVarint(b, off + idLen, keepMarker = false)
      val p = off + idLen + szLen
      val e =
        if (isUnknownSize(sz, szLen)) end
        else {
          require(sz >= 0 && p + sz <= end,
            s"element 0x${id.toHexString} size $sz overruns at offset $off")
          p + sz.toInt
        }
      f(id, p, e)
      off = e
    }
  }

  /** Parse WebM/Matroska metadata; null for non-EBML payloads, loud
    * failure for structurally corrupt ones. */
  def parse(bytes: Array[Byte]): WebmMeta = {
    if (!isEbml(bytes)) return null
    var docType = ""
    var scaleNs = 1000000L // spec default
    var durationScale = -1.0
    var w = 0
    var h = 0
    var tracks = 0
    var videoTracks = 0
    walk(bytes, 0, bytes.length) { (id, p, e) =>
      id match {
        case 0x1A45DFA3L => // EBML header
          walk(bytes, p, e) { (id2, p2, e2) =>
            if (id2 == 0x4282L)
              docType = new String(bytes, p2, e2 - p2,
                java.nio.charset.StandardCharsets.US_ASCII)
          }
        case 0x18538067L => // Segment
          walk(bytes, p, e) { (id2, p2, e2) =>
            id2 match {
              case 0x1549A966L => // Info
                walk(bytes, p2, e2) { (id3, p3, e3) =>
                  id3 match {
                    case 0x2AD7B1L => scaleNs = readUint(bytes, p3, e3 - p3)
                    case 0x4489L => durationScale = readFloat(bytes, p3, e3 - p3)
                    case _ => ()
                  }
                }
              case 0x1654AE6BL => // Tracks
                walk(bytes, p2, e2) { (id3, p3, e3) =>
                  if (id3 == 0xAEL) {
                    tracks += 1
                    var isVideo = false
                    walk(bytes, p3, e3) { (id4, p4, e4) =>
                      id4 match {
                        case 0x83L => isVideo = readUint(bytes, p4, e4 - p4) == 1L
                        case 0xE0L => // Video
                          walk(bytes, p4, e4) { (id5, p5, e5) =>
                            id5 match {
                              case 0xB0L if w == 0 =>
                                w = readUint(bytes, p5, e5 - p5).toInt
                              case 0xBAL if h == 0 =>
                                h = readUint(bytes, p5, e5 - p5).toInt
                              case _ => ()
                            }
                          }
                        case _ => ()
                      }
                    }
                    if (isVideo) videoTracks += 1
                  }
                }
              case _ => ()
            }
          }
        case _ => ()
      }
    }
    require(docType.nonEmpty, "missing EBML DocType")
    require(scaleNs > 0, "TimecodeScale must be positive")
    val durMs =
      if (durationScale < 0) 0L
      else math.round(durationScale * scaleNs / 1e6)
    WebmMeta(docType, durMs, w, h, tracks, videoTracks)
  }

  /** Minimal spec-valid WebM skeleton: EBML header (DocType "webm") +
    * Segment(Info(TimecodeScale 1e6, Duration float64 ms),
    * Tracks(video TrackEntry with dims)). Fixed-width encodings make
    * the size a constant **85 bytes** — the closed form gates replay. */
  def encode(durationMs: Long, width: Int, height: Int): Array[Byte] = {
    require(durationMs >= 0 && width > 0 && height > 0 && width <= 0xffff &&
      height <= 0xffff, s"bad spec ${durationMs}ms ${width}x$height")
    val out = new java.io.ByteArrayOutputStream()
    def bytes(xs: Int*): Unit = xs.foreach(x => out.write(x & 0xff))
    def uint(v: Long, n: Int): Unit =
      for (i <- (n - 1) to 0 by -1) out.write(((v >> (8 * i)) & 0xff).toInt)
    // EBML header, payload 31 bytes
    bytes(0x1a, 0x45, 0xdf, 0xa3, 0x80 | 31)
    bytes(0x42, 0x86, 0x81, 1)          // EBMLVersion 1
    bytes(0x42, 0xf7, 0x81, 1)          // EBMLReadVersion 1
    bytes(0x42, 0xf2, 0x81, 4)          // EBMLMaxIDLength 4
    bytes(0x42, 0xf3, 0x81, 8)          // EBMLMaxSizeLength 8
    bytes(0x42, 0x82, 0x84); "webm".foreach(c => out.write(c.toInt)) // DocType
    bytes(0x42, 0x87, 0x81, 2)          // DocTypeVersion 2
    bytes(0x42, 0x85, 0x81, 2)          // DocTypeReadVersion 2
    // Segment, payload 24 (Info) + 20 (Tracks) = 44
    bytes(0x18, 0x53, 0x80, 0x67, 0x80 | 44)
    // Info, payload 8 + 11 = 19
    bytes(0x15, 0x49, 0xa9, 0x66, 0x80 | 19)
    bytes(0x2a, 0xd7, 0xb1, 0x84); uint(1000000L, 4) // TimecodeScale
    bytes(0x44, 0x89, 0x88)             // Duration, float64
    uint(java.lang.Double.doubleToLongBits(durationMs.toDouble), 8)
    // Tracks, payload: TrackEntry 15
    bytes(0x16, 0x54, 0xae, 0x6b, 0x80 | 15)
    bytes(0xae, 0x80 | 13)              // TrackEntry, payload 13
    bytes(0x83, 0x81, 1)                // TrackType video
    bytes(0xe0, 0x80 | 8)               // Video, payload 8
    bytes(0xb0, 0x82); uint(width.toLong, 2)  // PixelWidth
    bytes(0xba, 0x82); uint(height.toLong, 2) // PixelHeight
    val r = out.toByteArray
    assert(r.length == 85, s"size bookkeeping off: ${r.length} != 85")
    r
  }
}
