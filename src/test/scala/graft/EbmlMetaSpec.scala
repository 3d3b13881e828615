package graft

import graft.operators.EbmlMeta

class EbmlMetaSpec extends SparkSpec {

  test("encode → parse round-trips duration, dims, track counts") {
    for (ms <- Seq(0L, 500L, 3600000L); (w, h) <- Seq((16, 16), (1920, 1080), (65535, 1))) {
      val m = EbmlMeta.parse(EbmlMeta.encode(ms, w, h))
      assert(m != null)
      assert(m.docType == "webm" && m.durationMs == ms &&
        m.width == w && m.height == h &&
        m.nTracks == 1 && m.nVideoTracks == 1)
    }
  }

  test("skeleton size is the 85-byte closed form") {
    assert(EbmlMeta.encode(1234, 640, 480).length == 85)
  }

  test("TimecodeScale scaling and float32 Duration are honored") {
    // rebuild Info by hand: scale 2e6 ns → Duration unit = 2 ms, and a
    // 4-byte float — duration 250 units = 500 ms
    val base = EbmlMeta.encode(0, 8, 8)
    // locate Info payload: EBML header is 36 bytes, Segment id+size 5,
    // Info id+size 5 → TimecodeScale at 46
    val b = base.clone()
    // TimecodeScale 0x2AD7B1, size 0x84, value 2_000_000
    val ts = 46
    assert((b(ts) & 0xff) == 0x2a && (b(ts + 1) & 0xff) == 0xd7)
    val v = 2000000L
    for (i <- 0 until 4) b(ts + 4 + i) = ((v >> (8 * (3 - i))) & 0xff).toByte
    // Duration float64 → 250.0 units
    val du = ts + 8
    assert((b(du) & 0xff) == 0x44 && (b(du + 1) & 0xff) == 0x89)
    val bits = java.lang.Double.doubleToLongBits(250.0)
    for (i <- 0 until 8) b(du + 3 + i) = ((bits >> (8 * (7 - i))) & 0xff).toByte
    assert(EbmlMeta.parse(b).durationMs == 500L)
    // float32 variant: shrink the Duration element (size 0x84, 4 bytes)
    // inside a hand-built Info-only segment
    val f32 = java.lang.Float.floatToIntBits(250.0f)
    val info = Array[Byte](0x15, 0x49.toByte, 0xa9.toByte, 0x66.toByte, (0x80 | 15).toByte,
      0x2a, 0xd7.toByte, 0xb1.toByte, 0x84.toByte,
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte,
      0x44, 0x89.toByte, 0x84.toByte,
      ((f32 >> 24) & 0xff).toByte, ((f32 >> 16) & 0xff).toByte, ((f32 >> 8) & 0xff).toByte, (f32 & 0xff).toByte)
    val seg = Array[Byte](0x18, 0x53, 0x80.toByte, 0x67, (0x80 | info.length).toByte) ++ info
    val m = EbmlMeta.parse(base.take(36) ++ seg)
    assert(m.durationMs == 500L)
  }

  test("unknown-size Segment runs to end of payload") {
    val base = EbmlMeta.encode(700, 32, 32)
    val b = base.clone()
    b(40) = 0xff.toByte // Segment size varint 0x80|44 → 0xFF = unknown
    val m = EbmlMeta.parse(b)
    assert(m.durationMs == 700 && m.width == 32)
  }

  test("corrupt payloads fail loudly; non-EBML returns null") {
    assert(EbmlMeta.parse("not ebml".getBytes) == null)
    val good = EbmlMeta.encode(100, 8, 8)
    assert(intercept[IllegalArgumentException] {
      EbmlMeta.parse(good.dropRight(4)) // last element overruns
    }.getMessage.contains("overruns"))
    intercept[IllegalArgumentException] { EbmlMeta.encode(-1, 8, 8) }
    intercept[IllegalArgumentException] { EbmlMeta.encode(1, 70000, 8) }
  }

  test("a 5-8 byte element ID fails loudly (EBMLMaxIDLength is 4)") {
    val b = EbmlMeta.encode(700, 32, 32).clone()
    b(41) = 0x04 // first Segment-child ID byte → 6-byte-wide "ID"
    val e = intercept[IllegalArgumentException] { EbmlMeta.parse(b) }
    assert(e.getMessage.contains("wider than 4"))
  }

  test("extractWebmMeta: distributed walk, unknown passthrough, no cross-probe") {
    import spark.implicits._
    val rows = Seq(
      (1L, EbmlMeta.encode(2500, 1280, 720)),
      (2L, graft.operators.Mp4Meta.encode(2500, 1280, 720)),
      (3L, null.asInstanceOf[Array[Byte]]))
    val out = graft.operators.Multimodal.extractWebmMeta(
        rows.toDF("media_id", "data").repartition(2))
      .collect().map(f => f.mediaId -> f).toMap
    assert(out(1L).format == "webm" && out(1L).durationMs == 2500 &&
      out(1L).width == 1280 && out(1L).byteLen == 85)
    assert(out(2L).format == "unknown", "an MP4 must not parse as EBML")
    assert(out(3L).format == "unknown" && out(3L).byteLen == 0)
  }
}
