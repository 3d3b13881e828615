package graft

import graft.operators.{Vp8Codec, WebpCodec}

/** [[graft.operators.Vp8Codec]] — the lossy-WebP VP8 intra decoder
  * (RFC 6386) and its closed-form fixture encoder.
  *
  * Ground truth: every pinned hash below was produced by the REAL
  * system libwebp (`WebPDecodeYUV` via scripts/vp8_probe.py,
  * libwebp 1.2.4) — on a real libwebp-ENCODED file (the VP8 stream of
  * CPython's python.webp) and on our own encoder's streams, so the
  * default probability tables, bool coder, token trees, prediction
  * edge rules, and the loop filter are all cross-validated against an
  * independent implementation in both directions. */
class WebpLossySpec extends SparkSpec {

  private def sha(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  // CPython test-suite fixture (PSF-licensed), also embedded in
  // WebpCodecSpec for the ALPH/lossless half: VP8X + ALPH + lossy VP8.
  private val pythonWebpB64 =
    """UklGRqgBAABXRUJQVlA4WAoAAAAQAAAADwAADwAAQUxQSMMAAAABJ6KokSTleucYX+ffKpmImP90
      |cY3gJjDi4Yt3MsjBEVyDKzDosHgVjnhRNcEIDAJPkqBqsFUZHNa2bUYvTsZ2PLbtd/uvKa4hov9J
      |0f2PkPe6REkkGzolkTTzFG0Ox9PlFiD0CxS+kOGDtxoynjaCfx0pfk52CPuInrOR75lzRugygtv4
      |zEiy90UwfSD9NheMITJWLaXWayO8XeOlWRXVnIGk2W6WdYoYMQ+KqixQNPowgt+6a1BSKbUtz+lU
      |FAoBAAAAVlA4IL4AAACQAgCdASoQABAAAwA0JbACdDBPCIUMfAMdCCz96AD+/XSg/QKbH4r3Q3yc
      |N/bSDK/T/zVo4u6nvclvG/SqxWOuup+XhN9BojvaW+Tv+MvxvX/hr/o/5Qns9LtmX/+qKdl/yWzn
      |huasl7nkxvSTI4xf3Y85VSB/lU/8Ofj/b9JrA+ifvIOYZm2x1RP/dhfmsf5diuSfR7+z+r/+HR3z
      |Eo/+XM/B+vkYw73Pzx+ROaAB/ZoBSzEs3rzZe6qsAAAA""".stripMargin.replaceAll("\\s", "")

  private lazy val pythonWebp: Array[Byte] =
    java.util.Base64.getDecoder.decode(pythonWebpB64)

  test("real libwebp-encoded file: python.webp VP8 planes are byte-exact vs libwebp") {
    val (_, off, sz) = WebpCodec.chunks(pythonWebp).find(_._1 == "VP8 ").get
    val yuv = Vp8Codec.decodeToYuv(pythonWebp, off, sz)
    assert(yuv.width === 16 && yuv.height === 16)
    // WebPDecodeYUV ground truth (loop filter level 12, B_PRED MB with
    // nine distinct 4x4 modes — scripts/vp8_probe.py)
    assert(sha(yuv.y) ===
      "0e4516f7a73e1abf5a580bc1f058fe3349a5d70c0afa0fee09baec528f5ebe89")
    assert(sha(yuv.u) ===
      "288e64e65b3f321c5ba1ff3441e9378b29e8246665f5072aa8a75375c23fcbab")
    assert(sha(yuv.v) ===
      "e3774cc65e3cdf007774e315caea777667dfa29ec5cf43ec8fc920dca6b7e65b")
  }

  test("full lossy decode composes VP8 color with the ALPH alpha plane") {
    val r = WebpCodec.decode(pythonWebp)
    assert(r.width === 16 && r.height === 16 && r.channels === 4)
    assert(sha(r.pixels) ===
      "001e5a99a8792550bb18219d810ac66543d8c5f2d60d695002fc886220291df2")
    // alpha channel is the ALPH plane, not a constant fill
    val alphas = r.pixels.indices.collect {
      case i if i % 4 == 3 => r.pixels(i) & 0xff
    }
    assert(alphas.distinct.length > 1)
  }

  test("fixture encoder round-trips: closed-form flat levels, chroma 128") {
    for (id <- 0L until 8L; q <- Seq(0, 20, 60, 100, 127)) {
      val w = ((id % 6).toInt + 2) * 16
      val payload = Vp8Codec.encodeLossy(id, w, 16, q)
      val yuv = Vp8Codec.decodeToYuv(payload, 0, payload.length)
      assert(yuv.width === w && yuv.height === 16)
      val levels = Vp8Codec.lossyLevels(id, w / 16, q)
      for (mb <- 0 until w / 16; r <- 0 until 16; c <- 0 until 16)
        assert((yuv.y(r * w + mb * 16 + c) & 0xff) === levels(mb),
          s"id=$id q=$q mb=$mb ($r,$c)")
      assert(yuv.u.forall(b => (b & 0xff) == 128))
      assert(yuv.v.forall(b => (b & 0xff) == 128))
    }
  }

  test("REAL libwebp decodes our encoder's streams to the same planes") {
    // WebPDecodeYUV hashes of encodeLossyWebp(id, w, 16) at q=100,
    // captured via scripts/vp8_probe.py — pinning that our default
    // tables + bool encoder emit streams the reference implementation
    // reads identically (and that our decoder agrees with it).
    val expect = Map(
      (1L, 32) -> "37e8d2e00a418351476f51c33f2c8ef005eb459aa62c65186a3aea8833e8e12a",
      (2L, 64) -> "54f4704a3978b05066c0be7076b15a1feaa0d07d6e86838be7da72846f7b4ca8",
      (3L, 96) -> "c9711057e30f007dd0ece32802bd7d9a35e3030913cba89087c63edc1fcfe5a1")
    for (((id, w), h) <- expect) {
      val bytes = WebpCodec.encodeLossyWebp(id, w, 16)
      val (_, off, sz) = WebpCodec.chunks(bytes).find(_._1 == "VP8 ").get
      val yuv = Vp8Codec.decodeToYuv(bytes, off, sz)
      assert(sha(yuv.y) === h, s"id=$id")
    }
  }

  // Two REAL-libwebp-ENCODED multi-MB test cards (WebPEncodeRGB over a
  // deterministic synthetic card: RGB gradients + 8px checker + a
  // diagonal edge): 48x32 at q=50 (6 MB rows/cols, active loop
  // filter, mixed 16x16/B_PRED modes) and 33x17 at q=80 (odd dims —
  // the crop paths). Hashes are WebPDecodeYUV ground truth.
  private val card48B64 =
    """UklGRowBAABXRUJQVlA4IIABAABQCwCdASowACAAPtFgpE6oJaMiKrgKAQAaCWwAnTKEc++b/iN7
      |AlE6YgQKEtVxnUAc9l7DP6of4y2hUZajy524aEzoNh0HNSKtsx4WO1OZEbjr5/Pf/KBTZ9Y0aBt/
      |2jvTzYAA/du8v4tY0Rsn7ItJwwAG6IRETlaA2RZYrr/7SoZunkU0UTNQbHEmjz5gJNaI00SagWfM
      |MsOe3fAb7siPrNcqymdr1Ej62YBUuU2bTBokrJ3fMBedZzvDkm7CO8nWvPFtQtyeEz4T/uajzjLr
      |LAD//6DlctucJk7o6ZhHQdPkCLZ+oq50sEr/8mPRTcnD/P/NY6hRalSK0oeSju985vI64Gd6uqIJ
      |MDVFYBFMSDOf22i06HFYB2bG5en3ug43viOoK1ANuHUFPsMXc9MQQHwAPMP24qiz57hPaRLIZIh2
      |xiDGmbHV5LvegpZR8ohNjtL9dau2ECiB/4PJ3tKvbgF52x8/uoe4doOnlWahymx1lVWOVTJU2M0y
      |knzDsAA=""".stripMargin.replaceAll("\\s", "")

  private val card33B64 =
    """UklGRmQBAABXRUJQVlA4IFgBAABwCwCdASohABEAPm0wkkakIyGhJW5ggA2JbACdMoRzt5n+Ff5M
      |/IJRP6xi2/QD2AfwD1ALdA/qvVM74B+qvpK/rN8Hf6k/zOxZqCXnQAk9jvmL3nfdCXGEh4YJ/6HX
      |47hviLgAAP7HX/x3+XJCVZxGPf528wNAxcHQelfvptm2EkF86h0b/hsMtnpaV/EzVocoVhfQnJHU
      |5qhcik5qMSlFAwhdG/HU5YAJ/8GHsyHPXD7BrmZAk2bjWMRVk5H1EwatGZwPpTm3T0J+6JBxXiNV
      |oZc5+8jDUv+9ZcVuVBqZjvRGPChdmpWxdf9b5w/n/vfAys/4WUgwOoHPis5VEm11ZQgFC/omfXVa
      |Mn5+Gb5to3v07s70Go1+XMMHXUrhR0GI6B0p3ouchdwOlO9FzkGqM2N5eGH3+alBHdzUOE2/VuPZ
      |Bvn7KTZIUEp16RJ91LmVw+fmbMbAAA==""".stripMargin.replaceAll("\\s", "")

  test("real libwebp-ENCODED multi-MB test cards decode byte-exact (incl. odd dims)") {
    val cases = Seq(
      (card48B64, 48, 32,
        "c5983ed407be26bec68c89b7b705606f2f1c6e949064cadac8f0e76c2ae53732",
        "c71ac317aa2de8995bd0b51d2c92fbac1aee099fa37a5d4b871c0edb55679bf7",
        "6732aea6d825de3cbf42bc9b3aee81142e32993c99c1a0ae720af568aced4e1d"),
      (card33B64, 33, 17,
        "2936f7c41a21808510d34dd60a877f5c0e9aa4c7d7997ef3ca758682b1b90dc8",
        "1d7da19d0d2de3005f8f3c394b2a649cc4cd4d02ca2f89a67300d99ca3b416a4",
        "5519af60a4a09cf5e34b1bee1ea1d8a20d41851e7b407529a22e4e42b361c615"))
    for ((b64, w, h, ey, eu, ev) <- cases) {
      val bytes = java.util.Base64.getDecoder.decode(b64)
      val (_, off, sz) = WebpCodec.chunks(bytes).find(_._1 == "VP8 ").get
      val yuv = Vp8Codec.decodeToYuv(bytes, off, sz)
      assert(yuv.width === w && yuv.height === h)
      assert(sha(yuv.y) === ey, s"${w}x$h Y")
      assert(sha(yuv.u) === eu, s"${w}x$h U")
      assert(sha(yuv.v) === ev, s"${w}x$h V")
    }
  }

  test("lossy WebP through the container surface: meta, dims, aHash, RGB") {
    val bytes = WebpCodec.encodeLossyWebp(5L, 48, 16)
    val m = WebpCodec.parseMeta(bytes)
    assert(m.format === "vp8" && m.width === 48 && m.height === 16)
    assert(graft.operators.Multimodal.parseDims(bytes) === ("webp", 48, 16))
    val r = WebpCodec.decode(bytes)
    assert(r.channels === 4)
    // gray flat MBs: R == G == B == the closed-form level, alpha 255
    val levels = Vp8Codec.lossyLevels(5L, 3)
    for (mb <- 0 until 3; x <- 0 until 16) {
      val i = (8 * 48 + mb * 16 + x) * 4
      assert((r.pixels(i) & 0xff) === levels(mb))
      assert(r.pixels(i) === r.pixels(i + 1) && r.pixels(i) === r.pixels(i + 2))
      assert((r.pixels(i + 3) & 0xff) === 255)
    }
    assert(graft.operators.Multimodal.aHashAny(bytes) != null)
  }

  test("animated frames may be lossy: ANMF with an embedded VP8 payload") {
    val payload = Vp8Codec.encodeLossy(4L, 32, 16)
    val body = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def chunk(cc: String, p: Array[Byte]): Unit = {
      body ++= cc.getBytes("US-ASCII")
      val sz = p.length
      body += (sz & 0xff).toByte
      body += ((sz >> 8) & 0xff).toByte
      body += ((sz >> 16) & 0xff).toByte
      body += ((sz >> 24) & 0xff).toByte
      body ++= p
      if ((sz & 1) == 1) body += 0
    }
    val vp8x = Array[Byte](0x02, 0, 0, 0, 31, 0, 0, 15, 0, 0)
    chunk("VP8X", vp8x)
    chunk("ANIM", Array[Byte](0, 0, 0, -1, 1, 0))
    val anmf = new Array[Byte](16 + 8 + payload.length + (payload.length & 1))
    // 16-byte ANMF header: x/y 0, dims-1, duration, flags — then VP8
    anmf(6) = 31; anmf(9) = 15; anmf(12) = 40
    "VP8 ".getBytes("US-ASCII").copyToArray(anmf, 16)
    anmf(20) = (payload.length & 0xff).toByte
    anmf(21) = ((payload.length >> 8) & 0xff).toByte
    anmf(22) = ((payload.length >> 16) & 0xff).toByte
    payload.copyToArray(anmf, 24)
    chunk("ANMF", anmf)
    val file = new Array[Byte](12 + body.length)
    "RIFF".getBytes("US-ASCII").copyToArray(file, 0)
    val riffSz = 4 + body.length
    file(4) = (riffSz & 0xff).toByte
    file(5) = ((riffSz >> 8) & 0xff).toByte
    file(6) = ((riffSz >> 16) & 0xff).toByte
    file(7) = ((riffSz >> 24) & 0xff).toByte
    "WEBP".getBytes("US-ASCII").copyToArray(file, 8)
    body.copyToArray(file, 12)

    val meta = WebpCodec.parseMeta(file)
    assert(meta.hasAnim && meta.nFrames === 1)
    val frame = WebpCodec.decodeAnimFrame(file, 0)
    val levels = Vp8Codec.lossyLevels(4L, 2)
    assert(frame.width === 32 && frame.height === 16 && frame.channels === 3)
    assert((frame.pixels(0) & 0xff) === levels(0))
    assert((frame.pixels(16 * 3) & 0xff) === levels(1))
  }

  test("loud contracts: interframe, bad sync, truncation, encoder bounds") {
    val good = Vp8Codec.encodeLossy(1L, 32, 16)
    val inter = good.clone(); inter(0) = (inter(0) | 1).toByte
    val exI = intercept[IllegalArgumentException] {
      Vp8Codec.decodeToYuv(inter, 0, inter.length)
    }
    assert(exI.getMessage.contains("keyframe"))
    val badSync = good.clone(); badSync(3) = 0x42
    intercept[IllegalArgumentException] {
      Vp8Codec.decodeToYuv(badSync, 0, badSync.length)
    }
    intercept[IllegalArgumentException] {
      Vp8Codec.decodeToYuv(good, 0, 6) // too short
    }
    // first-partition size overrunning the payload
    intercept[IllegalArgumentException] {
      Vp8Codec.decodeToYuv(good, 0, 12)
    }
    intercept[IllegalArgumentException] {
      Vp8Codec.encodeLossy(1L, 32, 32) // one MB row only
    }
    intercept[IllegalArgumentException] {
      Vp8Codec.encodeLossy(1L, 24, 16) // width not a MB multiple
    }
    intercept[IllegalArgumentException] {
      Vp8Codec.encodeLossy(1L, 32, 16, q = 128)
    }
  }
}
