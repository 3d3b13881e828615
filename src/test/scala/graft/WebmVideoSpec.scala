package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{EbmlMeta, Multimodal, PngCodec, Vp8Codec, WebmVideo}

/** VP8 video keyframe decode through both containers (WebM/Matroska
  * and IVF): mux/demux roundtrips, pixel exactness against the
  * closed-form [[Vp8Codec.lossyLevels]], keyframe-subsequence
  * sampling, container cross-checks, loud-failure contracts, the
  * Spark operators, and a mutation soak (demux+decode must throw
  * IllegalArgumentException or succeed — never hang, never leak an
  * index error). */
class WebmVideoSpec extends SparkSpec {

  private def keyframes(id: Long, nf: Int, w: Int): Seq[(Long, Array[Byte])] =
    (0 until nf).map(f => (f * 200L, Vp8Codec.encodeLossy(id * 131L + f, w, 16)))

  private def withStubs(frames: Seq[(Long, Array[Byte])]): Seq[(Long, Array[Byte])] =
    frames.flatMap { case (pts, b) =>
      Seq((pts, b), (pts + 100L, WebmVideo.interframeStub()))
    }.dropRight(1)

  /** Byte offset where the Segment element starts (end of the EBML
    * header element). */
  private def segmentAt(webm: Array[Byte]): Int =
    webm.indexOfSlice(Seq(0x18, 0x53, 0x80, 0x67).map(_.toByte))

  test("webm mux/demux roundtrip preserves pts, keyframe flags, payloads") {
    val frames = withStubs(keyframes(7L, 3, 64))
    val bytes = WebmVideo.muxWebm(frames, 64, 16, 600L, framesPerCluster = 2)
    val got = WebmVideo.demuxWebm(bytes)
    assert(got.length == frames.length)
    frames.zip(got).foreach { case ((pts, payload), f) =>
      assert(f.ptsMs == pts)
      assert(f.keyframe == ((payload(0) & 1) == 0))
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(bytes, f.off, f.off + f.len), payload))
    }
    assert(got.count(_.keyframe) == 3)
  }

  test("ivf mux/demux roundtrip preserves pts, keyframe flags, payloads") {
    val frames = withStubs(keyframes(8L, 4, 48))
    val bytes = WebmVideo.muxIvf(frames, 48, 16)
    val got = WebmVideo.demuxIvf(bytes)
    assert(got.length == frames.length)
    frames.zip(got).foreach { case ((pts, payload), f) =>
      assert(f.ptsMs == pts)
      assert(f.keyframe == ((payload(0) & 1) == 0))
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(bytes, f.off, f.off + f.len), payload))
    }
  }

  test("decoded keyframe pixels match the closed-form lossyLevels in both containers") {
    for (id <- Seq(3L, 10L); nf = 3; w = 80) {
      val frames = keyframes(id, nf, w)
      for (bytes <- Seq(
          WebmVideo.muxWebm(frames, w, 16, nf * 200L),
          WebmVideo.muxIvf(frames, w, 16))) {
        val decoded = WebmVideo.decodeKeyframes(bytes).toSeq
        assert(decoded.map(_._1) == (0 until nf))
        decoded.foreach { case (f, pts, r) =>
          assert(pts == f * 200L)
          assert(r.width == w && r.height == 16 && r.channels == 3)
          val want = Vp8Codec.lossyLevels(id * 131L + f, w / 16)
          (0 until w / 16).foreach { mb =>
            val lvl = want(mb)
            for (y <- 0 until 16; x <- 0 until 16; c <- 0 until 3)
              assert((r.pixels(((y * w) + mb * 16 + x) * 3 + c) & 0xff) == lvl,
                s"id=$id frame=$f mb=$mb ($x,$y,$c)")
          }
        }
      }
    }
  }

  test("EbmlMeta.parse reads the muxed WebM's dims, duration, track census") {
    val bytes = WebmVideo.muxWebm(keyframes(5L, 2, 96), 96, 16, 400L)
    val m = EbmlMeta.parse(bytes)
    assert(m.docType == "webm")
    assert(m.width == 96 && m.height == 16)
    assert(m.nTracks == 1 && m.nVideoTracks == 1)
    assert(m.durationMs == 400L)
  }

  test("keyframe stride sampling decodes exactly every Nth keyframe") {
    val frames = withStubs(keyframes(9L, 5, 32))
    val bytes = WebmVideo.muxWebm(frames, 32, 16, 1000L)
    val got = WebmVideo.decodeKeyframes(bytes, everyNth = 2).toSeq
    assert(got.map(_._1) == Seq(0, 2, 4))
    assert(got.map(_._2) == Seq(0L, 400L, 800L))
  }

  test("BlockGroup blocks derive keyframe from ReferenceBlock absence") {
    // Hand-built Segment: Cluster(Timecode=0, BlockGroup(Block),
    // BlockGroup(Block, ReferenceBlock)). Block bodies: track vint 0x81,
    // i16 rel, flags 0, then a VP8 keyframe payload.
    val payload = Vp8Codec.encodeLossy(4L, 16, 16)
    assert(payload.length < 100, "fixture payload grew past 1-byte EBML sizes")
    def block(rel: Int): Array[Byte] = {
      val body = Array[Byte](0x81.toByte, ((rel >> 8) & 0xff).toByte,
        (rel & 0xff).toByte, 0x00) ++ payload
      Array[Byte](0xA1.toByte, (0x80 | body.length).toByte) ++ body
    }
    val bg1 = {
      val body = block(0)
      Array[Byte](0xA0.toByte, (0x80 | body.length).toByte) ++ body
    }
    val bg2 = {
      val body = block(200) ++ Array[Byte](0xFB.toByte, 0x81.toByte, 0x7f)
      Array[Byte](0xA0.toByte, (0x80 | body.length).toByte) ++ body
    }
    val clusterBody = Array[Byte](0xE7.toByte, 0x81.toByte, 0x00) ++ bg1 ++ bg2
    val cluster = Array[Byte](0x1F.toByte, 0x43.toByte, 0xB6.toByte, 0x75.toByte,
      (0x80 | clusterBody.length).toByte) ++ clusterBody
    val donor = WebmVideo.muxWebm(keyframes(4L, 1, 16), 16, 16, 200L)
    val seg = Array[Byte](0x18, 0x53.toByte, 0x80.toByte, 0x67,
      (0x80 | cluster.length).toByte) ++ cluster
    val bytes = java.util.Arrays.copyOfRange(donor, 0, segmentAt(donor)) ++ seg
    val got = WebmVideo.demuxWebm(bytes)
    assert(got.length == 2)
    assert(got(0).keyframe && got(0).ptsMs == 0L)
    assert(!got(1).keyframe && got(1).ptsMs == 200L)
  }

  test("lacing, truncation, bad fourcc, flag/payload mismatch fail loudly") {
    val frames = keyframes(6L, 2, 32)
    val webm = WebmVideo.muxWebm(frames, 32, 16, 400L)
    val ivf = WebmVideo.muxIvf(frames, 32, 16)

    // lacing bits set in a SimpleBlock flags byte (flags sits right
    // before the frame data window)
    val laced = webm.clone()
    val firstBlock = WebmVideo.demuxWebm(webm)(0)
    laced(firstBlock.off - 1) = (laced(firstBlock.off - 1) | 0x02).toByte
    intercept[IllegalArgumentException](WebmVideo.demuxWebm(laced))

    // truncations
    intercept[IllegalArgumentException](
      WebmVideo.demuxIvf(java.util.Arrays.copyOfRange(ivf, 0, 20)))
    intercept[IllegalArgumentException](
      WebmVideo.demux(java.util.Arrays.copyOfRange(webm, 0, 8)))

    // wrong fourcc
    val vp9 = ivf.clone(); vp9(11) = '9'.toByte
    intercept[IllegalArgumentException](WebmVideo.demuxIvf(vp9))

    // SimpleBlock keyframe flag set on an interframe payload: the
    // decode cross-check must refuse (IVF can't express the mismatch —
    // its flag IS the tag bit — so build it in WebM)
    val body = Array[Byte](0x81.toByte, 0, 0, 0x80.toByte) ++ WebmVideo.interframeStub()
    val sb = Array[Byte](0xA3.toByte, (0x80 | body.length).toByte) ++ body
    val clusterBody = Array[Byte](0xE7.toByte, 0x81.toByte, 0x00) ++ sb
    val cluster = Array[Byte](0x1F.toByte, 0x43.toByte, 0xB6.toByte, 0x75.toByte,
      (0x80 | clusterBody.length).toByte) ++ clusterBody
    val seg = Array[Byte](0x18, 0x53.toByte, 0x80.toByte, 0x67,
      (0x80 | cluster.length).toByte) ++ cluster
    val lying = java.util.Arrays.copyOfRange(webm, 0, segmentAt(webm)) ++ seg
    intercept[IllegalArgumentException](
      WebmVideo.decodeKeyframes(lying).foreach(_ => ()))

    // non-video payload
    intercept[IllegalArgumentException](WebmVideo.demux("hello".getBytes))
  }

  test("operators: encodeVp8Video + videoKeyframeFeatures match the closed form") {
    val s = spark
    import s.implicits._
    val spec = Seq((2L, 3, 64), (3L, 2, 32)).toDF("id", "nf", "w")
    val media = Multimodal.encodeVp8Video(spec, "id", "nf", "w",
      withInterframes = true)
    val got = Multimodal.videoKeyframeFeatures(media).collect()
      .sortBy(f => (f.mediaId, f.frameIdx))
    assert(got.map(f => (f.mediaId, f.frameIdx)).toSeq ==
      Seq((2L, 0), (2L, 1), (2L, 2), (3L, 0), (3L, 1)))
    got.foreach { f =>
      assert(f.format == (if (f.mediaId % 2 == 0) "webm" else "ivf"))
      assert(f.ptsMs == f.frameIdx * 200L)
      assert(f.height == 16 && f.width == f.nMb * 16)
      val levels = Vp8Codec.lossyLevels(f.mediaId * 131L + f.frameIdx, f.nMb)
      assert(f.meanLuma == levels.sum / levels.length)
      // the hash joins the image tier's space: recompute aHashRaster on
      // an independently-built flat-MB raster from the closed form
      val px = new Array[Byte](f.width * 16 * 3)
      for (mb <- 0 until f.nMb; y <- 0 until 16; x <- 0 until 16; c <- 0 until 3)
        px(((y * f.width) + mb * 16 + x) * 3 + c) = levels(mb).toByte
      assert(f.ahash == Multimodal.aHashRaster(PngCodec.Raster(f.width, 16, 3, px)))
    }
  }

  test("operators: everyNth sampling decodes only the sampled keyframes") {
    val s = spark
    import s.implicits._
    val spec = Seq((4L, 5, 48)).toDF("id", "nf", "w")
    val media = Multimodal.encodeVp8Video(spec, "id", "nf", "w",
      withInterframes = true)
    val got = Multimodal.videoKeyframeFeatures(media, everyNth = 2)
      .collect().sortBy(_.frameIdx)
    assert(got.map(_.frameIdx).toSeq == Seq(0, 2, 4))
    assert(got.map(_.ptsMs).toSeq == Seq(0L, 400L, 800L))
  }

  test("operators: videoDupPairs pairs identical content ACROSS containers") {
    val s = spark
    import s.implicits._
    // ids 6 (webm) and 7 (ivf) share seed 1 → pixel-identical videos in
    // different containers; id 8 (seed 2) matches nobody.
    val spec = Seq((6L, 1L, 3, 48), (7L, 1L, 3, 48), (8L, 2L, 3, 48))
      .toDF("id", "seed", "nf", "w")
    val media = Multimodal.encodeVp8Video(spec, "id", "nf", "w",
      withInterframes = true, seedCol = "seed")
    val fmts = Multimodal.videoKeyframeFeatures(media).collect()
      .groupBy(_.mediaId).map { case (k, v) => k -> v.head.format }
    assert(fmts == Map(6L -> "webm", 7L -> "ivf", 8L -> "webm"))
    val pairs = Multimodal.videoDupPairs(Multimodal.videoKeyframeFeatures(media))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((6L, 7L, 3L)))
  }

  test("operators: videoDupClusters agrees with the pair path's connected components") {
    val s = spark
    import s.implicits._
    // seeds: 1 shared by ids 10,11,13; 2 by 12,14; 3 unique to 15
    val spec = Seq((10L, 1L), (11L, 1L), (13L, 1L), (12L, 2L), (14L, 2L), (15L, 3L))
      .map { case (id, sd) => (id, sd, 3, 48) }.toDF("id", "seed", "nf", "w")
    val media = Multimodal.encodeVp8Video(spec, "id", "nf", "w", seedCol = "seed")
    val kf = Multimodal.videoKeyframeFeatures(media)
    val clusters = Multimodal.videoDupClusters(kf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(clusters.toSeq == Seq((10L, 10L), (11L, 10L), (12L, 12L),
      (13L, 10L), (14L, 12L)))
    // pair path emits the same relations, quadratically
    val pairs = Multimodal.videoDupPairs(kf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(pairs.toSeq == Seq((10L, 11L), (10L, 13L), (11L, 13L), (12L, 14L)))
  }

  test("mutation soak: demux+decode throws IllegalArgumentException or succeeds") {
    val frames = withStubs(keyframes(11L, 3, 48))
    for ((bytes, tag) <- Seq(
        (WebmVideo.muxWebm(frames, 48, 16, 600L), "webm"),
        (WebmVideo.muxIvf(frames, 48, 16), "ivf"))) {
      val rnd = new scala.util.Random(0xC0DEC + tag.hashCode)
      var i = 0
      while (i < 3000) {
        val m = bytes.clone()
        val flips = 1 + rnd.nextInt(3)
        var j = 0
        while (j < flips) {
          val p = rnd.nextInt(m.length)
          m(p) = (m(p) ^ (1 << rnd.nextInt(8))).toByte
          j += 1
        }
        try {
          val it = WebmVideo.decodeKeyframes(m)
          while (it.hasNext) it.next()
        } catch {
          case _: IllegalArgumentException => ()
        }
        i += 1
      }
    }
  }
}
