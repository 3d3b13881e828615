package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Av1Meta

/** The AV1 metadata parser against the REAL system libaom (an
  * independent encoder driven via scripts/av1_oracle.py), plus hand
  * vectors and writer round-trips for the gate machinery. */
class Av1MetaSpec extends AnyFunSuite {

  private def oracleAvailable: Boolean =
    new java.io.File("/lib/x86_64-linux-gnu/libaom.so.3").exists() &&
      new java.io.File("/root/repo/scripts/av1_oracle.py").exists()

  private def aom(res: String, keyint: Int, frames: Int)
      : (Array[Byte], Seq[(Long, Boolean)], Int, Int) = {
    val pb = new ProcessBuilder("python3", "/root/repo/scripts/av1_oracle.py",
      res, keyint.toString, frames.toString)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val err = new String(p.getErrorStream.readAllBytes(), "UTF-8")
    assert(p.waitFor() == 0, s"oracle failed: $err")
    def intField(k: String): Int =
      s""""$k":\\s*(\\d+)""".r.findFirstMatchIn(out).get.group(1).toInt
    val b64 = """"stream_b64":\s*"([A-Za-z0-9+/=]*)"""".r
      .findFirstMatchIn(out).get.group(1)
    val pkts = """\[(\d+),\s*(\d+)\]""".r.findAllMatchIn(out)
      .map(m => (m.group(1).toLong, m.group(2) == "1")).toSeq
    (java.util.Base64.getDecoder.decode(b64), pkts,
      intField("w"), intField("h"))
  }

  test("OBU walk: header fields, leb128 sizes, loud on junk") {
    val s = Av1Meta.writeStream(64, 48, nFrames = 5, keyint = 2, seed = 7L)
    val os = Av1Meta.obus(s)
    // TD + seq + frame, then TD + frame per remaining frame
    assert(os.map(_.obuType) == Vector(2, 1, 6, 2, 6, 2, 6, 2, 6, 2, 6))
    assert(os.count(_.obuType == Av1Meta.ObuTemporalDelimiter) == 5)
    assert(os.forall(o => o.temporalId == 0 && o.spatialId == 0))
    intercept[IllegalArgumentException](
      Av1Meta.census("definitely not an AV1 stream".getBytes("UTF-8")))
    intercept[IllegalArgumentException](
      Av1Meta.obus(Array[Byte](0x80.toByte))) // forbidden bit
  }

  test("writeSequenceHeader → parse recovers geometry, level, superblock") {
    for ((w, h, lv, sb) <- Seq((64, 48, 8, false), (100, 62, 12, true),
      (1920, 1080, 0, false), (1, 1, 31, false))) {
      val p = Av1Meta.writeSequenceHeader(w, h, lv, sb)
      val sh = Av1Meta.parseSequenceHeader(p, 0, p.length)
      assert(sh.maxWidth == w && sh.maxHeight == h, s"${w}x$h")
      assert(sh.levelIdx == lv && sh.use128x128Superblock == sb)
      assert(sh.profile == 0 && sh.bitDepth == 8 && !sh.monochrome)
      assert(sh.subsamplingX == 1 && sh.subsamplingY == 1)
      assert(sh.superblockSize == (if (sb) 128 else 64))
    }
  }

  test("writeStream → census replays exactly from (w, h, frames, keyint)") {
    for ((w, h, nf, ki) <- Seq((64, 48, 7, 3), (320, 130, 12, 4), (96, 64, 1, 1))) {
      val c = Av1Meta.census(Av1Meta.writeStream(w, h, nf, ki, seed = w * 7L + nf))
      assert(c.width == w && c.height == h)
      assert(c.nFrames == nf && c.nTemporalUnits == nf)
      assert(c.nKeyframes == (nf + ki - 1) / ki)
      assert(c.nIntraOnly == 0 && c.nShownExisting == 0)
      assert(c.nSeqHeaders == 1 && c.profile == 0 && c.levelIdx == 8)
      assert(c.bitDepth == 8 && !c.monochrome && c.superblock == 64)
    }
  }

  test("AV1-in-MP4 end-to-end: av01 dispatch, av1C geometry, sample keyframes") {
    import graft.operators.Mp4Meta
    val n = 8
    val ki = 3
    val av1C = Av1Meta.writeAv1C(width = 100, height = 62, levelIdx = 12)
    val samples = (0 until n).map(f =>
      Av1Meta.writeSample(keyframe = f % ki == 0, seed = 77L + f))
    val syncs = (0 until n).filter(_ % ki == 0).map(_ + 1)
    val mp4 = Mp4Meta.encodeAv1(samples, syncs, av1C, 100, 62)
    val info = Mp4Meta.videoCodecInfo(mp4)
    assert(info.codec == "av01")
    val (cbTag, cbBytes) = info.configBox.get
    assert(cbTag == "av1C")
    val rec = Av1Meta.parseAv1C(cbBytes, 0, cbBytes.length)
    assert(rec.profile == 0 && rec.levelIdx == 12 && rec.bitDepth == 8)
    assert(!rec.monochrome && rec.subsamplingX == 1 && rec.subsamplingY == 1)
    val seq = rec.sequenceHeader.get
    assert(seq.maxWidth == 100 && seq.maxHeight == 62)
    val st = Mp4Meta.sampleTable(mp4)
    assert(st.samples.size == n)
    st.samples.foreach { s =>
      val bytes = java.util.Arrays.copyOfRange(mp4, s.offset.toInt,
        (s.offset + s.size).toInt)
      assert(Av1Meta.sampleIsKeyframe(seq, bytes) == s.keyframe,
        s"sample ${s.index}: stss vs frame_type")
    }
    intercept[IllegalArgumentException](Av1Meta.parseAv1C(cbBytes, 0, 2))
  }

  test("AV1-in-WebM: V_AV1 CodecID, sequence header in CodecPrivate, block flags agree") {
    import graft.operators.WebmVideo
    val n = 7
    val ki = 3
    val seqObu = {
      val s = Av1Meta.writeStream(100, 62, 1, 1, seed = 1L, levelIdx = 12)
      val o = Av1Meta.obus(s).find(_.obuType == Av1Meta.ObuSequenceHeader).get
      // CodecPrivate carries the WHOLE OBU (header + payload)
      java.util.Arrays.copyOfRange(s, o.offset - 2, o.offset + o.length)
    }
    val frames = (0 until n).map { f =>
      val key = f % ki == 0
      (f * 33L, Av1Meta.writeSample(key, 50L + f), key)
    }
    val webm = WebmVideo.muxWebmCoded(frames, "V_AV1", 100, 62, n * 33L,
      codecPrivate = seqObu)
    val (codec, priv) = WebmVideo.trackCodec(webm)
    assert(codec == "V_AV1" && priv != null)
    val seq = {
      val o = Av1Meta.obus(priv).find(_.obuType == Av1Meta.ObuSequenceHeader).get
      Av1Meta.parseSequenceHeader(priv, o.offset, o.length)
    }
    assert(seq.maxWidth == 100 && seq.maxHeight == 62 && seq.levelIdx == 12)
    val demuxed = WebmVideo.demuxWebm(webm)
    assert(demuxed.length == n)
    demuxed.zipWithIndex.foreach { case (fr, i) =>
      val payload = java.util.Arrays.copyOfRange(webm, fr.off, fr.off + fr.len)
      assert(Av1Meta.sampleIsKeyframe(seq, payload) == fr.keyframe,
        s"frame $i: container flag vs frame_type")
      assert(fr.keyframe == (i % ki == 0))
    }
    // the VP8 mux path still works through the generic form
    val vp8 = WebmVideo.trackCodec(WebmVideo.muxWebm(
      Seq((0L, graft.operators.Vp8Codec.encodeLossy(7L, 32, 16))), 32, 16, 33L))
    assert(vp8._1 == "V_VP8" && vp8._2 == null)
  }

  test("census agrees with libaom on keyframes, frames and geometry") {
    assume(oracleAvailable, "libaom/oracle script not present")
    for ((res, ki, nf) <- Seq(("100x62", 4, 9), ("64x48", 3, 8), ("320x130", 25, 5))) {
      val (stream, pkts, w, h) = aom(res, ki, nf)
      val c = Av1Meta.census(stream)
      assert(c.width == w && c.height == h, s"$res geometry")
      assert(c.profile == 0 && c.bitDepth == 8 && !c.monochrome, s"$res coding")
      assert(c.superblock == 64 || c.superblock == 128)
      // the ENCODER's own packet flags are the keyframe ground truth
      assert(pkts.size == nf, s"$res packet count")
      assert(c.nFrames == nf, s"$res frames")
      assert(c.nKeyframes == pkts.count(_._2), s"$res keyframes")
      assert(c.nKeyframes == (nf + ki - 1) / ki, s"$res cadence")
      assert(c.nShownExisting == 0 && c.nSeqHeaders >= 1)
    }
  }

  test("libaom sequence header parses field-for-field") {
    assume(oracleAvailable, "libaom/oracle script not present")
    val (stream, _, _, _) = aom("100x62", 4, 3)
    val seqObu = Av1Meta.obus(stream).find(_.obuType == Av1Meta.ObuSequenceHeader).get
    val sh = Av1Meta.parseSequenceHeader(stream, seqObu.offset, seqObu.length)
    // AV1 carries exact dims — no conformance-window padding like HEVC
    assert(sh.maxWidth == 100 && sh.maxHeight == 62)
    assert(sh.profile == 0 && !sh.stillPicture && !sh.reducedStillPicture)
    assert(sh.bitDepth == 8 && !sh.monochrome)
    assert(sh.subsamplingX == 1 && sh.subsamplingY == 1)
    assert(sh.levelIdx >= 0 && sh.levelIdx <= 31)
  }

  test("mutation fuzz: bit flips and truncations parse or fail loudly") {
    val base = Av1Meta.writeStream(104, 64, 9, 3, seed = 11L)
    val rnd = new scala.util.Random(4321)
    var parsed = 0
    (0 until 500).foreach { i =>
      val mutant: Array[Byte] = (i % 3) match {
        case 0 =>
          val b = base.clone()
          val p = rnd.nextInt(b.length)
          b(p) = (b(p) ^ (1 << rnd.nextInt(8))).toByte
          b
        case 1 =>
          java.util.Arrays.copyOf(base, 1 + rnd.nextInt(base.length - 1))
        case _ =>
          val b = base.clone()
          val p = rnd.nextInt(b.length)
          val n = math.min(b.length - p, 1 + rnd.nextInt(16))
          (0 until n).foreach(k => b(p + k) = rnd.nextInt(256).toByte)
          b
      }
      try { Av1Meta.census(mutant); parsed += 1 }
      catch { case _: IllegalArgumentException => () }
    }
    assert(parsed > 0, "some mutants should still parse (payload-only hits)")
  }
}
