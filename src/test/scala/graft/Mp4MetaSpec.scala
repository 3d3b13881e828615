package graft

import org.apache.spark.sql.functions._

import graft.operators.{Mp4Meta, Multimodal}

class Mp4MetaSpec extends SparkSpec {
  import spark.implicits._

  test("encode → parse round-trips metadata exactly; size is the closed form") {
    val bytes = Mp4Meta.encode(durationMs = 12345L, width = 640, height = 360)
    assert(bytes.length == 240)
    val m = Mp4Meta.parse(bytes)
    assert(m.durationMs == 12345L && m.width == 640 && m.height == 360 && m.nTracks == 1)
    // timescale conversion: 90kHz media timescale, same wall duration
    val hz = Mp4Meta.parse(Mp4Meta.encode(2000L, 320, 240, timescale = 90000))
    assert(hz.durationMs == 2000L)
  }

  test("box walk: unknown boxes skip by size; 64-bit extended sizes parse") {
    val base = Mp4Meta.encode(500L, 100, 50)
    // append an unknown box (free) — parser must ignore it
    val free = Array[Byte](0, 0, 0, 12, 'f', 'r', 'e', 'e', 1, 2, 3, 4)
    assert(Mp4Meta.parse(base ++ free).durationMs == 500L)
    // wrap the same payload bytes of `free` in a 64-bit-size box
    val big = Array[Byte](0, 0, 0, 1, 'f', 'r', 'e', 'e',
      0, 0, 0, 0, 0, 0, 0, 20, 1, 2, 3, 4)
    assert(Mp4Meta.parse(base ++ big).width == 100)
  }

  test("non-MP4 returns null; corrupt structure fails loudly") {
    assert(Mp4Meta.parse("RIFF not an mp4 here".getBytes) == null)
    val bytes = Mp4Meta.encode(100L, 10, 10)
    // corrupt the moov size to overflow the buffer
    val bad = bytes.clone(); bad(24 + 3) = 0x7f.toByte
    intercept[IllegalArgumentException] { Mp4Meta.parse(bad) }
    // ftyp alone (no moov/mvhd) is structurally incomplete
    intercept[IllegalArgumentException] { Mp4Meta.parse(bytes.take(24)) }
  }

  test("valid-sized but layout-short mvhd/tkhd fail loudly, not via AIOOBE") {
    // an mvhd whose declared size (12) is a legal box size for the walk
    // but smaller than the v0 fixed layout the parser must read
    val out = new java.io.ByteArrayOutputStream()
    def be(v: Long, n: Int): Unit =
      for (i <- (n - 1) to 0 by -1) out.write(((v >> (8 * i)) & 0xff).toInt)
    def tagW(s: String): Unit = s.foreach(c => out.write(c.toInt))
    be(16, 4); tagW("ftyp"); tagW("isom"); be(0, 4)
    be(8 + 12, 4); tagW("moov")
    be(12, 4); tagW("mvhd"); be(0, 4) // 4-byte payload: version+flags only
    assert(intercept[IllegalArgumentException] { Mp4Meta.parse(out.toByteArray) }
      .getMessage.contains("truncated mvhd"))
    // tkhd: shrink the encoded box's declared size to 16 — valid for
    // the walk, too small for the version's fixed layout
    val full = Mp4Meta.encode(100L, 10, 10)
    val shrunk = full.clone()
    // layout: ftyp 24 + moov hdr 8 + mvhd 108 + trak hdr 8 → tkhd at 148
    shrunk(148 + 3) = 16
    assert(intercept[IllegalArgumentException] { Mp4Meta.parse(shrunk) }
      .getMessage.contains("truncated tkhd"))
  }

  test("distributed encode → metadata extraction; unknown passthrough; frame sampling composes") {
    val spec = Seq((1L, 1500L, 640, 360), (2L, 900L, 320, 240))
      .toDF("id", "ms", "w", "h")
    val media = Multimodal.encodeMp4Frame(spec, "id", "ms", "w", "h").repartition(2)
    val got = Multimodal.extractVideoMeta(media).collect()
      .map(f => f.mediaId -> f).toMap
    assert(got(1L).format == "mp4" && got(1L).durationMs == 1500L &&
      got(1L).width == 640 && got(1L).height == 360 && got(1L).byteLen == 240)
    assert(got(2L).durationMs == 900L && got(2L).width == 320)
    val mixed = Seq((9L, "no video".getBytes)).toDF("media_id", "data")
    assert(Multimodal.extractVideoMeta(mixed).collect()(0).format == "unknown")
    // the opaque-payload frame sampler runs over mp4 bytes unchanged
    val frames = Multimodal.sampleFrames(media.where(col("media_id") === 1L), 100)
      .collect().map(_.getInt(1))
    assert(frames.toSeq == Seq(0, 100, 200))
  }

  test("sample table: offsets/sizes/dts/keyframes resolve exactly (ragged chunks, RLE stts)") {
    val sizes = Seq(100, 120, 90, 200, 150, 110, 130)        // 7 samples
    val deltas = Seq(33, 33, 33, 40, 40, 33, 33)             // two RLE runs + tail
    val b = Mp4Meta.encodeWithSamples(sizes, deltas, samplesPerChunk = 3,
      syncEvery = 4, timescale = 600)
    val st = Mp4Meta.sampleTable(b)
    assert(st.timescale == 600)
    assert(st.samples.size == 7)
    assert(st.samples.map(_.size.toInt) == sizes.toVector)
    // dts = prefix sums of deltas
    val wantDts = deltas.scanLeft(0L)(_ + _).init
    assert(st.samples.map(_.dts) == wantDts.toVector)
    // keyframes at 1-based 1 and 5 -> 0-based 0 and 4
    assert(st.samples.filter(_.keyframe).map(_.index) == Vector(0, 4))
    // offsets: within a chunk consecutive samples are contiguous; the
    // bytes at each offset are the deterministic mdat pattern
    st.samples.foreach { sm =>
      assert(b((sm.offset + 1).toInt) == (((sm.index * 131) + 1) & 0xff).toByte,
        s"payload at sample ${sm.index}")
    }
    val byChunk = st.samples.grouped(3).toSeq
    byChunk.foreach { chunk =>
      chunk.sliding(2).foreach {
        case Seq(a, c) => assert(c.offset == a.offset + a.size)
        case _ => ()
      }
    }
  }

  test("sample table: co64 offsets, fixed-size stsz, absent stss = all sync") {
    val sizes = Seq.fill(6)(80)
    val b = Mp4Meta.encodeWithSamples(sizes, Seq.fill(6)(25),
      samplesPerChunk = 2, syncEvery = 0, timescale = 1000, use64 = true,
      fixedStsz = true)
    val st = Mp4Meta.sampleTable(b)
    assert(st.samples.size == 6)
    assert(st.samples.forall(_.keyframe))
    assert(st.samples.map(_.size).forall(_ == 80L))
    // bytes at the co64 offsets match the mdat pattern
    st.samples.foreach { sm =>
      assert(b(sm.offset.toInt) == ((sm.index * 131) & 0xff).toByte)
    }
  }

  test("sample table: corrupt tables fail loudly") {
    val good = Mp4Meta.encodeWithSamples(Seq(100, 100), Seq(30, 30), 2, 1)
    // count mismatch: patch stsz sample_count (find 'stsz' and bump count)
    def patch(tag: String, fieldOff: Int, v: Int): Array[Byte] = {
      val b = good.clone()
      val at = new String(b.map(_.toChar)).indexOf(tag)
      assert(at > 0)
      val o = at + 4 + fieldOff
      b(o) = ((v >> 24) & 0xff).toByte; b(o + 1) = ((v >> 16) & 0xff).toByte
      b(o + 2) = ((v >> 8) & 0xff).toByte; b(o + 3) = (v & 0xff).toByte
      b
    }
    intercept[IllegalArgumentException](Mp4Meta.sampleTable(patch("stsz", 8, 57)))
    intercept[IllegalArgumentException](Mp4Meta.sampleTable(patch("stts", 4, 9999999)))
    intercept[IllegalArgumentException](Mp4Meta.sampleTable(
      Mp4Meta.encode(1000, 64, 48))) // no stbl at all
  }
}
