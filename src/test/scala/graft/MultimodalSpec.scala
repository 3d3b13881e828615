package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "hello world", "en"),
    (2L, "bonjour", "fr"),
    (3L, "", "en")).toDF("doc_id", "text", "lang")

  test("withMediaColumn builds the binary + metadata schema") {
    val m = Multimodal.withMediaColumn(docs, "doc_id", "text", Seq("lang"))
    assert(m.schema("data").dataType == BinaryType)
    assert(m.schema("meta").dataType.isInstanceOf[StructType])
    assert(m.count() == 3)
  }

  test("parseDims reads golden BMP header bytes (hand-written, little-endian)") {
    // 54-byte header for a 3x2 bitmap, written out field by field from
    // the public BITMAPINFOHEADER layout — pins offsets + endianness
    // independently of the encoder.
    val golden: Array[Byte] = (Array(
      0x42, 0x4d,             // "BM"
      0x4e, 0x00, 0x00, 0x00, // file size 78 = 54 + 12*2
      0x00, 0x00, 0x00, 0x00,
      0x36, 0x00, 0x00, 0x00, // pixel offset 54
      0x28, 0x00, 0x00, 0x00, // header size 40
      0x03, 0x00, 0x00, 0x00, // width 3
      0x02, 0x00, 0x00, 0x00, // height 2
      0x01, 0x00, 0x18, 0x00) ++ Array.fill(26)(0)).map(_.toByte)
    assert(Multimodal.parseDims(golden) == (("bmp", 3, 2)))
  }

  test("parseDims reads golden PNG IHDR bytes (big-endian)") {
    val golden: Array[Byte] = (Array(
      0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, // signature
      0x00, 0x00, 0x00, 0x0d,                         // IHDR length 13
      0x49, 0x48, 0x44, 0x52,                         // "IHDR"
      0x00, 0x00, 0x01, 0x00,                         // width 256
      0x00, 0x00, 0x00, 0x78)).map(_.toByte)          // height 120
    assert(Multimodal.parseDims(golden) == (("png", 256, 120)))
    assert(Multimodal.parseDims("not an image".getBytes) == (("unknown", 0, 0)))
    assert(Multimodal.parseDims(null) == (("unknown", 0, 0)))
  }

  test("encodeBmp → parseDims round-trips real bytes at spec size") {
    val bytes = Multimodal.encodeBmp(7L, width = 5, height = 3)
    // rowSize(5) = 16 (3*5=15 padded to 4-byte boundary)
    assert(bytes.length == 54 + 16 * 3)
    assert(Multimodal.parseDims(bytes) == (("bmp", 5, 3)))
  }

  test("encodeBmpFrame + extractFeatures: distributed encode/parse round-trip") {
    val dims = Seq((1L, 3, 2), (2L, 64, 48), (3L, 1, 1)).toDF("id", "w", "h")
    val media = Multimodal.encodeBmpFrame(dims, "id", "w", "h")
    val f = Multimodal.extractFeatures(media).collect().map(x => x.mediaId -> x).toMap
    assert(f(1L).format == "bmp" && f(1L).width == 3 && f(1L).height == 2)
    assert(f(2L).width == 64 && f(2L).height == 48)
    assert(f(2L).byteLen == 54L + Multimodal.bmpRowSize(64) * 48)
    assert(f(3L).width == 1 && f(3L).height == 1)
  }

  test("extractFeatures is partition-invariant") {
    val dims = Seq((1L, 3, 2), (2L, 10, 4), (3L, 2, 2)).toDF("id", "w", "h")
    def feats(n: Int) = Multimodal.extractFeatures(
      Multimodal.encodeBmpFrame(dims.repartition(n), "id", "w", "h"))
      .collect().sortBy(_.mediaId).toSeq
    assert(feats(1) == feats(3))
  }

  test("resizeStub shrinks payloads proportionally, row-locally") {
    import graft.operators.Multimodal
    val media = Multimodal.withMediaColumn(
      Seq((1L, "abcdefghij"), (2L, "xy")).toDF("id", "payload"), "id", "payload", Nil)
    val out = Multimodal.resizeStub(media, 50)
      .select(col("media_id"), length(col("data")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(1L) == 5 && out(2L) == 1)
  }

  test("resizeBmp24: 50% of a 4x4 keeps exactly the even-indexed source pixels") {
    val src = Multimodal.encodeBmp(7L, 4, 4)
    val out = Multimodal.resizeBmp24(src, 50)
    val (fmt, w, h) = Multimodal.parseDims(out)
    assert((fmt, w, h) == ("bmp", 2, 2))
    assert(out.length == 54 + Multimodal.bmpRowSize(2) * 2)
    // nearest-neighbor with nw=w/2: dst(x,y) = src(2x,2y); strides pad to 4
    val srcStride = Multimodal.bmpRowSize(4)
    val dstStride = Multimodal.bmpRowSize(2)
    for (y <- 0 until 2; x <- 0 until 2; c <- 0 until 3) {
      val d = out(54 + y * dstStride + x * 3 + c)
      val s = src(54 + (2 * y) * srcStride + (2 * x) * 3 + c)
      assert(d == s, s"pixel ($x,$y) channel $c")
    }
  }

  test("resizeBmp24: dims floor to at least 1; upscale also works") {
    val tiny = Multimodal.resizeBmp24(Multimodal.encodeBmp(1L, 3, 5), 10)
    assert(Multimodal.parseDims(tiny) == (("bmp", 1, 1)))
    val up = Multimodal.resizeBmp24(Multimodal.encodeBmp(1L, 2, 2), 200)
    assert(Multimodal.parseDims(up) == (("bmp", 4, 4)))
    // non-BMP payloads are rejected loudly, not resized wrongly
    val e = intercept[IllegalArgumentException] {
      Multimodal.resizeBmp24("notabmp".getBytes, 50)
    }
    assert(e.getMessage.contains("BMP"))
  }

  test("resizeBmpFrame resizes payloads row-locally across partitions") {
    val dims = Seq((1L, 8, 6), (2L, 31, 17), (3L, 1, 1)).toDF("id", "w", "h")
    val media = Multimodal.encodeBmpFrame(dims, "id", "w", "h").repartition(3)
    val got = Multimodal.extractFeatures(Multimodal.resizeBmpFrame(media, 50))
      .collect().map(f => f.mediaId -> ((f.width, f.height, f.byteLen))).toMap
    assert(got(1L) == ((4, 3, 54 + Multimodal.bmpRowSize(4) * 3)))
    assert(got(2L) == ((15, 8, 54 + Multimodal.bmpRowSize(15) * 8)))
    assert(got(3L) == ((1, 1, 54 + Multimodal.bmpRowSize(1) * 1)))
  }

  test("sampleFrames explodes one row per stride offset") {
    val m = Multimodal.withMediaColumn(docs.where(col("doc_id") === 1), "doc_id", "text", Seq("lang"))
    // 11 bytes, stride 4 → offsets 0,4,8
    val frames = Multimodal.sampleFrames(m, 4).collect().map(_.getInt(1))
    assert(frames.toSeq == Seq(0, 4, 8))
  }
}
