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

  test("extractFeatures: per-partition batch decode with stable fake decoder") {
    val m = Multimodal.withMediaColumn(docs, "doc_id", "text", Seq("lang"))
    val f = Multimodal.extractFeatures(m).collect().map(x => x.mediaId -> x).toMap
    assert(f(1L).byteLen == 11L)
    assert(f(1L).headByte == 'h'.toInt)
    assert(f(1L).width == 12 && f(1L).height == ('h'.toInt % 480) + 1)
    assert(f(3L).byteLen == 0L && f(3L).headByte == -1 && f(3L).width == 0)
  }

  test("extractFeatures is partition-invariant") {
    val m = Multimodal.withMediaColumn(docs, "doc_id", "text", Seq("lang"))
    val one = Multimodal.extractFeatures(m.repartition(1)).collect().sortBy(_.mediaId).toSeq
    val many = Multimodal.extractFeatures(m.repartition(3)).collect().sortBy(_.mediaId).toSeq
    assert(one == many)
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

  test("sampleFrames explodes one row per stride offset") {
    val m = Multimodal.withMediaColumn(docs.where(col("doc_id") === 1), "doc_id", "text", Seq("lang"))
    // 11 bytes, stride 4 → offsets 0,4,8
    val frames = Multimodal.sampleFrames(m, 4).collect().map(_.getInt(1))
    assert(frames.toSeq == Seq(0, 4, 8))
  }
}
