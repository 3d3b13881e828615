package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.operators.{Bzip2, Decompress, Gzip, Xz}

class DecompressSpec extends SparkSpec {
  import spark.implicits._

  private val raw = "the payload text that goes in".getBytes(UTF_8)

  test("sniff: disjoint magics; short and alien payloads are raw") {
    assert(Decompress.sniff(Gzip.gzip(raw)) == "gzip")
    assert(Decompress.sniff(Bzip2.encode(raw)) == "bzip2")
    assert(Decompress.sniff(Xz.encode(raw)) == "xz")
    assert(Decompress.sniff(raw) == "raw")
    assert(Decompress.sniff(Array[Byte](1, 2)) == "raw")
    assert(Decompress.sniff(null) == "raw")
    // BZh without a level digit is not bzip2
    assert(Decompress.sniff("BZhX rest of text".getBytes(UTF_8)) == "raw")
  }

  test("auto routes each codec and passes raw through unchanged") {
    assert(Decompress.auto(Gzip.gzip(raw))._2.sameElements(raw))
    assert(Decompress.auto(Bzip2.encode(raw))._2.sameElements(raw))
    assert(Decompress.auto(Xz.encode(raw))._2.sameElements(raw))
    val (f, out) = Decompress.auto(raw)
    assert(f == "raw" && (out eq raw))
  }

  test("a matched magic with a corrupt body fails loudly, never falls back to raw") {
    val bad = Gzip.gzip(raw).clone()
    bad(bad.length - 1) = (bad(bad.length - 1) ^ 1).toByte
    assertThrows[IllegalArgumentException](Decompress.auto(bad))
  }

  test("autoFrame over a mixed frame") {
    val rows = Seq(
      (0L, Gzip.gzip("a".getBytes(UTF_8))),
      (1L, Bzip2.encode("b".getBytes(UTF_8))),
      (2L, Xz.encode("c".getBytes(UTF_8))),
      (3L, "d plain".getBytes(UTF_8))).toDF("media_id", "data")
    val out = Decompress.autoFrame(rows, "media_id", "data").orderBy("media_id").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("gzip", "bzip2", "xz", "raw"))
    assert(out.map(r => new String(r.getAs[Array[Byte]](2), UTF_8)).toSeq ==
      Seq("a", "b", "c", "d plain"))
  }
}
