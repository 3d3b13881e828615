package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.operators.TarCodec
import graft.operators.TarCodec.Entry

class TarCodecSpec extends SparkSpec {
  import spark.implicits._

  test("roundtrip: names, data, order, padding at all sizes") {
    val entries = Seq(
      Entry("a.txt", "hello".getBytes(UTF_8)),
      Entry("b.bin", Array.tabulate(512)(_.toByte)), // exactly one block
      Entry("c.empty", Array.emptyByteArray),
      Entry("d.big", Array.tabulate(1300)(i => (i % 251).toByte)))
    val tar = TarCodec.encode(entries)
    assert(tar.length % 512 == 0)
    val back = TarCodec.decode(tar)
    assert(back.map(_.name) == entries.map(_.name))
    back.zip(entries).foreach { case (b, e) => assert(b.data.sameElements(e.data)) }
  }

  test("deterministic: equal inputs produce byte-equal archives") {
    val e = Seq(Entry("x", "data".getBytes(UTF_8)))
    assert(TarCodec.encode(e).sameElements(TarCodec.encode(e)))
  }

  test("cross-oracle: a jdk-independent hand-built GNU-style header parses") {
    // assemble a header by hand from the public ustar layout (octal
    // fields space-terminated, the GNU variant) — independent of our
    // writer's zero-padded style
    val name = "hand.txt".getBytes(UTF_8)
    val data = "independent".getBytes(UTF_8)
    val h = new Array[Byte](512)
    System.arraycopy(name, 0, h, 0, name.length)
    def oct(off: Int, width: Int, v: Long): Unit = {
      val s = java.lang.Long.toOctalString(v)
      val padded = (" " * (width - 2 - s.length)) + s + " "
      padded.getBytes(UTF_8).zipWithIndex.foreach { case (b, i) => h(off + i) = b }
    }
    oct(100, 8, 420)  // mode
    oct(108, 8, 1000) // uid
    oct(116, 8, 1000) // gid
    oct(124, 12, data.length.toLong)
    oct(136, 12, 1234567L)
    h(156) = '0'
    System.arraycopy("ustar".getBytes(UTF_8), 0, h, 257, 5)
    h(263) = '0'; h(264) = '0'
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    val sum = h.map(_ & 0xff).sum.toLong
    val cs = java.lang.Long.toOctalString(sum)
    ("0" * (6 - cs.length) + cs).getBytes(UTF_8).zipWithIndex.foreach {
      case (b, i) => h(148 + i) = b
    }
    h(154) = 0; h(155) = ' '
    val bos = new ByteArrayOutputStream()
    bos.write(h)
    bos.write(data)
    bos.write(new Array[Byte](512 - data.length)) // pad
    bos.write(new Array[Byte](1024)) // end blocks
    val es = TarCodec.decode(bos.toByteArray)
    assert(es.size == 1 && es.head.name == "hand.txt")
    assert(es.head.data.sameElements(data))
  }

  test("corruption fails loudly: checksum, magic, typeflag, truncation, name width") {
    val tar = TarCodec.encode(Seq(Entry("f", "x".getBytes(UTF_8))))
    val badSum = tar.clone(); badSum(0) = 'g'
    assertThrows[IllegalArgumentException](TarCodec.decode(badSum))
    val badMagic = tar.clone(); badMagic(257) = 'v'
    assertThrows[IllegalArgumentException](TarCodec.decode(badMagic))
    // a header whose data region is cut off must fail, and a non-512
    // multiple must fail; note dropping ONE end block is legal EOF
    assertThrows[IllegalArgumentException](TarCodec.decode(tar.take(512)))
    assertThrows[IllegalArgumentException](TarCodec.decode(tar.dropRight(1)))
    assert(TarCodec.decode(tar.dropRight(512)).size == 1)
    // symlink typeflag must not silently skip: rebuild checksum so only
    // the typeflag is at fault
    val link = tar.clone(); link(156) = '2'
    var sum = 0L
    for (i <- 0 until 512) sum += (if (i >= 148 && i < 156) ' '.toLong else (link(i) & 0xff).toLong)
    val cs = java.lang.Long.toOctalString(sum)
    for (i <- 148 until 156) link(i) = ' '
    ("0" * (6 - cs.length) + cs).getBytes(UTF_8).zipWithIndex.foreach {
      case (b, i) => link(148 + i) = b
    }
    link(154) = 0; link(155) = ' '
    assertThrows[IllegalArgumentException](TarCodec.decode(link))
    assertThrows[IllegalArgumentException](
      TarCodec.encode(Seq(Entry("n" * 101, Array.emptyByteArray))))
  }

  test("webdataset shards roundtrip through gzip + tar + stem pairing") {
    val docs = Seq(
      (0L, "alpha text", "en"),
      (1L, "beta text", "fr"),
      (5L, "epsilon", "de"),
      (32L, "same shard as 0", "en")).toDF("doc_id", "text", "meta")
    val shards = TarCodec.webdatasetBuild(docs, shards = 32)
    assert(shards.count() == 3) // groups 0 (ids 0,32), 1, 5
    val back = TarCodec.webdatasetIngest(shards).orderBy("doc_id").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((0L, "alpha text", "en"), (1L, "beta text", "fr"),
        (5L, "epsilon", "de"), (32L, "same shard as 0", "en")))
  }

  test("torn webdataset samples fail loudly") {
    import graft.operators.Gzip
    val torn = Gzip.gzip(TarCodec.encode(Seq(
      Entry("7.txt", "no meta half".getBytes(UTF_8)))))
    val df = Seq(Tuple1(torn)).toDF("data")
    val ex = intercept[org.apache.spark.SparkException](
      TarCodec.webdatasetIngest(df).collect())
    assert(ex.getMessage != null)
  }
}
