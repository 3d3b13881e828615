package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.AvroCodec
import graft.sources.AvroCodec.{AvField, AvRecord, ABool, ABytes, ADouble, AFloat, AInt, ALong, ANullable, AString}

/** Cross-checked against avro-java (the independent implementation on
  * the Spark classpath — cross-oracle only, never the product path) in
  * both directions and all three codecs. */
class AvroCodecSpec extends AnyFunSuite {

  private val rec = AvRecord("Doc", Vector(
    AvField("id", ALong),
    AvField("n", AInt),
    AvField("ok", ABool),
    AvField("score", ADouble),
    AvField("ratio", AFloat),
    AvField("text", AString),
    AvField("blob", ABytes),
    AvField("opt", ANullable(AString))))

  private val rows: Seq[Seq[Any]] = (0 until 500).map { i =>
    Seq(i.toLong * 1000003L, i - 250, i % 3 == 0, i * 0.125 - 7.5,
      (i * 0.5f - 100f), s"row $i with ünicode §$i",
      Array.tabulate(i % 17)(j => ((i * 31 + j) % 251).toByte),
      if (i % 4 == 0) null else s"opt-$i")
  }

  private def sameRows(a: Seq[Seq[Any]], b: Seq[Seq[Any]]): Unit = {
    assert(a.size == b.size)
    a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
      x.zip(y).foreach {
        case (p: Array[Byte], q: Array[Byte]) =>
          assert(p.sameElements(q), s"row $i bytes differ")
        case (p, q) => assert(p == q, s"row $i: $p != $q")
      }
    }
  }

  test("roundtrip all codecs: encode -> decode identity, schema preserved") {
    for (codec <- Seq("null", "deflate", "snappy")) {
      val enc = AvroCodec.encode(rec, rows, codec, blockRecords = 64)
      val (schema, back) = AvroCodec.decode(enc)
      assert(schema == rec, s"codec $codec mangled the schema")
      sameRows(back, rows)
    }
  }

  test("deterministic bytes; deflate and snappy actually shrink") {
    val a = AvroCodec.encode(rec, rows, "null")
    assert(a.sameElements(AvroCodec.encode(rec, rows, "null")))
    assert(AvroCodec.encode(rec, rows, "deflate").length < a.length)
    assert(AvroCodec.encode(rec, rows, "snappy").length < a.length)
  }

  private def avroJavaSchema = new org.apache.avro.Schema.Parser()
    .parse(s"""{"type":"record","name":"Doc","fields":[
      {"name":"id","type":"long"},{"name":"n","type":"int"},
      {"name":"ok","type":"boolean"},{"name":"score","type":"double"},
      {"name":"ratio","type":"float"},{"name":"text","type":"string"},
      {"name":"blob","type":"bytes"},{"name":"opt","type":["null","string"]}]}""")

  test("avro-java reads our containers (all codecs)") {
    import scala.jdk.CollectionConverters._
    for (codec <- Seq("null", "deflate", "snappy")) {
      val enc = AvroCodec.encode(rec, rows, codec, blockRecords = 64)
      val reader = new org.apache.avro.file.DataFileReader(
        new org.apache.avro.file.SeekableByteArrayInput(enc),
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord](avroJavaSchema))
      val got = reader.iterator().asScala.map { g =>
        Seq(g.get("id"), g.get("n"), g.get("ok"), g.get("score"), g.get("ratio"),
          g.get("text").toString,
          { val bb = g.get("blob").asInstanceOf[java.nio.ByteBuffer]
            val arr = new Array[Byte](bb.remaining()); bb.get(arr); arr },
          Option(g.get("opt")).map(_.toString).orNull)
      }.toSeq
      reader.close()
      sameRows(got, rows)
    }
  }

  test("we read avro-java containers (null + deflate + snappy)") {
    import org.apache.avro.file.{CodecFactory, DataFileWriter}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    for (codec <- Seq(CodecFactory.nullCodec(), CodecFactory.deflateCodec(6),
        CodecFactory.snappyCodec())) {
      val bos = new java.io.ByteArrayOutputStream()
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](avroJavaSchema))
      w.setCodec(codec)
      w.create(avroJavaSchema, bos)
      rows.foreach { r =>
        val g = new GenericData.Record(avroJavaSchema)
        g.put("id", r(0)); g.put("n", r(1)); g.put("ok", r(2))
        g.put("score", r(3)); g.put("ratio", r(4)); g.put("text", r(5))
        g.put("blob", java.nio.ByteBuffer.wrap(r(6).asInstanceOf[Array[Byte]]))
        g.put("opt", r(7))
        w.append(g)
      }
      w.close()
      val (schema, back) = AvroCodec.decode(bos.toByteArray)
      assert(schema == rec)
      sameRows(back, rows)
    }
  }

  test("toDataFrame: schema mapping and values land in Spark") {
    val spark = TestSpark.spark
    val df = AvroCodec.toDataFrame(spark, AvroCodec.encode(rec, rows, "deflate"))
    assert(df.schema.fieldNames.toSeq ==
      Seq("id", "n", "ok", "score", "ratio", "text", "blob", "opt"))
    assert(df.count() == 500)
    val r7 = df.where(org.apache.spark.sql.functions.col("id") === 7000021L)
      .collect()(0)
    assert(r7.getInt(1) == -243 && !r7.getBoolean(2))
    assert(r7.getString(5) == "row 7 with ünicode §7")
  }

  test("unsupported schema shapes and corrupt containers fail loudly by name") {
    val e1 = intercept[IllegalArgumentException](AvroCodec.parseSchema(
      """{"type":"record","name":"X","fields":[{"name":"a","type":{"type":"array","items":"int"}}]}"""))
    assert(e1.getMessage.contains("unsupported") || e1.getMessage.contains("array"))
    val e2 = intercept[IllegalArgumentException](AvroCodec.parseSchema(
      """{"type":"record","name":"X","fields":[{"name":"a","type":["int","string"]}]}"""))
    assert(e2.getMessage.contains("union"))
    val enc = AvroCodec.encode(rec, rows.take(10), "null")
    val bad = enc.clone()
    bad(bad.length - 8) = (bad(bad.length - 8) ^ 0x7f).toByte // inside final sync
    val e3 = intercept[IllegalArgumentException](AvroCodec.decode(bad))
    assert(e3.getMessage.contains("sync"))
    val e4 = intercept[IllegalArgumentException](
      AvroCodec.decode("not avro at all".getBytes(UTF_8)))
    assert(e4.getMessage.contains("magic"))
  }

  test("truncation sweep fails loudly, never an index error") {
    val enc = AvroCodec.encode(rec, rows.take(20), "null")
    for (cut <- 0 until enc.length) {
      try { AvroCodec.decode(java.util.Arrays.copyOf(enc, cut)); () }
      catch { case _: IllegalArgumentException => () }
    }
  }
}
