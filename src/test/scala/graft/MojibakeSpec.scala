package graft

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import org.apache.spark.sql.functions._

import graft.operators.Mojibake

class MojibakeSpec extends SparkSpec {
  import spark.implicits._

  private def corrupt(s: String): String = new String(s.getBytes(UTF_8), ISO_8859_1)

  test("utf8Class: valid multibyte / pure ascii / invalid forms") {
    assert(Mojibake.utf8Class("plain ascii".getBytes(UTF_8)) == 0)
    assert(Mojibake.utf8Class("café".getBytes(UTF_8)) == 1)
    assert(Mojibake.utf8Class("𝄞 clef".getBytes(UTF_8)) == 1) // 4-byte
    assert(Mojibake.utf8Class(Array(0xc0, 0xaf).map(_.toByte)) == -1) // overlong '/'
    assert(Mojibake.utf8Class(Array(0xed, 0xa0, 0x80).map(_.toByte)) == -1) // surrogate
    assert(Mojibake.utf8Class(Array(0xf5, 0x80, 0x80, 0x80).map(_.toByte)) == -1) // > U+10FFFF lead
    assert(Mojibake.utf8Class(Array(0xe9, 0x20).map(_.toByte)) == -1) // truncated continuation
    assert(Mojibake.utf8Class(Array(0x80).map(_.toByte)) == -1) // bare continuation
  }

  test("fix repairs Latin-1 mojibake, once and twice") {
    val clean = "café — naïve résumé"
    assert(Mojibake.fixWithRounds(corrupt(clean)) == ((clean, 1)))
    assert(Mojibake.fixWithRounds(corrupt(corrupt(clean))) == ((clean, 2)))
  }

  test("fix repairs CP1252 mojibake (JDK windows-1252 as the forward oracle)") {
    // the JDK's independent Cp1252 decoder produces the garbled form;
    // our hand-transcribed reverse table must undo it exactly - smart
    // quotes, euro and en dash all land in the 0x80-0x9F specials
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    // bytes avoid 0x81/8D/8F/90/9D, which CP1252 leaves undefined
    val clean = "\u20ac100 \u2013 \u2018quoted\u2019 na\u00efve"
    val garbled = new String(clean.getBytes(UTF_8), cp1252)
    assert(garbled != clean)
    assert(Mojibake.fixWithRounds(garbled) == ((clean, 1)))
    // U+201D's UTF-8 ends in 0x9D, undefined in CP1252: the JDK
    // decoder emits U+FFFD, the original byte is DESTROYED, and the
    // repairer correctly declines rather than guessing
    val lossy = new String("\u201d".getBytes(UTF_8), cp1252)
    assert(lossy.contains('\ufffd'))
    assert(Mojibake.fixWithRounds(lossy) == ((lossy, 0)))
  }

  test("correct text is untouched: ascii, accents, CJK, emoji-free corpus text") {
    Seq("plain", "café — naïve", "日本語テキスト", "").foreach { s =>
      assert(Mojibake.fixWithRounds(s) == ((s, 0)))
    }
  }

  test("repair facade over a frame with mixed corruption depths") {
    val clean = "café row"
    val docs = Seq(
      (0L, corrupt(corrupt(clean))),
      (1L, corrupt(clean)),
      (2L, clean),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Mojibake.repair(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq ==
      Seq((0L, 2, clean), (1L, 1, clean), (2L, 0, clean), (3L, 0, "")))
  }
}
