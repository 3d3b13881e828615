package graft

import org.apache.spark.sql.functions._

import graft.operators.Blocklist

class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  test("counts all occurrences: substrings, overlaps, suffix patterns via output links") {
    val ac = Blocklist.build(Seq("he", "she", "his", "hers"))
    // classic AC example: "ushers" contains she, he, hers
    assert(ac.countMatches("ushers") == 3L)
    assert(ac.matchedTerms("ushers").toSeq == Seq(0, 1, 3)) // he, she, hers
    // overlapping occurrences of a self-overlapping pattern all count
    val aa = Blocklist.build(Seq("aa"))
    assert(aa.countMatches("aaaa") == 3L)
  }

  test("case-insensitive; substring semantics match 'slowly' for 'slow'") {
    val ac = Blocklist.build(Seq("slow", "fast table"))
    assert(ac.countMatches("SLOWLY the Fast Table turned") == 2L)
    assert(ac.countMatches("fas table slo w") == 0L)
  }

  test("matches spanning pattern-prefix restarts (failure links, not restart-at-root)") {
    // scanning 'aab' after partial 'aa' must still find 'ab' via the
    // fail link; a naive restart-at-next-char scanner finds it too,
    // but a broken fail function would miss it
    val ac = Blocklist.build(Seq("aab", "ab"))
    assert(ac.countMatches("aab") == 2L) // aab and ab both end at index 2
    val ac2 = Blocklist.build(Seq("abcabd", "cab"))
    assert(ac2.countMatches("abcabcabd") == 3L) // cab twice + abcabd once
  }

  test("build validation: empty list, empty pattern, duplicates fail loudly") {
    assertThrows[IllegalArgumentException](Blocklist.build(Nil))
    assertThrows[IllegalArgumentException](Blocklist.build(Seq("a", "")))
    assertThrows[IllegalArgumentException](Blocklist.build(Seq("Spam", "spam")))
  }

  test("annotate + filterClean over a frame") {
    val docs = Seq(
      (1L, "a clean document"),
      (2L, "contains spam here"),
      (3L, "SPAM and more sPaM"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val ann = Blocklist.annotate(docs, "doc_id", "text", Seq("spam", "scam"))
      .orderBy("doc_id").collect()
    assert(ann.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq ==
      Seq((1L, 0L, 0L, true), (2L, 1L, 1L, false), (3L, 2L, 1L, false),
        (4L, 0L, 0L, true)))
    val clean = Blocklist.filterClean(docs, "doc_id", "text", Seq("spam", "scam"))
    assert(clean.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
  }
}
