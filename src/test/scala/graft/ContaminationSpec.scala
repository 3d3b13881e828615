package graft

import org.apache.spark.sql.functions._

import graft.operators.Contamination

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  // 12-token docs: an 8-gram overlap needs a run of 8 shared tokens.
  private val train = Seq(
    (1L, "a b c d e f g h i j k l"),       // shares 8-gram runs with eval doc
    (2L, "z y x w v u t s r q p o"),       // disjoint vocabulary
    (3L, "a b c d e f g X i j k l"),       // run broken at position 7: no shared 8-gram
    (4L, "short doc")                      // < n tokens: no shingles at all
  ).toDF("doc_id", "text")
  private val eval_ = Seq(
    Tuple1("a b c d e f g h i j k l m n")  // contains train doc 1's runs
  ).toDF("text")

  test("contaminatedIds flags exactly the docs sharing an n-gram, with counts") {
    val got = Contamination.contaminatedIds(train, "doc_id", "text", eval_, "text", n = 8)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // doc 1 has 5 distinct 8-grams (12-8+1), all present in the eval doc
    assert(got == Seq((1L, 5L)))
  }

  test("decontaminate drops flagged docs and keeps the rest, schema intact") {
    val kept = Contamination.decontaminate(train, "doc_id", "text", eval_, "text", n = 8)
    assert(kept.columns.toSeq == Seq("doc_id", "text"))
    assert(kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L, 4L))
  }

  test("decontaminate above the broadcast cap falls back to a plain anti-join, same result") {
    // maxBroadcastIds = 0 forces the non-broadcast path
    val fallback = Contamination.decontaminate(
        train, "doc_id", "text", eval_, "text", n = 8, maxBroadcastIds = 0L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(fallback == Seq(2L, 3L, 4L))
  }

  test("bloom variant returns exactly the broadcast variant's result") {
    val exact = Contamination.decontaminate(train, "doc_id", "text", eval_, "text", n = 8)
      .collect().map(_.getLong(0)).sorted.toSeq
    // default expectedEvalNgrams = auto (pre-count of the eval n-gram set)
    val bloom = Contamination.decontaminateBloom(
        train, "doc_id", "text", eval_, "text", n = 8)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(bloom == exact)
  }

  test("bloom variant above the broadcast cap falls back to a plain anti-join, same result") {
    val fallback = Contamination.decontaminateBloom(
        train, "doc_id", "text", eval_, "text", n = 8, maxBroadcastIds = 0L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(fallback == Seq(2L, 3L, 4L))
  }

  test("empty eval corpus flags nothing") {
    val kept = Contamination.decontaminate(
      train, "doc_id", "text", eval_.where(lit(false)), "text", n = 8)
    assert(kept.count() == 4)
  }
}
