package graft

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("native expressions are callable from SQL") {
    Seq((Array(1.0, 0.0), Array(1.0, 0.0), "a b c d", 2.0),
      (Array(0.0, 1.0), Array(1.0, 0.0), "a b c d", 3.0))
      .toDF("x", "y", "t", "v").createOrReplaceTempView("ext_t")

    val r = spark.sql(
      """SELECT round(cosine_similarity(x, y), 6) AS cs,
        |  size(minhash_signature(word_ngrams(t, 2), 16)) AS sig_len,
        |  simhash64(word_ngrams(t, 1)) AS sh,
        |  size(minhash_bands(word_ngrams(t, 2), 16, 4)) AS n_bands,
        |  size(text_minhash_bands(t, 2, 16, 4)) AS n_bands_fused
        |FROM ext_t""".stripMargin).collect()
    assert(r(0).getDouble(0) == 1.0)
    assert(r(1).getDouble(0) == 0.0)
    assert(r.forall(_.getInt(1) == 16))
    assert(r(0).getLong(2) == r(1).getLong(2)) // same tokens → same simhash
    assert(r.forall(_.getInt(3) == 4))
    assert(r.forall(_.getInt(4) == 4))

    val agg = spark.sql("SELECT product_agg(v) FROM ext_t").collect()(0)
    assert(agg.getDouble(0) == 6.0)

    val nfc = spark.sql(
      "SELECT nfc_normalize('e\\u0301') = '\\u00E9', char_entropy('aa')")
      .collect()(0)
    assert(nfc.getBoolean(0))
    assert(nfc.getDouble(1) == 0.0)
  }

  test("SQL function argument validation surfaces clear errors") {
    val e = intercept[Exception](
      spark.sql("SELECT cosine_similarity(array(1.0)) ").collect())
    assert(e.getMessage.contains("2 arguments"))
  }
}
