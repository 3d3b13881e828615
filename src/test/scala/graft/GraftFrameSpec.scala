package graft

import org.apache.spark.sql.functions._

import graft.api.GraftFrame

class GraftFrameSpec extends SparkSpec {
  import spark.implicits._

  private def people = new GraftFrame(
    Seq((1L, "ann", 34, 120.0), (2L, "bob", 28, 80.0), (3L, "cat", 34, 95.0),
      (4L, "dan", 41, 60.0)).toDF("id", "name", "age", "score"))

  test("select / where / query") {
    assert(people.select("name", "age").columns == Seq("name", "age"))
    assert(people.where(col("age") > 30).count() == 3)
    assert(people.query("age = 34 AND score > 100").count() == 1)
  }

  test("sort_values / head / nlargest / nsmallest") {
    val sorted = people.sort_values(Seq("age"), ascending = false)
    assert(sorted.toDF.collect()(0).getString(1) == "dan")
    assert(people.head(2).count() == 2)
    val top = people.nlargest(2, "score").toDF.collect().map(_.getString(1))
    assert(top.toSeq == Seq("ann", "cat"))
    val bottom = people.nsmallest(1, "score").toDF.collect()(0).getString(1)
    assert(bottom == "dan")
  }

  test("merge maps pandas how names; outer → full_outer") {
    val extra = new GraftFrame(Seq((1L, "NYC"), (9L, "LA")).toDF("id", "city"))
    val inner = people.merge(extra, Seq("id"))
    assert(inner.count() == 1)
    val outer = people.merge(extra, Seq("id"), how = "outer")
    assert(outer.count() == 5) // 4 people + unmatched LA
    val left = people.merge(extra, Seq("id"), how = "left", broadcastOther = true)
    assert(left.count() == 4)
    val anti = people.merge(extra, Seq("id"), how = "anti")
    assert(anti.count() == 3)
  }

  test("groupby.agg pandas-style pairs with stable output names") {
    val g = people.groupby("age").agg("score" -> "sum", "id" -> "count")
    assert(g.columns == Seq("age", "sum_score", "count_id"))
    val m = g.toDF.where(col("age") === 34).collect()(0)
    assert(m.getDouble(1) == 215.0 && m.getLong(2) == 2L)
  }

  test("groupby.agg sort= orders output by key; rejected with split_out > 1") {
    val sorted = people.groupby("age").agg(Seq("score" -> "sum"), sort = true)
      .toDF.collect().map(_.getAs[Int]("age"))
    assert(sorted.toSeq == sorted.toSeq.sorted)
    // split_out=1 composes: one ordered shard
    val one = people.groupby("age").agg(1, true, "score" -> "sum").toDF
    assert(one.rdd.getNumPartitions == 1)
    assert(one.collect().map(_.getAs[Int]("age")).toSeq == sorted.toSeq.sorted)
    val e = intercept[IllegalArgumentException] {
      people.groupby("age").agg(4, true, "score" -> "sum")
    }
    assert(e.getMessage.contains("split_out"))
  }

  test("Units.parseBytes mirrors the reference's dask-style table") {
    import graft.api.Units.parseBytes
    assert(parseBytes("100") == 100L)
    assert(parseBytes("100 MB") == 100000000L)
    assert(parseBytes("100M") == 100000000L)
    assert(parseBytes("5kB") == 5000L)
    assert(parseBytes("5.4 kB") == 5400L)
    assert(parseBytes("1kiB") == 1024L)
    assert(parseBytes("1e6") == 1000000L)
    assert(parseBytes("1e6 kB") == 1000000000L)
    assert(parseBytes("MB") == 1000000L)
    assert(parseBytes("1GiB") == (1L << 30))
    assert(parseBytes("2ki") == 2048L)
    assert(intercept[IllegalArgumentException](parseBytes("5 foos"))
      .getMessage.contains("byte unit"))
    assert(intercept[IllegalArgumentException](parseBytes("x5x B"))
      .getMessage.contains("as a number"))
  }

  test("groupby.size counts rows per group") {
    val s = people.groupby("age").size().toDF.where(col("age") === 34).collect()(0)
    assert(s.getLong(1) == 2L)
  }

  test("concat is by-name union allowing missing columns") {
    val other = new GraftFrame(Seq((5L, "eve")).toDF("id", "name"))
    val u = people.concat(other)
    assert(u.count() == 5)
    val eve = u.toDF.where(col("id") === 5).collect()(0)
    assert(eve.getAs[Any]("age") == null)
  }

  test("intersect / except are set-semantics") {
    val a = new GraftFrame(Seq(1, 2, 2, 3).toDF("x"))
    val b = new GraftFrame(Seq(2, 3, 4).toDF("x"))
    assert(a.intersect(b).toDF.collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3))
    assert(a.except(b).toDF.collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("drop_duplicates with and without subset") {
    val d = new GraftFrame(Seq((1, "a"), (1, "b"), (1, "a")).toDF("k", "v"))
    assert(d.drop_duplicates().count() == 2)
    assert(d.drop_duplicates(Seq("k")).count() == 1)
  }

  test("rename / withColumn / drop") {
    val r = people.rename(Map("name" -> "who")).select("who")
    assert(r.columns == Seq("who"))
    assert(people.withColumn("dbl", col("score") * 2).toDF
      .where(col("id") === 2).collect()(0).getAs[Double]("dbl") == 160.0)
    assert(!people.drop("score").columns.contains("score"))
  }

  test("named reductions through the facade") {
    val s = people.drop("name").sum().toDF.collect()(0)
    // id: 1+2+3+4 = 10 (long); age: 137 (long); score: 355.0
    assert(s.getLong(0) == 10L)
    assert(s.getDouble(2) == 355.0)
  }

  test("split_out controls grouped-output shard count without changing results") {
    val big = new GraftFrame(
      (1 to 200).map(i => (i % 10, i.toDouble)).toDF("k", "v"))
    val base = big.groupby("k").agg("v" -> "sum").toDF
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    for (n <- Seq(3, 7)) {
      val sharded = big.groupby("k").agg(n, "v" -> "sum")
      assert(sharded.npartitions == n, s"split_out=$n")
      val got = sharded.toDF.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      assert(got == base, s"split_out=$n")
    }
  }

  test("repartition_by_range + sort_within_partitions: disjoint sorted ranges") {
    val big = new GraftFrame(
      (1 to 500).map(i => ((i * 37) % 500, s"r$i")).toDF("k", "v"))
    val rp = big.repartition_by_range(4, "k").sort_within_partitions("k")
    assert(rp.npartitions == 4)
    // each partition internally sorted, and partition key ranges disjoint
    val perPart = rp.toDF.select("k").rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val ks = it.map(_.getInt(0)).toSeq
        Iterator.single((pid, ks))
      }.collect().sortBy(_._1)
    perPart.foreach { case (pid, ks) =>
      assert(ks == ks.sorted, s"partition $pid not sorted")
    }
    val nonEmpty = perPart.filter(_._2.nonEmpty)
    nonEmpty.sliding(2).foreach {
      case Array((_, a), (_, b)) => assert(a.max <= b.min)
      case _ =>
    }
    assert(perPart.map(_._2.size).sum == 500)
  }

  test("LLM-pipeline facade: near-dup, bloom semi-join, kmeans, text metrics") {
    // near-dup: a doc and its 1-token-dropped copy are found as a pair
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = new GraftFrame(Seq(
      (1L, base), (2L, base.stripSuffix(" upsilon")),
      (3L, "completely different text about other things entirely here now " +
        "with many more unrelated words to keep jaccard at zero")).toDF("id", "txt"))
    val pairs = docs.near_dup_pairs("id", "txt", threshold = 0.6)
      .toDF.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
    val kept = docs.drop_near_duplicates("id", "txt", threshold = 0.6)
      .toDF.select("id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 3L))

    // bloom semi-join delegates with exact results
    val large = new GraftFrame(spark.range(0, 100).toDF("k"))
    val smallF = new GraftFrame(spark.range(0, 100).where(col("id") % 9 === 0).toDF("sk"))
    assert(large.semi_join_bloom(smallF, "k", "sk").count() == 12)

    // kmeans facade returns one cell per row
    val vecs = new GraftFrame((0 until 10)
      .map(i => (i.toLong, Array.tabulate(4)(d => (i * 7 + d).toFloat)))
      .toDF("id", "vec"))
    val cells = vecs.kmeans("id", "vec", k = 2, iters = 1).toDF.collect()
    assert(cells.length == 10 && cells.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 2))

    // decontaminate drops the two docs sharing an 8-gram with the eval
    // corpus (doc 3's vocabulary is disjoint)
    val evalF = new GraftFrame(Seq(
      Tuple1("alpha beta gamma delta epsilon zeta eta theta")).toDF("txt"))
    val clean = docs.decontaminate("id", "txt", evalF, "txt", n = 8)
      .toDF.select("id").collect().map(_.getLong(0)).sorted
    assert(clean.toSeq == Seq(3L))

    // stratified sample keeps k per group
    val strat = new GraftFrame(spark.range(0, 60)
      .select(col("id"), (col("id") % 3).cast("string").as("g")))
      .stratified_sample("g", "id", k = 5)
    assert(strat.toDF.groupBy("g").count().collect().map(_.getLong(1)).toSeq == Seq(5L, 5L, 5L))

    // exact-k global sample and per-group top-n delegate
    assert(new GraftFrame(spark.range(0, 200).toDF("id"))
      .sample_exact("id", k = 17).count() == 17)
    val topn = new GraftFrame(spark.range(0, 40)
      .select(col("id"), (col("id") % 2).cast("string").as("g"), (col("id") * 2).as("sc")))
      .top_n_per_group("g", "id", "sc", k = 3)
    assert(topn.toDF.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(34L, 35L, 36L, 37L, 38L, 39L))

    // heavy hitters surfaces the frequent value
    val hh = new GraftFrame(
      (Seq.fill(50)("hot") ++ (1 to 30).map(i => s"cold$i")).toDF("v"))
      .heavy_hitters("v", 5).toDF.collect().map(r => r.getString(0))
    assert(hh.contains("hot"))

    // range join delegates (one in-window point)
    val pts = new GraftFrame(Seq((1L, 10L), (2L, 99L)).toDF("pid", "p"))
    val ivs = new GraftFrame(Seq((7L, 8L, 12L)).toDF("iid", "lo", "hi"))
    val rj = pts.join_range(ivs, "p", "lo", "hi", bucketWidth = 5L)
      .toDF.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rj.toSeq == Seq((1L, 7L)))

    // text metrics appends the 9 quality+repetition columns
    val m = docs.with_text_metrics("txt")
    val added = m.columns.toSet -- docs.columns.toSet
    assert(added == Set("n_chars", "n_tokens", "avg_token_chars",
      "stopword_ratio", "distinct_ratio", "dup_line_frac",
      "dup_line_char_frac", "dup_2gram_frac", "dup_3gram_frac"))
    assert(m.count() == 3)

    // gopher verdict + metrics columns, never-null verdict
    val g = docs.with_gopher_quality("txt")
    assert(g.columns.contains("gopher_keep") && g.columns.contains("top_2gram_char_frac"))
    assert(g.toDF.select("gopher_keep").collect().forall(!_.isNullAt(0)))

    // c4 columns
    val c4 = docs.with_c4_cleaning("txt")
    assert(c4.columns.contains("clean_text") && c4.columns.contains("keep_doc"))

    // url columns append canonical/host/domain; blocklist drop filters
    val urls = new GraftFrame(Seq(
      (1L, "HTTPS://A.Spam.COM/x?utm_a=1"), (2L, "https://ok.org/y"))
      .toDF("id", "url"))
    val u = urls.with_url_columns("url")
    assert((u.columns.toSet -- urls.columns.toSet) ==
      Set("url_canonical", "url_host", "url_domain"))
    val blocked = new GraftFrame(Seq(Tuple1("spam.com")).toDF("domain"))
    val keptUrls = urls.drop_blocked_domains("url", blocked)
      .toDF.select("id").collect().map(_.getLong(0)).toSeq
    assert(keptUrls == Seq(2L))

    // bm25 returns one score per row, absent terms score 0
    val b = docs.bm25("id", "txt", Seq("zzz_absent")).toDF
      .collect().map(_.getDouble(1))
    assert(b.length == 3 && b.forall(_ == 0.0))

    // int8 codes: codes + scale appended, code count = dim
    val qvecs = new GraftFrame(Seq((1L, Seq(0.5, -1.0))).toDF("id", "v"))
    val q = qvecs.with_int8_codes("v").toDF.collect()(0)
    assert(q.getSeq[Byte](2).length == 2)

    // semantic dedup: scaled copy (cos = 1) in the same cluster is dropped
    val sem = new GraftFrame(Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(2.0f, 0.0f)), (3L, Array(0.0f, 1.0f)))
      .toDF("id", "vec"))
      .semantic_dedup("id", "vec", k = 2, tau = 0.99)
      .toDF.select("id").collect().map(_.getLong(0)).sorted
    assert(sem.toSeq == Seq(1L, 3L))

    // dsir resample: cooking target surfaces the cooking doc from raw
    val tgt = new GraftFrame(Seq((0L, "bake the sauce and stir the bread"))
      .toDF("id", "txt"))
    val rawDocs = new GraftFrame(Seq(
      (1L, "the court dismissed the appeal yesterday"),
      (2L, "stir the sauce then bake the bread")).toDF("id", "txt"))
    val picked = rawDocs.dsir_resample("id", "txt", tgt, n = 1)
      .toDF.select("id").collect().map(_.getLong(0))
    assert(picked.toSeq == Seq(2L))
    // the stochastic form keeps n rows and is deterministic per seed
    val g1 = rawDocs.dsir_resample_gumbel("id", "txt", tgt, n = 1, seed = 3L)
      .toDF.select("id").collect().map(_.getLong(0)).toSeq
    val g2 = rawDocs.dsir_resample_gumbel("id", "txt", tgt, n = 1, seed = 3L)
      .toDF.select("id").collect().map(_.getLong(0)).toSeq
    assert(g1 == g2 && g1.length == 1)

    // dup-span fraction: the shared-tail docs flag, the unique one doesn't
    val spans = new GraftFrame(Seq(
      (1L, "unique prefix one shared tail marker span here"),
      (2L, "unique prefix two shared tail marker span here"),
      (3L, "entirely different words with nothing in common at all"))
      .toDF("id", "txt"))
      .dup_span_fraction("id", "txt", n = 4)
      .toDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(spans(1L) > 0.0 && spans(2L) > 0.0 && spans(3L) == 0.0)

    // round-10 facades: paragraph dedup, span removal, audio metadata
    val pd = new GraftFrame(Seq(
      (1L, "keep me\n\nshared para"), (2L, "shared para\n\nother"))
      .toDF("id", "txt"))
      .dedup_paragraphs("id", "txt")
      .toDF.select("id", "txt").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(pd == Map(1L -> "keep me\n\nshared para", 2L -> "other"))
    val sr = new GraftFrame(Seq(
      (1L, "a b c d e"), (2L, "x b c d y")).toDF("id", "txt"))
      .remove_dup_spans("id", "txt", n = 3)
      .toDF.select("id", "txt").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(sr == Map(1L -> "a b c d e", 2L -> "x y"))
    val am = new GraftFrame(Seq(
      (1L, graft.operators.Mp3Meta.encode(2, 9, 0)),
      (2L, graft.operators.OggMeta.encodeVorbis(44100, 1, 44100L, 30)))
      .toDF("id", "data"))
      .audio_metadata("id", "data")
      .toDF.select("id", "format").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(am == Map(1L -> "mp3", 2L -> "vorbis"))
  }

  test("multimodal facade: image hashes, one-call image dedup, audio/gif/video metadata") {
    import graft.operators.{GifCodec, Multimodal, WavCodec}
    // two byte-identical BMPs, one visually different (the gradient's
    // id only shifts brightness, which aHash is invariant to BY DESIGN
    // — different DIMS change the sampled pattern), one undecodable
    val media = new GraftFrame(Seq(
      (1L, Multimodal.encodeBmp(7L, 20, 12)),
      (2L, Multimodal.encodeBmp(7L, 20, 12)),
      (3L, Multimodal.encodeBmp(99L, 9, 31)),
      (4L, "not an image".getBytes)).toDF("id", "payload"))
    val hashes = media.image_hashes("id", "payload")
      .toDF.collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(hashes(1L) == hashes(2L) && hashes(1L) != null)
    assert(hashes(3L) != hashes(1L))
    assert(hashes(4L) == null)
    // dedup keeps the min-id copy of the duplicate pair, the distinct
    // image, and the undecodable row (null hash joins no cluster)
    val kept = media.drop_duplicate_images("id", "payload", maxHamming = 0)
      .toDF.select("id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L))

    val audio = new GraftFrame(Seq(
      (1L, WavCodec.encode(WavCodec.signal(1L, 30, 1, 8000))),
      (2L, "junk".getBytes)).toDF("id", "payload"))
    val af = audio.audio_features("id", "payload")
      .toDF.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(af(1L) == "wav" && af(2L) == "unknown")

    val gifs = new GraftFrame(Seq(
      (1L, GifCodec.encodeAnimated(5L, 8, 6, 3, 20))).toDF("id", "payload"))
    val gm = gifs.gif_metadata("id", "payload").toDF.collect()(0)
    assert(gm.getInt(5) == 3 && gm.getBoolean(6) && gm.getLong(7) == 600L)

    val vids = new GraftFrame(Seq(
      (1L, "junk".getBytes)).toDF("id", "payload"))
    assert(vids.video_metadata("id", "payload").toDF.collect()(0).getString(2) == "unknown")
  }
}
