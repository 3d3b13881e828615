package graft

import org.apache.spark.sql.functions._

import graft.operators.Pipeline

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, nTokens: Int): (Long, String) =
    (id, (1 to nTokens).map(i => s"t$i").mkString(" "))

  test("chunkDocuments: windows cover every token with the right overlap") {
    val df = Seq(doc(1, 100), doc(2, 40), doc(3, 41), doc(4, 5))
      .toDF("doc_id", "text")
    val chunks = Pipeline.chunkDocuments(df, "doc_id", "text", maxTokens = 40, overlap = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))

    // 100 tokens, stride 30: chunks at 0, 30, 60 → 1 + ceil(60/30) = 3
    val d1 = chunks.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.length == 3)
    assert(d1(0)._3.startsWith("t1 ") && d1(0)._3.endsWith(" t40"))
    assert(d1(1)._3.startsWith("t31 ") && d1(1)._3.endsWith(" t70"))
    assert(d1(2)._3.startsWith("t61 ") && d1(2)._3.endsWith(" t100"))
    // exactly fits → 1 chunk; one over → 2; short doc → 1 whole chunk
    assert(chunks.count(_._1 == 2L) == 1)
    assert(chunks.count(_._1 == 3L) == 2)
    assert(chunks.filter(_._1 == 4L).map(_._3).toSeq == Seq("t1 t2 t3 t4 t5"))
  }

  test("chunkDocuments: consecutive chunks share exactly `overlap` tokens") {
    val df = Seq(doc(1, 100)).toDF("doc_id", "text")
    val chunks = Pipeline.chunkDocuments(df, "doc_id", "text", 40, 10)
      .orderBy("chunk_idx").collect().map(_.getString(2).split(" ").toSeq)
    chunks.sliding(2).foreach { w =>
      assert(w(0).takeRight(10) == w(1).take(10))
    }
  }

  test("trainTestSplit: deterministic, disjoint, and roughly proportional") {
    val df = (1L to 2000L).map(i => (i, i * 2)).toDF("id", "v")
    val s1 = Pipeline.trainTestSplit(df, "id", 100)
    val s2 = Pipeline.trainTestSplit(df.repartition(13), "id", 100)
    assert(s1.orderBy("id").collect().toSeq == s2.orderBy("id").collect().toSeq)
    val nTest = s1.where($"split" === "test").count()
    assert(nTest > 120 && nTest < 280, s"test fraction off: $nTest/2000")
    assert(s1.count() == 2000)
  }

  test("mixtureSample: rate 1000 keeps all, rate 0 drops all, default applies") {
    val df = (1L to 900L).map(i => (i, s"src${i % 3}")).toDF("id", "source")
    val kept = Pipeline.mixtureSample(
      df, "id", "source", Map("src0" -> 1000, "src1" -> 0), defaultPerMille = 500)
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == 300)
    assert(!bySrc.contains("src1"))
    assert(bySrc("src2") > 100 && bySrc("src2") < 200)
  }

  test("hash ops survive 64-bit ids, spread structured ids, compose independently") {
    // ANSI-mode safety: ids near Long.MaxValue must not overflow
    val huge = Seq(Long.MaxValue - 1, Long.MaxValue / 2, 5000000000L)
      .map(i => (i, "s")).toDF("id", "source")
    assert(Pipeline.trainTestSplit(huge, "id", 100).count() == 3)
    // structured ids (all multiples of 1000) must not collapse into one
    // bucket: the split fraction stays near the nominal rate
    val structured = (1L to 2000L).map(i => (i * 1000, i)).toDF("id", "v")
    val nTest = Pipeline.trainTestSplit(structured, "id", 100)
      .where($"split" === "test").count()
    assert(nTest > 120 && nTest < 280, s"structured ids collapsed: $nTest/2000")
    // composition: sample-then-split must make independent decisions —
    // the test fraction of sample survivors stays ~10%, not 0% or 100%
    val df = (1L to 5000L).map(i => (i, "s")).toDF("id", "source")
    val sampled = Pipeline.mixtureSample(df, "id", "source", Map("s" -> 500))
    val nS = sampled.count()
    val nST = Pipeline.trainTestSplit(sampled, "id", 100)
      .where($"split" === "test").count()
    assert(nS > 2200 && nS < 2800, s"sample rate off: $nS/5000")
    val frac = nST.toDouble / nS
    assert(frac > 0.05 && frac < 0.16, s"composed split biased: $nST/$nS = $frac")
  }

  test("hashBucket decouples ids congruent mod 2^31-1 (high-bit fold)") {
    // ids differing only by multiples of 2^31-1 are invisible to a bare
    // `id % M` first step; the xor(id, id >>> 31) fold must separate
    // them under (almost) every seed.
    val m = 2147483647L
    val ids = (0 until 8).map(j => 5L + j * m)
    val df = ids.map(Tuple1(_)).toDF("id")
    val buckets = df
      .select(graft.operators.Pipeline.hashBucket($"id", 1000, 7L).as("b"))
      .collect().map(_.getLong(0)).toSet
    assert(buckets.size > 1, s"congruent ids still coupled: $buckets")
    assert(buckets.size >= 6, s"weak spread over congruent ids: $buckets")
  }

  test("globalShuffle: a permutation, deterministic per seed, seed-sensitive") {
    val df = (1L to 500L).map(i => (i, i)).toDF("id", "v")
    val a = Pipeline.globalShuffle(df, "id", seed = 1L).select("id").collect().map(_.getLong(0))
    val b = Pipeline.globalShuffle(df, "id", seed = 1L).select("id").collect().map(_.getLong(0))
    val c = Pipeline.globalShuffle(df, "id", seed = 2L).select("id").collect().map(_.getLong(0))
    assert(a.toSeq == b.toSeq)
    assert(a.toSeq != c.toSeq)
    assert(a.sorted.toSeq == (1L to 500L))
    assert(a.take(20).toSeq != (1L to 20L))
  }

  test("temperatureMixture clamps extreme-ratio sources to 1 per-mille, never 0") {
    // alpha=0.01 → expo 0.99: a 1-vs-1100 size ratio floors the big
    // source's rate to 0 before the clamp — rebalancing must keep the
    // source represented, not delete it. Seed the big source with ids
    // whose sample-hash bucket is 0, which rate>=1 MUST keep.
    val bucket0 = (1L to 20000L).filter { i =>
      val folded = i ^ (i >>> 31)
      val r1 = (folded % 2147483647L) * 1103515245L % 2147483647L
      ((r1 ^ 202L) * 1103515245L % 2147483647L) % 1000L == 0L
    }.take(2)
    assert(bucket0.nonEmpty, "fixture: no bucket-0 id found")
    val rows = Seq((999999L, "a")) ++
      ((1L to 1100L).filterNot(bucket0.contains).take(1100 - bucket0.size) ++ bucket0)
        .map((_, "b"))
    val kept = Pipeline.temperatureMixture(
        rows.toDF("doc_id", "source"), "doc_id", "source", alpha = 0.01)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // the small source survives whole; the big source keeps exactly its
    // bucket-0 ids (rate clamped to 1 per-mille)
    assert(kept.contains(999999L))
    assert(bucket0.forall(kept.contains), s"clamp failed: kept=$kept")
  }

  test("packSequences rejects the unsharded single-stream form unless opted in") {
    val df = (1L to 10L).map(i => (i, 100L)).toDF("id", "n_tok")
    val e = intercept[IllegalArgumentException] {
      Pipeline.packSequences(df, "n_tok", budget = 1000, orderCol = "id")
    }
    assert(e.getMessage.contains("singleStream"))
    // explicit opt-in still works for small frames
    val packed = Pipeline.packSequences(df, "n_tok", budget = 500,
      orderCol = "id", singleStream = true)
    assert(packed.groupBy("bin").count().count() == 2)
  }

  test("packSequences: bins respect the running-total budget law") {
    val df = (1L to 100L).map(i => (i, "s", 100L)).toDF("id", "shard", "n_tok")
    val packed = Pipeline.packSequences(df, "n_tok", budget = 1000,
      orderCol = "id", partitionCols = Seq("shard"))
    // 100-token docs into 1000-token bins → exactly 10 docs per bin
    val sizes = packed.groupBy("bin").count().collect().map(_.getLong(1))
    assert(sizes.forall(_ == 10) && sizes.length == 10)
    // bin is monotone in id order
    val bins = packed.orderBy("id").collect().map(_.getAs[Long]("bin"))
    assert(bins.toSeq == bins.sorted.toSeq)
  }

  test("stratifiedSample: k per group, matches the window formulation, seed-sensitive") {
    import org.apache.spark.sql.expressions.Window
    val df = ((1L to 100L).map(i => (i, "a")) ++ (201L to 215L).map(i => (i, "b")))
      .toDF("id", "source")
    val got = Pipeline.stratifiedSample(df, "source", "id", k = 10, seed = 7L)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    // exactly k from the big group, the whole small group (15 < k? no: 15 ≥ 10 → 10)
    assert(got.count(_._1 == "a") == 10 && got.count(_._1 == "b") == 10)
    // agrees with the (non-scale) window formulation on the same hash
    val w = Window.partitionBy("source")
      .orderBy(Pipeline.hashBucket(col("id"), Int.MaxValue, 7L), col("id"))
    val want = df.withColumn("rn", row_number().over(w)).where(col("rn") <= 10)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(got == want)
    // a group smaller than k is kept whole
    val small = Pipeline.stratifiedSample(df.where(col("source") === "b"),
      "source", "id", k = 100, seed = 7L)
    assert(small.count() == 15)
    // a different seed picks a different sample
    val other = Pipeline.stratifiedSample(df, "source", "id", k = 10, seed = 8L)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(other != got)
  }

  test("topNPerGroup: highest scores win, ties break to the smaller id") {
    val df = Seq(
      (1L, "a", 5.0), (2L, "a", 9.0), (3L, "a", 9.0), (4L, "a", 1.0),
      (5L, "b", 2.0), (6L, "b", 3.0)
    ).toDF("id", "g", "score")
    val got = Pipeline.topNPerGroup(df, "g", "id", "score", k = 2)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(2L, 3L, 5L, 6L)) // a: the two 9.0s; b: both rows
  }

  test("uniformSample: exactly k rows, deterministic, seed-sensitive") {
    val df = spark.range(0, 1000).select(col("id"), (col("id") % 5).as("payload"))
    val s1 = Pipeline.uniformSample(df, "id", k = 50, seed = 3L)
      .collect().map(_.getLong(0)).toSeq
    assert(s1.length == 50 && s1.distinct.length == 50)
    val again = Pipeline.uniformSample(df.repartition(13), "id", k = 50, seed = 3L)
      .collect().map(_.getLong(0)).toSeq
    assert(again.sorted == s1.sorted) // partitioning-invariant
    val s2 = Pipeline.uniformSample(df, "id", k = 50, seed = 4L)
      .collect().map(_.getLong(0)).toSeq
    assert(s2.sorted != s1.sorted)
  }

  test("topNPerGroup/stratifiedSample: a null group is kept, null ids never chosen") {
    val df = Seq(
      (java.lang.Long.valueOf(1L), null.asInstanceOf[String], 5.0),
      (java.lang.Long.valueOf(2L), null.asInstanceOf[String], 9.0),
      (java.lang.Long.valueOf(3L), "a", 7.0),
      (null.asInstanceOf[java.lang.Long], "a", 99.0) // best score but null id
    ).toDF("id", "g", "score")
    val got = Pipeline.topNPerGroup(df, "g", "id", "score", k = 1)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(2L, 3L)) // null group's best + a's best non-null-id row
    val strat = Pipeline.stratifiedSample(df, "g", "id", k = 5)
    assert(strat.where(col("g").isNull).count() == 2)
  }

  test("topNPerGroup: null scores are excluded from candidacy, not a crash") {
    val df = Seq(
      (1L, "a", java.lang.Double.valueOf(5.0)),
      (2L, "a", null.asInstanceOf[java.lang.Double]),
      (3L, "a", java.lang.Double.valueOf(7.0))
    ).toDF("id", "g", "score")
    val got = Pipeline.topNPerGroup(df, "g", "id", "score", k = 2)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 3L))
  }

  test("temperatureMixture: null ids excluded from counts; sentinel collision rejected") {
    // 100 "b" rows of which 50 have null ids: without the exclusion,
    // b's n=100 would deflate a's rate below 1000 even though only 50
    // b rows are keepable
    val df = ((1L to 100L).map(i => (java.lang.Long.valueOf(i), "a")) ++
      (1L to 50L).map(i => (java.lang.Long.valueOf(1000L + i), "b")) ++
      (1L to 50L).map(_ => (null.asInstanceOf[java.lang.Long], "b")))
      .toDF("id", "source")
    val kept = Pipeline.temperatureMixture(df, "id", "source", alpha = 0.5)
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("b") == 50L) // smallest countable source kept whole
    val bad = Seq((1L, "__null__"), (2L, null.asInstanceOf[String])).toDF("id", "source")
    val e = intercept[IllegalArgumentException] {
      Pipeline.temperatureMixture(bad, "id", "source")
    }
    assert(e.getMessage.contains("__null__"))
  }

  test("temperatureMixture: integer-coded and null sources are real groups") {
    val df = ((1L to 300L).map(i => (i, java.lang.Integer.valueOf(1))) ++
      (1001L to 1100L).map(i => (i, null.asInstanceOf[java.lang.Integer])))
      .toDF("id", "source")
    val kept = Pipeline.temperatureMixture(df, "id", "source", alpha = 0.5)
    // the null group is the smallest → kept whole; source columns intact
    assert(kept.where(col("source").isNull).count() == 100)
    assert(kept.columns.toSeq == Seq("id", "source"))
  }

  test("temperatureMixture: smallest source kept whole, big source sqrt-rated") {
    // a: 800 rows, b: 200 rows → rate_b = 1000‰ (whole), rate_a =
    // floor(1000·sqrt(200/800)) = 500‰
    val df = ((1L to 800L).map(i => (i, "a")) ++ (1001L to 1200L).map(i => (i, "b")))
      .toDF("id", "source")
    val kept = Pipeline.temperatureMixture(df, "id", "source", alpha = 0.5)
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("b") == 200L) // rate 1000 keeps every row
    assert(kept("a") > 300L && kept("a") < 700L) // ~50% hash keep
    // deterministic: a second run reproduces the exact counts
    val again = Pipeline.temperatureMixture(df, "id", "source", alpha = 0.5)
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == kept)
  }

  test("curateV3: first-fail precedence and dedup over the surviving pool only") {
    import spark.implicits._
    import graft.operators.QualityClassifier
    val docs = Seq(
      (1L, "alpha beta gamma clean one"),    // kept
      (2L, "short doc"),                     // len (2 < minTokens)
      (3L, "alpha beta gamma badword here"), // flagged by the classifier
      (4L, "alpha beta gamma clean one"),    // exact dup of 1 -> dup
      (5L, "alpha beta gamma badword here")  // identical to 3: flagged FIRST —
                                             // dedup must ignore docs dropped earlier
    ).toDF("doc_id", "text")
    // hand-built model (ClassifierSpec owns training): +2 weight on
    // badword's bucket, bias -1 — σ(1)=0.75 flags, σ(-1)=0.25 passes.
    // Guard against a hash collision poisoning the fixture: every
    // other token must land in a different bucket at this dim/seed.
    val dim = 4096
    val tokens = Seq("alpha", "beta", "gamma", "clean", "one", "short",
      "doc", "here", "badword")
    val buckets = tokens.map { t =>
      t -> spark.range(1).select(explode(
        graft.functions.DsirFeatures.dsirBuckets(lit(t), Seq(1), dim, 13L)))
        .collect()(0).getInt(0)
    }.toMap
    assert(tokens.filterNot(_ == "badword")
      .forall(t => buckets(t) != buckets("badword")),
      s"fixture collision at dim=$dim seed=13: $buckets")
    val wQ = new Array[Long](dim)
    wQ(buckets("badword")) = (2.0 * QualityClassifier.WeightScale).toLong
    val m = QualityClassifier.LrModel(wQ,
      -(1.0 * QualityClassifier.WeightScale).toLong, Seq(1), dim, 13L,
      binary = true)
    // pplTailMax very low so the ppl stage never fires here (pinned
    // separately by the gate census at sf0.01)
    val got = Pipeline.curateV3(docs, "doc_id", "text", m,
      minTokens = 3, pplTailMax = -1e9, hotK = 0)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got === Map(1L -> "kept", 2L -> "len", 3L -> "flagged",
      4L -> "dup", 5L -> "flagged"))
  }
}
