package graft

import org.apache.spark.sql.functions._

import graft.operators.KneserNey

/** [[graft.operators.KneserNey]] — interpolated KN trigram LM:
  * hand-computed probabilities on a tiny corpus, the full backoff
  * ladder (unseen trigram / context / middle / tail token), hot-slice
  * vs plain-join parity, short-document contract, and the de-skewed
  * plan shape. */
class KneserNeySpec extends SparkSpec {

  /** One-doc corpus "a b a b c": trigram types (a,b,a):1 (b,a,b):1
    * (a,b,c):1 — small enough to derive every KN count by hand. */
  private def tiny() = {
    import spark.implicits._
    Seq((0L, "a b a b c")).toDF("doc_id", "text")
  }

  test("count tables derive every KN structure from the trigram types") {
    val t = KneserNey.countTables(tiny(), "text")
    val t3 = t.t3.collect().map(r =>
      ((r.getString(0), r.getString(1), r.getString(2)), r.getLong(3))).toMap
    assert(t3 === Map(("a", "b", "a") -> 1L, ("b", "a", "b") -> 1L,
      ("a", "b", "c") -> 1L))
    val ctx2 = t.ctx2.collect().map(r =>
      ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(ctx2 === Map(("a", "b") -> ((2L, 2L)), ("b", "a") -> ((1L, 1L))))
    val mid2 = t.mid2.collect().map(r =>
      (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(mid2 === Map("b" -> ((2L, 2L)), "a" -> ((1L, 1L))))
    val u3 = t.u3.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(u3 === Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
    val tot = t.totals.collect().head
    assert(tot.getDouble(0) === 3.0 && tot.getDouble(1) === 3.0) // nall, v
  }

  test("hand-computed interpolated KN ladder on the tiny corpus") {
    // score the corpus against itself; position (a,b,a):
    //   pU(a)  = (1+1)/((3+3)+1) = 2/7
    //   pBi(a|b) = (max(1-.75,0) + (.75*2)*(2/7)) / 2
    //   pTri(a|a,b) = (max(1-.75,0) + (.75*2)*pBi) / 2
    val pU = (1.0 + 1.0) / ((3.0 + 3.0) + 1.0)
    val pBiA = (math.max(1.0 - 0.75, 0.0) + (0.75 * 2.0) * pU) / 2.0
    val pTriA = (math.max(1.0 - 0.75, 0.0) + (0.75 * 2.0) * pBiA) / 2.0
    // position (b,a,b): ctx (b,a) c2ctx=1 n3=1; (a,b) n1p23=1; mid a:
    //   n1p2mid=1 n2=1; u3(b)=1
    val pBiB = (math.max(1.0 - 0.75, 0.0) + (0.75 * 1.0) * pU) / 1.0
    val pTriB = (math.max(1.0 - 0.75, 0.0) + (0.75 * 1.0) * pBiB) / 1.0
    // position (a,b,c): same ctx as A, bigram (b,c) n1p23=1, mid b
    val pBiC = (math.max(1.0 - 0.75, 0.0) + (0.75 * 2.0) * pU) / 2.0
    val pTriC = (math.max(1.0 - 0.75, 0.0) + (0.75 * 2.0) * pBiC) / 2.0
    val expected = math.log(pTriA) + math.log(pTriB) + math.log(pTriC)

    val r = KneserNey.trigramLogProb(tiny(), tiny(), "doc_id", "text",
      hotK = 0).collect().head
    assert(r.getLong(1) === 3L)
    assert(math.abs(r.getDouble(2) - expected) < 1e-12,
      s"lp_sum ${r.getDouble(2)} vs hand-computed $expected")
  }

  test("backoff ladder: unseen trigram, context, middle, and tail token") {
    import spark.implicits._
    val count = tiny()
    // "a b X": ctx (a,b) seen, trigram unseen, X unseen everywhere
    // "z z z": nothing seen -> pure floored unigram
    // "b a c": ctx (b,a) seen, (a,c) bigram unseen, mid a seen, c seen
    val probes = Seq((1L, "a b x"), (2L, "z z z"), (3L, "b a c"))
      .toDF("doc_id", "text")
    val lps = KneserNey.trigramLogProb(probes, count, "doc_id", "text",
      hotK = 0).collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    val pUx = (0.0 + 1.0) / ((3.0 + 3.0) + 1.0) // unseen x -> 1/7
    val pUc = (1.0 + 1.0) / ((3.0 + 3.0) + 1.0)
    // doc 1: pBi(x|b) = (max(0-.75,0) + (.75*2)*pUx)/2; tri ctx seen
    val pBiX = (0.0 + (0.75 * 2.0) * pUx) / 2.0
    val pTriX = (0.0 + (0.75 * 2.0) * pBiX) / 2.0
    assert(math.abs(lps(1L) - math.log(pTriX)) < 1e-12)
    // doc 2: ctx (z,z) unseen -> pBi; mid z unseen -> pU(z unseen)
    assert(math.abs(lps(2L) - math.log(1.0 / 7.0)) < 1e-12)
    // doc 3: ctx (b,a) seen c2ctx=1 n3=1; (a,c) unseen; mid a seen
    val pBiC3 = (0.0 + (0.75 * 1.0) * pUc) / 1.0
    val pTriC3 = (0.0 + (0.75 * 1.0) * pBiC3) / 1.0
    assert(math.abs(lps(3L) - math.log(pTriC3)) < 1e-12)
  }

  test("hot-slice path is bit-identical to the plain-join path") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val plain = KneserNey.trigramLogProb(docs, docs, "doc_id", "text",
        hotK = 0, localBound = 0)
      .collect().map(r => (r.getLong(0), (r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    val hot = KneserNey.trigramLogProb(docs, docs, "doc_id", "text",
        hotK = 64, localBound = 0)
      .collect().map(r => (r.getLong(0), (r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    assert(plain.keySet === hot.keySet)
    // counts identical; sums equal to the last ulp up to aggregation
    // order (the per-position doubles are identical — only the Σ
    // association differs between the two plans)
    for ((id, (n, lp)) <- plain) {
      assert(hot(id)._1 === n, s"doc $id n_scored")
      (lp, hot(id)._2) match {
        case (Some(a), Some(b)) =>
          assert(math.abs(a - b) < 1e-9, s"doc $id lp_sum $a vs $b")
        case (a, b) => assert(a === b, s"doc $id null mismatch")
      }
    }
  }

  test("local-stats path matches the distributed derivation and scoring (r20)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    // count tables: every stat table bit-identical (exact integers)
    val dist = KneserNey.countTables(docs, "text", localBound = 0)
    val loc = KneserNey.countTables(docs, "text")
    assert(loc.local, "fixture should be under the local-stats bound")
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.mkString("|")).toSet
    assert(rows(loc.t3) === rows(dist.t3))
    assert(rows(loc.ctx2) === rows(dist.ctx2))
    assert(rows(loc.b23) === rows(dist.b23))
    assert(rows(loc.mid2) === rows(dist.mid2))
    assert(rows(loc.u3) === rows(dist.u3))
    assert(rows(loc.totals) === rows(dist.totals))
    // scoring: same per-doc counts; lp sums to the last ulp (identical
    // per-position doubles, only Σ association differs between plans)
    val d = KneserNey.trigramLogProb(docs, docs, "doc_id", "text",
        hotK = 256, localBound = 0)
      .collect().map(r => (r.getLong(0), (r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    val l = KneserNey.trigramLogProb(docs, docs, "doc_id", "text",
        hotK = 256)
      .collect().map(r => (r.getLong(0), (r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    assert(d.keySet === l.keySet)
    for ((id, (n, lp)) <- d) {
      assert(l(id)._1 === n, s"doc $id n_scored")
      (lp, l(id)._2) match {
        case (Some(a), Some(b)) =>
          assert(math.abs(a - b) < 1e-9, s"doc $id lp_sum $a vs $b")
        case (a, b) => assert(a === b, s"doc $id null mismatch")
      }
    }
  }

  test("documents under 3 tokens score n_scored = 0 with null lp_sum") {
    import spark.implicits._
    val probes = Seq((1L, "one two"), (2L, ""), (3L, "   "),
      (4L, "a b c")).toDF("doc_id", "text")
    val rows = KneserNey.trigramLogProb(probes, tiny(), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.isNullAt(2))).toList
      .sortBy(_._1)
    assert(rows === List((1L, 0L, true), (2L, 0L, true), (3L, 0L, true),
      (4L, 1L, false))) // 3 tokens = exactly one trigram position
  }

  test("perplexitySplit labels by fixed thresholds and drops unscoreable docs") {
    import spark.implicits._
    // count corpus = the repetitive doc only, so its trigrams are
    // in-model (head) while the noise doc backs off to floored
    // unigrams (tail) — self-scoring would make BOTH seen
    val count = Seq((0L, "a b a b c a b a b c a b a b c"))
      .toDF("doc_id", "text")
    val docs = Seq((1L, "a b a b c a b a b c a b a b c"),
      (2L, "q w e r t y u i o p"), (3L, "hi")).toDF("doc_id", "text")
    val out = KneserNey.perplexitySplit(docs, count, "doc_id", "text",
      headMin = -2.0, middleMin = -6.0, hotK = 0)
      .select("doc_id", "label").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(!out.contains(3L), "2-token doc must be dropped")
    assert(out(1L) === "head", s"repetitive doc got ${out(1L)}")
    assert(out(2L) !== "head", s"noise doc got ${out(2L)}")
  }

  test("loud contracts: discount range and negative hotK") {
    val e1 = intercept[IllegalArgumentException] {
      KneserNey.trigramLogProb(tiny(), tiny(), "doc_id", "text",
        discount = 1.5)
    }
    assert(e1.getMessage.contains("discount"))
    val e2 = intercept[IllegalArgumentException] {
      KneserNey.trigramLogProb(tiny(), tiny(), "doc_id", "text",
        hotK = -1)
    }
    assert(e2.getMessage.contains("hotK"))
  }

  test("plan shape: hot slices broadcast, no cartesian beyond the 1-row totals") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val df = KneserNey.trigramLogProb(docs, docs, "doc_id", "text",
      hotK = 64, localBound = 0)
    df.collect()
    var bhj = 0; var bnl = 0; var cart = 0
    def walk(p: SparkPlan): Unit = p.foreach {
      case q: QueryStageExec => walk(q.plan)
      case _: BroadcastHashJoinExec => bhj += 1
      case _: BroadcastNestedLoopJoinExec => bnl += 1
      case _: CartesianProductExec => cart += 1
      case _ => ()
    }
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case other => walk(other)
    }
    assert(cart === 0, "no cartesian product anywhere")
    // five hot slices broadcast (AQE may also broadcast small residual
    // joins at this fixture size — at least the slices must be there)
    assert(bhj >= 5, s"expected >=5 broadcast hash joins, got $bhj")
    // the only nested-loop is the 1-row totals attach
    assert(bnl <= 2, s"totals cross join only, got $bnl")
  }

  /** Per-shuffle-stage (total, max-partition) bytes of an EXECUTED
    * adaptive plan — the SkewSpec mapStats probe. */
  private def shuffleStageBytes(
      df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def walk(p: SparkPlan): Unit = p.foreach {
      case s: ShuffleQueryStageExec =>
        s.mapStats.foreach(ms =>
          out += ((ms.bytesByPartitionId.sum, ms.bytesByPartitionId.max)))
        walk(s.plan)
      case q: QueryStageExec => walk(q.plan)
      case _ => ()
    }
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case other => walk(other)
    }
    out.toSeq
  }

  test("passenger salt spreads a hot gram across partitions (round-15 fix, measured)") {
    // every trigram has w2 = 'the', so with hotK >= 1 EVERY probe row
    // is a broadcast passenger on the w2 attach. The pre-fix salt
    // hashed only the key columns — one synthetic key, the whole
    // probe volume through ONE reduce partition. The fixed salt mixes
    // row-varying columns, so no partition may dominate.
    val pKey = "spark.sql.shuffle.partitions"
    val bKey = "spark.sql.autoBroadcastJoinThreshold"
    val (prevP, prevB) = (spark.conf.get(pKey), spark.conf.get(bKey))
    try {
      spark.conf.set(pKey, "32")
      spark.conf.set(bKey, "-1") // keep residual joins real shuffles
      import spark.implicits._
      val docs = (0 until 3000).map { i =>
        (i.toLong, s"w$i the x$i the y$i the z$i")
      }.toDF("doc_id", "text")
      val df = KneserNey.trigramLogProb(docs, docs, "doc_id", "text",
        hotK = 8, localBound = 0)
      df.collect()
      // the byte-dominant shuffle stage is the salted passenger
      // exchange; bounded means its max partition carries well under
      // the whole volume (32 partitions — uniform would be ~3%)
      val (total, mx) = shuffleStageBytes(df).maxBy(_._1)
      val frac = mx.toDouble / total
      assert(frac < 0.25,
        f"hot-gram passenger shuffle funnels: max partition carries $frac%.2f of the stage")
    } finally {
      spark.conf.set(pKey, prevP)
      spark.conf.set(bKey, prevB)
    }
  }
}
