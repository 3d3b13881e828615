package graft

import org.apache.spark.sql.functions._

import graft.functions.{CharGramBuckets, DsirFeatures}
import graft.operators.{MultiClass, QualityClassifier, TextOps}

/** [[graft.operators.MultiClass]] + [[graft.functions.CharGramBuckets]]
  * + [[graft.operators.TextOps.langIdTrain]] — K-class one-vs-rest
  * training: exact agreement with the binary trainer on 2 classes,
  * char-gram featurization kernel identities, argmax tiebreak, the
  * persist/rebuild round trip, trained langid end-to-end, and loud
  * contracts. */
class MultiClassSpec extends SparkSpec {

  private val D = 64

  private def feats = array_distinct(
    DsirFeatures.dsirBuckets(col("text"), Seq(1), D, 13L))

  private def toy() = {
    import spark.implicits._
    Seq(
      (0L, "good fast table scan", "pos"),
      (1L, "good merge join good", "pos"),
      (2L, "good window agg row", "pos"),
      (3L, "bad slow table scan", "neg"),
      (4L, "bad merge join bad", "neg"),
      (5L, "bad window agg row", "neg")
    ).toDF("doc_id", "text", "lab")
  }

  test("charGramBuckets: hand-computed FNV bucket, multiplicity, lowercasing") {
    import spark.implicits._
    def fnvBucket(g: String, mask: Int): Int = {
      // FNV-1a, independently restated (offset/prime are the public
      // constants) so the kernel can't be "tested" against itself
      var h = 0xcbf29ce484222325L ^ 13L
      g.getBytes("UTF-8").foreach { b =>
        h ^= (b & 0xffL); h *= 0x100000001b3L
      }
      (h & mask).toInt
    }
    val got = Seq(("AbA", 0)).toDF("text", "i")
      .select(CharGramBuckets.charGramBuckets(col("text"), Seq(2), D, 13L)
        .as("b")).collect()(0).getSeq[Int](0)
    // lowercased "aba" → bigrams "ab", "ba" (document order, multiplicity)
    assert(got === Seq(fnvBucket("ab", D - 1), fnvBucket("ba", D - 1)))
    // too-short strings yield no grams (not a null, not a phantom)
    val short = Seq(("x", 0)).toDF("text", "i")
      .select(CharGramBuckets.charGramBuckets(col("text"), Seq(2), D, 13L)
        .as("b")).collect()(0).getSeq[Int](0)
    assert(short.isEmpty)
  }

  test("two classes reproduce the binary trainer weight-for-weight") {
    val docs = toy().withColumn("y",
      when(col("lab") === "pos", 1).otherwise(0))
    val bin = QualityClassifier.trainLogistic(docs, "text", "y", D,
      rounds = 7, lr = 0.25, binary = true)
    val mc = MultiClass.train(docs, feats, "lab", Seq("pos", "neg"), D,
      rounds = 7, lr = 0.25)
    // class 0 ("pos") of the one-vs-rest model IS the binary model:
    // identical features, identical residuals, identical grid updates
    assert(mc.weightsQ(0).toSeq === bin.weightsQ.toSeq)
    assert(mc.biasQ(0) === bin.biasQ)
  }

  test("learns a 3-class keyword signal and argmax ties go to the earliest label") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha fast table", "a"), (1L, "alpha merge join", "a"),
      (2L, "beta fast table", "b"), (3L, "beta merge join", "b"),
      (4L, "gamma fast table", "c"), (5L, "gamma merge join", "c")
    ).toDF("doc_id", "text", "lab")
    val m = MultiClass.train(docs, feats, "lab", Seq("a", "b", "c"), D,
      rounds = 10, lr = 0.25)
    val got = MultiClass.scored(docs, feats, m, "pred")
      .select("lab", "pred").collect()
    assert(got.forall(r => r.getString(0) == r.getString(1)),
      got.mkString(", "))
    // tie case: a doc with NO features scores the three intercepts;
    // build a model with equal intercepts and zero weights
    val tie = MultiClass.McModel(Seq("a", "b", "c"),
      Array.fill(3)(new Array[Long](D)), Array(5L, 5L, 5L), D)
    val pred = MultiClass.scored(
      Seq((0L, "zz", "a")).toDF("doc_id", "text", "lab")
        .withColumn("f", typedLit(Seq.empty[Int])),
      col("f"), tie, "pred").select("pred").collect()(0).getString(0)
    assert(pred === "a", "equal scores must resolve to the earliest label")
  }

  test("modelFrame/modelFromRows round trip is exact") {
    val docs = toy()
    val m = MultiClass.train(docs, feats, "lab", Seq("pos", "neg"), D,
      rounds = 5, lr = 0.25, classWeights = Seq(2L, 1L))
    val back = MultiClass.modelFromRows(
      MultiClass.modelFrame(docs, m), Seq("pos", "neg"), D)
    assert(back.weightsQ.map(_.toSeq).toSeq === m.weightsQ.map(_.toSeq).toSeq)
    assert(back.biasQ.toSeq === m.biasQ.toSeq)
  }

  test("gradient shuffle is bucket-bounded and all-K-in-one-pass") {
    // the K residual sums ride ONE groupBy(bucket): assert a partial
    // aggregate exists and nothing cartesian sneaks in
    val docs = toy()
    val grad = docs.select(
      lit(1L).as("__r0"), lit(2L).as("__r1"),
      explode(feats).as("bucket"))
      .groupBy("bucket").agg(sum("__r0"), sum("__r1"))
    val plan = grad.queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum") || plan.contains("Partial"), plan)
    assert(!plan.contains("CartesianProduct"))
  }

  test("trained langid separates two synthetic languages end-to-end") {
    import spark.implicits._
    val docs = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, "the cat and the dog of the house", "en")
      else (i.toLong, "der hund und die katze und das haus", "de")
    }.toDF("doc_id", "text", "lang")
    val m = TextOps.langIdTrain(docs, "text", "lang", Seq("en", "de"),
      numBuckets = 128, ns = Seq(2), rounds = 5, lr = 0.25)
    val acc = TextOps.langIdPredict(docs, "text", m, "pred")
      .agg(avg(when(col("pred") === col("lang"), 1.0).otherwise(0.0)))
      .collect()(0).getDouble(0)
    assert(acc === 1.0)
  }

  test("langIdPredict minScore: low-confidence predictions become 'unknown'") {
    import spark.implicits._
    val docs = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, "the cat and the dog of the house", "en")
      else (i.toLong, "der hund und die katze und das haus", "de")
    }.toDF("doc_id", "text", "lang")
    val m = TextOps.langIdTrain(docs, "text", "lang", Seq("en", "de"),
      numBuckets = 128, ns = Seq(2), rounds = 5, lr = 0.25)
    // threshold 0: every row gets a real label; threshold 1.0: scores
    // are algebraic sigmoids strictly below 1, so EVERYTHING rejects
    val open = TextOps.langIdPredict(docs, "text", m, "pred")
    assert(open.where(col("pred") === "unknown").count() === 0)
    val strict = TextOps.langIdPredict(docs, "text", m, "pred", minScore = 1.0)
    assert(strict.where(col("pred") =!= "unknown").count() === 0)
    // an attainable threshold keeps the confident rows' labels intact
    val cut = TextOps.langIdPredict(docs, "text", m, "pred", minScore = 0.5)
    assert(cut.where(col("pred") =!= "unknown")
      .where(col("pred") =!= col("lang")).count() === 0,
      "surviving predictions must still be correct")
  }

  test("evalMetrics/macroSummary: hand-computed K-class census with an absent class") {
    import spark.implicits._
    // truth:  a a a a b b c      pred: a a b a b a c
    // a: tp=3 n_true=4 n_pred=4 → p=0.75  r=0.75  f1=0.75
    // b: tp=1 n_true=2 n_pred=2 → p=0.5   r=0.5   f1=0.5
    // c: tp=1 n_true=1 n_pred=1 → p=1 r=1 f1=1
    // d: absent everywhere → 0/0/0 with p=r=f1=0 (zero-division rule)
    val scored = Seq(
      ("a", "a"), ("a", "a"), ("a", "b"), ("a", "a"),
      ("b", "b"), ("b", "a"), ("c", "c")
    ).toDF("y", "pred")
    val per = MultiClass.evalMetrics(scored, Seq("a", "b", "c", "d"), "y", "pred")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .sortBy(_._1)
    assert(per.toSeq === Seq(
      ("a", 3L, 4L, 4L, 0.75, 0.75, 0.75),
      ("b", 1L, 2L, 2L, 0.5, 0.5, 0.5),
      ("c", 1L, 1L, 1L, 1.0, 1.0, 1.0),
      ("d", 0L, 0L, 0L, 0.0, 0.0, 0.0)))
    val m = MultiClass.macroSummary(
      MultiClass.evalMetrics(scored, Seq("a", "b", "c", "d"), "y", "pred"),
      Seq("a", "b", "c", "d")).collect()(0)
    // macro = ((0.75 + 0.5) + 1.0 + 0.0)/4 = 0.5625; accuracy = 5/7
    assert(m.getAs[Double]("macro_precision") === 0.5625)
    assert(m.getAs[Double]("macro_recall") === 0.5625)
    assert(m.getAs[Double]("macro_f1") === 0.5625)
    assert(m.getAs[Double]("accuracy") === math.rint(5.0 / 7.0 * 1e6) / 1e6)
    // confusion census is the K²-bounded base table
    val conf = MultiClass.confusion(scored, "y", "pred").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted
    assert(conf.toSeq === Seq(("a", "a", 3L), ("a", "b", 1L),
      ("b", "a", 1L), ("b", "b", 1L), ("c", "c", 1L)))
  }

  test("broadcast margin path is bit-equal to the plan-literal path") {
    // Large models (numBuckets >= BroadcastBucketThreshold) fold the
    // margins over a broadcast weight matrix instead of K plan
    // literals (round-15 advisory). Force the broadcast path at the
    // gates' tiny bucket count and require bit-identical training AND
    // scoring — the two paths do the same Long fold + one division.
    val docs = toy()
    val labels = Seq("pos", "neg")
    val lit_ = MultiClass.train(docs, feats, "lab", labels, D, rounds = 6,
      localBound = 0)
    val bc = MultiClass.train(docs, feats, "lab", labels, D, rounds = 6,
      broadcastThreshold = 1, localBound = 0)
    assert(bc.biasQ.toSeq === lit_.biasQ.toSeq)
    // driver-local GD dispatch: bit-identical to both (r20)
    val loc = MultiClass.train(docs, feats, "lab", labels, D, rounds = 6)
    assert(loc.biasQ.toSeq === lit_.biasQ.toSeq)
    assert(loc.weightsQ.map(_.toSeq).toSeq === lit_.weightsQ.map(_.toSeq).toSeq)
    assert(bc.weightsQ.map(_.toSeq).toSeq === lit_.weightsQ.map(_.toSeq).toSeq)
    val a = MultiClass.scored(docs, feats, lit_)
      .select("doc_id", "score_pos", "score_neg", "pred_label")
      .orderBy("doc_id").collect().toSeq
    val b = MultiClass.scored(docs, feats, lit_, broadcastThreshold = 1)
      .select("doc_id", "score_pos", "score_neg", "pred_label")
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("loud contracts: labels, buckets, class weights, unknown model label") {
    val docs = toy()
    intercept[IllegalArgumentException] {
      MultiClass.train(docs, feats, "lab", Seq("pos"), D)
    }
    intercept[IllegalArgumentException] {
      MultiClass.train(docs, feats, "lab", Seq("pos", "pos"), D)
    }
    intercept[IllegalArgumentException] {
      MultiClass.train(docs, feats, "lab", Seq("pos", "neg"), 63)
    }
    intercept[IllegalArgumentException] {
      MultiClass.train(docs, feats, "lab", Seq("pos", "neg"), D, lr = 0.3)
    }
    intercept[IllegalArgumentException] {
      MultiClass.train(docs, feats, "lab", Seq("pos", "neg"), D,
        classWeights = Seq(3L, 1L))
    }
    intercept[IllegalArgumentException] {
      // label outside the inventory must fail the setup scan
      MultiClass.train(docs, feats, "lab", Seq("pos", "other"), D)
    }
    intercept[IllegalArgumentException] {
      MultiClass.modelFromRows(
        MultiClass.modelFrame(docs,
          MultiClass.train(docs, feats, "lab", Seq("pos", "neg"), D)),
        Seq("pos", "UNKNOWN"), D)
    }
  }
}
