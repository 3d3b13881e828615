package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target: cooking-flavored; raw: mostly legal-flavored plus a couple
  // of cooking docs the sampler should surface.
  private def target = Seq(
    (0L, "stir the sauce then bake the bread"),
    (1L, "bake the cake and stir the batter"),
    (2L, "season the sauce and bake slowly")).toDF("id", "text")

  private def raw = Seq(
    (10L, "the court held that the statute applies"),
    (11L, "counsel moved to dismiss the complaint"),
    (12L, "stir the sauce and bake the bread"),
    (13L, "the statute of limitations bars the claim"),
    (14L, "bake the cake then season the sauce"),
    (15L, "the appellate court reversed the judgment")).toDF("id", "text")

  test("fit + score rank target-like documents above the rest") {
    val model = Dsir.fit(target, raw, "text", numBuckets = 256)
    val scores = raw.select(col("id"), Dsir.score(col("text"), model).as("w"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val cooking = Seq(12L, 14L).map(scores)
    val legal = Seq(10L, 11L, 13L, 15L).map(scores)
    assert(cooking.min > legal.max,
      s"cooking docs should outscore legal docs: $scores")
  }

  test("scoreNano is an exact integer, deterministic across partitioning") {
    val model = Dsir.fit(target, raw, "text", numBuckets = 256)
    val a = raw.select(col("id"), Dsir.scoreNano(col("text"), model).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = raw.repartition(5)
      .select(col("id"), Dsir.scoreNano(col("text"), model).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("empty text scores 0; null text scores null") {
    val model = Dsir.fit(target, raw, "text", numBuckets = 256)
    val df = Seq((0L, ""), (1L, null.asInstanceOf[String])).toDF("id", "text")
    val got = df.select(col("id"), Dsir.scoreNano(col("text"), model).as("n"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(0L).contains(0L))
    assert(got(1L).isEmpty)
  }

  test("resampleTopN keeps the n best and compiles to a bounded top-n, not a sort") {
    val model = Dsir.fit(target, raw, "text", numBuckets = 256)
    val picked = Dsir.resampleTopN(raw, "id", "text", model, n = 2)
    assert(picked.select("id").collect().map(_.getLong(0)).toSet == Set(12L, 14L))
    val plan = picked.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  /** Driver-side replica of [[graft.operators.Pipeline.hashBucket]] for
    * non-negative ids — lets the distribution property run 20k seeds
    * without 20k Spark jobs. */
  private def hashBucketReplica(id: Long, buckets: Int, seed: Long): Long = {
    val M = 2147483647L
    val K = 1103515245L
    val folded = id ^ (id >>> 31)
    val r1 = math.floorMod(math.floorMod(folded, M) * K, M)
    math.floorMod((r1 ^ seed) * K, M) % buckets
  }

  private def gumbelKey(id: Long, lw: Double, seed: Long): Double = {
    val b = 1 << 30
    val u = (hashBucketReplica(id, b, seed).toDouble + 0.5) / b.toDouble
    lw + -math.log(-math.log(u))
  }

  test("resampleGumbel matches a driver-side replay of the seeded keys") {
    val model = Dsir.fit(target, raw, "text", numBuckets = 256)
    val scores = raw.select(col("id"), Dsir.score(col("text"), model).as("lw"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (seed <- Seq(0L, 1L, 7L, 99L, 12345L)) {
      val got = Dsir.resampleGumbel(raw, "id", "text", model, n = 2, seed = seed)
        .select("id").collect().map(_.getLong(0)).toSet
      val want = scores.toSeq
        .sortBy { case (id, lw) => (-gumbelKey(id, lw, seed), id) }
        .take(2).map(_._1).toSet
      assert(got == want, s"seed=$seed")
    }
    // and the plan is still a bounded top-n, not a global sort
    val plan = Dsir.resampleGumbel(raw, "id", "text", model, n = 2, seed = 0L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("resampleGumbel: single-draw frequencies over many seeds recover the softmax") {
    // The Gumbel-max theorem: P(argmax_i (lw_i + G_i) = j) = softmax(lw)_j.
    // Replicate the operator's exact key arithmetic over 20k seeds and
    // compare empirical winner frequencies to the softmax — a biased
    // uniform (the hash) or a wrong key formula breaks this.
    val model = Dsir.fit(target, raw, "text", numBuckets = 256)
    val scores = raw.select(col("id"), Dsir.score(col("text"), model).as("lw"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val exp = scores.map { case (id, lw) => id -> math.exp(lw) }
    val z = exp.map(_._2).sum
    val softmax = exp.map { case (id, w) => id -> w / z }.toMap
    val draws = 20000
    val wins = scala.collection.mutable.Map.empty[Long, Int].withDefaultValue(0)
    for (seed <- 0 until draws) {
      val winner = scores.minBy { case (id, lw) => (-gumbelKey(id, lw, seed.toLong), id) }._1
      wins(winner) += 1
    }
    softmax.foreach { case (id, p) =>
      val phat = wins(id).toDouble / draws
      assert(math.abs(phat - p) < 0.02,
        s"id=$id softmax=$p empirical=$phat")
    }
  }

  test("non-power-of-two bucket count is rejected") {
    val model = Dsir.fit(target, raw, "text", numBuckets = 256)
    val bad = model.copy(nanoRatios = new Array[Long](100), numBuckets = 100)
    val e = intercept[Exception] {
      raw.select(Dsir.scoreNano(col("text"), bad)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("power of two"), e.getMessage)
  }

  test("bucket histogram partial-aggregates before the exchange") {
    val plan = Dsir.bucketCounts(raw, "text", numBuckets = 256)
      .queryExecution.executedPlan.toString
    // two-phase hash aggregate: a partial agg must appear below the shuffle
    assert(plan.contains("HashAggregate"), plan)
    assert(plan.contains("Exchange"), plan)
  }
}
