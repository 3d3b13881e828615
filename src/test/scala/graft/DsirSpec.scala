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
