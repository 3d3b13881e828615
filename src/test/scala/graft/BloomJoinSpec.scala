package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomJoin

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloomSemiJoin equals the plain semi-join (no lost rows, no extras)") {
    val large = spark.range(0, 10000)
      .select(col("id").as("k"), (col("id") % 97).as("payload"))
    // sparse build side: every 37th key, plus keys the large side lacks
    val small = spark.range(0, 20000)
      .where(col("id") % 37 === 0).select(col("id").as("sk"))
    val got = BloomJoin.bloomSemiJoin(large, "k", small, "sk", expectedItems = 1000)
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    val want = large.join(small.select(col("sk").as("k")), Seq("k"), "left_semi")
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(got == want)
    assert(want.nonEmpty && want == (0L until 10000L by 37).toSeq)
  }

  test("string keys and duplicate build keys work; empty build side → empty result") {
    val large = Seq("a", "b", "c", "d").toDF("k")
    val small = Seq("b", "b", "d", "zz").toDF("sk")
    val got = BloomJoin.bloomSemiJoin(large, "k", small, "sk")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("b", "d"))
    val empty = BloomJoin.bloomSemiJoin(large, "k", small.where(lit(false)), "sk")
    assert(empty.count() == 0)
  }

  test("mixed integral key types hash consistently (int probe vs bigint build)") {
    val large = spark.range(0, 1000).select(col("id").cast("int").as("k"))
    val small = spark.range(0, 1000).where(col("id") % 10 === 0)
      .select(col("id").as("sk")) // bigint
    val got = BloomJoin.bloomSemiJoin(large, "k", small, "sk", expectedItems = 100)
      .count()
    assert(got == 100) // every multiple of 10 must survive the bloom
    // non-coercible types are rejected loudly
    val bad = intercept[IllegalArgumentException] {
      BloomJoin.bloomSemiJoin(large, "k", small.select(col("sk").cast("string")), "sk")
    }
    assert(bad.getMessage.contains("share a type"))
  }

  test("the bloom predicate sits in the plan before the join") {
    val large = spark.range(0, 100).select(col("id").as("k"))
    val small = spark.range(0, 10).select(col("id").as("sk"))
    val plan = BloomJoin.bloomSemiJoin(large, "k", small, "sk")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
  }
}
