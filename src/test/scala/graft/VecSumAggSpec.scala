package graft

import org.apache.spark.sql.functions._

import graft.functions.VecSumAgg

class VecSumAggSpec extends SparkSpec {
  import spark.implicits._

  private val vecSum = VecSumAgg.vecSum

  test("sums vectors element-wise per group") {
    val df = Seq(
      ("a", Seq(1.0, 2.0, 3.0)),
      ("a", Seq(0.5, -2.0, 1.0)),
      ("b", Seq(10.0, 0.0, 0.0))).toDF("g", "v")
    val got = df.groupBy("g").agg(vecSum(col("v")).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got("a") == Seq(1.5, 0.0, 4.0))
    assert(got("b") == Seq(10.0, 0.0, 0.0))
  }

  test("skips null vectors; all-null group yields null") {
    val df = Seq(
      ("a", Option(Seq(1.0, 1.0))),
      ("a", None),
      ("b", None)).toDF("g", "v")
    val got = df.groupBy("g").agg(vecSum(col("v")).as("s"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("a").map(_.asInstanceOf[scala.collection.Seq[Double]].toSeq) ==
      Some(Seq(1.0, 1.0)))
    assert(got("b").isEmpty)
  }

  test("result is invariant to partitioning (partial aggregation merges)") {
    val n = 1000
    val df = spark.range(n)
      .select((col("id") % 7).as("g"),
        array(col("id").cast("double"), lit(1.0)).as("v"))
    val one = df.coalesce(1).groupBy("g").agg(vecSum(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val many = df.repartition(13).groupBy("g").agg(vecSum(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(one == many)
    // integer-valued doubles: sums are exact, counts land in dim 1
    assert(one(0L)(1) == math.ceil(n / 7.0))
  }

  test("zero-length vector is rejected (corrupt, not 'no input')") {
    val df = Seq(("a", Seq(1.0)), ("a", Seq.empty[Double])).toDF("g", "v")
    val e = intercept[Exception] {
      df.coalesce(1).groupBy("g").agg(vecSum(col("v")).as("s")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("zero-length")))
  }

  test("dimension mismatch fails fast with a clear message") {
    val df = Seq(("a", Seq(1.0, 2.0)), ("a", Seq(1.0))).toDF("g", "v")
    val e = intercept[Exception] {
      df.coalesce(1).groupBy("g").agg(vecSum(col("v")).as("s")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("dimension mismatch")))
  }
}
