package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals plain groupBy on a hot-key distribution") {
    // 10k rows, 95% on one key — the shape salting exists for
    val df = (1 to 10000).map { i =>
      val k = if (i % 20 == 0) s"cold_${i % 7}" else "hot"
      (k, i.toDouble)
    }.toDF("k", "v").repartition(16)
    val expected = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sum"))
      .orderBy("k").collect()
    val got = Skew.saltedCountSum(df, "k", "v", salts = 8)
      .orderBy("k").collect()
    assert(got.toSeq == expected.toSeq)
  }

  test("result is invariant to the salt count") {
    val df = (1 to 500).map(i => ("x", i.toLong)).toDF("k", "v")
    val results = Seq(1, 4, 64).map(s =>
      Skew.saltedCountSum(df, "k", "v", salts = s).collect()(0))
    assert(results.distinct.size == 1)
  }
}
