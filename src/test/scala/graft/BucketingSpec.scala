package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing — the pre-shuffle strategy for
  * repeatedly-joined 100 TB fact tables: both sides bucketed on the join
  * key with the same bucket count join WITHOUT a shuffle exchange.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with zero shuffle exchanges") {
    val a = (1L to 2000L).map(i => (i, i * 2.0)).toDF("k", "va")
    val b = (1L to 2000L).map(i => (i, s"s$i")).toDF("k", "vb")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    a.write.bucketBy(8, "k").sortBy("k").saveAsTable("graft_bkt_a")
    b.write.bucketBy(8, "k").sortBy("k").saveAsTable("graft_bkt_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bkt_a")
        .join(spark.table("graft_bkt_b"), "k")
      val n = joined.count()
      assert(n == 2000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free co-located join, got:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }
}
