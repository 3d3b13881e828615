package graft

import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("MG guarantees hold on a zipf-ish stream across partitions") {
    // item i appears 1000/i times (i = 1..50) + 500 singletons of noise
    val rows = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"w$i")) ++
      (1 to 500).map(i => s"noise$i")
    val df = rows.toDF("tok").repartition(7)
    val n = rows.length.toLong
    val k = 20
    val est = HeavyHitters.heavyHitters(df, "tok", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // bounds: est <= true, undercount <= n/(k+1)
    est.foreach { case (t, e) =>
      assert(e <= truth(t), s"$t overestimated: $e > ${truth(t)}")
      assert(truth(t) - e <= n / (k + 1), s"$t undercounted beyond bound")
    }
    // recall: every item with true count > n/(k+1) is present
    val heavy = truth.filter(_._2 > n.toDouble / (k + 1)).keySet
    assert(heavy.nonEmpty && heavy.subsetOf(est.keySet),
      s"missing heavy hitters: ${heavy -- est.keySet}")
    // candidate set is bounded by k x partitions
    assert(est.size <= k * 7)
  }

  test("all-distinct stream yields only bounded candidates; nulls are skipped") {
    val df = ((1 to 1000).map(i => s"u$i") :+ null).toDF("tok").repartition(4)
    val got = HeavyHitters.heavyHitters(df, "tok", 10)
    assert(got.count() <= 40)
    assert(got.where(col("tok").isNull).count() == 0)
  }
}
