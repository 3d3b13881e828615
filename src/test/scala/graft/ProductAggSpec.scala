package graft

import org.apache.spark.sql.functions._

import graft.functions.ProductAgg.product
import graft.operators.Reductions

class ProductAggSpec extends SparkSpec {
  import spark.implicits._

  test("product multiplies, skipping nulls") {
    val df = Seq[java.lang.Double](1.0, 2.0, null, 3.0, 4.0).toDF("x")
    assert(df.agg(product(col("x"))).collect()(0).getDouble(0) == 24.0)
  }

  test("product is partition-invariant (merge path)") {
    val df = (1 to 10).map(_.toDouble).toDF("x")
    val expect = (1 to 10).map(_.toDouble).product
    for (n <- Seq(1, 3, 8)) {
      val got = df.repartition(n).agg(product(col("x"))).collect()(0).getDouble(0)
      assert(got == expect, s"n=$n")
    }
  }

  test("all-null and empty inputs: raw null, facade identity 1.0") {
    val allNull = Seq[java.lang.Double](null, null).toDF("x")
    assert(allNull.agg(product(col("x"))).collect()(0).isNullAt(0))
    assert(Reductions.prod0(allNull).collect()(0).getDouble(0) == 1.0)
    val empty = Seq.empty[Double].toDF("x")
    assert(Reductions.prod0(empty).collect()(0).getDouble(0) == 1.0)
  }

  test("integer input is cast to double") {
    val df = Seq(2L, 3L, 4L).toDF("x")
    assert(df.agg(product(col("x"))).collect()(0).getDouble(0) == 24.0)
  }

  test("min_count gates the product") {
    val df = Seq[java.lang.Double](2.0, null).toDF("x")
    assert(Reductions.prod0(df, Seq("x"), minCount = 2).collect()(0).isNullAt(0))
  }
}
