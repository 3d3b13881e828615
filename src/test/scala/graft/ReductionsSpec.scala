package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Reductions

/** pandas-semantics truth table for the nine named reductions
  * (reference: dataframe/core.py:264-404) plus the properties SURVEY §5
  * commits to: partition invariance, skipna, min_count, ddof.
  */
class ReductionsSpec extends SparkSpec {
  import spark.implicits._

  private def mixed = Seq[(java.lang.Double, java.lang.Long)](
    (1.5, 10L), (2.5, null), (null, 30L), (4.0, 40L))
    .toDF("d", "i")

  test("sum skips nulls; int sums stay integral") {
    val r = Reductions.sum0(mixed).collect()(0)
    assert(r.getDouble(0) == 8.0)
    assert(r.getLong(1) == 80L)
    assert(Reductions.sum0(mixed).schema("i").dataType == LongType)
  }

  test("sum of all-null column is typed zero (pandas), not null") {
    val df = Seq[(java.lang.Double, java.lang.Long)]((null, null), (null, null))
      .toDF("d", "i")
    val r = Reductions.sum0(df).collect()(0)
    assert(r.getDouble(0) == 0.0)
    assert(r.getLong(1) == 0L)
  }

  test("min_count nulls out under-counted aggregates") {
    val r = Reductions.sum0(mixed, Seq("d"), minCount = 4).collect()(0)
    assert(r.isNullAt(0))
    val ok = Reductions.sum0(mixed, Seq("d"), minCount = 3).collect()(0)
    assert(ok.getDouble(0) == 8.0)
  }

  test("reductions are partition-invariant") {
    // The reference's chunk-header bug (core.py:254-255 + io.py:17-18)
    // made results depend on chunking; ours must not.
    val base = (1 to 1000).map(i => (i.toDouble, i.toLong)).toDF("d", "i")
    val expect = Reductions.sum0(base.repartition(1)).collect()(0)
    for (n <- Seq(3, 8, 32)) {
      val r = Reductions.sum0(base.repartition(n)).collect()(0)
      assert(r == expect, s"n=$n")
    }
    val m1 = Reductions.mean0(base.repartition(1), Seq("d")).collect()(0).getDouble(0)
    val m7 = Reductions.mean0(base.repartition(7), Seq("d")).collect()(0).getDouble(0)
    assert(math.abs(m1 - m7) < 1e-9)
  }

  test("std ddof 0/1/2 matches manual computation") {
    val xs = Seq(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0)
    val df = xs.toDF("x")
    val n = xs.size
    val mu = xs.sum / n
    val m2 = xs.map(v => (v - mu) * (v - mu)).sum
    for (ddof <- Seq(0, 1, 2)) {
      val got = Reductions.std0(df, Seq("x"), ddof).collect()(0).getDouble(0)
      val want = math.sqrt(m2 / (n - ddof))
      assert(math.abs(got - want) < 1e-12, s"ddof=$ddof got=$got want=$want")
    }
  }

  test("count counts non-null per column") {
    val r = Reductions.count0(mixed).collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
  }

  test("max/min/mean basics") {
    assert(Reductions.max0(mixed, Seq("d")).collect()(0).getDouble(0) == 4.0)
    assert(Reductions.min0(mixed, Seq("i")).collect()(0).getLong(0) == 10L)
    assert(math.abs(Reductions.mean0(mixed, Seq("d")).collect()(0).getDouble(0) - 8.0 / 3) < 1e-12)
  }

  test("all/any with pandas truthiness on numerics and nulls skipped") {
    val df = Seq[(java.lang.Double, java.lang.Boolean)](
      (1.0, true), (0.0, null), (2.0, true)).toDF("x", "b")
    val all = Reductions.all0(df).collect()(0)
    assert(all.getBoolean(0) == false) // 0.0 is falsy
    assert(all.getBoolean(1) == true)  // null skipped
    val any = Reductions.any0(df).collect()(0)
    assert(any.getBoolean(0) == true)
  }

  test("reduction on a frame with no numeric columns raises a clear error") {
    val df = Seq("a", "b").toDF("s")
    val e = intercept[IllegalArgumentException](Reductions.sum0(df))
    assert(e.getMessage.contains("no numeric columns"))
  }

  test("row-wise reductions: skipna semantics") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 2.0), (null, 3.0), (null, null)).toDF("a", "b")
    val cols = Seq(col("a"), col("b"))
    val got = df.select(
      Reductions.rowSum(cols).as("s"),
      Reductions.rowCount(cols).as("c"),
      Reductions.rowMean(cols).as("m"),
      Reductions.rowMax(cols).as("mx")).collect()
    assert(got(0) == Row(3.0, 2L, 1.5, 2.0))
    assert(got(1).getDouble(0) == 3.0 && got(1).getLong(1) == 1L && got(1).getDouble(2) == 3.0)
    assert(got(2).getDouble(0) == 0.0) // pandas: all-null row sums to 0
    assert(got(2).getLong(1) == 0L)
    assert(got(2).isNullAt(2)) // mean of nothing is null
    assert(got(2).isNullAt(3))
  }
}
