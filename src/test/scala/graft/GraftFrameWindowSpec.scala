package graft

import org.apache.spark.sql.functions._

import graft.api.GraftFrame

/** rolling / shift / diff / melt / sample_mod facade semantics. */
class GraftFrameWindowSpec extends SparkSpec {
  import spark.implicits._

  private def series = Seq(
    ("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0), ("a", 4, 40.0),
    ("b", 1, 5.0), ("b", 2, 7.0)).toDF("grp", "t", "v")

  test("rolling mean: null until a full window, then windowed average") {
    val got = new GraftFrame(series)
      .rolling("v", "t", window = 3, fn = "mean", partitionCols = Seq("grp"))
      .toDF.where(col("grp") === "a").orderBy("t")
      .select("v_roll_mean").collect()
      .map(r => Option(r.getAs[java.lang.Double](0)).map(_.toDouble))
    assert(got.toSeq == Seq(None, None, Some(20.0), Some(30.0)))
  }

  test("rolling sum/min/max agree with manual windows") {
    val sums = new GraftFrame(series)
      .rolling("v", "t", window = 2, fn = "sum", partitionCols = Seq("grp"))
      .toDF.where(col("grp") === "b").orderBy("t")
      .select("v_roll_sum").collect()
      .map(r => Option(r.getAs[java.lang.Double](0)).map(_.toDouble))
    assert(sums.toSeq == Seq(None, Some(12.0)))
    intercept[IllegalArgumentException] {
      new GraftFrame(series).rolling("v", "t", 2, fn = "median",
        partitionCols = Seq("grp"))
    }
  }

  test("global-window guard: empty partitionCols requires explicit opt-in") {
    // unguarded global window = whole-frame single-partition sort — an
    // error unless the caller opts in (r18 VERDICT item 5)
    val msg = intercept[IllegalArgumentException] {
      new GraftFrame(series).cumsum("v", "t")
    }.getMessage
    assert(msg.contains("allowGlobalWindow"))
    intercept[IllegalArgumentException] { new GraftFrame(series).rolling("v", "t", 2) }
    intercept[IllegalArgumentException] { new GraftFrame(series).shift("v", "t") }
    intercept[IllegalArgumentException] { new GraftFrame(series).diff("v", "t") }
    // opted in: same numbers as the manual running sum, through the
    // explicit constant-partition window
    val got = new GraftFrame(series.where(col("grp") === "a"))
      .cumsum("v", "t", allowGlobalWindow = true)
      .toDF.orderBy("t").select("v_cumsum").collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(10.0, 30.0, 60.0, 100.0))
    val sh = new GraftFrame(series.where(col("grp") === "b"))
      .shift("v", "t", allowGlobalWindow = true)
      .toDF.orderBy("t").collect()
      .map(r => Option(r.getAs[java.lang.Double]("v_shift")).map(_.toDouble))
    assert(sh.toSeq == Seq(None, Some(5.0)))
  }

  test("shift and diff match pandas lag semantics") {
    val got = new GraftFrame(series)
      .shift("v", "t", periods = 1, partitionCols = Seq("grp"))
      .diff("v", "t", partitionCols = Seq("grp"))
      .toDF.where(col("grp") === "a").orderBy("t")
      .collect()
    val shifts = got.map(r => Option(r.getAs[java.lang.Double]("v_shift")))
    val diffs = got.map(r => Option(r.getAs[java.lang.Double]("v_diff")))
    assert(shifts.head.isEmpty && diffs.head.isEmpty)
    assert(shifts(1).contains(10.0) && diffs(1).contains(10.0))
    assert(diffs(3).contains(10.0))
  }

  test("melt produces one row per id x valueVar") {
    val wide = Seq((1, 2.0, 3.0)).toDF("id", "x", "y")
    val long = new GraftFrame(wide).melt(Seq("id"), Seq("x", "y")).toDF
      .orderBy("variable").collect()
    assert(long.length == 2)
    assert(long.map(_.getAs[String]("variable")).toSeq == Seq("x", "y"))
    assert(long.map(_.getAs[Double]("value")).toSeq == Seq(2.0, 3.0))
  }

  test("sample_mod keeps exactly the rows in the keyed bucket") {
    val df = spark.range(100).toDF("k")
    val kept = new GraftFrame(df).sample_mod("k", mod = 10, bucket = 3)
      .toDF.collect().map(_.getAs[Long]("k"))
    assert(kept.length == 10)
    assert(kept.forall(_ % 10 == 3))
  }
}
