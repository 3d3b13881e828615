package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.GraftFrame

class GraftFrameMissingDataSpec extends SparkSpec {
  import spark.implicits._

  private def frame = new GraftFrame(
    Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 10.0, "a"), (2L, null, "b"), (null, 30.0, null), (4L, 40.0, "a"))
      .toDF("k", "v", "s"))

  test("fillna fills typed defaults per column subset") {
    val f = frame.fillna(0.0, Seq("v"))
    assert(f.toDF.collect().map(_.getDouble(1)).toSeq == Seq(10.0, 0.0, 30.0, 40.0))
    val g = frame.fillna("missing", Seq("s"))
    assert(g.toDF.collect()(2).getString(2) == "missing")
  }

  test("dropna any/all with subset") {
    assert(frame.dropna("any").count() == 2)
    assert(frame.dropna("any", Seq("k")).count() == 3)
    assert(frame.dropna("all").count() == 4)
  }

  test("astype casts named columns") {
    val t = frame.astype(Map("k" -> DoubleType, "v" -> StringType))
    assert(t.schema("k").dataType == DoubleType)
    assert(t.schema("v").dataType == StringType)
    assert(t.schema("s").dataType == StringType)
  }

  test("value_counts orders by count desc then value") {
    val vc = frame.value_counts("s").toDF.collect()
    assert(vc(0).getString(0) == "a" && vc(0).getLong(1) == 2L)
  }

  test("nunique exact and approx agree on small data") {
    // pandas nunique(dropna=True): null is NOT a distinct value — and
    // approx_count_distinct ignores nulls too, so both paths agree
    assert(frame.nunique("s") == 2) // a, b (null excluded)
    assert(frame.approx_nunique("k") == 3L)
  }

  test("describe_ long-form stats") {
    val d = frame.describe_(Seq("v")).toDF.collect()
    assert(d.length == 1)
    val r = d(0)
    assert(r.getString(0) == "v")
    assert(r.getDouble(1) == 3.0) // count
    assert(math.abs(r.getDouble(2) - 80.0 / 3) < 1e-9)
    assert(r.getDouble(4) == 10.0 && r.getDouble(5) == 40.0)
  }

  test("isin filters by collection") {
    assert(frame.isin("s", Seq("a")).count() == 2)
  }
}
