package graft

import org.apache.spark.sql.functions._

import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("d=1 catches every edit type: equal, delete, insert, substitute — and rejects d=2") {
    val left = Seq("spark", "table", "query", "shuffle").toDF("a")
    val right = Seq(
      "spark", // equal (0)
      "tale", // delete from table (1)
      "squery", // insert into query (1)
      "shuffla", // substitute in shuffle (1)
      "quarry", // distance 2 from query -> must NOT match at d=1
      "zzz").toDF("b")
    val got = FuzzyJoin.editDistancePairs(left, "a", right, "b", maxDist = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set(
      ("spark", "spark", 0),
      ("table", "tale", 1),
      ("query", "squery", 1),
      ("shuffle", "shuffla", 1)))
  }

  test("completeness vs brute force at d=1 and d=2 on a deterministic corpus") {
    // words from a small alphabet so near-misses are dense
    def word(i: Int): String =
      (0 until 4 + i % 3).map(j => ('a' + (i * 7 + j * 3) % 4).toChar).mkString
    val ls = (0 until 60).map(word).distinct
    val rs = (60 until 120).map(word).distinct
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j => i.max(j)))
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (dMax <- Seq(1, 2)) {
      val want = (for (a <- ls; b <- rs; d = lev(a, b) if d <= dMax)
        yield (a, b, d)).toSet
      val got = FuzzyJoin.editDistancePairs(
        ls.toDF("a"), "a", rs.toDF("b"), "b", dMax)
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      assert(got == want, s"d=$dMax: missing ${want -- got}, extra ${got -- want}")
    }
  }

  test("duplicate and null inputs: values matched once, nulls dropped") {
    val left = Seq(Some("alpha"), Some("alpha"), None).toDF("a")
    val right = Seq(Some("alphA"), None).toDF("b")
    val got = FuzzyJoin.editDistancePairs(left, "a", right, "b", maxDist = 1).collect()
    assert(got.length == 1 && got(0).getString(0) == "alpha" && got(0).getInt(2) == 1)
  }

  test("plan: equi-join blocking only — no cartesian, no nested loop") {
    val left = Seq("one", "two").toDF("a")
    val right = Seq("onne", "twwo").toDF("b")
    val p = FuzzyJoin.editDistancePairs(left, "a", right, "b", maxDist = 1)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("maxDist bounds enforced") {
    val df = Seq("x").toDF("a")
    intercept[IllegalArgumentException](
      FuzzyJoin.editDistancePairs(df, "a", df, "a", maxDist = 3))
  }
}
