package graft

import graft.operators.Apply

class ApplySpec extends SparkSpec {
  import spark.implicits._

  private def df = (1 to 100).map(i => (i.toLong, i * 2.0)).toDF("k", "v")

  test("applyRows: per-row closure with declared encoder (test_df.py semantics)") {
    // myadd(row, a=2, b=1.5) = row.sum() + a + b (test_df.py:17-20)
    val got = Apply.applyRows(df)(r => r.getLong(0) + r.getDouble(1) + 2.0 + 1.5)
      .collect().sorted
    val want = (1 to 100).map(i => i + i * 2.0 + 3.5).sorted
    assert(got.toSeq == want)
  }

  test("mapPartitions: partial counts sum to total, at any partitioning") {
    for (n <- Seq(1, 4, 16)) {
      val parts = Apply.mapPartitions(df.repartition(n))(it => Iterator.single(it.size))
      assert(parts.collect().sum == 100, s"n=$n")
    }
  }

  test("reduction: chunk/combine/aggregate contract") {
    val total = Apply.reduction(df)(
      chunk = it => it.map(_.getDouble(1)).sum,
      combine = (a: Double, b: Double) => a + b,
      aggregate = (s: Double) => s / 100)
    assert(math.abs(total - 101.0) < 1e-9) // mean of 2,4,..,200
  }

  test("reduction on an empty (0-row) frame still runs chunk per partition") {
    val empty = Seq.empty[(Long, Double)].toDF("k", "v")
    val n = Apply.reduction(empty)(
      chunk = it => it.size.toLong,
      combine = (a: Long, b: Long) => a + b,
      aggregate = (x: Long) => x)
    assert(n == 0L)
  }

  test("reduction respects splitEvery fan-in without changing the result") {
    val big = df.repartition(32)
    for (fanIn <- Seq(2, 8, 64)) {
      val s = Apply.reduction(big)(
        chunk = it => it.map(_.getLong(0)).sum,
        combine = (a: Long, b: Long) => a + b,
        aggregate = (x: Long) => x,
        splitEvery = fanIn)
      assert(s == 5050L, s"fanIn=$fanIn")
    }
  }

  test("mapPartitionsWithInfo injects a valid (number, numPartitions) context") {
    val parts = Apply.mapPartitionsWithInfo(df.repartition(7)) { (info, it) =>
      Iterator.single((info.number, info.numPartitions, it.size))
    }.collect()
    assert(parts.length == 7)
    assert(parts.map(_._1).sorted.toSeq == (0 until 7).toSeq) // each id once
    assert(parts.forall(_._2 == 7))
    assert(parts.map(_._3).sum == 100)
  }

  test("zipPartitionsAligned co-locates equal keys and merges locally") {
    val a = (1 to 50).map(i => (i.toLong, s"a$i")).toDF("k", "av")
    val b = (26 to 75).map(i => (i.toLong, i * 10L)).toDF("k", "bv")
    for (n <- Seq(3, 8)) {
      val merged = Apply.zipPartitionsAligned(a, b, Seq("k"), n) { (ia, ib) =>
        val right = ib.map(r => r.getLong(0) -> r.getLong(1)).toMap
        ia.flatMap(r => right.get(r.getLong(0)).map(v => (r.getLong(0), v)))
      }.collect().sortBy(_._1)
      // result must be the full key intersection regardless of shard count
      assert(merged.map(_._1).toSeq == (26L to 50L).toSeq, s"n=$n")
      assert(merged.forall { case (k, v) => v == k * 10 })
    }
  }

  test("zipPartitionsStrict rejects mismatched partition counts with a clear error") {
    val a = df.repartition(4)
    val b = df.repartition(5)
    val e = intercept[IllegalArgumentException] {
      Apply.zipPartitionsStrict(a, b)((x, _) => x.map(_.getLong(0)))
    }
    assert(e.getMessage.contains("equal partition counts"))
  }
}
