package graft

import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity.cosineSim

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def sim(a: Seq[Double], b: Seq[Double]): Option[Double] = {
    val r = Seq((a.toArray, b.toArray)).toDF("a", "b")
      .select(cosineSim(col("a"), col("b"))).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("identical vectors → 1.0") {
    assert(math.abs(sim(Seq(1, 2, 3), Seq(1, 2, 3)).get - 1.0) < 1e-12)
  }

  test("orthogonal vectors → 0.0") {
    assert(sim(Seq(1, 0), Seq(0, 1)).get == 0.0)
  }

  test("opposite vectors → -1.0") {
    assert(math.abs(sim(Seq(1.0, 2.0), Seq(-1.0, -2.0)).get + 1.0) < 1e-12)
  }

  test("zero-norm vector → 0.0 (not NaN)") {
    assert(sim(Seq(0, 0), Seq(1, 1)).get == 0.0)
  }

  test("dimension mismatch → null, not truncated similarity") {
    assert(sim(Seq(1, 2, 3), Seq(1, 2)).isEmpty)
  }

  test("null input → null") {
    val r = Seq((Array(1.0), null: Array[Double])).toDF("a", "b")
      .select(cosineSim(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("known value: cos between (1,0) and (1,1) = 1/sqrt(2)") {
    assert(math.abs(sim(Seq(1, 0), Seq(1, 1)).get - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("CentroidSims is bit-identical to per-centroid cosineSim") {
    import graft.functions.CentroidSims.centroidSims
    // pseudo-random 7-dim vectors; last centroid has a mismatched dim
    def v(i: Int, d: Int): Array[Double] =
      Array.tabulate(d)(j => (((i * 31 + j * 17) % 23) - 11) / 7.0)
    val cents = (0 until 5).map(i => v(i, 7)).toArray :+ v(9, 6)
    val rows = (10 until 30).map(i => Tuple1(v(i, 7))) :+
      Tuple1(Array.fill(7)(0.0)) // zero norm → 0.0 per contract
    val df = rows.toDF("a")
    val fused = df.select(centroidSims(col("a"), cents).as("s"))
      .collect().map(_.getSeq[Double](0))
    val unrolled = df.select(array(cents.map(c =>
        cosineSim(col("a"), array(c.map(lit): _*))): _*).as("s"))
      .collect().map(_.getSeq[Double](0))
    assert(fused.length == unrolled.length)
    fused.zip(unrolled).foreach { case (f, u) =>
      // Seq equality: nulls (the mismatched-dim centroid) must align too
      assert(f == u)
    }
  }

  test("CentroidSims: null element in the query vector → all-null sims") {
    import graft.functions.CentroidSims.centroidSims
    val df = Seq(Tuple1(Array[java.lang.Double](1.0, null, 2.0))).toDF("a")
    val r = df.select(centroidSims(col("a").cast("array<double>"),
      Array(Array(1.0, 2.0, 3.0))).as("s")).collect()(0).getSeq[Any](0)
    assert(r == Seq(null))
  }
}
