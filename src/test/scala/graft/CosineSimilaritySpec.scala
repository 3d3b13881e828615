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
}
