package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: hand-computed two-iteration values on a 3-node cycle + dangler") {
    // 1 -> 2, 2 -> 3, 3 -> 1, 1 -> 4 (4 dangles)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)).toDF("src", "dst")
    val r1 = Graph.pageRank(e, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // init 1.0; outdeg(1)=2: node2 gets 0.5, node3 gets 1.0 (from 2),
    // node1 gets 1.0 (from 3), node4 gets 0.5
    assert(math.abs(r1(1L) - (0.15 + 0.85 * 1.0)) < 1e-12)
    assert(math.abs(r1(2L) - (0.15 + 0.85 * 0.5)) < 1e-12)
    assert(math.abs(r1(3L) - (0.15 + 0.85 * 1.0)) < 1e-12)
    assert(math.abs(r1(4L) - (0.15 + 0.85 * 0.5)) < 1e-12)
    val r2 = Graph.pageRank(e, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // iteration 2 from r1: contrib to 2 = r1(1)/2, to 3 = r1(2),
    // to 1 = r1(3), to 4 = r1(1)/2; dangler 4 contributes nothing
    assert(math.abs(r2(1L) - (0.15 + 0.85 * r1(3L))) < 1e-12)
    assert(math.abs(r2(2L) - (0.15 + 0.85 * r1(1L) / 2)) < 1e-12)
    assert(math.abs(r2(4L) - (0.15 + 0.85 * r1(1L) / 2)) < 1e-12)
  }

  test("pageRank: no in-links means 1-d; iters=0 is the init vector") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val r = Graph.pageRank(e, iters = 3).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(1L) - 0.15) < 1e-12)
    val r0 = Graph.pageRank(e, iters = 0).collect().map(_.getDouble(1))
    assert(r0.forall(_ == 1.0))
  }

  test("pageRank: duplicate edges count twice, self-loops are legal") {
    val e = Seq((1L, 2L), (1L, 2L), (3L, 3L)).toDF("src", "dst")
    val r = Graph.pageRank(e, iters = 1).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // node 2: two edges from 1 (outdeg 2) -> contribution 0.5 + 0.5
    assert(math.abs(r(2L) - (0.15 + 0.85 * 1.0)) < 1e-12)
    // self-loop: node 3 feeds itself (outdeg 1)
    assert(math.abs(r(3L) - (0.15 + 0.85 * 1.0)) < 1e-12)
  }

  test("connectedComponents facade labels components by minimum id") {
    val e = Seq((5L, 3L), (3L, 9L), (20L, 21L)).toDF("src", "dst")
    val cc = Graph.connectedComponents(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L))
  }
}
