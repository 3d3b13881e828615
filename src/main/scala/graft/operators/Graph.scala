package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph operators for crawl-quality ranking: PageRank over a link
  * graph (the Common-Crawl-style domain/host ranking signal — rank
  * feeds URL frontier prioritization and per-domain quality priors)
  * and connected components (a thin facade over the dedup tier's
  * log-round min-label contraction).
  *
  * PageRank spec (deterministic, oracle-replayable): ranks start at
  * 1.0; each iteration every edge `(src, dst)` contributes
  * `rank(src)/outdeg(src)` to dst and
  * `rank' = (1−d) + d·Σ contributions` — nodes without in-links hold
  * `1−d`, dangling nodes simply contribute nothing (the classic
  * non-normalized formulation, stable under the fixed iteration
  * count the caller chooses). Duplicate edges count twice;
  * self-loops are legal.
  *
  * Scale shape: each iteration is ONE join of the edge table with the
  * current rank vector on `src` plus one grouped sum on `dst` — the
  * canonical two-shuffle PageRank step; the rank vector is
  * `localCheckpoint`ed per iteration so lineage stays flat. The edge
  * table is never collected or broadcast (at 100 TB it is the big
  * table); `iters` bounds total work exactly. */
object Graph {

  /** edges(src, dst) → (node, rank) after `iters` iterations. */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var ranks = nodes.withColumn("rank", lit(1.0))
    var i = 0
    while (i < iters) {
      val contribs = e.join(ranks, e("src") === ranks("node"))
        .join(outDeg, "src")
        .select(col("dst").as("node"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("node").agg(sum("c").as("csum"))
      val prev = ranks
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("csum"), lit(0.0)))
            .as("rank"))
        .localCheckpoint()
      prev.unpersist()
      i += 1
    }
    ranks
  }

  /** edges(src, dst) → (id, cluster): undirected connected components
    * via the dedup tier's log-round min-label contraction
    * ([[Dedup.duplicateClusters]] — the same machinery that closes
    * near-dup pairs into clusters). */
  def connectedComponents(edges: DataFrame): DataFrame =
    Dedup.duplicateClusters(
      edges.select(col("src").cast("long").as("id_a"), col("dst").cast("long").as("id_b")))
}
