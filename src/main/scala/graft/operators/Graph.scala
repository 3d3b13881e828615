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
  * Scale shape: the weighted edge table `(src, dst, 1/outdeg)` is
  * built ONCE (one outdeg aggregation + one join), hash-partitioned
  * on `src` and pinned; the node table likewise arrives
  * hash-partitioned on `node` from its distinct. Every iteration's
  * rank join then reuses those partitionings — the EDGE BYTES NEVER
  * MOVE after setup; the only per-iteration exchange is the
  * contribution transpose (partial-aggregated `(dst, Σ)` pairs,
  * bounded by nodes × partitions, never edge-sized). The rank vector
  * is checkpointed per iteration so lineage stays flat; edges are
  * never collected or broadcast (at 100 TB they are the big table);
  * `iters` bounds total work exactly. `PlanAuditSpec` pins the
  * no-edge-side-exchange invariant on a live iteration plan. */
object Graph {

  /** edges(src, dst) → (node, rank) after `iters` iterations.
    *
    * @param reliable cut per-iteration lineage with a RELIABLE
    *   checkpoint (requires `sparkContext.setCheckpointDir`) instead
    *   of `localCheckpoint`. Local checkpoints pin blocks to
    *   executors — on a real cluster a lost node kills the
    *   lineage-truncated run; flip this on for long multi-hour runs.
    * @param iterationProbe test hook invoked with each iteration's
    *   UN-checkpointed rank frame (plan assertions); no-op default. */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
      reliable: Boolean = false,
      iterationProbe: DataFrame => Unit = _ => ()): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    def cut(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // Hoisted out of the loop: the weighted edge table, partitioned on
    // src exactly once. The explicit repartition (not the join's
    // incidental layout) guarantees the pinned partitioning whatever
    // join shape Catalyst picks for the outdeg join; cut() captures it
    // into the checkpointed frame so in-loop joins need no edge-side
    // exchange.
    val w = cut(e.join(outDeg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("outdeg")).as("w"))
      .repartition(col("src")))
    // distinct() leaves nodes hash-partitioned on node; cut() keeps it.
    val nodes = cut(e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct())
    var ranks = nodes.withColumn("rank", lit(1.0))
    var i = 0
    while (i < iters) {
      // ranks is partitioned on node (from nodes / the previous
      // iteration's left join), w on src: the join is exchange-free on
      // BOTH sides; only the transposed partial sums shuffle.
      val contribs = w.join(ranks, w("src") === ranks("node"))
        .select(col("dst").as("node"), (col("rank") * col("w")).as("c"))
        .groupBy("node").agg(sum("c").as("csum"))
      val next = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("csum"), lit(0.0)))
            .as("rank"))
      iterationProbe(next)
      val prev = ranks
      ranks = cut(next)
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
