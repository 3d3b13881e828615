package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.CentroidSims
import graft.functions.CosineSimilarity.cosineSim

/** Similarity search over embedding columns (`array<float>` /
  * `array<double>`): brute-force cosine top-k as the exact baseline, and
  * an SRP-LSH (random-hyperplane) bucketed variant as the scale path.
  *
  * Scale design: brute force is O(|Q|·|C|) — correct for small query
  * sets against a broadcastable corpus slice, a scale-killer otherwise.
  * The ANN path buckets both sides by hyperplane sign bits (row-local),
  * joins on the bucket (ONE shuffle), and only scores within buckets.
  * Recall is tunable via fewer planes (bigger buckets) or multi-probe.
  *
  * Recall caveat (measured on the synthetic fixture): SRP-LSH recall
  * tracks how CLOSE true neighbors are. A true neighbor at cos≈1
  * agrees on almost every sign bit and is found reliably; on
  * near-orthogonal data (fixture max pairwise cos ≈ 0.4) sign buckets
  * carry no signal and recall@10 is ~0.1 even multi-probed. That is
  * inherent to LSH, not a bug — embedding dedup (cos ≥ 0.9x) is the
  * intended workload; use [[bruteForceTopK]] when the corpus side is
  * small enough to broadcast or neighbors are weak.
  */
object Similarity {

  /** Embeddings arrive as `array<float>`; the cosine expression computes
    * in double. One cast, pushed into the same codegen stage. */
  def asDoubleVec(c: Column): Column = c.cast(ArrayType(DoubleType))

  /** Cosine of `vec` against each centroid in `cs`, as an array column —
    * one [[graft.functions.CentroidSims]] node carrying the matrix as a
    * reference object. Row-local, no shuffle or join for cell
    * assignment; the matrix never appears as plan literals (an unrolled
    * `array(cosineSim(vec, array(lit…)))` put cells×dim literal nodes
    * through the analyzer and Janino per instantiation — that compile
    * time dominated the IVF queries at bench scale). */
  private def cellSimsFor(cs: Array[Array[Double]])(vec: Column): Column =
    graft.functions.CentroidSims.centroidSims(asDoubleVec(vec), cs)

  /** Argmax over an ALIASED sims column; first index wins ties
    * (deterministic). The alias matters: array_position + array_max
    * reference the sims twice and the nCells×dim literal dot-product
    * array is not CSE'd — inlining it would double the per-row cost. */
  private def argmaxCell(simsCol: Column): Column =
    (array_position(simsCol, array_max(simsCol)) - 1).cast("int")

  /** Spark `round(expr, d)` semantics (BigDecimal HALF_UP) on the
    * driver, so driver-rounded seeds match executor-rounded means. */
  private def roundTo(d: Int)(x: Double): Double =
    BigDecimal(x).setScale(d, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** One Lloyd round: assign each vector to its argmax-cosine cell
    * (row-local codegen against literal centroids), then per-cell
    * element-wise mean via the native vector-sum partial aggregate
    * ([[graft.functions.VecSumAgg]]) — ONE grouped shuffle carrying
    * `cells × partitions` arrays, never `rows × dim` exploded doubles.
    * Returns the tiny cell→centroid model (empty cells absent).
    * `centRound` optionally rounds each mean to that many decimals,
    * which makes the trained model bit-reproducible across engines and
    * partition orders (summation order is not associative in fp). */
  private def lloydStep(
      df: DataFrame, vecCol: String, cs: Array[Array[Double]],
      centRound: Option[Int]): Map[Int, Array[Double]] = {
    val vecSum = graft.functions.VecSumAgg.vecSum
    val mean = centRound match {
      case Some(d) => transform(col("__s"), x => round(x / col("__n"), d))
      case None    => transform(col("__s"), x => x / col("__n"))
    }
    df
      .select(asDoubleVec(col(vecCol)).as("__v"))
      // a null embedding has no cell: drop it from training (the old
      // posexplode formulation dropped such rows implicitly; without
      // this filter the null cell group would NPE the model collect)
      .where(col("__v").isNotNull)
      .select(col("__v"), cellSimsFor(cs)(col("__v")).as("__sims"))
      .select(argmaxCell(col("__sims")).as("cell"), col("__v"))
      .groupBy("cell")
      .agg(vecSum(col("__v")).as("__s"), count(lit(1)).as("__n"))
      .select(col("cell"), mean.as("centroid"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .toMap
  }

  /** K-means clustering of an embedding column (cosine assignment) —
    * the embedding-space partitioner a training pipeline uses for
    * curriculum buckets, dedup sharding, or IVF-style indexing.
    *
    * Deliberately deterministic end-to-end so the result is
    * oracle-checkable and stable across reruns:
    *   - seeds = the vectors of the `k` smallest ids (no RNG);
    *   - assignment = argmax cosine, ties to the lowest cell;
    *   - centroid update = element-wise mean ROUNDED to `centRound`
    *     decimals — fp summation is not associative, so unrounded means
    *     differ in the last ulp across partition counts and engines;
    *     rounding renders the trained model, and hence every
    *     assignment, bit-reproducible (a 1e-9 perturbation is far
    *     below any meaningful centroid separation).
    *
    * Scale: each iteration is one row-local assign scan + ONE grouped
    * vector-sum shuffle of `k × partitions` arrays; the k×dim model
    * lives on the driver like any fitted model. Empty cells keep their
    * previous centroid. Returns (idCol, cell) assignments. */
  def kmeansAssign(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 1, centRound: Int = 9): DataFrame = {
    val cents = trainCentroids(df, idCol, vecCol, k, iters, centRound)
    df.select(col(idCol), asDoubleVec(col(vecCol)).as("__v"))
      .select(col(idCol), cellSimsFor(cents)(col("__v")).as("__sims"))
      .select(col(idCol), argmaxCell(col("__sims")).as("cell"))
  }

  /** The deterministic Lloyd trainer behind [[kmeansAssign]] (and
    * [[semDupPairs]]): id-ordered seeds, `iters` rounds of
    * assign + rounded-mean update. Returns the k×dim centroid model. */
  private def trainCentroids(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, centRound: Int): Array[Array[Double]] = {
    require(k > 0, s"k must be positive, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    // Null embeddings are excluded from seeding and training; in the
    // returned assignments they carry a null cell (no nearest centroid
    // exists for a missing vector — inventing one would be a wrong
    // number, the same contract CosineSimilarity applies).
    val seeds: Array[Array[Double]] = df
      .where(col(vecCol).isNotNull)
      .orderBy(col(idCol)).limit(k)
      .select(asDoubleVec(col(vecCol)))
      .collect()
      .map(_.getSeq[Double](0).toArray.map(roundTo(centRound)))
    require(seeds.nonEmpty, "trainCentroids: empty input")
    (1 to iters).foldLeft(seeds) { (cs, _) =>
      val means = lloydStep(df, vecCol, cs, centRound = Some(centRound))
      cs.indices.map(i => means.getOrElse(i, cs(i))).toArray
    }
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic near-
    * duplicate pairs via k-means partitioning — cluster the embedding
    * space, then compare vectors ONLY within their cluster and report
    * pairs with cosine ≥ `tau`. Deterministic end-to-end (the same
    * id-seeded rounded-centroid trainer as [[kmeansAssign]]) so an
    * external oracle can replay clustering AND pair selection exactly.
    *
    * Returns (cell, id_a, id_b, sim) with id_a < id_b.
    *
    * Scale: assignment is row-local (the k×dim model rides ONE codegen
    * node as a reference object); candidate generation is a self-
    * equi-join on `cell` — ONE shuffle per side, never a cross join.
    * Per-cluster work is O(|cell|²): `k` is the knob that bounds it
    * (the paper runs k≈110k on LAION; size k so the expected cell is
    * 10³–10⁴ rows). For clusters that still come out hot — a web
    * corpus's embedding space is itself skewed, so a few cells can dwarf
    * the expectation — set `srpPlanes > 0`: each vector also gets a
    * row-local [[srpBucket]] signature and the join key becomes (cell,
    * bucket), splitting a hot cell into ≤ 2^srpPlanes sub-buckets.
    * Recall then follows the SRP caveat: a ≥ tau pair straddling a
    * hyperplane is missed, with miss probability shrinking as tau → 1
    * (the pairs SemDeDup exists to find) and growing with srpPlanes —
    * keep it small (2-4 planes splits a hot cell 4-16× and clips only
    * the borderline pairs). srpPlanes = 0 (default) is exact within
    * cells and is the oracle-gated path. Null embeddings have no cell
    * and thus produce no pairs. */
  def semDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, tau: Double, iters: Int = 1, centRound: Int = 9,
      srpPlanes: Int = 0, srpSeed: Long = 42L): DataFrame = {
    require(tau >= -1.0 && tau <= 1.0, s"tau must be in [-1, 1], got $tau")
    require(srpPlanes >= 0, s"srpPlanes must be >= 0, got $srpPlanes")
    val cents = trainCentroids(df, idCol, vecCol, k, iters, centRound)
    val dim = cents(0).length
    val base = df
      .select(col(idCol), asDoubleVec(col(vecCol)).as("__v"))
      .where(col("__v").isNotNull)
      .select(col(idCol), col("__v"), cellSimsFor(cents)(col("__v")).as("__sims"))
      .select(col(idCol), col("__v"), argmaxCell(col("__sims")).as("cell"))
    if (srpPlanes == 0) {
      val a = base.select(
        col("cell"), col(idCol).as("id_a"), col("__v").as("__va"))
      val b = base.select(
        col("cell").as("__cb"), col(idCol).as("id_b"), col("__v").as("__vb"))
      a.join(b, col("cell") === col("__cb") && col("id_a") < col("id_b"))
        .select(col("cell"), col("id_a"), col("id_b"),
          cosineSim(col("__va"), col("__vb")).as("sim"))
        .where(col("sim") >= tau)
    } else {
      val assigned = base.withColumn("__bkt",
        srpBucket(col("__v"), dim, srpPlanes, srpSeed))
      val a = assigned.select(
        col("cell"), col("__bkt"), col(idCol).as("id_a"), col("__v").as("__va"))
      val b = assigned.select(
        col("cell").as("__cb"), col("__bkt").as("__bb"),
        col(idCol).as("id_b"), col("__v").as("__vb"))
      a.join(b,
          col("cell") === col("__cb") && col("__bkt") === col("__bb") &&
            col("id_a") < col("id_b"))
        .select(col("cell"), col("id_a"), col("id_b"),
          cosineSim(col("__va"), col("__vb")).as("sim"))
        .where(col("sim") >= tau)
    }
  }

  /** SemDeDup drop step: keep one representative per semantic-duplicate
    * pair — the smaller id survives, every id that appears as the
    * LARGER side of a ≥ `tau` within-cluster pair is dropped. (The
    * min-id rule is the deterministic, oracle-replayable stand-in for
    * the paper's keep-farthest-from-centroid choice; both keep exactly
    * one of a mutually-similar group under transitive closure of the
    * greedy sweep.) Returns the surviving rows of `df`, all columns.
    *
    * Scale: [[semDupPairs]]' shape plus one id-projected distinct and a
    * shuffled LEFT ANTI join back — the dup-id set can be a large
    * fraction of the corpus, so it is never broadcast by hint (AQE may
    * still choose to if it measures small). */
  def semDedup(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, tau: Double, iters: Int = 1, centRound: Int = 9,
      srpPlanes: Int = 0, srpSeed: Long = 42L): DataFrame = {
    val dups = semDupPairs(df, idCol, vecCol, k, tau, iters, centRound,
        srpPlanes, srpSeed)
      .select(col("id_b").as("__dup_id")).distinct()
    df.join(dups, col(idCol) === col("__dup_id"), "left_anti")
  }

  /** Exact top-k: every query row scored against every corpus row.
    * Queries are broadcast (the small side by contract); ranking is a
    * per-query window — `row_number` keeps ties deterministic via the
    * corpus-id tiebreak. */
  def bruteForceTopK(
      queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, cId: String, cVec: String,
      k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .select(
        col(qId), col(cId),
        cosineSim(asDoubleVec(col(qVec)), asDoubleVec(col(cVec))).as("sim"))
    val w = Window.partitionBy(col(qId)).orderBy(col("sim").desc, col(cId).asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Exact top-k with a k-bounded PARTIAL aggregate instead of a window
    * ([[graft.functions.TopKAgg]]): each map task reduces its partition
    * to ≤ k candidates per query before the exchange, so the shuffle
    * carries k·partitions rows per query — not every scored pair, which
    * is what the window/row_number formulation of [[bruteForceTopK]]
    * must shuffle. Same result set; THE scale shape for brute-force
    * scoring of a corpus too big to window. */
  def bruteForceTopKAgg(
      queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, cId: String, cVec: String,
      k: Int): DataFrame = {
    // The aggregate buffer carries the corpus id as a long; a string id
    // would silently cast to null — reject it up front.
    corpus.schema(cId).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case t => throw new IllegalArgumentException(
        s"bruteForceTopKAgg needs an integral corpus id, got $cId: ${t.catalogString}" +
          " — use bruteForceTopK for non-numeric ids")
    }
    val topk = graft.functions.TopKAgg.topK(k)
    corpus.crossJoin(broadcast(queries))
      .select(
        col(qId),
        cosineSim(asDoubleVec(col(qVec)), asDoubleVec(col(cVec))).as("sim"),
        col(cId).cast("long").as("id"))
      // cosineSim is null for mismatched-dimension / null-element vectors;
      // the typed aggregator's Double field is non-nullable, so one corrupt
      // embedding would fail the whole job. Drop it here — the window
      // formulation degrades the same way (null sim sorts last).
      .where(col("sim").isNotNull)
      .groupBy(col(qId))
      .agg(topk(col("sim"), col("id")).as("top"))
      .select(col(qId), posexplode(col("top")).as(Seq("rank0", "s")))
      .select(col(qId), col("s.id").as(cId),
        col("s.sim").as("sim"), (col("rank0") + 1).as("rank"))
  }

  /** Rank scored (qId, cId, sim) candidates down to top-k per query.
    * Integral corpus ids ride the k-bounded [[graft.functions.TopKAgg]]
    * PARTIAL aggregate: each map task reduces to ≤ k candidates per
    * query before the exchange, so a hot query (one degenerate
    * LSH bucket / IVF cell at 100 TB) never funnels its whole candidate
    * set through a single reducer. Non-integral ids fall back to the
    * per-query window — the funnel shape — acceptable only because the
    * candidate sets that reach it are small; integral ids are the
    * normal case for corpus keys. Null sims (corrupt/mismatched-dim
    * vectors) are dropped on both paths for identical output. */
  private def rankTopK(scored: DataFrame, qId: String, cId: String, k: Int): DataFrame =
    scored.schema(cId).dataType match {
      case idType @ (ByteType | ShortType | IntegerType | LongType) =>
        val topk = graft.functions.TopKAgg.topK(k)
        scored
          .where(col("sim").isNotNull)
          .groupBy(col(qId))
          .agg(topk(col("sim"), col(cId).cast("long")).as("top"))
          .select(col(qId), posexplode(col("top")).as(Seq("rank0", "s")))
          .select(col(qId), col("s.id").cast(idType).as(cId),
            col("s.sim").as("sim"), (col("rank0") + 1).as("rank"))
      case _ =>
        val w = Window.partitionBy(col(qId)).orderBy(col("sim").desc, col(cId).asc)
        scored.where(col("sim").isNotNull)
          .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
    }

  /** Deterministic pseudo-random hyperplane component in [-0.5, 0.5),
    * derived from (plane, dim) via SplitMix64 — no RNG state, so every
    * executor materializes identical planes. */
  private def planeComponent(plane: Int, dim: Int, seed: Long): Double = {
    var z = seed + plane.toLong * 0x9e3779b97f4a7c15L + dim.toLong * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble - 0.5
  }

  /** SRP bucket id: sign bit of the vector's dot product with each of
    * `nPlanes` fixed hyperplanes, packed into a long. Built from
    * codegen'd higher-order functions over literal plane arrays. */
  def srpBucket(vec: Column, dim: Int, nPlanes: Int = 12, seed: Long = 42L): Column = {
    require(nPlanes <= 62, "nPlanes must fit in a long")
    val bits = (0 until nPlanes).map { p =>
      val plane = array((0 until dim).map(d => lit(planeComponent(p, d, seed))): _*)
      val dot = aggregate(
        zip_with(asDoubleVec(vec), plane, (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v)
      when(dot > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** ANN top-k via SRP-LSH: queries and corpus bucketed by the SAME
    * planes, joined on the bucket, scored only within buckets. Recall
    * < 1 by construction (a near neighbor across a hyperplane is
    * missed); `multiProbe=true` also probes every bucket at Hamming
    * distance 1 from the query's bucket (flip one sign bit), trading
    * (nPlanes+1)× more candidate buckets for sharply better recall —
    * near neighbors differ in few sign bits. Returns the same shape as
    * [[bruteForceTopK]]. */
  def annTopK(
      queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, cId: String, cVec: String,
      k: Int, dim: Int, nPlanes: Int = 12, seed: Long = 42L,
      multiProbe: Boolean = false): DataFrame = {
    // Alias the bucket ONCE before fanning out the probe array: the
    // probe expression references it nPlanes+1 times, and higher-order
    // aggregate/zip_with exprs are not CSE'd — inlining would recompute
    // the nPlanes×dim dot products per reference (CollapseProject won't
    // duplicate it across this projection boundary either).
    val qBucketed = queries.select(col(qId), col(qVec),
      srpBucket(col(qVec), dim, nPlanes, seed).as("__b"))
    val probes =
      if (!multiProbe) array(col("__b"))
      else array(col("__b") +: (0 until nPlanes).map(p =>
        col("__b").bitwiseXOR(lit(1L << p))): _*)
    val qb = qBucketed.select(col(qId), col(qVec), explode(probes).as("bucket"))
    val cb = corpus.select(
      col(cId), col(cVec), srpBucket(col(cVec), dim, nPlanes, seed).as("bucket"))
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .select(
        col(qId), col(cId),
        cosineSim(asDoubleVec(col(qVec)), asDoubleVec(col(cVec))).as("sim"))
      .distinct() // a pair can match through several probe buckets
    rankTopK(scored, qId, cId, k)
  }

  /** IVF (inverted-file) ANN top-k — the classic coarse-quantizer route:
    * partition the corpus into `nCells` Voronoi cells, search only the
    * `nProbe` cells nearest each query.
    *
    * Training the quantizer = choosing centroids. Real deployments run
    * k-means; here the centroid set is an even id-spread of corpus
    * vectors picked via a DISTRIBUTED quantile sketch of the id column
    * (one sketch row returns to the driver — never the id list itself),
    * then broadcast as literal arrays — the standard IVF shape (the
    * trained model is tiny and driver-resident by design, like any
    * k-means model; the training scan is executor-side).
    *
    * Scale: cell assignment is row-local codegen (no shuffle); the probe
    * join broadcasts the query side; cost is |C|·nProbe/nCells scored
    * pairs instead of |C| per query. Recall < 1 by construction —
    * a neighbor in an unprobed cell is missed; raise `nProbe` to trade
    * compute for recall. */
  def ivfTopK(
      queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, cId: String, cVec: String,
      k: Int, nCells: Int = 16, nProbe: Int = 4, kmeansIters: Int = 1): DataFrame = {
    val cents = ivfCentroids(corpus, cId, cVec, nCells, kmeansIters)
    val cb = corpus
      .select(col(cId), col(cVec), cellSimsFor(cents)(col(cVec)).as("__sims"))
      .select(col(cId), col(cVec), argmaxCell(col("__sims")).as("cell"))
    ivfSearch(queries, qId, qVec, cb, cId, cVec, cents, k, nProbe)
  }

  /** Train the IVF coarse quantizer (quantile-seeded + Lloyd rounds):
    * the tiny driver-resident model, deterministic for a given corpus
    * and params. Shared by [[ivfTopK]] and [[ivfIndex]] so the
    * index-then-search route is byte-equivalent to the one-call route. */
  private def ivfCentroids(
      corpus: DataFrame, cId: String, cVec: String,
      nCells: Int, kmeansIters: Int): Array[Array[Double]] = {
    // Seed centroid ids = approximate quantiles of the id column.
    // GK-sketch values are actual data elements, so each is a real
    // corpus id; the driver receives O(nCells) values, independent of
    // |corpus|.
    val probes = (0 until nCells).map(i => (i + 0.5) / nCells).toArray
    val centIds = corpus
      .select(col(cId).cast("double").as("__id"))
      .stat.approxQuantile("__id", probes, 0.001)
      .map(_.toLong).distinct.toSet
    require(centIds.nonEmpty, "ivfCentroids: empty corpus")
    val seeds: Array[Array[Double]] = corpus
      .where(col(cId).isInCollection(centIds))
      .orderBy(col(cId))
      .select(asDoubleVec(col(cVec)))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    // the quantile sketch round-trips ids through Double: ids above
    // 2^53 don't survive the cast, the filter matches nothing, and the
    // failure would otherwise surface as an inscrutable ANSI array
    // error deep in probeCells
    require(seeds.nonEmpty,
      "ivfCentroids: no seed vectors found — corpus ids must round-trip" +
        " through Double (|id| < 2^53) for quantile-based centroid seeding")
    // Lloyd refinement: assign → per-cell element-wise mean → re-collect
    // the tiny model (nCells × dim doubles — driver-resident by design,
    // like any k-means model). Executor-side cost is a row-local assign
    // plus ONE vector-sum hash agg per iteration ([[lloydStep]]); empty
    // cells keep their previous centroid.
    (1 to kmeansIters).foldLeft(seeds) { (cs, _) =>
      val means = lloydStep(corpus, cVec, cs, centRound = None)
      cs.indices.map(i => means.getOrElse(i, cs(i))).toArray
    }
  }

  /** Probe join + exact rescoring against a pre-assigned corpus:
    * queries pick their top-nProbe cells row-locally, the slim query
    * batch broadcasts into the cell equi-join, candidates rescore with
    * exact cosine, k-rank. */
  /** Top-nProbe cells for a query: sort (−sim, cell) structs
    * ascending. `simsCol` must be an aliased attribute — the lambda
    * body is evaluated per sequence element, so an inlined sims
    * expression would be recomputed nCells times per row. */
  private def probeCellsCol(simsCol: Column, nCents: Int,
      nProbe: Int): Column = {
    val structs = transform(sequence(lit(0), lit(nCents - 1)),
      i => struct((-element_at(simsCol, i + 1)).as("neg"), i.as("cell")))
    transform(slice(sort_array(structs), 1, nProbe), s => s.getField("cell"))
  }

  private def ivfSearch(
      queries: DataFrame, qId: String, qVec: String,
      assigned: DataFrame, cId: String, cVec: String,
      cents: Array[Array[Double]], k: Int, nProbe: Int): DataFrame = {
    val qb = queries
      .select(col(qId), col(qVec), cellSimsFor(cents)(col(qVec)).as("__sims"))
      .select(col(qId), col(qVec),
        explode(probeCellsCol(col("__sims"), cents.length, nProbe)).as("cell"))
    val scored = assigned.join(broadcast(qb), Seq("cell"))
      .select(col(qId), col(cId),
        cosineSim(asDoubleVec(col(qVec)), asDoubleVec(col(cVec))).as("sim"))
    rankTopK(scored, qId, cId, k)
  }

  /** Build a PERSISTABLE IVF index — the ANN analog of
    * [[Dedup.minHashIndex]]'s index-once / search-per-batch contract:
    * returns `(assignments, centroids)` where `assignments` is
    * `(cell, <cId>, <cVec>)` (write it as parquet bucketed/partitioned
    * on `cell` so probe joins co-locate) and `centroids` is the
    * `(cell, vec)` model table (nCells rows — trivially storable next
    * to the assignments). Later query batches search via
    * [[ivfAgainstIndex]] without rescanning or re-assigning the
    * corpus; at 100 TB the corpus assignment scan happens ONCE, and
    * each batch costs one broadcast probe join over the slim batch.
    * Deterministic training ⇒ `ivfAgainstIndex(q, ivfIndex(c)…)` is
    * result-identical to `ivfTopK(q, c, …)` (pinned in spec). */
  def ivfIndex(
      corpus: DataFrame, cId: String, cVec: String,
      nCells: Int = 16, kmeansIters: Int = 1): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = ivfCentroids(corpus, cId, cVec, nCells, kmeansIters)
    val assignments = corpus
      .select(col(cId), col(cVec), cellSimsFor(cents)(col(cVec)).as("__sims"))
      .select(argmaxCell(col("__sims")).as("cell"), col(cId), col(cVec))
    val centDf = cents.zipWithIndex
      .map { case (v, i) => (i, v.toSeq) }.toSeq.toDF("cell", "vec")
    (assignments, centDf)
  }

  /** Search a query batch against a persisted IVF index
    * ([[ivfIndex]]'s `(assignments, centroids)` read back from
    * storage). The centroid fetch is nCells rows — a bounded model
    * read, never corpus-sized. */
  /** Rebuild the centroid array from a persisted `(cell, vec)` frame —
    * a bounded nCells model read; gaps or duplicates fail loudly. */
  private def centroidsFromDf(centroids: DataFrame,
      ctx: String): Array[Array[Double]] = {
    val rows = centroids
      .orderBy(col("cell"))
      .select(col("cell").cast("int"), asDoubleVec(col("vec")).as("__v"))
      .collect()
    require(rows.nonEmpty, s"$ctx: empty centroid table")
    rows.zipWithIndex.foreach { case (r, i) =>
      require(r.getInt(0) == i,
        s"$ctx: centroid table has gap/dup at cell $i (got ${r.getInt(0)})")
    }
    rows.map(_.getSeq[Double](1).toArray)
  }

  def ivfAgainstIndex(
      queries: DataFrame, qId: String, qVec: String,
      assignments: DataFrame, centroids: DataFrame, cId: String, cVec: String,
      k: Int, nProbe: Int = 4): DataFrame =
    ivfSearch(queries, qId, qVec, assignments, cId, cVec,
      centroidsFromDf(centroids, "ivfAgainstIndex"), k, nProbe)

  /** FAISS-style IVF-PQ index (IndexIVFPQ with by_residual = false —
    * PQ codebooks train on the RAW vectors, so one codebook set serves
    * every cell and the same deterministic [[Quantization.pqTrain]]
    * replay applies): the corpus is coarse-quantized into IVF cells
    * and stored as PQ CODES ONLY — at 100 TB the searchable index is
    * ~(4·m bytes + a cell id) per vector instead of the full float
    * vectors, and a search touches only the probed cells' codes.
    *
    * Returns `(assignments, centroids, codebookDf)`:
    * `assignments = (cell, <cId>, codes)` (write partitioned/bucketed
    * on `cell` so probe joins co-locate), `centroids = (cell, vec)`
    * (nCells rows), `codebookDf = (sub, code, vec)` (m·k rows). Both
    * model tables are bounded — the compressed corpus is the only
    * corpus-sized output. */
  def ivfPqIndex(
      corpus: DataFrame, cId: String, cVec: String,
      nCells: Int = 16, m: Int = 2, k: Int = 4,
      kmeansIters: Int = 1, pqIters: Int = 1)
      : (DataFrame, DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = ivfCentroids(corpus, cId, cVec, nCells, kmeansIters)
    val cbs = Quantization.pqTrain(corpus, cId, cVec, m, k, pqIters)
    val assignments = corpus
      .select(col(cId), col(cVec), cellSimsFor(cents)(col(cVec)).as("__sims"))
      .select(argmaxCell(col("__sims")).as("cell"), col(cId),
        when(col(cVec).isNotNull,
          Quantization.pqEncodeCol(col(cVec), cbs)).as("codes"))
    val centDf = cents.zipWithIndex
      .map { case (v, i) => (i, v.toSeq) }.toSeq.toDF("cell", "vec")
    val codebookDf = (for {
      s <- cbs.indices
      c <- cbs(s).indices
    } yield (s, c, cbs(s)(c).toSeq)).toDF("sub", "code", "vec")
    (assignments, centDf, codebookDf)
  }

  /** Search a query batch against a persisted IVF-PQ index: queries
    * pick their top-nProbe cells row-locally, the slim (qId, lut,
    * cell) batch broadcasts into the cell equi-join, and candidates
    * score by ADC over their stored codes — the raw corpus vectors are
    * never touched. Ranking rides the k-bounded
    * [[graft.functions.TopKAgg]] partial aggregate on negated distance
    * (never a per-query window); ties break to the lower corpus id.
    * Returns (qId, <cId>, rank, dist) with dist = summed squared
    * subspace L2 (the ADC approximation). */
  def ivfPqSearch(
      queries: DataFrame, qId: String, qVec: String,
      assignments: DataFrame, centroids: DataFrame, codebookDf: DataFrame,
      cId: String, k: Int, nProbe: Int = 4): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val cents = centroidsFromDf(centroids, "ivfPqSearch")
    val cbs = Quantization.codebooksFromDf(codebookDf, "ivfPqSearch")
    val m = cbs.length
    val nCodes = cbs(0).length
    val qb = queries
      .select(col(qId), col(qVec), cellSimsFor(cents)(col(qVec)).as("__sims"))
      .select(col(qId), Quantization.adcLut(col(qVec), cbs).as("__lut"),
        explode(probeCellsCol(col("__sims"), cents.length, nProbe)).as("cell"))
    adcRankTopK(assignments, qb, qId, cId, m, nCodes, k)
  }

  /** Shared IVF-PQ scoring tail: broadcast the slim (qId, __lut, cell)
    * batch into the cell equi-join, ADC-score the stored codes, rank
    * via the k-bounded [[graft.functions.TopKAgg]] partial aggregate
    * (never a per-query window); ties break to the lower corpus id. */
  private def adcRankTopK(assignments: DataFrame, qb: DataFrame,
      qId: String, cId: String, m: Int, nCodes: Int, k: Int): DataFrame = {
    val scored = assignments.where(col("codes").isNotNull)
      .join(broadcast(qb), Seq("cell"))
      .select(col(qId), col(cId),
        Quantization.adcDist(col("codes"), col("__lut"), m, nCodes).as("__dist"))
      .where(col("__dist").isNotNull)
    val topk = graft.functions.TopKAgg.topK(k)
    scored
      .groupBy(col(qId))
      .agg(topk(negate(col("__dist")), col(cId).cast("long")).as("top"))
      .select(col(qId), posexplode(col("top")).as(Seq("rank0", "s")))
      .select(col(qId), col("s.id").as(cId),
        (col("rank0") + 1).as("rank"), negate(col("s.sim")).as("dist"))
  }

  /** Probe-cell pick over a squared-L2 DISTANCE array: the nProbe
    * nearest cells, ascending distance, ties to the lower cell. */
  private def probeCellsByDistCol(distsCol: Column, nCents: Int,
      nProbe: Int): Column = {
    val structs = transform(sequence(lit(0), lit(nCents - 1)),
      i => struct(element_at(distsCol, i + 1).as("d"), i.as("cell")))
    transform(slice(sort_array(structs), 1, nProbe), s => s.getField("cell"))
  }

  /** FAISS IndexIVFPQ with `by_residual = true` — FAISS's DEFAULT
    * residual encoding: each vector stores PQ codes of its RESIDUAL
    * (vector − its cell's centroid), so the code bits describe the
    * within-cell displacement instead of re-encoding the coarse
    * position the cell id already carries — the higher-fidelity
    * layout at equal m·k. One codebook set serves every cell (the
    * shared-quantizer layout, FAISS's own default), so the model
    * stays (nCells + m·k) bounded rows and the compressed corpus is
    * the only corpus-sized output.
    *
    * This entry point takes a PRE-TRAINED coarse quantizer `cents`
    * (FAISS's `IndexIVFPQ(quantizer, …)` shape — pass
    * [[ivfIndex]]/k-means output, or any model table read back from
    * storage); cells assign by squared-L2 argmin (the IndexFlatL2
    * quantizer), ties to the lower cell. Assignment and residual are
    * row-local (one [[graft.functions.CentroidSims]] +
    * [[graft.functions.CentroidResidual]] node each — the matrix
    * never appears as plan literals); PQ training over the residuals
    * is the same deterministic [[Quantization.pqTrain]] replay.
    *
    * Returns `(assignments, centroids, codebookDf)` exactly like
    * [[ivfPqIndex]] — the persisted-index layout is format-compatible,
    * only the code SEMANTICS differ (residual vs raw), so search must
    * go through [[ivfPqSearchResidual]]. */
  def ivfPqIndexResidual(
      corpus: DataFrame, cId: String, cVec: String,
      cents: Array[Array[Double]], m: Int = 2, k: Int = 4,
      pqIters: Int = 1): (DataFrame, DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    require(cents.nonEmpty, "need at least one coarse centroid")
    val withRes = corpus
      .select(col(cId), asDoubleVec(col(cVec)).as("__v"))
      .select(col(cId), col("__v"),
        CentroidSims.centroidDistsSq(col("__v"), cents).as("__d"))
      .select(col(cId),
        (array_position(col("__d"), array_min(col("__d"))) - 1)
          .cast("int").as("cell"),
        col("__v"))
      .withColumn("__res",
        CentroidSims.centroidResidual(col("__v"), col("cell"), cents))
    val cbs = Quantization.pqTrain(withRes, cId, "__res", m, k, pqIters)
    val assignments = withRes.select(col("cell"), col(cId),
      when(col("__res").isNotNull,
        Quantization.pqEncodeCol(col("__res"), cbs)).as("codes"))
    val centDf = cents.zipWithIndex
      .map { case (v, i) => (i, v.toSeq) }.toSeq.toDF("cell", "vec")
    val codebookDf = (for {
      s <- cbs.indices
      c <- cbs(s).indices
    } yield (s, c, cbs(s)(c).toSeq)).toDF("sub", "code", "vec")
    (assignments, centDf, codebookDf)
  }

  /** Search a query batch against a persisted RESIDUAL IVF-PQ index
    * ([[ivfPqIndexResidual]]'s output): queries pick their nProbe
    * nearest cells by squared-L2 (row-local), and build one ADC LUT
    * PER PROBED CELL from the residual `query − centroid(cell)` —
    * the per-cell LUT is what by_residual costs at query time, an
    * nProbe× factor on a slim m·k-double table, never on the corpus.
    * The broadcast batch is (qId, lut, cell); scoring and the
    * k-bounded ranking are [[ivfPqSearch]]'s exact tail. Returns
    * (qId, <cId>, rank, dist), dist = ADC over residual space. */
  def ivfPqSearchResidual(
      queries: DataFrame, qId: String, qVec: String,
      assignments: DataFrame, centroids: DataFrame, codebookDf: DataFrame,
      cId: String, k: Int, nProbe: Int = 4): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val cents = centroidsFromDf(centroids, "ivfPqSearchResidual")
    val cbs = Quantization.codebooksFromDf(codebookDf, "ivfPqSearchResidual")
    val m = cbs.length
    val nCodes = cbs(0).length
    val qb = queries
      .select(col(qId), asDoubleVec(col(qVec)).as("__qv"))
      .select(col(qId), col("__qv"),
        CentroidSims.centroidDistsSq(col("__qv"), cents).as("__d"))
      .select(col(qId), col("__qv"),
        explode(probeCellsByDistCol(col("__d"), cents.length, nProbe))
          .as("cell"))
      .select(col(qId), col("cell"),
        Quantization.adcLut(
          CentroidSims.centroidResidual(col("__qv"), col("cell"), cents),
          cbs).as("__lut"))
    adcRankTopK(assignments, qb, qId, cId, m, nCodes, k)
  }

  /** Recall@k of an ANN result against the exact brute-force result —
    * the quality gate for approximate search. Both inputs are outputs of
    * the topK operators (columns qId, cId, rank ≤ k). */
  def recallAtK(ann: DataFrame, exact: DataFrame, qId: String, cId: String): DataFrame = {
    val hits = exact.join(ann, Seq(qId, cId), "left_semi")
      .groupBy(col(qId)).agg(count(lit(1)).as("n_hit"))
    val totals = exact.groupBy(col(qId)).agg(count(lit(1)).as("n_true"))
    totals.join(hits, Seq(qId), "left")
      .select(col(qId),
        (coalesce(col("n_hit"), lit(0L)) / col("n_true")).as("recall"))
  }

  /** All pairs with cosine ≥ threshold within a frame (embedding-space
    * near-dup). Brute-force self-join — QUADRATIC, oracle/verify path
    * only; the scale path is [[bucketedCosinePairs]]. */
  def cosineNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.crossJoin(b)
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineSim(asDoubleVec(col("v_a")), asDoubleVec(col("v_b"))).as("sim"))
      .where(col("sim") >= threshold)
  }

  /** Embedding-space near-dup pairs at scale: SRP-bucket both sides of
    * the self-join ([[srpBucket]]), join on the bucket (ONE equi-join
    * shuffle — never a cross join), exact-cosine verify within buckets.
    * Same output as [[cosineNearDupPairs]] whenever every ≥-threshold
    * pair lands in a shared probe bucket.
    *
    * Recall: one side probes every bucket at Hamming distance ≤ 1 from
    * its own code (flip each sign bit), so a pair is found iff its two
    * codes differ in ≤ 1 bit. A random hyperplane separates a pair at
    * angle θ with p = θ/π; at threshold 0.99 (θ ≤ 8.1°, p ≤ 0.045) the
    * expected differing bits at nPlanes=16 is ≤ 0.72 — and planted
    * exact-direction duplicates (cos = 1) differ in ZERO bits, so they
    * are found with certainty. For looser thresholds lower `nPlanes`
    * (bigger buckets) rather than relying on deeper probes.
    *
    * Scale: candidates ≈ (nPlanes+1)·n²/2^nPlanes — raise `nPlanes`
    * with log₂(corpus) to hold the per-bucket population constant. The
    * probe explode is (nPlanes+1)× on ONE side only; payload vectors
    * shuffle once per side. */
  def bucketedCosinePairs(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      dim: Int, nPlanes: Int = 16, seed: Long = 42L): DataFrame = {
    val bucket = srpBucket(col(vecCol), dim, nPlanes, seed)
    // Probe side carries its own bucket plus every 1-bit flip; the other
    // side keeps its exact bucket. A pair (a,b) with hamming(code_a,
    // code_b) ≤ 1 then matches on exactly ONE probe value, so no
    // post-join distinct is needed. The bucket is aliased ONCE before
    // the probe fan-out — the probe array references it nPlanes+1
    // times, and the higher-order dot-product expression is not CSE'd.
    val probes = array(col("__b") +: (0 until nPlanes).map(p =>
      col("__b").bitwiseXOR(lit(1L << p))): _*)
    val a = df
      .select(col(idCol).as("id_a"), col(vecCol).as("v_a"), bucket.as("__b"))
      .select(col("id_a"), col("v_a"), explode(probes).as("bucket"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("v_b"),
      bucket.as("bucket"))
    a.join(b, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineSim(asDoubleVec(col("v_a")), asDoubleVec(col("v_b"))).as("sim"))
      .where(col("sim") >= threshold)
  }
}
