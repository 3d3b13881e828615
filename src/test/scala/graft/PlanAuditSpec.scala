package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan assertions for the headline queries — the 100 TB
  * design contract, pinned as executable checks rather than prose:
  * dimension joins broadcast, scan filters reach parquet, aggregations
  * are two-phase, top-k never globally sorts.
  *
  * Runs on the sf0.001 fixtures: plan SHAPE is scale-independent (the
  * one exception, broadcast-threshold autodetection, is forced by the
  * explicit `broadcast()` hints the queries use).
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  /** Count physical NODES of a kind — matches the `(N) Name` detail
    * headers, not every textual mention. */
  private def nodes(p: String, kind: String): Int =
    s"""\\(\\d+\\) $kind""".r.findAllIn(p).size

  test("q3: dimension join is broadcast, agg is two-phase hash") {
    val p = plan("q3_shipping")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(nodes(p, "HashAggregate") >= 2, p)
  }

  test("q5: all dimension sides broadcast — no sort-merge join of dims") {
    val p = plan("q5_region")
    assert(nodes(p, "BroadcastHashJoin") >= 3, p)
  }

  test("q6: filters are pushed to the parquet scan") {
    val p = plan("q6_forecast")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("l_shipdate") || pushed.contains("IsNotNull(l_shipdate)"), p)
    assert(pushed.contains("l_quantity"), p)
    // and the projection prunes: no l_comment in the read schema
    assert(!p.linesIterator.filter(_.contains("ReadSchema")).mkString.contains("l_comment"), p)
  }

  test("reductions: partial + final aggregate, one row per partition shuffled") {
    val p = plan("red_sum")
    assert(nodes(p, "HashAggregate") >= 2, p)
    assert(!p.contains("SortAggregate"), p)
  }

  test("top-k: TakeOrderedAndProject, never a global sort") {
    val p = plan("topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("pipeline chunking: row-local generate, zero exchanges") {
    val p = plan("pipeline_chunk")
    assert(p.contains("Generate"), p)
    // orderBy for the gate adds one range exchange; the chunk expansion
    // itself must add none → at most that single exchange in the plan.
    assert(nodes(p, "Exchange") <= 1, p)
  }

  test("pipeline split/mixture: pure projection — no exchange, no generate") {
    for (name <- Seq("pipeline_split", "pipeline_mixture")) {
      val p = plan(name)
      // one exchange for the groupBy + one for the gate's orderBy; the
      // split/sample itself is a scan-projection adding none
      assert(nodes(p, "Exchange") <= 2, s"$name:\n$p")
      assert(nodes(p, "Generate") == 0 && nodes(p, "Sort Merge") == 0, s"$name:\n$p")
    }
  }

  test("driver contract: entry() flagship returns rows on the smoke fixture") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("embedding near-dup: bucketed equi-join — never a cross join") {
    val p = plan("dedup_embedding")
    assert(nodes(p, "CartesianProduct") == 0, p)
    assert(nodes(p, "BroadcastNestedLoopJoin") == 0, p)
    // the bucket join is a real equi-join on the SRP code
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("dedup clusters/drop gates ride the LSH path — no cross join") {
    for (name <- Seq("dedup_clusters", "dedup_drop")) {
      val p = plan(name)
      assert(nodes(p, "CartesianProduct") == 0, s"$name:\n$p")
      assert(nodes(p, "BroadcastNestedLoopJoin") == 0, s"$name:\n$p")
    }
  }

  test("index compaction: equi-joins only — never a cross join at any stage") {
    // the final compacted-index plan reflects the re-point join; the
    // candidate/verify stages run inside duplicateClusters' checkpointed
    // rounds, so audit the PRE-contraction plan too via the probe gate
    for (name <- Seq("dedup_index_compact", "dedup_index_compact_probe")) {
      val p = plan(name)
      assert(nodes(p, "CartesianProduct") == 0, s"$name:\n$p")
      assert(nodes(p, "BroadcastNestedLoopJoin") == 0, s"$name:\n$p")
    }
  }

  test("paragraph/span dedup gates: equi-joins only, never a cross join") {
    // round-10 text dedup: the winner probes and coverage/rebuild joins
    // are all key equi-joins — a cartesian or nested-loop anywhere here
    // would explode at corpus scale
    for (name <- Seq("dedup_paragraphs", "dedup_spans_remove")) {
      val p = plan(name)
      assert(nodes(p, "CartesianProduct") == 0, s"$name:\n$p")
      assert(nodes(p, "BroadcastNestedLoopJoin") == 0, s"$name:\n$p")
    }
  }

  test("decontamination: eval side broadcast, train side never cross-joined") {
    val p = plan("decontam_ids")
    assert(nodes(p, "CartesianProduct") == 0, p)
    assert(nodes(p, "BroadcastNestedLoopJoin") == 0, p)
    // the n-gram probe is a broadcast hash join — the train corpus is
    // not shuffled to meet the (tiny) eval n-gram set
    assert(nodes(p, "BroadcastHashJoin") >= 1, p)
  }

  test("range join: bucketed equi-join — never a nested-loop join") {
    val p = plan("range_join")
    assert(nodes(p, "BroadcastNestedLoopJoin") == 0, p)
    assert(nodes(p, "CartesianProduct") == 0, p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("global sample: per-partition heaps (TakeOrderedAndProject), no full sort of the corpus") {
    val p = plan("pipeline_sample_global")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("stratified sample: partial-aggregate selection, no per-group window") {
    val p = plan("pipeline_stratified")
    // the k-per-group selection must NOT be a window (one partition per
    // group = skew-killer); TopKAgg runs as an ObjectHashAggregate pair
    assert(!p.contains("Window"), p)
    assert(nodes(p, "ObjectHashAggregate") >= 2, p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("kmeans gate: row-local assignment — exchanges only for agg + orderBy") {
    val p = plan("embed_kmeans")
    // assignment is a scan projection (CentroidSims); the plan's only
    // exchanges are the final count/sum groupBy and the gate's orderBy
    assert(nodes(p, "Exchange") <= 2, p)
    assert(nodes(p, "Generate") == 0, p) // no posexplode-by-dimension
  }

  test("repetition metrics: row-local, zero joins, single sort for the gate") {
    val p = plan("text_repetition")
    assert(nodes(p, "Exchange") <= 1, p)
    assert(nodes(p, "SortMergeJoin") + nodes(p, "BroadcastHashJoin") == 0, p)
  }

  test("bloom semi-join: might_contain filter sits under the join") {
    val p = plan("bloom_semi_join")
    assert(p.contains("might_contain"), p)
    assert(nodes(p, "CartesianProduct") == 0, p)
  }

  test("partitioned write: read-back filter prunes partitions at the scan") {
    val p = plan("partitioned_write") // invoking the gate performs the write
    val scan = p.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(scan.contains("l_returnflag"), p)
  }

  test("ann/ivf ranking: k-bounded partial aggregate — no per-query window") {
    for (name <- Seq("simsearch_ann", "simsearch_ivf")) {
      val p = plan(name)
      assert(!p.contains("Window"), s"$name:\n$p")
      // TopKAgg runs as a partial+final ObjectHashAggregate pair
      assert(nodes(p, "ObjectHashAggregate") >= 2, s"$name:\n$p")
    }
  }

  test("pq: encode is row-local; ADC ranking is k-bounded, no window, no shuffle join") {
    val p = plan("simsearch_pq")
    assert(!p.contains("Window"), p)
    // queries (lookup tables) ride a broadcast; the corpus side never
    // shuffles for the scoring join
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // TopKAgg partial+final pair bounds what leaves each map task
    assert(nodes(p, "ObjectHashAggregate") >= 2, p)
    // embed_pq: codes are computed row-local — the only exchange in the
    // plan is the census groupBy's
    val pe = plan("embed_pq")
    assert(nodes(pe, "Exchange") <= 2, pe)
  }

  test("dupspans: hashed mode shuffles 8-byte long keys, exact mode strings") {
    // slim mode: every gram aggregate/join keys on xxhash64(gram) —
    // the optimized plan computes the hash BEFORE the first exchange
    // and no gram string survives past the projection
    val hashed = SparkEntry.queries("text_dupspans_hashed")(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(hashed.contains("xxhash64"), hashed)
    assert(hashed.contains("AS __gk"), hashed)
    // the aggregate key is the bigint __gk, not the gram string
    assert("Aggregate \\[__gk#\\d+L".r.findFirstIn(hashed).isDefined, hashed)
    // exact mode keeps the strings (no hash anywhere in the plan)
    val exact = SparkEntry.queries("text_dupspans")(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(!exact.contains("xxhash64"), exact)
  }

  test("bigram LM: hot slices ride broadcasts; residual joins stay shuffled; no cartesian") {
    val p = plan("text_bigram_lm")
    // hotPairs + hotW2 + the totals row: at least three broadcast sides
    assert(nodes(p, "BroadcastHashJoin") + nodes(p, "BroadcastNestedLoopJoin") >= 3, p)
    assert(!p.contains("CartesianProduct"), p)
    // every broadcast HINT sits on a k-bounded side — a GlobalLimit
    // (the top-hotK slices) or a grouping-free Aggregate (the one-row
    // totals) — never on a full count table; the residual
    // bigram/unigram joins stay hint-free so they can shuffle at scale
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, Join, LogicalPlan}
    val opt = SparkEntry.queries("text_bigram_lm")(spark, dir)
      .queryExecution.optimizedPlan
    val joins = opt.collect { case j: Join => j }
    var hintedSides = 0
    joins.foreach { j =>
      def check(side: LogicalPlan, hinted: Boolean): Unit = if (hinted) {
        hintedSides += 1
        val bounded = side.collectFirst {
          case g: GlobalLimit => g
          case a: Aggregate if a.groupingExpressions.isEmpty => a
        }
        assert(bounded.isDefined, s"unbounded broadcast hint over:\n$side")
      }
      check(j.left, j.hint.leftHint.exists(_.strategy.isDefined))
      check(j.right, j.hint.rightHint.exists(_.strategy.isDefined))
    }
    assert(hintedSides >= 3, s"expected the hot/totals hints, saw $hintedSides")
  }

  test("incremental ingest dedup: equi-joins only — no cartesian, no nested loop") {
    val p = plan("dedup_incremental_drop")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("tfidf: the tf→dfreq join carries no broadcast hint") {
    // same contract as unigramLogProb: a web-scale vocabulary table can
    // run to billions of rows, so the join must stay unhinted — AQE
    // broadcasts small vocabs at runtime, huge ones degrade to a
    // shuffled hash join instead of a driver OOM
    val df = SparkEntry.queries("text_tfidf")(spark, dir)
    val lp = df.queryExecution.optimizedPlan.toString
    assert(!lp.contains("strategy=broadcast"), lp)
  }

  test("bm25: one stats aggregate broadcast back — no explode, no per-term join") {
    val p = plan("text_bm25")
    // scoring side: no generator (explode) and no shuffle join of a
    // term table — term frequencies are row-local array math
    assert(!p.contains("Generate"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    // the corpus-stats single row rides a broadcast
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    // stats aggregate is the standard two-phase pair
    assert(nodes(p, "HashAggregate") >= 2, p)
  }

  test("int8 quantization: fully row-local — only the gate's sort exchanges") {
    val p = plan("embed_int8")
    // encode/decode/cosine are row-local; the single exchange in the
    // plan belongs to the output orderBy
    assert(nodes(p, "Exchange") <= 1, p)
    assert(!p.contains("Join"), p)
  }

  test("exactByHashById: the dedup-decision exchanges are slim — no payload") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = graft.operators.Dedup.exactByHashById(docs, "text", "doc_id")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // every exchange keyed on the content fingerprint must carry only
    // (fingerprint, id) — the text payload stays out of the shuffle
    val blocks = p.split("""(?m)^\(\d+\) """).toSeq
    val fpExchanges = blocks.filter(b => b.startsWith("Exchange") && b.contains("__h1"))
    assert(fpExchanges.nonEmpty, p)
    for (b <- fpExchanges)
      assert(!b.contains("text#"), s"payload column in a fingerprint exchange:\n$b")
  }

  test("semdedup: candidate generation is an equi-join on the cell, never a cross join") {
    val p = plan("dedup_semantic")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // cell assignment is row-local: the centroid model is one reference
    // object, not unrolled literals
    assert(p.contains("centroid_sims"), p)
  }

  test("dsir scoring: row-local expression — only the gate's sort exchange") {
    val p = plan("text_dsir")
    // the model is fitted before the plan exists; scoring itself is a
    // scan + project, so the only exchange is the output orderBy
    assert(nodes(p, "Exchange") <= 1, p)
    assert(!p.contains("Join"), p)
    assert(p.contains("dsir_score"), p)
  }

  test("dsir resample: bounded top-n heaps, never a global sort of the corpus") {
    val p = plan("text_dsir_sample")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("dupspans: two-phase aggregates, no window, no cross join") {
    val p = plan("text_dupspans")
    assert(nodes(p, "HashAggregate") >= 2, p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dedupLines: slim frequency shuffle, broadcast anti-probe, no cartesian") {
    val p = plan("dedup_lines")
    assert(!p.contains("CartesianProduct"), p)
    // under the size gate the boilerplate-key probe is a map-side
    // broadcast anti-join — line text never shuffles for the FILTER
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("LeftAnti"), p)
    // the doc-frequency aggregate carries (key, id), never line text —
    // planned on the un-checkpointed key set (the checkpoint hides the
    // aggregate's job from the gate plan)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val kp = graft.operators.Dedup.boilerplateKeys(docs, "doc_id", "text", 2)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    val blocks = kp.split("""(?m)^\(\d+\) """).toSeq
    val keyExchanges = blocks.filter(b => b.startsWith("Exchange") && b.contains("__key"))
    assert(keyExchanges.nonEmpty, kp)
    for (b <- keyExchanges)
      assert(!b.contains("__line#"), s"line text in the frequency exchange:\n$b")
  }

  test("url ops: pure row-local projection — only the gate's sort exchange") {
    val p = plan("url_canonicalize")
    assert(nodes(p, "Exchange") <= 1, p)
    assert(!p.contains("Join"), p)
  }

  test("url host stats: two-phase hash aggregate over (host, counters)") {
    val p = plan("url_host_stats")
    assert(nodes(p, "HashAggregate") >= 2, p)
    assert(!p.contains("Join"), p)
  }

  test("url blocklist: corpus never shuffles — broadcast anti-join only") {
    val p = plan("url_blocklist")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("drop-best dedup: winner selection is a slim aggregate, no cartesian, no window") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val p = graft.operators.Dedup.dropNearDuplicatesBy(
        docs.withColumn("score", pmod(col("doc_id"), lit(7L))), "doc_id", "score", pairs)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
    // the winner aggregate groups on cluster and never carries text
    // (max_by with a struct ordering plans as SortAggregate)
    val blocks = p.split("""(?m)^\(\d+\) """).toSeq
    val winnerAggs = blocks.filter(b =>
      b.takeWhile(_ != '\n').contains("Aggregate") && b.contains("max_by"))
    assert(winnerAggs.nonEmpty, p)
    for (b <- winnerAggs) assert(!b.contains("text#"), s"payload in winner agg:\n$b")
  }

  test("hamming near-dup: bands DISTINCT fingerprints — two bounded tiers, no cartesian") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate}
    for (gate <- Seq("multimodal_image_dedup", "dedup_simhash")) {
      val df = SparkEntry.queries(gate)(spark, dir)
      val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      // radius-0 self-join tier ∪ banded cross tier (the gate corpora
      // may union scans of their own); nothing unbounded
      assert(nodes(p, "Union") >= 1, s"$gate:\n$p")
      assert(nodes(p, "CartesianProduct") == 0 &&
        nodes(p, "BroadcastNestedLoopJoin") == 0, s"$gate:\n$p")
      // the chunk posexplode must sit over a DISTINCT-fingerprint
      // aggregate (group = output = the bare hash) — the round-7
      // degenerate-class hardening: bucket size is bounded by distinct
      // near-collisions, never corpus frequency of a viral value
      val chunkGens = df.queryExecution.optimizedPlan.collect {
        case g: Generate if g.generatorOutput.exists(_.name == "chunk_idx") => g
      }
      assert(chunkGens.nonEmpty, s"$gate: no chunk banding Generate")
      for (g <- chunkGens) {
        val distinctAgg = g.child.collectFirst {
          case a: Aggregate
            if a.groupingExpressions.size == 1 && a.aggregateExpressions.size == 1 => a
        }
        assert(distinctAgg.nonEmpty,
          s"$gate: banding Generate not fed by a distinct-value collapse")
      }
    }
  }

  test("minhash LSH: bands one representative per DISTINCT text — no cartesian") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate}
    val df = SparkEntry.queries("dedup_minhash_lsh")(spark, dir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(nodes(p, "CartesianProduct") == 0 &&
      nodes(p, "BroadcastNestedLoopJoin") == 0, p)
    // the band posexplode must sit over the exact-text-class collapse
    // (group = (xxhash64, length), one struct-min aggregate) — the
    // round-7 degenerate-class hardening: a boilerplate class of m
    // identical texts bands ONE representative, never m rows
    val bandGens = df.queryExecution.optimizedPlan.collect {
      case g: Generate if g.generatorOutput.exists(_.name == "band_idx") => g
    }
    assert(bandGens.nonEmpty, "no band Generate in the plan")
    for (g <- bandGens) {
      val collapse = g.child.collectFirst {
        case a: Aggregate if a.groupingExpressions.size == 2 => a
      }
      assert(collapse.nonEmpty,
        "band Generate not fed by the exact-text-class collapse")
    }
  }

  test("round-9 media-metadata gates: row-local decode, no joins, bounded exchanges") {
    for (name <- Seq("multimodal_png_16bit", "multimodal_mp3_meta",
        "multimodal_flac_meta", "multimodal_webm", "multimodal_opus_meta",
        "multimodal_tiff_meta",
        // round-10 additions: AAC/ADTS, M4A, codec-dispatched Ogg, and
        // the seven-format unified audio dispatcher
        "multimodal_aac_meta", "multimodal_m4a_meta",
        "multimodal_ogg_vorbis_meta", "multimodal_audio_meta_all")) {
      val p = plan(name)
      assert(nodes(p, "SortMergeJoin") + nodes(p, "BroadcastHashJoin") +
        nodes(p, "ShuffledHashJoin") + nodes(p, "CartesianProduct") +
        nodes(p, "BroadcastNestedLoopJoin") == 0, s"$name:\n$p")
      // encode/parse are mapPartitions projections; the only exchanges
      // belong to the gate's final agg or orderBy
      assert(nodes(p, "Exchange") <= 2, s"$name:\n$p")
    }
  }

  test("broadcast join query does broadcast; big join stays shuffle") {
    assert(plan("join_broadcast").contains("BroadcastHashJoin"))
    // join_big must not HINT a broadcast: disable the size-based
    // auto-broadcast (at sf0.001 everything fits under the threshold,
    // which a 100 TB run would not) and require a shuffle join.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val p = plan("join_big")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
    } finally spark.conf.set(key, prev)
  }

  // ---- round-10 families ------------------------------------------------

  test("row-local ingest/repair/extract gates: one gate exchange, no joins") {
    // each of these is mapPartitions payload work; the only exchange
    // allowed is the gate's own orderBy range partitioning
    for (name <- Seq("web_main_content", "pdf_text_extract",
        "text_fix_mojibake", "text_blocklist", "audio_resample")) {
      val p = plan(name)
      assert(nodes(p, "Exchange") <= 1, s"$name:\n$p")
      assert(!p.contains("Join"), s"$name:\n$p")
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
    }
  }

  test("warc ingest: one build-side group exchange + the gate sort, nothing else") {
    val p = plan("web_warc_ingest")
    assert(nodes(p, "Exchange") <= 2, p)
    assert(!p.contains("Join"), p)
    // the ingest direction (members -> records -> http -> text) is pure
    // MapPartitions — the scale path has no shuffle of payload bytes
    assert(p.contains("MapPartitions"), p)
  }

  test("gzip roundtrip census: mapPartitions + two-phase aggregate only") {
    val p = plan("web_gzip_roundtrip")
    assert(nodes(p, "HashAggregate") >= 2, p)
    assert(!p.contains("Join"), p)
  }

  test("robots filter: equi-join on domain, never a cartesian") {
    val p = plan("web_robots_filter")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("zorder: ONE range exchange, top-k gate never globally sorts") {
    val p = plan("layout_zorder")
    assert(nodes(p, "Exchange") == 1, p)
    assert(p.contains("REPARTITION_BY_COL") || p.contains("rangepartitioning"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("kmv sketch: two-phase object aggregate — k-bounded partials cross the exchange") {
    val p = plan("sketch_kmv_distinct")
    assert(nodes(p, "ObjectHashAggregate") >= 2, p)
    // the scalar attach of the exact count is the documented one-row
    // broadcast join, and nothing else joins
    assert(nodes(p, "BroadcastNestedLoopJoin") <= 1, p)
  }

  test("bpe encode: trained counts apply row-locally — one gate exchange, no joins") {
    val p = plan("text_bpe_encode")
    assert(nodes(p, "Exchange") <= 1, p)
    assert(!p.contains("Join"), p)
  }

  test("q4/q7/q13/q18: semi join stays semi, dims broadcast, no cartesian") {
    val p4 = plan("q4_priority")
    assert(p4.contains("LeftSemi"), p4)
    val p7 = plan("q7_volume")
    assert(nodes(p7, "BroadcastHashJoin") >= 4, p7)
    assert(!p7.contains("CartesianProduct"), p7)
    val p13 = plan("q13_distribution")
    assert(p13.contains("LeftOuter"), p13)
    assert(nodes(p13, "HashAggregate") >= 4, p13) // two two-phase aggs
    val p18 = plan("q18_toporders")
    assert(nodes(p18, "HashAggregate") >= 2, p18)
    assert(!p18.contains("CartesianProduct"), p18)
  }

  test("q17/q20/q21/q22: correlated tier — semi/anti stay keyed, no cartesian") {
    val p17 = plan("q17_smallqty")
    assert(!p17.contains("CartesianProduct"), p17)
    assert(nodes(p17, "HashAggregate") >= 2, p17) // per-part threshold + final
    val p20 = plan("q20_excess")
    assert(p20.contains("LeftSemi"), p20)
    assert(!p20.contains("CartesianProduct"), p20)
    val p21 = plan("q21_waiting")
    assert(p21.contains("LeftSemi"), p21)
    assert(p21.contains("LeftAnti"), p21)
    // the <>-residual semi/anti joins must still be EQUI-keyed on
    // l_orderkey (hash or sort-merge), not nested-loop
    assert(!p21.contains("CartesianProduct") &&
      !p21.contains("BroadcastNestedLoopJoin"), p21)
    val p22 = plan("q22_prospects")
    assert(p22.contains("LeftAnti"), p22)
    // the scalar-average attach is the one-row broadcast cross join;
    // nothing else may nest loops
    assert(nodes(p22, "BroadcastNestedLoopJoin") <= 1, p22)
    assert(!p22.contains("CartesianProduct"), p22)
  }

  test("q2/q8/q9/q10: min-cost join-back and dim ladders broadcast, no cartesian") {
    val p2 = plan("q2_mincost")
    // region/supplier/part dims broadcast; the min-cost join-back is
    // the only big-big join and it is equi-keyed on (partkey, cost)
    assert(nodes(p2, "BroadcastHashJoin") >= 2, p2)
    assert(!p2.contains("CartesianProduct") &&
      !p2.contains("BroadcastNestedLoopJoin"), p2)
    val p8 = plan("q8_marketshare")
    // six dimension hops all ride broadcasts; only lineitem⋈orders may
    // shuffle — so at most one non-broadcast join in the tree
    assert(nodes(p8, "BroadcastHashJoin") >= 5, p8)
    assert(nodes(p8, "SortMergeJoin") + nodes(p8, "ShuffledHashJoin") <= 1, p8)
    assert(!p8.contains("CartesianProduct"), p8)
    val p9 = plan("q9_profit")
    // every join is a broadcast: the part-name filter, supplier, nation
    assert(nodes(p9, "SortMergeJoin") + nodes(p9, "ShuffledHashJoin") +
      nodes(p9, "CartesianProduct") == 0, p9)
    val p10 = plan("q10_returns")
    assert(p10.contains("TakeOrderedAndProject"), p10) // top-20, never a full sort
    assert(!p10.contains("CartesianProduct"), p10)
  }

  test("q11/q12/q14/q15/q16/q19: scalar attaches stay one-row, conditional aggs single-pass") {
    val p11 = plan("q11_stock")
    // the total is a one-row broadcast attach; the only other join is
    // the broadcast supplier semi-filter
    assert(nodes(p11, "BroadcastNestedLoopJoin") <= 1, p11)
    assert(!p11.contains("CartesianProduct"), p11)
    val p12 = plan("q12_priority")
    // both counts come from ONE aggregate over the join — a single
    // two-phase agg, no second scan
    assert(nodes(p12, "HashAggregate") == 2, p12)
    val p14 = plan("q14_promo")
    assert(nodes(p14, "BroadcastHashJoin") == 1, p14)
    assert(nodes(p14, "SortMergeJoin") + nodes(p14, "ShuffledHashJoin") +
      nodes(p14, "CartesianProduct") == 0, p14)
    val p15 = plan("q15_topsupplier")
    // max-revenue scalar attaches as a one-row broadcast; under AQE
    // exchange reuse is a RUNTIME decision, so execute and assert the
    // revenue view's shuffle stage was reused for the max leg, not
    // recomputed (both legs carry the same explicit not-null filter so
    // they canonicalize to one subtree)
    assert(nodes(p15, "BroadcastNestedLoopJoin") <= 1, p15)
    val q15 = SparkEntry.queries("q15_topsupplier")(spark, dir)
    if (spark.conf.get("spark.sql.adaptive.enabled", "true").toBoolean) {
      q15.collect()
      val e15 = q15.queryExecution.executedPlan.toString
      assert(e15.contains("ReusedQueryStage") || e15.contains("ReusedExchange"),
        e15)
    } else {
      // without AQE, runtime stage reuse never materializes — assert the
      // precondition instead: the revenue view's two legs canonicalize to
      // one subtree (the same aggregate appears twice in the analyzed
      // plan with identical canonical form)
      val aggs = q15.queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a.canonicalized
      }
      assert(aggs.combinations(2).exists { case Seq(a, b) => a == b },
        q15.queryExecution.optimizedPlan.toString)
    }
    val p16 = plan("q16_partsupp")
    assert(p16.contains("LeftAnti"), p16)
    assert(p16.contains("TakeOrderedAndProject"), p16)
    assert(!p16.contains("CartesianProduct"), p16)
    val p19 = plan("q19_disjunct")
    // the disjunction is a residual of the broadcast equi-join, never a
    // nested loop over part
    assert(nodes(p19, "BroadcastHashJoin") == 1, p19)
    assert(nodes(p19, "CartesianProduct") +
      nodes(p19, "BroadcastNestedLoopJoin") == 0, p19)
  }

  test("bucketed join: both scans co-located — zero exchanges") {
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.functions.{col, count, lit}
    val aqeKey = "spark.sql.adaptive.enabled"
    val bKey = "spark.sql.autoBroadcastJoinThreshold"
    val (prevA, prevB) = (spark.conf.get(aqeKey), spark.conf.get(bKey))
    try {
      // AQE off for a walkable tree; broadcast off so co-location (not a
      // trivial broadcast) is what removes the exchanges
      spark.conf.set(aqeKey, "false")
      spark.conf.set(bKey, "-1")
      new graft.api.GraftFrame(spark.read.parquet(s"$dir/orders.parquet"))
        .to_parquet_bucketed("orders_pin_bkt", buckets = 8,
          by = Seq("o_custkey"), sortCols = Seq("o_custkey"))
      new graft.api.GraftFrame(spark.read.parquet(s"$dir/customer.parquet"))
        .to_parquet_bucketed("customer_pin_bkt", buckets = 8,
          by = Seq("c_custkey"), sortCols = Seq("c_custkey"))
      val o = spark.table("orders_pin_bkt")
      val c = spark.table("customer_pin_bkt")
      // join on the bucket keys AND an aggregation on them: the whole
      // pipeline rides the write-time layout, zero exchanges anywhere
      val j = o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(o("o_custkey")).agg(count(lit(1)).as("n"))
      val exec = j.queryExecution.executedPlan
      assert(exec.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"bucketed join should be exchange-free:\n$exec")
      // the residual Sorts are PARTITION-LOCAL passes over the already
      // co-located buckets (since 3.0 Spark conservatively ignores
      // bucket sort metadata at scan — a bucket may span files — unless
      // the legacy outputOrdering flag is set); the expensive global
      // movement is what the zero-exchange assertion above pins away
      assert(exec.collect { case s: SortExec => s }.forall(!_.global),
        s"any residual sort must be partition-local:\n$exec")
      assert(j.collect().length > 0)
    } finally {
      spark.conf.set(aqeKey, prevA)
      spark.conf.set(bKey, prevB)
      spark.sql("DROP TABLE IF EXISTS orders_pin_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_pin_bkt")
    }
  }

  test("pagerank iteration: edge bytes never re-shuffle — ONE exchange per round, none edge-side") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    import org.apache.spark.sql.functions.col
    // AQE off for a deterministic walkable tree (the invariant itself
    // is AQE-independent: EnsureRequirements honors the checkpointed
    // partitioning either way)
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    val probes = scala.collection.mutable.ArrayBuffer[DataFrame]()
    try {
      spark.conf.set(key, "false")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = docs.count()
      val e = docs.select(col("doc_id").as("src"), ((col("doc_id") * 7 + 1) % n).as("dst"))
        .unionAll(docs.select(col("doc_id").as("src"), ((col("doc_id") * 13 + 3) % n).as("dst")))
      graft.operators.Graph.pageRank(e, iters = 3, iterationProbe = probes += _)
    } finally spark.conf.set(key, prev)
    assert(probes.size == 3)
    // iterations 2..3 run entirely from the checkpointed, pre-partitioned
    // tables — the steady state a 100-iteration crawl ranking lives in
    for ((df, i) <- probes.zipWithIndex.drop(1)) {
      val exec = df.queryExecution.executedPlan
      val exchanges = exec.collect { case s: ShuffleExchangeExec => s }
      assert(exchanges.size == 1,
        s"iteration ${i + 1}: expected exactly the transpose exchange, got ${exchanges.size}:\n$exec")
      // the one exchange moves partial-aggregated (node, csum) pairs —
      // its input schema must be rank-vector shaped, not edge shaped
      assert(!exchanges.head.child.output.map(_.name).contains("dst"),
        s"iteration ${i + 1}: the exchange carries edge rows:\n$exec")
      // and the rank join's edge side (the child producing dst) holds
      // no exchange anywhere beneath it
      val joins: Seq[(SparkPlan, SparkPlan)] = exec.collect {
        case j: SortMergeJoinExec => Seq((j.left, j.right))
        case j: ShuffledHashJoinExec => Seq((j.left, j.right))
        case j: BroadcastHashJoinExec => Seq((j.left, j.right))
      }.flatten
      val edgeSides = joins.collect {
        case (l, r) if l.output.exists(_.name == "dst") => l
        case (l, r) if r.output.exists(_.name == "dst") => r
      }
      assert(edgeSides.nonEmpty, s"iteration ${i + 1}: no rank join found:\n$exec")
      for (side <- edgeSides)
        assert(side.collect { case s: ShuffleExchangeExec => s }.isEmpty,
          s"iteration ${i + 1}: edge-side exchange:\n$exec")
    }
  }

  test("round-14 gates: funnel user-keyed, tfidf NN pruned join, no cartesian anywhere") {
    // funnel: every join/agg keys on the user column — no cartesian,
    // no broadcast nested loop (the range bounds must ride the
    // equi-joins as residuals)
    val pf = plan("events_funnel")
    assert(!pf.contains("CartesianProduct"), pf)
    assert(!pf.contains("BroadcastNestedLoopJoin"), pf)
    // tfidf NN: the stop-bucket keep-list broadcasts; the dot-product
    // join is an equi-join on bucket; ranking is a window, bounded by
    // the probe restriction — and never a cartesian
    val pn = plan("text_tfidf_nn")
    assert(!pn.contains("CartesianProduct"), pn)
    assert(pn.contains("BroadcastHashJoin"), pn)
    // hilbert: ONE range exchange for the layout rewrite, and the
    // gate's top-k never globally sorts the full frame a second time
    val ph = plan("layout_hilbert")
    assert(nodes(ph, "Exchange") <= 2, ph)
    assert(ph.contains("TakeOrderedAndProject"), ph)
    // retention: distinct user-day + first-day aggs, equi-join, final
    // grouped count — no cartesian, no nested loop
    val pr = plan("events_retention")
    assert(!pr.contains("CartesianProduct"), pr)
    assert(!pr.contains("BroadcastNestedLoopJoin"), pr)
  }

  test("video frame decode: row-local kernels — payload bytes never shuffle") {
    // the gate's only exchange is its orderBy range partitioning; the
    // demux→decode chain itself adds none (flatMap over media rows)
    val p = plan("multimodal_video_frames")
    assert(nodes(p, "Exchange") <= 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("video dedup clusters: slim fingerprint exchanges only, no cartesian") {
    // fingerprint groupBy + rep groupBy + member join + gate orderBy:
    // every exchange carries (id, fp) or smaller — pin the count so a
    // payload-bytes shuffle can't sneak in
    val p = plan("video_dedup_clusters")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(nodes(p, "Exchange") <= 6, p)
  }

  test("pHash: row-local hashing; the hamming dedup never cross-joins") {
    val p = plan("multimodal_phash")
    assert(nodes(p, "Exchange") <= 1, p) // gate orderBy only
    val p2 = plan("image_dedup_phash")
    assert(!p2.contains("CartesianProduct") && !p2.contains("BroadcastNestedLoopJoin"), p2)
  }

  test("ADPCM decode: row-local state machine, zero non-sort exchanges") {
    val p = plan("multimodal_audio_adpcm")
    assert(nodes(p, "Exchange") <= 1, p) // gate orderBy only
  }

  test("webdataset media: one re-shard exchange builds shards; ingest adds none") {
    // groupByKey(media_id % shards) is the single corpus shuffle of the
    // shard writer; decode after ingest is mapPartitions — the gate's
    // orderBy adds its range exchange on top
    val p = plan("webdataset_video")
    assert(nodes(p, "Exchange") <= 3, p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
