package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{Blocklist, Dedup, Similarity, WebArchive}

/** Empirical linearity probe for the dedup/ANN scale claims (round-10
  * VERDICT item 5): the O(batch) / linear-candidate behaviors are pinned
  * by planted unit tests; this measures them — wall time AND executed
  * shuffle bytes for the three flagship ingest paths at sf0.1 (1×) and a
  * synthetic 10× corpus, writing a SCALING.md table.
  *
  * The 10× corpus is dup-DENSE but cross-copy DISJOINT: 10 copies of the
  * sf0.1 documents table, every token of copy k suffixed `_k`, ids
  * shifted by k·10⁷. Each copy keeps the gates' planted drop-5-token
  * near-dup structure (so duplicate density per row is IDENTICAL at both
  * scales — 10× rows means 10× true pairs), while suffixing makes
  * shingles across copies disjoint (no artificial 10-clique inflation
  * that would change per-row workload). Under that construction a linear
  * operator shows ~10× time/bytes; a quadratic candidate structure would
  * show ~100×.
  *
  * Usage: runMain graft.tools.ScalingProbe [sfDir] [outPath]
  */
object ScalingProbe {

  /** Total shuffle bytes over every shuffle stage of an EXECUTED
    * adaptive plan (same probe as DedupSpec/TextOpsSpec use to pin
    * funnels — mapStats of each ShuffleQueryStageExec). */
  private def totalShuffleBytes(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
    var total = 0L
    def walk(p: SparkPlan): Unit = p.foreach {
      case s: ShuffleQueryStageExec =>
        s.mapStats.foreach(ms => total += ms.bytesByPartitionId.sum)
        walk(s.plan)
      case q: QueryStageExec => walk(q.plan)
      case _ => ()
    }
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case other => walk(other)
    }
    total
  }

  /** The gates' planted near-dup construction: every ≥30-token doc gets
    * a drop-5-token copy at id+10⁶ (within the SAME id-space copy). */
  private def plantDups(docs: DataFrame): DataFrame = {
    val base = docs.where(size(split(col("text"), " ")) >= 30)
      .select(col("doc_id"), col("text"))
    val toks = split(col("text"), " ")
    docs.select(col("doc_id"), col("text")).unionAll(
      base.select((col("doc_id") + 1000000L).as("doc_id"),
        array_join(slice(toks, lit(1), size(toks) - 5), " ").as("text")))
  }

  /** `copies` shifted, token-suffixed copies of the docs table —
    * cross-copy shingle-disjoint, per-copy structure preserved. */
  private def scaleDocs(docs: DataFrame, copies: Int): DataFrame =
    (0 until copies).map { k =>
      docs.select((col("doc_id") + k * 10000000L).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          t => concat(t, lit(s"_$k"))), " ").as("text"))
    }.reduce(_ unionAll _)

  /** Build → collect() → walk the SAME DataFrame object: collect()
    * executes the df's own QueryExecution, so its AQE mapStats are
    * populated for the shuffle-bytes walk (a count() would execute a
    * separate QueryExecution and leave the walked plan unexecuted). */
  private def timed(build: () => DataFrame): (Double, Long, Long) = {
    val t1 = System.nanoTime()
    build().collect()
    val w1 = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val df = build()
    val rows = df.collect().length.toLong
    val w2 = (System.nanoTime() - t2) / 1e9
    (math.min(w1, w2), totalShuffleBytes(df), rows)
  }

  private final class ShuffleBytesListener
      extends org.apache.spark.scheduler.SparkListener {
    @volatile var bytes = 0L
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      bytes += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
  }

  /** Like [[timed]] but sums LISTENER-observed shuffle-write bytes over
    * every stage the second build executes — required for ops that run
    * through multiple actions (PageRank's per-iteration checkpoints),
    * where the final plan is a bare RDD scan and AQE mapStats see
    * nothing. The listener bus is async: a short drain pause before
    * reading keeps the sum complete. */
  private def timedListener(spark: org.apache.spark.sql.SparkSession,
      build: () => DataFrame): (Double, Long, Long) = {
    val t1 = System.nanoTime()
    build().collect()
    val w1 = (System.nanoTime() - t1) / 1e9
    val l = new ShuffleBytesListener
    spark.sparkContext.addSparkListener(l)
    val t2 = System.nanoTime()
    val rows = build().collect().length.toLong
    val w2 = (System.nanoTime() - t2) / 1e9
    Thread.sleep(2000)
    spark.sparkContext.removeSparkListener(l)
    (math.min(w1, w2), l.bytes, rows)
  }

  /** 100× probe (round-11 VERDICT item 4): the brief's stated bar is
    * "would it survive 100×" — the 10× window can hide a super-linear
    * term with a small constant, so the three heaviest dedup paths and
    * the ANN path re-run at 1× vs 100× (single-run timing — at this
    * scale the noise floor is irrelevant next to a quadratic blow-up,
    * which would show as ~10,000×). APPENDS a section to outPath so
    * the 1×/10× table above it stays authoritative. */
  private def run100x(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      outPath: String, cpus: String): Unit = {
    val docs1 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val emb1 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val results = scala.collection.mutable.LinkedHashMap
      .empty[(String, Int), (Double, Long, Long)]
    for (copies <- Seq(1, 100)) {
      val docs = scaleDocs(docs1, copies).cache()
      val nDocs = docs.count()
      def once(build: () => DataFrame): (Double, Long, Long) = {
        val t = System.nanoTime()
        val df = build()
        val rows = df.collect().length.toLong
        ((System.nanoTime() - t) / 1e9, totalShuffleBytes(df), rows)
      }
      results(("dedup_lsh_drop", copies)) = once { () =>
        Dedup.dropLshDuplicates(plantDups(docs), "doc_id", "text",
          threshold = 0.5, numHashes = 128, bands = 32)
          .select(col("doc_id"))
      }
      results(("dedup_incremental_drop", copies)) = once { () =>
        val toks = split(col("text"), " ")
        val base = docs.where(size(toks) >= 30)
        val batch = base.select((col("doc_id") + 1000000L).as("doc_id"),
            array_join(slice(toks, lit(1), size(toks) - 5), " ").as("text"))
          .unionAll(base.select((col("doc_id") + 2000000L).as("doc_id"),
            array_join(reverse(toks), " ").as("text")))
        val index = Dedup.minHashIndex(docs, "doc_id", "text",
          numHashes = 128, bands = 32)
        Dedup.dedupIncremental(batch, "doc_id", "text",
          index, docs, "doc_id", "text",
          threshold = 0.5, numHashes = 128, bands = 32)
          .select(col("doc_id"))
      }
      results(("remove_dup_spans", copies)) = once { () =>
        graft.operators.TextOps.removeDupSpans(
          plantDups(docs), "doc_id", "text", n = 8)
          .select(col("doc_id"), col("n_tokens_kept"))
      }
      results(("simsearch_ivf", copies)) = once { () =>
        val q = emb1.where(col("vec_id") < 64)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        val c = (0 until copies).map { k =>
          emb1.select((col("vec_id") + k * 10000000L).as("corpus_id"),
            transform(Similarity.asDoubleVec(col("embedding")),
              x => x + lit(k * 0.001)).as("cv"))
        }.reduce(_ unionAll _)
        Similarity.ivfTopK(q, "query_id", "qv",
          c, "corpus_id", "cv", k = 10, nCells = 16, nProbe = 4)
      }
      println(s"[scaling-100x] copies=$copies nDocs=$nDocs done")
      docs.unpersist()
    }
    val head = Provenance.gitHead
    val dirty = Provenance.gitTreeDirty
    val sb = new StringBuilder
    sb ++= "\n## 100× probe (heaviest dedup paths + ANN)\n\n"
    sb ++= s"Generated by `graft.tools.ScalingProbe 100x` at git `$head`" +
      s"${if (dirty) " (DIRTY tree)" else ""}, fixtures `$sfDir`, local[$cpus]. " +
      "Same corpus recipe as the 10× table (token-suffixed id-shifted " +
      "copies, cross-copy shingle-disjoint); single-run timing — a hidden " +
      "quadratic term would show as ~10,000×, far above any noise floor.\n\n"
    sb ++= "| op | scale | rows out | wall s | shuffle MB |\n"
    sb ++= "|---|---|---|---|---|\n"
    for (((op, copies), (sec, bytes, rows)) <- results)
      sb ++= f"| $op | ${copies}× | $rows | $sec%.2f | ${bytes / 1e6}%.1f |\n"
    sb ++= "\n| op | time 100×/1× | shuffle 100×/1× |\n|---|---|---|\n"
    for (op <- Seq("dedup_lsh_drop", "dedup_incremental_drop",
        "remove_dup_spans", "simsearch_ivf")) {
      val (s1, b1, _) = results((op, 1))
      val (s100, b100, _) = results((op, 100))
      val bRatio = if (b1 > 0) f"${b100.toDouble / b1}%.1f×" else "n/a"
      sb ++= f"| $op | ${s100 / s1}%.1f× | $bRatio |\n"
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      sb.toString, java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    println(sb.toString)
  }

  /** TPC-H tier 1× vs 10× (round-13 VERDICT item 5): the q-gates'
    * 2×-of-baseline bar is only exercised at sf0.1, so this scales the
    * FACT tables — `copies` id-shifted unions of lineitem/orders (the
    * documents recipe applied to facts; dimensions stay fixed, the
    * realistic shape: facts grow, dims don't) — materializes them as
    * parquet, and runs the five most expensive TPC-H gates unchanged
    * against the scaled directory. Records wall (min-of-2), executed
    * shuffle bytes, and the EXECUTED plan's join mix (the q15
    * technique): a broadcast dimension ladder that silently crossed
    * into a shuffle join would show as a dropped BHJ count at 10×. */
  private def runTpch(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      outPath: String, cpus: String): Unit = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    val qNames = Seq("q16_partsupp", "q7_volume", "q8_marketshare",
      "q5_region", "q2_mincost")
    val dims = Seq("region", "nation", "customer", "supplier", "part")
    val results = scala.collection.mutable.LinkedHashMap
      .empty[(String, Int), (Double, Long, Long, Int, Int)]
    for (copies <- Seq(1, 10)) {
      val dir = s"/tmp/graft_tpch_scale_${copies}x"
      def shifted(table: String, keyCol: String): DataFrame = {
        val df = spark.read.parquet(s"$sfDir/$table.parquet")
        (0 until copies).map { k =>
          df.withColumn(keyCol, col(keyCol) + k * 1000000000L)
        }.reduce(_ unionAll _)
      }
      shifted("lineitem", "l_orderkey")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      shifted("orders", "o_orderkey")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      for (t <- dims) spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
      for (q <- qNames) {
        def once(): (Double, DataFrame, Long) = {
          val t = System.nanoTime()
          val df = graft.SparkEntry.queries(q)(spark, dir)
          val rows = df.collect().length.toLong
          ((System.nanoTime() - t) / 1e9, df, rows)
        }
        val (w1, _, _) = once()
        val (w2, df, rows) = once()
        // QueryStageExec wraps materialized stages as leaves — recurse
        // into them (same walk totalShuffleBytes does) or AQE hides
        // every join from the count
        import org.apache.spark.sql.execution.SparkPlan
        import org.apache.spark.sql.execution.adaptive.QueryStageExec
        var bhj = 0; var shuffleJoins = 0
        def walk(p: SparkPlan): Unit = p.foreach {
          case q: QueryStageExec => walk(q.plan)
          case _: BroadcastHashJoinExec => bhj += 1
          case _: SortMergeJoinExec => shuffleJoins += 1
          case _: ShuffledHashJoinExec => shuffleJoins += 1
          case _ => ()
        }
        df.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case other => walk(other)
        }
        results((q, copies)) =
          (math.min(w1, w2), totalShuffleBytes(df), rows, bhj, shuffleJoins)
      }
      println(s"[scaling-tpch] copies=$copies done")
    }
    val head = Provenance.gitHead
    val dirty = Provenance.gitTreeDirty
    val sb = new StringBuilder
    sb ++= "\n## TPC-H tier: facts ×10, dims fixed\n\n"
    sb ++= s"Generated by `graft.tools.ScalingProbe tpch` at git `$head`" +
      s"${if (dirty) " (DIRTY tree)" else ""}, fixtures `$sfDir`, local[$cpus]. " +
      "The 10× corpus is 10 id-shifted copies of lineitem+orders " +
      "(dimension tables unchanged — facts grow, dims don't), " +
      "materialized as parquet; the five most expensive q-gates run " +
      "UNCHANGED against the scaled directory. `joins` is the EXECUTED " +
      "plan's broadcast/shuffle join mix — a broadcast dimension ladder " +
      "silently crossing into a shuffle join would show as a dropped " +
      "B-count at 10×.\n\n"
    sb ++= "| op | scale | rows out | wall s | shuffle MB | joins B/S |\n"
    sb ++= "|---|---|---|---|---|---|\n"
    for (((op, copies), (sec, bytes, rows, bhj, sj)) <- results)
      sb ++= f"| $op | ${copies}× | $rows | $sec%.2f | ${bytes / 1e6}%.1f | $bhj/$sj |\n"
    sb ++= "\n| op | time 10×/1× | shuffle 10×/1× | broadcast ladder |\n|---|---|---|---|\n"
    for (q <- qNames) {
      val (s1, b1, _, bhj1, _) = results((q, 1))
      val (s10, b10, _, bhj10, _) = results((q, 10))
      val bRatio = if (b1 > 0) f"${b10.toDouble / b1}%.1f×" else "n/a"
      val ladder = if (bhj10 >= bhj1) "held" else s"CROSSED ($bhj1→$bhj10)"
      sb ++= f"| $q | ${s10 / s1}%.1f× | $bRatio | $ladder |\n"
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      sb.toString, java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    println(sb.toString)
  }

  /** LM/classifier tier 1× vs 10× (round-14 additions): interpolated
    * KN trigram self-scoring (model retrains as the corpus grows —
    * the honest shape: count AND score sides both scale), logistic
    * quality-classifier training (D-bounded gradient shuffles ×
    * rounds), and the exact-AUC metrics chain. Training/metrics run
    * multiple internal actions, so shuffle bytes come from the stage
    * listener, not AQE mapStats. Same corpus recipe as the main
    * table (token-suffixed id-shifted copies). */
  private def runLm(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      outPath: String, cpus: String): Unit = {
    import graft.operators.{KneserNey, QualityClassifier}
    val docs1 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val results = scala.collection.mutable.LinkedHashMap
      .empty[(String, Int), (Double, Long, Long)]
    // the 30× point makes the KN broadcast→shuffle AQE transition
    // legible: at 1× (and still at 3×) every stat table broadcasts —
    // near-zero shuffle — and the transition lands below 10×, so the
    // meaningful linearity read is 30×/10×, both post-transition
    for (copies <- Seq(1, 10, 30)) {
      val docs = scaleDocs(docs1, copies).cache()
      val nDocs = docs.count()
      // per-copy positives: the suffixed label token still starts
      // with "dup", so every copy keeps the 5% positive rate
      val labelled = docs.withColumn("y",
        exists(split(lower(col("text")), "\\s+"),
          t => t.startsWith("dup")).cast("int"))

      results(("kn_trigram_score", copies)) = timed { () =>
        KneserNey.trigramLogProb(docs, docs, "doc_id", "text", hotK = 256)
          .select(col("doc_id"), col("n_scored"))
      }
      results(("lr_train", copies)) = timedListener(spark, { () =>
        val m = QualityClassifier.trainLogistic(labelled, "text", "y",
          numBuckets = 64, ns = Seq(1), seed = 13L, rounds = 10,
          lr = 0.25, posWeight = 32L, binary = true)
        QualityClassifier.modelFrame(labelled, m)
      })
      results(("lr_metrics", copies)) = timedListener(spark, { () =>
        val m = QualityClassifier.trainLogistic(labelled, "text", "y",
          numBuckets = 64, ns = Seq(1), seed = 13L, rounds = 2,
          lr = 0.25, posWeight = 32L, binary = true)
        QualityClassifier.evalMetrics(
          QualityClassifier.score(labelled, "text", m))
      })
      println(s"[scaling-lm] copies=$copies nDocs=$nDocs done")
      docs.unpersist()
    }
    val head = Provenance.gitHead
    val dirty = Provenance.gitTreeDirty
    val sb = new StringBuilder
    sb ++= "\n## LM / classifier tier (round-14 operators)\n\n"
    sb ++= s"Generated by `graft.tools.ScalingProbe lm` at git `$head`" +
      s"${if (dirty) " (DIRTY tree)" else ""}, fixtures `$sfDir`, local[$cpus]. " +
      "Same corpus recipe as the main table. kn_trigram_score retrains " +
      "the model on the scaled corpus AND scores it (both sides grow — " +
      "expect ~10×); lr_train is 10 gradient rounds whose shuffles are " +
      "bucket-bounded (expect the SCAN to grow 10× but the gradient " +
      "exchange to stay ~constant); lr_metrics adds scoring + the " +
      "distributed-prefix-sum AUC. Training shuffle bytes are " +
      "listener-observed (multi-action ops).\n\n"
    sb ++= "| op | scale | rows out | wall s | shuffle MB |\n"
    sb ++= "|---|---|---|---|---|\n"
    for (((op, copies), (sec, bytes, rows)) <- results)
      sb ++= f"| $op | ${copies}× | $rows | $sec%.2f | ${bytes / 1e6}%.1f |\n"
    sb ++= "\n| op | time 10×/1× | shuffle 10×/1× | shuffle 30×/10× (post-transition, ~3× = linear) |\n|---|---|---|---|\n"
    for (op <- Seq("kn_trigram_score", "lr_train", "lr_metrics")) {
      val (s1, b1, _) = results((op, 1))
      val (s10, b10, _) = results((op, 10))
      val (_, b30, _) = results((op, 30))
      val bRatio = if (b1 > 0) f"${b10.toDouble / b1}%.1f×" else "n/a"
      val bRatio30 = if (b10 > 0) f"${b30.toDouble / b10}%.1f×" else "n/a"
      sb ++= f"| $op | ${s10 / s1}%.1f× | $bRatio | $bRatio30 |\n"
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      sb.toString, java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    println(sb.toString)
  }

  /** Analytics tier 1× vs 10× vs 30× (round-14 additions): funnel,
    * retention, and the stop-bucket-pruned TF-IDF NN. Events scale by
    * user-id-shifted copies with timestamps jittered per copy (every
    * copy keeps the per-user event density, users stay disjoint —
    * the funnel/retention work is per-user, so linear growth is the
    * honest expectation). The TF-IDF corpus scales by the documents
    * recipe (token-suffixed copies — vocabulary grows 10×, so the
    * dim-bounded hash buckets absorb more collisions while the sparse
    * frame grows linearly). */
  private def runAnalytics(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, outPath: String, cpus: String): Unit = {
    import graft.operators.TextOps
    import graft.streaming.EventWindows
    val ev1 = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id"), col("ts"), col("event_type"))
    val docs1 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def scaleEvents(copies: Int) = (0 until copies).map { k =>
      ev1.select((col("user_id") + k * 10000000L).as("user_id"),
        (col("ts") + expr(s"INTERVAL ${k * 7} SECONDS")).as("ts"),
        col("event_type"))
    }.reduce(_ unionAll _)
    val results = scala.collection.mutable.LinkedHashMap
      .empty[(String, Int), (Double, Long, Long)]
    for (copies <- Seq(1, 10, 30)) {
      val ev = scaleEvents(copies).cache()
      val docs = scaleDocs(docs1, copies).cache()
      val n = ev.count() + docs.count()
      results(("events_funnel", copies)) = timed { () =>
        EventWindows.funnel(ev, Seq("view", "click", "purchase"), 86400)
          .agg(count(col("t1")).as("n1"), count(col("t2")).as("n2"),
            count(col("t3")).as("n3"))
      }
      results(("events_retention", copies)) = timed { () =>
        EventWindows.retention(ev, maxOffsetDays = 7)
      }
      // leg A — the TRAP, measured: dim FIXED at 256 while the
      // suffixed vocabulary grows with copies, so every bucket's df
      // grows ~linearly and the inverted-index join fans out
      // super-linearly (bucket collision density). Probes grow with
      // copies too (30 per copy).
      results(("tfidf_nn_fixdim", copies)) = timedListener(spark, { () =>
        val sparse = TextOps.hashedTfidf(docs, "doc_id", "text",
          dim = 256, seed = 13L)
        TextOps.tfidfNearestNeighbor(
          sparse.where(col("doc_id") % 10000000L < 30), sparse, "doc_id",
          maxDf = (docs1.count() * copies * 9) / 10)
      })
      // leg B — the SCALE PATH: dim grows with the vocabulary (the
      // standard hashing-vectorizer guidance) and the probe batch is
      // FIXED, so per-bucket df stays ~constant and the join cost is
      // ~linear in the corpus.
      val dimScaled = Integer.highestOneBit(256 * copies)
      results(("tfidf_nn_scaled", copies)) = timedListener(spark, { () =>
        val sparse = TextOps.hashedTfidf(docs, "doc_id", "text",
          dim = dimScaled, seed = 13L)
        TextOps.tfidfNearestNeighbor(
          sparse.where(col("doc_id") < 30), sparse, "doc_id",
          maxDf = (docs1.count() * copies * 9) / 10)
      })
      println(s"[scaling-analytics] copies=$copies rows=$n done")
      ev.unpersist(); docs.unpersist()
    }
    val head = Provenance.gitHead
    val dirty = Provenance.gitTreeDirty
    val sb = new StringBuilder
    sb ++= "\n## Analytics tier (round-14 operators)\n\n"
    sb ++= s"Generated by `graft.tools.ScalingProbe analytics` at git `$head`" +
      s"${if (dirty) " (DIRTY tree)" else ""}, fixtures `$sfDir`, local[$cpus]. " +
      "Events scale by user-id-shifted copies (per-user density fixed, " +
      "users disjoint — funnel/retention are per-user, so ~linear is the " +
      "honest bar). The TF-IDF corpus scales by the token-suffixed " +
      "documents recipe; two legs measure the hashing-vectorizer dim " +
      "trade-off: tfidf_nn_fixdim holds dim=256 while the vocabulary " +
      "grows (per-bucket df densifies → the inverted-index join fans " +
      "out SUPER-linearly — the documented trap of a fixed-dim hashing " +
      "vectorizer), tfidf_nn_scaled grows dim with the vocabulary and " +
      "fixes the probe batch (the standard guidance → ~linear). " +
      "tfidf_nn shuffle bytes are listener-observed (hashedTfidf runs " +
      "an internal count action).\n\n"
    sb ++= "| op | scale | rows out | wall s | shuffle MB |\n"
    sb ++= "|---|---|---|---|---|\n"
    for (((op, copies), (sec, bytes, rows)) <- results)
      sb ++= f"| $op | ${copies}× | $rows | $sec%.2f | ${bytes / 1e6}%.1f |\n"
    sb ++= "\n| op | time 10×/1× | shuffle 10×/1× | shuffle 30×/10× (~3× = linear) |\n|---|---|---|---|\n"
    for (op <- Seq("events_funnel", "events_retention", "tfidf_nn_fixdim",
        "tfidf_nn_scaled")) {
      val (s1, b1, _) = results((op, 1))
      val (s10, b10, _) = results((op, 10))
      val (_, b30, _) = results((op, 30))
      val r1 = if (b1 > 0) f"${b10.toDouble / b1}%.1f×" else "n/a"
      val r3 = if (b10 > 0) f"${b30.toDouble / b10}%.1f×" else "n/a"
      sb ++= f"| $op | ${s10 / s1}%.1f× | $r1 | $r3 |\n"
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      sb.toString, java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    println(sb.toString)
  }

  /** Executed-plan broadcast/shuffle join mix (the q15 / tpch-probe
    * technique). Walk AFTER execution so AQE's final choices are the
    * ones counted. */
  private def joinMix(df: DataFrame): (Int, Int) = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    var bhj = 0
    var sj = 0
    def walk(p: SparkPlan): Unit = p.foreach {
      case q: QueryStageExec => walk(q.plan)
      case _: BroadcastHashJoinExec => bhj += 1
      case _: BroadcastNestedLoopJoinExec => bhj += 1
      case _: SortMergeJoinExec => sj += 1
      case _: ShuffledHashJoinExec => sj += 1
      case _ => ()
    }
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case other => walk(other)
    }
    (bhj, sj)
  }

  /** 100× legs for the LM + analytics tiers (round-14 verdict item 6):
    * the four headline ops at 10× vs 100× with the EXECUTED plan's
    * broadcast/shuffle join mix recorded — a broadcast ladder silently
    * flipping to a shuffle join at scale shows as a dropped B-count.
    * The KN hot-slice ladder is EXPLICIT `broadcast()` hints bounded
    * by hotK, so its B-count dropping at 100× is a hard failure
    * (loud `require`), not a data point. */
  /** Media tier (round 16): video keyframe decode/dedup and image
    * pHash at 1×/10×/100× synthetic corpora. Decode and hashing are
    * row-local by construction (the only exchanges are the dedup
    * join's), and the fixture keeps dup density CONSTANT across
    * scales — every seed is shared by 4 ids at every scale, so true
    * pairs grow linearly and a linear operator shows ~linear wall.
    * Honest bars: video_decode/image_phash ~linear wall with ~zero
    * shuffle; video_dedup_clusters ~linear wall and ~linear shuffle
    * (one slim fingerprint row per video — payload bytes never enter
    * an exchange, and the quantized fixture hashes collapsing into few
    * classes costs O(m) per class, not O(m²) pairs). */
  private def runMedia(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, outPath: String, cpus: String): Unit = {
    import graft.operators.Multimodal
    val results = scala.collection.mutable.LinkedHashMap
      .empty[(String, Int), (Double, Long, Long)]
    val base = 2000
    for (scale <- Seq(1, 10, 100)) {
      val n = base * scale
      val nSeeds = math.max(1, n / 4)
      val spec = spark.range(n.toLong).select(
        col("id"),
        (col("id") % nSeeds).as("seed"),
        ((col("id") % nSeeds) % 3 + 2).cast("int").as("nf"),
        (((col("id") % nSeeds) % 4 + 2) * 16).cast("int").as("w"))
      val media = Multimodal.encodeVp8Video(spec, "id", "nf", "w",
        withInterframes = true, seedCol = "seed")
        .repartition(cpus.toInt).cache()
      media.count() // materialize encode outside the timed region
      results(("video_decode", scale)) = timed { () =>
        Multimodal.videoKeyframeFeatures(media).toDF()
          .groupBy(col("format"))
          .agg(count(lit(1)).as("n"), sum(col("meanLuma")).as("s"))
      }
      // clusters, not pairs: the fixture's quantized flat-MB hashes
      // collapse into few classes (as the hottest real videos do), and
      // pair OUTPUT is quadratic in class size by definition — the
      // measured scale path is the O(m)-per-class cluster contraction
      results(("video_dedup_clusters", scale)) = timed { () =>
        Multimodal.videoDupClusters(Multimodal.videoKeyframeFeatures(media))
          .agg(count(lit(1)).as("n_members"),
            expr("count(distinct cluster)").as("n_clusters"))
      }
      media.unpersist()
      val dims = spark.range(n.toLong).select(col("id"),
        (col("id") % 64 + 8).cast("int").as("w"),
        (col("id") % 48 + 8).cast("int").as("h"))
      val bmp = Multimodal.encodeBmpFrame(dims, "id", "w", "h")
        .repartition(cpus.toInt).cache()
      bmp.count()
      results(("image_phash", scale)) = timed { () =>
        Multimodal.pHashAnyFrame(bmp)
          .agg(count(col("phash")).as("n"),
            sum(col("phash").bitwiseAND(lit(0xffffL))).as("s"))
      }
      bmp.unpersist()
      println(s"[scaling-media] scale=$scale rows=$n done")
    }
    val head = Provenance.gitHead
    val dirty = Provenance.gitTreeDirty
    val sb = new StringBuilder
    sb ++= "\n## Media tier — video decode / video dedup / image pHash (round 16)\n\n"
    sb ++= s"Generated by `graft.tools.ScalingProbe media` at git `$head`" +
      s"${if (dirty) " (DIRTY tree)" else ""}, local[$cpus], synthetic " +
      "corpora of 2k/20k/200k media rows (WebM for even ids, IVF for odd; " +
      "2–4 VP8 keyframes each, interframe stubs interleaved; BMPs up to " +
      "71×55). Dup density is constant (each seed shared by 4 ids), so " +
      "linear is the honest bar for every leg; decode and pHash should " +
      "carry ~zero shuffle (row-local kernels), video_dedup_clusters " +
      "shuffles one slim fingerprint row per video (the pair-emitting " +
      "videoDupPairs is the oracle path — its OUTPUT is quadratic in " +
      "duplicate-class size by definition, and the quantized fixture " +
      "hashes make classes corpus-sized here, exactly the hot-content " +
      "case the cluster contraction exists for).\n\n"
    sb ++= "| op | scale | rows out | wall s | shuffle MB |\n"
    sb ++= "|---|---|---|---|---|\n"
    for (((op, scale), (sec, bytes, rows)) <- results)
      sb ++= f"| $op | ${scale}× | $rows | $sec%.2f | ${bytes / 1e6}%.1f |\n"
    def wall(op: String, s: Int) = results((op, s))._1
    sb ++= "\n| op | wall 10×/1× | wall 100×/10× (~10× = linear) |\n|---|---|---|\n"
    for (op <- Seq("video_decode", "video_dedup_clusters", "image_phash"))
      sb ++= f"| $op | ${wall(op, 10) / wall(op, 1)}%.1f× | ${wall(op, 100) / wall(op, 10)}%.1f× |\n"
    val out = java.nio.file.Paths.get(outPath)
    java.nio.file.Files.write(out, sb.toString.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    println(sb.toString)
  }

  /** Metadata tier (round 16): footer / page-index scans must cost
    * O(files), not O(bytes). The SAME lineitem rows are written as 16,
    * 160 and 1600 files; a metadata-only scan's wall should track the
    * FILE count while the data volume stays constant — the property that
    * makes a 100k-file manifest build tractable at 100 TB. */
  private def runMeta(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, outPath: String, cpus: String): Unit = {
    import graft.sources.ParquetFooter
    val results = scala.collection.mutable.LinkedHashMap
      .empty[(String, Int), (Double, Long, Long)]
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val m1 = li.agg(max("l_orderkey")).head.getLong(0) + 1
    val lo = 3 * m1 / 10; val hi = 9 * m1 / 20
    for (files <- Seq(16, 160, 1600)) {
      val out = s"/root/repo/target/tmp/graft_meta_scale_$files"
      // bloom filter on the key column (dictionary off for that column —
      // a fully dict-encoded chunk makes the writer drop the bloom), so
      // the bloom-census leg rides the same fixture set
      li.repartition(files).write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#l_orderkey", "true")
        .option("parquet.enable.dictionary#l_orderkey", "false")
        .parquet(out)
      results(("footers", files)) = timed { () =>
        ParquetFooter.footers(spark, out).agg(
          count(lit(1)).as("n"), sum("num_rows").as("rows"))
      }
      results(("column_stats", files)) = timed { () =>
        ParquetFooter.columnStats(spark, out)
          .groupBy("codec").agg(count(lit(1)).as("n"))
      }
      results(("rg_prune", files)) = timed { () =>
        ParquetFooter.pruneCensus(spark, out, "l_orderkey", lo, hi)
          .agg(sum(when(col("skipped"), 1L).otherwise(0L)).as("skipped"),
            sum("rows_scanned").as("scanned"))
      }
      // bloom-census leg (round 17, VERDICT item 6): the point-lookup
      // file-skip decision must also stay O(files) — each probe reads
      // one footer + one bloom bitset per file, never data pages
      results(("bloom_probe", files)) = timed { () =>
        graft.sources.ParquetBloom
          .probeCensus(spark, out, "l_orderkey",
            Seq(lo, hi, m1 / 2, m1 + 11, m1 + 23, m1 + 37, m1 + 51, m1 + 73))
          .agg(sum(when(col("might_contain"), 1L).otherwise(0L)).as("hits"),
            count(lit(1)).as("n"))
      }
      // data plane, honestly measured: the hand page reader is a
      // row-boxing audit/tooling path, NOT a replacement for Spark's
      // vectorized scan — record the gap rather than hide it
      results(("page_scan_hand", files)) = timed { () =>
        graft.sources.ParquetPages
          .scanTwoColumns(spark, out, "l_orderkey", "l_quantity")
          .agg(sum("a_long").as("s"), round(sum("b_double"), 2).as("q"))
      }
      results(("page_scan_spark", files)) = timed { () =>
        spark.read.parquet(out)
          .agg(sum("l_orderkey").as("s"), round(sum("l_quantity"), 2).as("q"))
      }
      println(s"[scaling-meta] files=$files done")
    }
    val head = Provenance.gitHead
    val dirty = Provenance.gitTreeDirty
    val sb = new StringBuilder
    sb ++= "\n## Metadata tier — parquet footer / stats / bloom scans (rounds 16-17)\n\n"
    sb ++= s"Generated by `graft.tools.ScalingProbe meta` at git `$head`" +
      s"${if (dirty) " (DIRTY tree)" else ""}, local[$cpus]. The SAME " +
      "sf0.1 lineitem rows written as 16 / 160 / 1600 parquet files: a " +
      "footer-only scan reads a few KB per file tail and never touches " +
      "data pages, so its wall must track the FILE count (the 100 TB " +
      "manifest-build property), stay milliseconds-class, and carry " +
      "~zero shuffle (the only exchange is the final tiny stats agg).\n\n"
    sb ++= "| op | files | rows out | wall s | shuffle MB |\n"
    sb ++= "|---|---|---|---|---|\n"
    for (((op, files), (sec, bytes, rows)) <- results)
      sb ++= f"| $op | $files | $rows | $sec%.2f | ${bytes / 1e6}%.1f |\n"
    def wall(op: String, f: Int) = results((op, f))._1
    sb ++= "\n| op | wall 160/16 | wall 1600/160 (≤~10× = O(files); " +
      "constant data volume throughout) |\n|---|---|---|\n"
    for (op <- Seq("footers", "column_stats", "rg_prune", "bloom_probe",
        "page_scan_hand", "page_scan_spark"))
      sb ++= f"| $op | ${wall(op, 160) / wall(op, 16)}%.1f× | ${wall(op, 1600) / wall(op, 160)}%.1f× |\n"
    sb ++= f"\nHand page reader vs Spark's vectorized scan at 16 files: " +
      f"${wall("page_scan_hand", 16) / wall("page_scan_spark", 16)}%.1f× slower — " +
      "expected and documented: the hand reader is the audit/tooling data " +
      "plane (row-boxed, spec-grounded, zero parquet-mr); production scans " +
      "stay on Spark's vectorized reader.\n"
    val out = java.nio.file.Paths.get(outPath)
    java.nio.file.Files.write(out, sb.toString.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    println(sb.toString)
  }

  /** Write tier (round 19; r18 VERDICT item 7): the hand parquet writer
    * vs Spark's parquet sink over the SAME rows at 16 and 160 output
    * files — wall clock + output bytes, hand writer both dict-encoded
    * and forced-PLAIN so the dictionary win is recorded as a number,
    * not prose. One writer task per file in both engines (repartition),
    * source cached so only the WRITE is measured. */
  private def runWrite(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, outPath: String, cpus: String): Unit = {
    import graft.sources.ParquetWriter
    val results = scala.collection.mutable.LinkedHashMap
      .empty[(String, Int), (Double, Long)] // (wall s, dir bytes)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").selectExpr(
      "l_orderkey",
      "CAST(l_quantity AS DOUBLE) AS qty",
      "l_returnflag AS rf",
      "IF(l_linenumber % 3 = 0, CAST(NULL AS STRING), l_linestatus) AS ls",
      "concat('cat', CAST(l_orderkey % 997 AS INT)) AS cat")
    li.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val nRows = li.count()
    def dirBytes(d: String): Long = {
      val f = new java.io.File(d)
      if (!f.exists()) 0L
      else f.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }
    def timedWrite(body: => Unit): Double = {
      val samples = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      samples.min
    }
    for (files <- Seq(16, 160)) {
      val src = li.repartition(files)
      src.count() // materialize the shuffle once so writes measure writes
      val oh = s"/root/repo/target/tmp/graft_write_hand_$files"
      val op = s"/root/repo/target/tmp/graft_write_plain_$files"
      val os = s"/root/repo/target/tmp/graft_write_spark_$files"
      results(("hand_dict", files)) =
        (timedWrite(ParquetWriter.writeDir(src, oh, codec = 1)), dirBytes(oh))
      results(("hand_plain", files)) =
        (timedWrite(ParquetWriter.writeDir(src, op, codec = 1,
          dictStrings = false)), dirBytes(op))
      val ob = s"/root/repo/target/tmp/graft_write_bloom_$files"
      results(("hand_bloom", files)) =
        (timedWrite(ParquetWriter.writeDir(src, ob, codec = 1,
          bloomColumns = Set("l_orderkey", "cat"))), dirBytes(ob))
      results(("spark_sink", files)) =
        (timedWrite(src.write.mode("overwrite")
          .option("compression", "snappy").parquet(os)), dirBytes(os))
      println(s"[scaling-write] files=$files done")
    }
    val head = Provenance.gitHead
    val dirty = Provenance.gitTreeDirty
    val sb = new StringBuilder
    sb ++= "\n## Write tier — hand parquet writer vs Spark's sink (round 19)\n\n"
    sb ++= s"Generated by `graft.tools.ScalingProbe write` at git `$head`" +
      s"${if (dirty) " (DIRTY tree)" else ""}, fixtures `$sfDir`, " +
      s"local[$cpus]. $nRows lineitem-derived rows (1 long, 1 double, " +
      "3 strings: 3-value rf, nullable 2-value ls, 997-value cat) " +
      "snappy-written as 16 and 160 files, one writer task per file in " +
      "both engines; the source is cached and pre-shuffled so walls " +
      "measure the WRITE. hand_dict = the shipping writer " +
      "(RLE_DICTIONARY string chunks), hand_plain = dictStrings=false, " +
      "hand_bloom = dict plus split-block bloom filters on l_orderkey " +
      "AND cat (the per-chunk distinct-hash + bitset cost), " +
      "spark_sink = Spark's parquet-mr-backed sink.\n\n"
    sb ++= "| writer | files | wall s | out MB |\n"
    sb ++= "|---|---|---|---|\n"
    for (((op, files), (sec, bytes)) <- results)
      sb ++= f"| $op | $files | $sec%.2f | ${bytes / 1e6}%.1f |\n"
    def r(op: String, f: Int) = results((op, f))
    sb ++= f"\nDictionary win (hand_dict vs hand_plain bytes, 16 files): " +
      f"${r("hand_plain", 16)._2.toDouble / r("hand_dict", 16)._2}%.2f× smaller; " +
      f"vs Spark's writer: ${r("hand_dict", 16)._2.toDouble / r("spark_sink", 16)._2}%.2f× " +
      f"Spark's bytes. Wall vs Spark at 16 files: " +
      f"${r("hand_dict", 16)._1 / r("spark_sink", 16)._1}%.2f×; at 160: " +
      f"${r("hand_dict", 160)._1 / r("spark_sink", 160)._1}%.2f×. " +
      f"Bloom overhead (hand_bloom vs hand_dict, 16 files): " +
      f"${r("hand_bloom", 16)._1 / r("hand_dict", 16)._1}%.2f× wall, " +
      f"${r("hand_bloom", 16)._2.toDouble / r("hand_dict", 16)._2}%.2f× bytes.\n"
    val out = java.nio.file.Paths.get(outPath)
    java.nio.file.Files.write(out, sb.toString.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    println(sb.toString)
  }

  private def runDeep100(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, outPath: String, cpus: String): Unit = {
    import graft.operators.{KneserNey, QualityClassifier, TextOps}
    import graft.streaming.EventWindows
    val docs1 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val ev1 = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id"), col("ts"), col("event_type"))
    def scaleEvents(copies: Int) = (0 until copies).map { k =>
      ev1.select((col("user_id") + k * 10000000L).as("user_id"),
        (col("ts") + expr(s"INTERVAL ${k * 7} SECONDS")).as("ts"),
        col("event_type"))
    }.reduce(_ unionAll _)
    val n1 = docs1.count()
    // (wall s, shuffle bytes, rows out, bhj, shuffle joins)
    val results = scala.collection.mutable.LinkedHashMap
      .empty[(String, Int), (Double, Long, Long, Int, Int)]
    def once(build: () => DataFrame): (Double, Long, Long, Int, Int) = {
      // warm-up build pays one-time codegen/broadcast-prep costs so the
      // measured run is steady-state (the [[timed]] convention)
      val t1 = System.nanoTime()
      build().collect()
      val w1 = (System.nanoTime() - t1) / 1e9
      val df = build()
      val t2 = System.nanoTime()
      val rows = df.collect().length.toLong
      val w2 = (System.nanoTime() - t2) / 1e9
      val (b, s) = joinMix(df)
      (math.min(w1, w2), totalShuffleBytes(df), rows, b, s)
    }
    for (copies <- Seq(10, 100)) {
      val docs = scaleDocs(docs1, copies).cache()
      val nDocs = docs.count()
      val ev = scaleEvents(copies).cache()
      val nEv = ev.count()
      results(("kn_trigram_score", copies)) = once { () =>
        KneserNey.trigramLogProb(docs, docs, "doc_id", "text", hotK = 256)
          .select(col("doc_id"), col("n_scored"))
      }
      // lr_train is multi-action: listener bytes, join mix n/a
      val labelled = docs.withColumn("y",
        exists(split(lower(col("text")), "\\s+"),
          t => t.startsWith("dup")).cast("int"))
      val (sec, bytes, rows) = timedListener(spark, { () =>
        val m = QualityClassifier.trainLogistic(labelled, "text", "y",
          numBuckets = 64, ns = Seq(1), seed = 13L, rounds = 10,
          lr = 0.25, posWeight = 32L, binary = true)
        QualityClassifier.modelFrame(labelled, m)
      })
      results(("lr_train", copies)) = (sec, bytes, rows, 0, 0)
      results(("events_funnel", copies)) = once { () =>
        EventWindows.funnel(ev, Seq("view", "click", "purchase"), 86400)
          .agg(count(col("t1")).as("n1"), count(col("t2")).as("n2"),
            count(col("t3")).as("n3"))
      }
      val dimScaled = Integer.highestOneBit(256 * copies)
      results(("tfidf_nn_scaled", copies)) = once { () =>
        val sparse = TextOps.hashedTfidf(docs, "doc_id", "text",
          dim = dimScaled, seed = 13L)
        TextOps.tfidfNearestNeighbor(
          sparse.where(col("doc_id") < 30), sparse, "doc_id",
          maxDf = (n1 * copies * 9) / 10)
      }
      println(s"[scaling-deep100] copies=$copies nDocs=$nDocs nEv=$nEv done")
      docs.unpersist(); ev.unpersist()
    }
    // explicit bounded-broadcast ladders (KN hot slices, tfidf's
    // dim-bounded idf) must NOT lose a broadcast between 10× and 100×
    for (op <- Seq("kn_trigram_score", "tfidf_nn_scaled")) {
      val b10 = results((op, 10))._4
      val b100 = results((op, 100))._4
      require(b100 >= b10,
        s"$op broadcast ladder flipped at 100×: $b10 broadcasts at 10× " +
          s"but $b100 at 100×")
    }
    val head = Provenance.gitHead
    val dirty = Provenance.gitTreeDirty
    val sb = new StringBuilder
    sb ++= "\n## 100× legs — LM + analytics tiers (round 15)\n\n"
    sb ++= s"Generated by `graft.tools.ScalingProbe deep100` at git `$head`" +
      s"${if (dirty) " (DIRTY tree)" else ""}, fixtures `$sfDir`, local[$cpus]. " +
      "Same corpus recipes as the 30× tables; single-run timing (a hidden " +
      "quadratic would show as ~100×, far above noise). `joins B/S` is the " +
      "EXECUTED plan's broadcast/shuffle join mix. `B kept` applies only to " +
      "ops whose broadcasts are EXPLICIT bounded hints (KN's hot slices, " +
      "hotK-bounded; tfidf's dim-bounded idf) — those dropping at 100× " +
      "fail the probe loudly. events_funnel carries no hints: its step " +
      "tables grow with the data, so AQE broadcasting them at small scale " +
      "and shuffle-joining at 100× is the CORRECT right-sizing, reported " +
      "as n/a. lr_train has no joins (listener bytes).\n\n"
    sb ++= "| op | scale | rows out | wall s | shuffle MB | joins B/S |\n"
    sb ++= "|---|---|---|---|---|---|\n"
    for (((op, copies), (sec, bytes, rows, b, s)) <- results)
      sb ++= f"| $op | ${copies}× | $rows | $sec%.2f | ${bytes / 1e6}%.1f | $b/$s |\n"
    sb ++= "\n| op | time 100×/10× | shuffle 100×/10× (~10× = linear) | B kept |\n|---|---|---|---|\n"
    val hinted = Set("kn_trigram_score", "tfidf_nn_scaled")
    for (op <- Seq("kn_trigram_score", "lr_train", "events_funnel",
        "tfidf_nn_scaled")) {
      val (s10, b10, _, j10, _) = results((op, 10))
      val (s100, b100, _, j100, _) = results((op, 100))
      val bRatio = if (b10 > 0) f"${b100.toDouble / b10}%.1f×" else "n/a"
      val kept = if (hinted(op)) (j100 >= j10).toString else "n/a"
      sb ++= f"| $op | ${s100 / s10}%.1f× | $bRatio | $kept |\n"
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      sb.toString, java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    println(sb.toString)
  }

  /** Index-compaction scaling (round 18): the maintenance claim is
    * cost ∝ index + candidates, never a full-corpus shingle pass.
    * Leg (a): index 1× vs 10× (per-copy dup structure preserved) —
    * wall and shuffle must grow ~linearly. Leg (b): FIXED index while
    * the corpus gains 9× UNRELATED rows — cost must stay near-flat,
    * because unindexed corpus rows are pruned before any shingling
    * (they pay one cheap md5 column scan only). LISTENER-accounted
    * (cluster-contraction rounds checkpoint per round, so mapStats on
    * the final plan see only the tail). */
  private def runCompact(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, outPath: String, cpus: String): Unit = {
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    def legs(d: DataFrame): (DataFrame, DataFrame, DataFrame) = {
      val base = d.where(size(split(col("text"), " ")) >= 30)
        .select(col("doc_id"), col("text"))
      val toks = split(col("text"), " ")
      val b2 = base.select((col("doc_id") + 500000000L).as("doc_id"),
        array_join(slice(toks, lit(1), size(toks) - 5), " ").as("text"))
      (base, b2, base.unionByName(b2))
    }
    def compactAgg(b1: DataFrame, b2: DataFrame, corpus: DataFrame): DataFrame =
      Dedup.compactMinHashIndexes(Seq(
          Dedup.minHashIndex(b1, "doc_id", "text", numHashes = 128, bands = 32),
          Dedup.minHashIndex(b2, "doc_id", "text", numHashes = 128, bands = 32)),
          corpus, "doc_id", "text", threshold = 0.5)
        .agg(countDistinct("id").as("n_ids"), count(lit(1)).as("n_rows"))
    val results = scala.collection.mutable.LinkedHashMap
      .empty[(String, Int), (Double, Long, Long)]
    for (copies <- Seq(1, 10)) {
      val d = scaleDocs(docs, copies)
      val (b1, b2, corpus) = legs(d)
      results(("index_compact", copies)) =
        timedListener(spark, () => compactAgg(b1, b2, corpus))
      println(s"[scaling-compact] copies=$copies done")
    }
    val (b1, b2, corpus1) = legs(docs)
    val bloat = scaleDocs(docs, 10).where(col("doc_id") >= 10000000L)
      .select((col("doc_id") + 600000000L).as("doc_id"), col("text"))
    results(("index_compact_corpus10x", 1)) =
      timedListener(spark, () => compactAgg(b1, b2, corpus1.unionByName(bloat)))
    println("[scaling-compact] corpus-bloat leg done")
    val head = Provenance.gitHead
    val dirty = Provenance.gitTreeDirty
    val sb = new StringBuilder
    sb ++= "\n## Index-compaction tier — minHash index maintenance (round 18)\n\n"
    sb ++= s"Generated by `graft.tools.ScalingProbe compact` at git `$head`" +
      s"${if (dirty) " (DIRTY tree)" else ""}, fixtures `$sfDir`, local[$cpus]. " +
      "Two daily band-hash indexes (batch2 = drop-5 near-dups of batch1) " +
      "union, exact/near classes contract, rows re-point to class reps. " +
      "`index_compact` scales BOTH index and corpus 1×→10×; " +
      "`index_compact_corpus10x` keeps the 1× index while the corpus " +
      "carries 9× additional UNINDEXED rows — near-flat cost is the " +
      "O(index), not O(corpus), claim.\n\n"
    sb ++= "| op | scale | rows out | wall s | shuffle MB (listener) |\n"
    sb ++= "|---|---|---|---|---|\n"
    for (((op, sc), (sec, bytes, rows)) <- results)
      sb ++= f"| $op | $sc× | $rows | $sec%.2f | ${bytes / 1e6}%.1f |\n"
    val w1 = results(("index_compact", 1))
    val w10 = results(("index_compact", 10))
    val wb = results(("index_compact_corpus10x", 1))
    sb ++= f"\nindex 10×/1×: wall ${w10._1 / w1._1}%.1f×, shuffle ${w10._2.toDouble / math.max(1, w1._2)}%.1f× " +
      f"(linear bar ~10×). corpus-bloat vs 1×: wall ${wb._1 / w1._1}%.2f×, " +
      f"shuffle ${wb._2.toDouble / math.max(1, w1._2)}%.2f× (flat bar ~1×).\n"
    val out = java.nio.file.Paths.get(outPath)
    java.nio.file.Files.writeString(out,
      new String(java.nio.file.Files.readAllBytes(out),
        java.nio.charset.StandardCharsets.UTF_8) + sb.toString)
    println(sb.toString)
  }

  def main(args: Array[String]): Unit = {
    // the "100x"/"tpch" mode flag may appear at any position; positional
    // args (sfDir, outPath) are resolved from what remains, so
    // `runMain graft.tools.ScalingProbe 100x` works as documented
    val mode100x = args.contains("100x")
    val modeTpch = args.contains("tpch")
    val modeLm = args.contains("lm")
    val modeAnalytics = args.contains("analytics")
    val modeDeep100 = args.contains("deep100")
    val modeMedia = args.contains("media")
    val modeMeta = args.contains("meta")
    val modeCompact = args.contains("compact")
    val modeWrite = args.contains("write")
    val positional = args.filterNot(a =>
      a == "100x" || a == "tpch" || a == "lm" || a == "analytics" ||
        a == "deep100" || a == "media" || a == "meta" || a == "compact" ||
        a == "write")
    val sfDir = positional.headOption.getOrElse("/root/testdata/sf0.1")
    val outPath = if (positional.length > 1) positional(1) else "SCALING.md"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(appName = "graft-scaling-probe", master = s"local[$cpus]",
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (mode100x) {
      run100x(spark, sfDir, outPath, cpus)
      spark.stop()
      return
    }
    if (modeTpch) {
      runTpch(spark, sfDir, outPath, cpus)
      spark.stop()
      return
    }
    if (modeLm) {
      runLm(spark, sfDir, outPath, cpus)
      spark.stop()
      return
    }
    if (modeAnalytics) {
      runAnalytics(spark, sfDir, outPath, cpus)
      spark.stop()
      return
    }
    if (modeDeep100) {
      runDeep100(spark, sfDir, outPath, cpus)
      spark.stop()
      return
    }
    if (modeMedia) {
      runMedia(spark, sfDir, outPath, cpus)
      spark.stop()
      return
    }
    if (modeMeta) {
      runMeta(spark, sfDir, outPath, cpus)
      spark.stop()
      return
    }
    if (modeCompact) {
      runCompact(spark, sfDir, outPath, cpus)
      spark.stop()
      return
    }
    if (modeWrite) {
      runWrite(spark, sfDir, outPath, cpus)
      spark.stop()
      return
    }

    val docs1 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val emb1 = spark.read.parquet(s"$sfDir/embeddings.parquet")

    // fixed tokenizer for the encode probe: trained once on the 1×
    // corpus (deployment shape — the tokenizer does not retrain as the
    // corpus grows)
    val bpeMerges = graft.operators.Bpe.train(docs1, "text", k = 8)

    val results = scala.collection.mutable.LinkedHashMap
      .empty[(String, Int), (Double, Long, Long)]

    for (copies <- Seq(1, 10)) {
      val docs = scaleDocs(docs1, copies).cache()
      val nDocs = docs.count() // materialize outside the timed region

      // 1. one-call LSH dedup (the dedup_lsh_drop path)
      results(("dedup_lsh_drop", copies)) = timed { () =>
        val corpus = plantDups(docs)
        Dedup.dropLshDuplicates(corpus, "doc_id", "text",
          threshold = 0.5, numHashes = 128, bands = 32)
          .select(col("doc_id"))
      }

      // 2. incremental ingest vs a persisted index (dedup_incremental_drop)
      results(("dedup_incremental_drop", copies)) = timed { () =>
        val toks = split(col("text"), " ")
        val base = docs.where(size(toks) >= 30)
        val batch = base.select((col("doc_id") + 1000000L).as("doc_id"),
            array_join(slice(toks, lit(1), size(toks) - 5), " ").as("text"))
          .unionAll(base.select((col("doc_id") + 2000000L).as("doc_id"),
            array_join(reverse(toks), " ").as("text")))
        val index = Dedup.minHashIndex(docs, "doc_id", "text",
          numHashes = 128, bands = 32)
        Dedup.dedupIncremental(batch, "doc_id", "text",
          index, docs, "doc_id", "text",
          threshold = 0.5, numHashes = 128, bands = 32)
          .select(col("doc_id"))
      }

      // 3. paragraph dedup (dedup_paragraphs path): 10-token chunks
      results(("dedup_paragraphs", copies)) = timed { () =>
        val toks = split(col("text"), " ")
        val lastChunk = greatest(
          floor((size(toks) + 9) / 10).cast("int") - 1, lit(0))
        val chunked = docs.select(col("doc_id"),
          array_join(transform(sequence(lit(0), lastChunk),
            i => array_join(slice(toks, i * 10 + 1, lit(10)), " ")), "\n\n")
            .as("text"))
        graft.operators.Dedup.dedupParagraphs(chunked, "doc_id", "text")
          .select(col("doc_id"), col("n_paras_kept"))
      }

      // 4. span removal (dedup_spans_remove path)
      results(("remove_dup_spans", copies)) = timed { () =>
        graft.operators.TextOps.removeDupSpans(
          plantDups(docs), "doc_id", "text", n = 8)
          .select(col("doc_id"), col("n_tokens_kept"))
      }

      // 5. IVF ANN top-k, fixed query set, corpus scaled (simsearch_ivf)
      results(("simsearch_ivf", copies)) = timed { () =>
        val q = emb1.where(col("vec_id") < 64)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        val c = (0 until copies).map { k =>
          emb1.select((col("vec_id") + k * 10000000L).as("corpus_id"),
            transform(Similarity.asDoubleVec(col("embedding")),
              x => x + lit(k * 0.001)).as("cv"))
        }.reduce(_ unionAll _)
        Similarity.ivfTopK(q, "query_id", "qv",
          c, "corpus_id", "cv", k = 10, nCells = 16, nProbe = 4)
      }

      // 6. crawl ingest (web_warc_ingest path): HTML→HTTP→WARC→gzip
      //    build, then the full parse back — row-local both ways, so
      //    both wall time and the single build-side group shuffle must
      //    scale ~10×
      results(("warc_ingest", copies)) = timed { () =>
        val blobs = WebArchive.warcGzipBuild(docs, groups = 64)
        WebArchive.warcIngest(blobs).select(col("doc_id"), col("body_len"))
      }

      // 7. blocklist scan (text_blocklist path): the automaton pass is
      //    pure map work — wall scales ~10×, shuffle stays at the tiny
      //    flagged-id projection ("slow" prefix-matches every copy's
      //    suffixed tokens, so hit density is scale-invariant)
      results(("blocklist_scan", copies)) = timed { () =>
        Blocklist.annotate(docs, "doc_id", "text", Seq("slow", "merge", "fast"))
          .where(!col("clean")).select(col("doc_id"))
      }

      // 8. wikipedia multistream ingest (wiki_dump_ingest path): shard
      //    count scales WITH the corpus so pages/shard is constant —
      //    build (bzip2 encode) and ingest (decode+parse+clean) are
      //    both row-local; the one shuffle is the build-side grouping
      results(("wiki_dump_ingest", copies)) = timed { () =>
        val shards = graft.operators.WikiDump.multistreamBuild(
          docs, shards = 64 * copies)
        graft.operators.WikiDump.multistreamIngest(shards).select(col("doc_id"))
      }

      // 9. BPE encode (text_bpe_encode path): merges are trained ONCE
      //    on the 1× corpus (a deployed tokenizer is fixed); encoding
      //    the scaled corpus is pure map work — zero shuffle at any
      //    scale, wall ~10×
      results(("bpe_encode", copies)) = timed { () =>
        graft.operators.Bpe.tokenCounts(docs, "doc_id", "text", bpeMerges)
      }

      // 10. PageRank, 3 fixed iterations (graph_pagerank path) on the
      //     gate's modular 2-out-degree graph over the scaled id space.
      //     Listener-based bytes: iterations run through checkpoints,
      //     so the final plan's mapStats see nothing. Setup shuffles
      //     (outdeg join + the two one-time repartitions) amortize over
      //     any real iteration count; steady-state per-iteration cost
      //     is ONE rank-vector-sized exchange (the PlanAuditSpec pin).
      results(("graph_pagerank_3it", copies)) = timedListener(spark, { () =>
        val e = docs.select(col("doc_id").as("src"),
            ((col("doc_id") * 7 + 1) % nDocs).as("dst"))
          .unionAll(docs.select(col("doc_id").as("src"),
            ((col("doc_id") * 13 + 3) % nDocs).as("dst")))
        graft.operators.Graph.pageRank(e, iters = 3)
      })

      // 11. unified audio metadata dispatch (multimodal_audio_meta_all
      //     path): the 7-way encode+probe construction of the gate over
      //     EVERY scaled doc (the gate's own doc_id<350 cap is
      //     scale-invariant and would measure nothing) — encode and
      //     meta-extract are row-local, so wall ~10×, shuffle ~0
      results(("audio_meta_all", copies)) = timed { () =>
        val M = graft.operators.Multimodal
        val spec = docs.select(col("doc_id"),
          (length(col("text")) % 300 + 50).cast("int").as("wframes"),
          (col("doc_id") % 2 + 1).cast("int").as("ch"),
          (col("doc_id") % 9 + 1).cast("int").as("frames"),
          (col("doc_id") % 512 + 16).cast("int").as("pb"),
          ((col("doc_id") % 50000) * 37 + 1000).cast("long").as("fsamples"),
          ((col("doc_id") % 50000) * 53 + 480).cast("long").as("osamples"),
          (col("doc_id") % 200 + 20).cast("int").as("db"),
          (length(col("text")) % 30000 + 500).cast("long").as("ms"),
          expr("array(44100, 48000, 32000, 22050)[CAST(doc_id % 4 AS INT)]")
            .cast("long").as("sr"))
        def part(k: Int) = spec.where(col("doc_id") % 7 === k)
        val wav = M.encodeWavFrame(
          part(0).withColumn("rate", lit(8000)), "doc_id", "wframes", "ch", "rate")
        val mp3 = M.encodeMp3Frame(
          part(1).withColumn("bi", lit(9)).withColumn("si", lit(0)),
          "doc_id", "frames", "bi", "si")
        val aac = M.encodeAacFrame(
          part(2).withColumn("si", lit(4)).withColumn("cc", lit(2)),
          "doc_id", "frames", "si", "cc", "pb")
        val flac = M.encodeFlacFrame(part(3), "doc_id", "fsamples", "sr", "ch")
        val opus = M.encodeOpusFrame(part(4), "doc_id", "osamples", "ch", "db")
        val vorb = M.encodeVorbisFrame(part(5), "doc_id", "osamples", "sr", "ch", "db")
        val m4a = M.encodeM4aFrame(part(6), "doc_id", "ms", "sr", "ch")
        val media = Seq(wav, mp3, aac, flac, opus, vorb, m4a).reduce(_ unionAll _)
        M.extractAudioMeta(media).toDF()
          .select(col("mediaId").as("doc_id"), col("format"))
      }

      println(s"[scaling] copies=$copies nDocs=$nDocs done")
      docs.unpersist()
    }

    val head = Provenance.gitHead
    val dirty = Provenance.gitTreeDirty
    val sb = new StringBuilder
    sb ++= "# SCALING — measured 1× vs 10× linearity probe\n\n"
    sb ++= s"Generated by `graft.tools.ScalingProbe` at git `$head`" +
      s"${if (dirty) " (DIRTY tree — not reproducible from that commit)" else ""}, " +
      s"fixtures `$sfDir`, local[$cpus].\n\n"
    sb ++= "The 10× corpus is 10 token-suffixed, id-shifted copies of the " +
      "sf0.1 documents table\n(cross-copy shingle-disjoint; per-copy " +
      "planted-dup structure identical), so a\nlinear operator shows ~10× " +
      "time/shuffle-bytes and a quadratic candidate\nstructure would show " +
      "~100×. Wall time is min-of-2; shuffle bytes are the sum\nover every " +
      "executed shuffle stage (AQE mapStats).\n\n"
    sb ++= "| op | scale | rows out | wall s | shuffle MB |\n"
    sb ++= "|---|---|---|---|---|\n"
    for (((op, copies), (sec, bytes, rows)) <- results)
      sb ++= f"| $op | ${copies}× | $rows | $sec%.2f | ${bytes / 1e6}%.1f |\n"
    sb ++= "\nReading the ratios: a shuffle ratio near 10× is linear. A ratio " +
      "well ABOVE 10×\nusually marks a PLAN TRANSITION, not quadratic work — " +
      "e.g. remove_dup_spans'\ncovered-position table fits under the " +
      "auto-broadcast threshold at 1× (map-side\nanti-join, tokens never " +
      "shuffle) but crosses it at 10×, so the anti-join\nbecomes a shuffle " +
      "join and the token table starts paying its (linear) share\nof " +
      "exchange bytes. Per-plan the growth stays linear; AQE picks the " +
      "transition\npoint by size, which is exactly what a 100 TB run wants.\n"
    sb ++= "\ngraph_pagerank_3it is LISTENER-accounted (per-iteration checkpoints " +
      "hide\nmapStats), so its bytes include the one-time setup shuffles " +
      "(outdeg join, the\ntwo pinned repartitions) that amortize over real " +
      "iteration counts, and its 1×\nbaseline is sublinear (AQE coalesces " +
      "the tiny partitions, compression floors\ndominate at ~0.3 MB) — the " +
      "ratio overstates growth. The steady-state invariant\nis structural, " +
      "not statistical: PlanAuditSpec pins each iteration to exactly ONE\n" +
      "exchange carrying partial-aggregated rank rows, never edge rows.\n"
    sb ++= "\n| op | time 10×/1× | shuffle 10×/1× |\n|---|---|---|\n"
    for (op <- Seq("dedup_lsh_drop", "dedup_incremental_drop",
        "dedup_paragraphs", "remove_dup_spans", "simsearch_ivf",
        "warc_ingest", "blocklist_scan", "wiki_dump_ingest",
        "bpe_encode", "graph_pagerank_3it", "audio_meta_all")) {
      val (s1, b1, _) = results((op, 1))
      val (s10, b10, _) = results((op, 10))
      val bRatio = if (b1 > 0) f"${b10.toDouble / b1}%.1f×" else "n/a"
      sb ++= f"| $op | ${s10 / s1}%.1f× | $bRatio |\n"
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), sb.toString)
    println(sb.toString)
    spark.stop()
  }
}
