package graft

import org.apache.spark.sql.functions._

/** Scratch phase-timing probe for compactMinHashIndexes (deleted after use). */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(appName = "compact-probe",
      master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    val dir = "/root/testdata/sf0.1"
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .where(size(split(col("text"), " ")) >= 30)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val toks = split(col("text"), " ")
    val b2 = base.select((col("doc_id") + 100000L).as("doc_id"),
      array_join(slice(toks, lit(1), size(toks) - 5), " ").as("text"))
    val b3 = base.select((col("doc_id") + 200000L).as("doc_id"),
      array_join(reverse(toks), " ").as("text"))
    val corpus = base.unionByName(b2).unionByName(b3)
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROBE $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm the JVM once
    t("warm-full") {
      Dedup.compactMinHashIndexes(Seq(
        Dedup.minHashIndex(base, "doc_id", "text", 128, 32),
        Dedup.minHashIndex(b2.unionByName(b3), "doc_id", "text", 128, 32)),
        corpus, "doc_id", "text", 0.5).select("id").distinct().count()
    }
    // phase timing (warm)
    val i1 = Dedup.minHashIndex(base, "doc_id", "text", 128, 32)
    val i2 = Dedup.minHashIndex(b2.unionByName(b3), "doc_id", "text", 128, 32)
    val union = t("union+ckpt") {
      i1.unionByName(i2).distinct().localCheckpoint(true)
    }
    t("union count")(println("  rows " + union.count()))
    val txtHash = corpus.select(col("doc_id").as("id"), md5(col("text")).as("__th"))
    val idsInIndex = union.select("id").distinct().join(txtHash, "id")
    val exactRep = idsInIndex.groupBy("__th").agg(min("id").as("__rep"))
    val idToExact = t("idToExact ckpt") {
      idsInIndex.join(exactRep, "__th").select(col("id"), col("__rep")).localCheckpoint(true)
    }
    val repRows = union.join(idToExact, "id")
      .select(col("band_idx"), col("band_hash"), col("__rep").as("id")).distinct()
    val cands = repRows.as("a").join(repRows.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
      .localCheckpoint(true)
    t("cands")(println("  pairs " + cands.count()))
    val candIds = cands.select(col("id_a").as("__vid"))
      .unionByName(cands.select(col("id_b").as("__vid"))).distinct()
    val sh = corpus.select(col("doc_id").as("__vid"), col("text"))
      .join(candIds, Seq("__vid"), "left_semi")
      .select(col("__vid"), Dedup.shingles(col("text"), 3).as("__sh"))
    val verified = cands
      .join(sh.select(col("__vid").as("id_a"), col("__sh").as("__sh_a")), "id_a")
      .join(sh.select(col("__vid").as("id_b"), col("__sh").as("__sh_b")), "id_b")
      .where(Dedup.jaccard(col("__sh_a"), col("__sh_b")) >= 0.5)
      .select("id_a", "id_b").localCheckpoint(true)
    t("verified")(println("  pairs " + verified.count()))
    val clusters = t("duplicateClusters") {
      Dedup.duplicateClusters(verified).localCheckpoint(true)
    }
    t("clusters count")(println("  " + clusters.count()))
    t("repoint+distinct") {
      val mapping = idToExact.join(
          clusters.withColumnRenamed("id", "__rid").withColumnRenamed("cluster", "__cluster"),
          col("__rep") === col("__rid"), "left")
        .select(col("id"), coalesce(col("__cluster"), col("__rep")).as("__final"))
      println("  rows " + union.join(mapping, Seq("id"), "left")
        .select(col("band_idx"), col("band_hash"),
          coalesce(col("__final"), col("id")).as("id"))
        .distinct().count())
    }
    spark.stop()
  }
}
