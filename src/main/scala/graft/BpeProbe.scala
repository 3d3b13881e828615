package graft

import org.apache.spark.sql.SparkSession

/** Measurement probe: k=1024 batched BPE train on sf0.1 documents.
  * The raw synthetic corpus exhausts its merge space at 107 merges
  * (tiny vocabulary), so the probe salts each word with a per-doc
  * suffix (vocab ×101) to give the trainer production-like material.
  *
  * Measured on this box (local[32], sf0.1, vocab 3120):
  * batched(batch=64): 1024 merges in 493 rounds, 70.1 s;
  * sequential: 1024 merges in 1024 rounds, 79.4 s; merge lists EQUAL.
  * The local win is modest because a local driver round-trip is ~free;
  * the 2.1× round reduction is the cluster win — each round is a
  * full scheduler round-trip (two stages + a collect) whose fixed
  * latency dominates at 32k-merge production vocabularies. */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("bpeprobe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    import spark.implicits._
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .selectExpr("cast(doc_id as long) doc_id", "text")
        .as[(Long, String)]
        .map { case (id, t) =>
          (id, t.split("\\s+").map(w => w + "x" + (id % 101)).mkString(" "))
        }
        .toDF("doc_id", "text")
        .cache()
      println("MARKER vocab=" +
        graft.operators.Bpe.wordFreqs(docs, "text").count())
      var rounds = 0
      val t0 = System.nanoTime()
      val ms = graft.operators.Bpe.trainBatched(docs, "text", k = 1024,
        batch = 64, onRound = (rank, n) => {
          rounds += 1
          if (rounds % 10 == 0) println(s"MARKER round=$rounds rank=$rank accepted=$n")
        })
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"MARKER k1024: merges=${ms.length} rounds=$rounds secs=$secs%.1f " +
        s"last=${ms.last.left}+${ms.last.right}")
      val t1 = System.nanoTime()
      val seqMs = graft.operators.Bpe.train(docs, "text", k = 1024)
      val secsSeq = (System.nanoTime() - t1) / 1e9
      println(f"MARKER k1024seq: merges=${seqMs.length} rounds=1024 secs=$secsSeq%.1f " +
        s"equal=${seqMs == ms}")
    } finally spark.stop()
  }
}
