package graft.tools

import org.apache.spark.sql.functions._

import graft.operators

/** BPE training scale probe (source of the COVERAGE.md large-k
  * incremental-vs-batched measurements): large-k BPE training on a
  * salted corpus derived from the documents fixture.
  * Usage: runMain graft.tools.BpeScaleCheck [mode] [sfDir]
  * (mode: k1024 | k8192 | k8192w). Salting recipe: 200 token-suffixed copies
  * with each token re-keyed to md5(token || copy) truncated to 16 hex
  * chars — vocabulary ~6200 distinct 16-char words whose frequencies
  * keep the fixture's skew, with enough per-word structure to sustain
  * k=8192 merges (the plain suffix recipe exhausts at ~428 because
  * base stems and copy suffixes share almost all merge rules). */
object BpeScaleCheck {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession
      .builder(appName = "graft-bpe-scale-check", master = s"local[$cpus]",
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val copies = 200
    val salted = (0 until copies).map { c =>
      base.select(
        (col("doc_id") + lit(c.toLong * 10000000L)).as("doc_id"),
        array_join(
          transform(split(lower(col("text")), "\\s+"),
            x => substring(md5(concat(x, lit(s"#$c"))), 1, 16)), " ").as("text"))
    }.reduce(_ unionByName _)
    salted.persist().count()
    println(s"MEASURE vocab=${operators.Bpe.wordFreqs(salted, "text").count()}")

    def timeIt[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"MEASURE $label ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val mode = if (args.nonEmpty) args(0) else "k1024"
    if (mode == "k1024") {
      var ri = 0
      val inc = timeIt("incremental k=1024 batch=64") {
        operators.Bpe.trainIncremental(salted, "text", k = 1024, batch = 64,
          onRound = (_, _) => ri += 1)
      }
      println(s"MEASURE incremental k=1024 rounds=$ri merges=${inc.length}")
      var rb = 0
      val bat = timeIt("batched k=1024 batch=64") {
        operators.Bpe.trainBatched(salted, "text", k = 1024, batch = 64,
          onRound = (_, _) => rb += 1)
      }
      println(s"MEASURE batched k=1024 rounds=$rb equal=${bat == inc}")
    }
    if (mode == "k8192w") {
      // production word-table shape: vocab ~62k distinct 16-hex words
      // derived from sf0.1 tokens (2000 salted copies), frequency
      // 1..50 from a word-hash — the scale where the per-round full
      // pair re-aggregation visibly loses to delta maintenance
      val toks = base.select(explode(split(lower(col("text")), "\\s+")).as("tok"))
        .where(length(col("tok")) > 0).distinct()
      val words = toks.crossJoin(spark.range(2000).toDF("c"))
        .select(substring(md5(concat(col("tok"), lit("#"), col("c"))), 1, 16).as("w"))
        .select(concat_ws(" ",
          array_repeat(col("w"), (crc32(col("w")) % 50 + 1).cast("int"))).as("text"))
      words.persist().count()
      println(s"MEASURE wordtable vocab=${operators.Bpe.wordFreqs(words, "text").count()}")
      var ri = 0
      var lastLog = System.nanoTime()
      val inc = timeIt("wordtable incremental k=8192 batch=1024") {
        operators.Bpe.trainIncremental(words, "text", k = 8192, batch = 1024,
          onRound = (rank, n) => {
            ri += 1
            if (System.nanoTime() - lastLog > 60e9) {
              println(s"MEASURE inc progress rank=$rank accepted=$n rounds=$ri")
              lastLog = System.nanoTime()
            }
          })
      }
      println(s"MEASURE wordtable incremental k=8192 rounds=$ri merges=${inc.length}")
      var rb = 0
      val bat = timeIt("wordtable batched k=8192 batch=1024") {
        operators.Bpe.trainBatched(words, "text", k = 8192, batch = 1024,
          onRound = (rank, n) => {
            rb += 1
            if (System.nanoTime() - lastLog > 60e9) {
              println(s"MEASURE bat progress rank=$rank accepted=$n rounds=$rb")
              lastLog = System.nanoTime()
            }
          })
      }
      println(s"MEASURE wordtable batched k=8192 rounds=$rb equal=${bat == inc}")
    }
    if (mode == "k8192") {
      var ri = 0
      var lastLog = System.nanoTime()
      val inc = timeIt("incremental k=8192 batch=1024") {
        operators.Bpe.trainIncremental(salted, "text", k = 8192, batch = 1024,
          onRound = (rank, n) => {
            ri += 1
            if (System.nanoTime() - lastLog > 30e9) {
              println(s"MEASURE progress rank=$rank accepted=$n rounds=$ri")
              lastLog = System.nanoTime()
            }
          })
      }
      println(s"MEASURE incremental k=8192 rounds=$ri merges=${inc.length}")
    }
    spark.stop()
  }
}
