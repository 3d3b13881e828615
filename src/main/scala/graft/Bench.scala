package graft

/** Benchmark main — runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query wall
  * times. Failed queries are recorded in an `errors` map (name → message)
  * and excluded from the total, so a broken query can't masquerade as a
  * fast one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession
      .builder(appName = "graft-bench", master = s"local[$cpus]",
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Untimed warmup: pay one-time JVM/codegen/parquet-reader costs here
    // so the alphabetically-first query isn't charged for them.
    try {
      import org.apache.spark.sql.functions.{col, sum}
      spark.range(1000000).agg(sum(col("id"))).collect()
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000)
        .agg(sum(col("l_quantity"))).collect()
    } catch { case _: Throwable => () }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val outcome =
        // noop sink, not count(): count lets the optimizer drop sorts
        // and column work, under-measuring; noop materializes every
        // output row and column without any write IO.
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); Right(()) }
        catch { case e: Throwable => Left(Option(e.getMessage).getOrElse(e.getClass.getName)) }
      (name, (System.nanoTime() - t0) / 1e9, outcome)
    }
    val ok = results.collect { case (n, t, Right(_)) => n -> t }
    val errs = results.collect { case (n, _, Left(m)) => n -> m }
    val qs = ok.map { case (k, v) => s"${JsonOut.q(k)}:$v" }.mkString("{", ",", "}")
    val es = errs.map { case (k, v) => s"${JsonOut.q(k)}:${JsonOut.q(v.take(200))}" }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"n_ok":${ok.size},"n_err":${errs.size},"sf":${JsonOut.q(sfDir)}}""")
    spark.stop()
  }
}
