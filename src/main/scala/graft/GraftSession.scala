package graft

import org.apache.spark.sql.SparkSession

/** Session factory with scale-appropriate defaults.
  *
  * The reference engine creates a fresh `lithops.FunctionExecutor()` per
  * operator call (reference: dataframe/core.py:258,271,306 — no session
  * reuse). We instead hold one long-lived SparkSession; AQE + shuffle
  * partition sizing are the knobs that matter at 100 TB.
  */
object GraftSession {
  def builder(
      appName: String = "graft",
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .master(master)
      // On a real cluster AQE coalesces/splits these at runtime; the static
      // number is just the pre-AQE default (200 is wrong for local mode).
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // AQE coalescing floor (r19 optimization): AQE costs a partition by
      // its BYTES, but this engine's hot stages are CPU-dense per byte —
      // minhash banding, n-gram explodes, codec encodes — where 1 MB of
      // text is seconds of CPU. The default 1 MB minPartitionSize
      // collapses any shuffle under ~cores·1MB to a handful of tasks, so
      // a CPU-dense reduce stage serializes on one core exactly when the
      // data is small relative to the machine. 64 KB keeps such stages
      // parallel; at production scale (partitions >> 1 MB after the
      // parallelism-first target) the floor never binds, so this is not a
      // local-mode tune. Env-overridable for A/B and cluster profiles.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "64k"))
      // graft's native expressions as SQL functions (cosine_similarity,
      // minhash_signature, simhash64, word_ngrams, product_agg)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir", "/root/repo/target/warehouse")
      .config("spark.sql.session.timeZone", "UTC")
      // Parquet TIMESTAMP(NANOS) (older pandas-written event fixtures) is
      // rejected by default; read as LongType nanos instead of erroring.
      // SparkEntry.events dispatches on the resulting dtype: LongType →
      // nanos div 1000, timestamp[us] fixtures (the current generation)
      // arrive as TimestampNTZ/Timestamp and never hit this config. Kept
      // so a nanos-era fixture still reads rather than throwing at scan.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(appName: String = "graft"): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
