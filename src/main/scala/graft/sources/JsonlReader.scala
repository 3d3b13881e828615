package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-Lines source/sink over `spark.read.json` — the interchange
  * format LLM training corpora actually ship in (one JSON document per
  * line: The Pile, RedPajama, Dolma all distribute as jsonl/jsonl.gz).
  * The reference stops at CSV (dataframe/io.py:13-88 is its whole IO
  * surface); this extends the same option-mapping style to jsonl.
  *
  * Scale notes (the reasons each option exists):
  *  - `schema`: an explicit schema SKIPS the inference pass — on a
  *    100 TB corpus, inference is a full extra scan (sampled only by
  *    `samplingRatio`). Production pipelines should always pass one.
  *  - line-mode jsonl is SPLITTABLE: Spark assigns byte ranges and
  *    tasks resync at the next newline, so one giant file still fans
  *    out across executors. `multiline=true` (a single JSON array/doc
  *    spanning lines) is NOT splittable — one file = one task — and is
  *    provided only for ingest of legacy dumps.
  *  - gzip jsonl.gz is also one-task-per-file; prefer zstd, which
  *    Spark writes as splittable-enough many-file output anyway.
  *  - `usecols`-style pruning happens via `.select` so Catalyst prunes
  *    the parsed fields (Spark's JSON reader honors required-schema
  *    pushdown — unreferenced fields are never materialized).
  */
final case class JsonlOptions(
    schema: Option[StructType] = None,
    samplingRatio: Double = 1.0,
    npartitions: Option[Int] = None,
    encoding: String = "UTF-8",
    multiline: Boolean = false,
    // drop columns that are null in every sampled row (inference only)
    dropFieldIfAllNull: Boolean = false,
    usecols: Seq[String] = Nil,
    nrows: Option[Int] = None,
    // PERMISSIVE (corrupt rows → nulls + _corrupt_record), DROPMALFORMED,
    // FAILFAST — web-scale jsonl always has a few broken lines, so the
    // default matches Spark's forgiving one
    mode: String = "PERMISSIVE")

object JsonlReader {

  def readJsonl(spark: SparkSession, path: String,
      opts: JsonlOptions = JsonlOptions()): DataFrame = {
    var r = spark.read
      .option("encoding", opts.encoding)
      .option("multiLine", opts.multiline.toString)
      .option("dropFieldIfAllNull", opts.dropFieldIfAllNull.toString)
      .option("mode", opts.mode)
    r = opts.schema match {
      case Some(s) => r.schema(s)
      case None => r.option("samplingRatio", opts.samplingRatio.toString)
    }
    var df = r.json(path)
    if (opts.usecols.nonEmpty)
      df = df.select(opts.usecols.map(org.apache.spark.sql.functions.col): _*)
    opts.nrows.foreach(n => df = df.limit(n))
    // coalesce-not-repartition when shrinking (no shuffle); repartition
    // only when the caller asks for MORE splits than the scan produced
    opts.npartitions.foreach { n =>
      df = if (n < df.rdd.getNumPartitions) df.coalesce(n) else df.repartition(n)
    }
    df
  }

  /** Write as JSON Lines. `compression`: None | "gzip" | "zstd" | … —
    * zstd preferred at scale (splittable-friendly many-file layout,
    * ~3× smaller than raw, much faster than gzip to decode). */
  def writeJsonl(df: DataFrame, path: String, mode: String = "overwrite",
      compression: Option[String] = None): Unit = {
    var w = df.write.mode(mode)
    compression.foreach(c => w = w.option("compression", c))
    w.json(path)
  }
}
