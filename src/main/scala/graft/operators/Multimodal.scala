package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: media payloads as opaque `binary` columns
  * with typed metadata structs, plus per-partition batch feature
  * extraction.
  *
  * The Spark-side plumbing — schema, partitioning, batch iteration shape
  * — is real; the actual byte decoding (image/audio codecs) is STUBBED
  * behind [[decodeStub]] with a deterministic fake, because codec
  * libraries are not available in this environment. Swapping in a real
  * decoder changes only that one function.
  *
  * Scale notes: payload bytes never shuffle (all transforms are
  * row-local `mapPartitions`); metadata-only queries prune the binary
  * column at the parquet scan, so "count images wider than X" reads
  * kilobytes, not the 100 TB of pixels.
  */
object Multimodal {

  /** Decoded-media features. `width`/`height` are what a real decoder
    * would parse from the header; here they are a deterministic function
    * of the payload so tests/oracles can predict them. */
  final case class MediaFeatures(
      mediaId: Long,
      byteLen: Long,
      headByte: Int,
      width: Int,
      height: Int)

  /** Attach a media payload column: `data` binary + `meta` struct.
    * Demonstrates the schema contract on any table with a binary-able
    * column. */
  def withMediaColumn(df: DataFrame, idCol: String, payloadCol: String,
      metaCols: Seq[String]): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(payloadCol).cast(BinaryType).as("data"),
      struct(metaCols.map(col): _*).as("meta"))

  /** STUB decoder — deterministic fake standing in for an image/audio
    * codec. Real implementation would parse the container header.
    * Kept total and pure so the pipeline around it is fully testable. */
  def decodeStub(bytes: Array[Byte]): (Int, Int) = {
    if (bytes == null || bytes.isEmpty) return (0, 0)
    // Fake dimensions derived from content so they're stable + verifiable
    val w = ((bytes.length % 640) + 1)
    val h = ((bytes(0) & 0xff) % 480) + 1
    (w, h)
  }

  /** Batch feature extraction over media rows: per-partition iteration
    * (the Scala analog of a batched pandas UDF — one decoder
    * initialization per partition, amortized across its rows). Input
    * must have columns (media_id: long, data: binary). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.select(col("media_id"), col("data")).mapPartitions { it: Iterator[Row] =>
      // Real decoders would be initialized HERE, once per partition.
      it.map { row =>
        val id = row.getLong(0)
        val bytes = row.getAs[Array[Byte]](1)
        val (w, h) = decodeStub(bytes)
        MediaFeatures(
          mediaId = id,
          byteLen = if (bytes == null) 0L else bytes.length.toLong,
          headByte = if (bytes == null || bytes.isEmpty) -1 else bytes(0) & 0xff,
          width = w,
          height = h)
      }
    }
  }

  /** STUB resize — the transform shape of a media re-encode: row-local
    * projection over (id, data), emitting a smaller payload whose size
    * tracks the scale factor deterministically (`substring` operates on
    * binary natively). A real implementation swaps a codec resize in
    * here and nothing else changes. Payloads never shuffle. */
  def resizeStub(media: DataFrame, scalePercent: Int): DataFrame = {
    require(scalePercent > 0 && scalePercent <= 100)
    // long arithmetic: length * scalePercent overflows Int for payloads
    // over ~Int.MaxValue/scale bytes (a 50 MB blob at 50% would wrap)
    media.withColumn("data",
      col("data").substr(lit(1),
        (length(col("data")).cast("long") * scalePercent / 100).cast("int")))
  }

  /** Deterministic frame-sampling demo over a binary payload: pick every
    * `stride`-th byte offset as a "frame" index (the real operator would
    * seek keyframes). Shows the explode/array plumbing for
    * one-row-per-frame outputs. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    require(stride > 0, s"stride must be positive, got $stride")
    media.select(
      col("media_id"),
      // empty payloads yield no frames (sequence(0,-1) would be a
      // descending range, not empty — guard explicitly)
      explode(
        when(length(col("data")) > 0,
          sequence(lit(0), length(col("data")) - 1, lit(stride)))
          .otherwise(array().cast(ArrayType(IntegerType, containsNull = false))))
        .as("frame_offset"))
  }
}
