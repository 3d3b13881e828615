package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unified decompression dispatch over the three hand-written codecs
  * — the compression sibling of [[Multimodal.extractAudioMeta]]'s
  * seven-format audio dispatcher: a mixed crawl/dump corpus carries
  * `.gz`, `.bz2` and `.xz` blobs side by side, and ingest wants ONE
  * call that sniffs magic bytes and routes.
  *
  * Probes are mutually disjoint by construction (distinct magic
  * prefixes: `1f 8b`, `BZh`, `fd 37 7a 58 5a 00`); a payload matching
  * none is reported `format = "raw"` and passed through UNCHANGED —
  * uncompressed members in a mixed bucket are data, not errors — while
  * a payload that MATCHES a magic but fails to decode fails loudly
  * (a truncated gzip member must not silently pass through as
  * "raw"). Row-local. */
object Decompress {

  /** Sniffed format of a payload: "gzip", "bzip2", "xz" or "raw". */
  def sniff(b: Array[Byte]): String =
    if (b == null || b.length < 6) "raw"
    else if ((b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b) "gzip"
    else if (b(0) == 'B' && b(1) == 'Z' && b(2) == 'h' &&
      b(3) >= '1' && b(3) <= '9') "bzip2"
    else if ((b(0) & 0xff) == 0xfd && b(1) == '7' && b(2) == 'z' &&
      b(3) == 'X' && b(4) == 'Z' && b(5) == 0) "xz"
    else "raw"

  /** Decompress one payload by sniffed format (identity for "raw"). */
  def auto(b: Array[Byte]): (String, Array[Byte]) = sniff(b) match {
    case "gzip" => ("gzip", Gzip.gunzip(b))
    case "bzip2" => ("bzip2", Bzip2.decode(b))
    case "xz" => ("xz", Xz.decode(b))
    case _ => ("raw", b)
  }

  /** media(idCol, dataCol) → (idCol, format, data): auto-decompressed
    * payloads with the detected format tag. Row-local mapPartitions;
    * payloads never shuffle. */
  def autoFrame(media: DataFrame, idCol: String, dataCol: String): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col(idCol).cast("long"), col(dataCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        val (fmt, out) = auto(b)
        (id, fmt, out)
      })
      .toDF(idCol, "format", "data")
  }
}
