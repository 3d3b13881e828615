package graft.operators

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** POSIX ustar TAR archives (IEEE 1003.1, public layout) and the
  * WebDataset shard convention on top of them — tar shards whose
  * member names share a stem per sample (`123.txt`, `123.json`, …)
  * are the de-facto container for 100 TB multimodal training data:
  * samples stream sequentially, shards shard embarrassingly.
  *
  * Decode: 512-byte header walk — name (+ ustar prefix field), octal
  * size, checksum VERIFIED (unsigned sum with the checksum field
  * blanked), magic checked, regular files extracted (typeflag '0' or
  * NUL), directories ('5') skipped; any other typeflag, a bad
  * checksum, a bad octal field or a truncated data block fails
  * loudly. End = two zero blocks (also accepted: clean EOF at a
  * header boundary, which GNU tar emits under `-b 1`).
  *
  * Encode: deterministic — mode 0644, uid/gid 0, mtime 0, no
  * user/group names — equal inputs produce byte-equal shards, so
  * shard-level exact dedup works on the compressed artifact.
  *
  * Everything is row-local byte walking under `mapPartitions`; a
  * shard is one row, entries never shuffle individually.
  */
object TarCodec {

  final case class Entry(name: String, data: Array[Byte])

  private val BlockSize = 512

  // ---- encode ----------------------------------------------------------

  private def writeOctal(b: Array[Byte], off: Int, width: Int, v: Long): Unit = {
    // width-1 octal digits, zero-padded, NUL terminator (ustar style)
    val s = java.lang.Long.toOctalString(v)
    require(s.length <= width - 1, s"value $v overflows a $width-byte octal field")
    val pad = width - 1 - s.length
    var i = 0
    while (i < pad) { b(off + i) = '0'; i += 1 }
    s.foreach { c => b(off + i) = c.toByte; i += 1 }
    b(off + width - 1) = 0
  }

  private def headerFor(name: String, size: Int): Array[Byte] = {
    val nameB = name.getBytes(UTF_8) // ≤100 bytes, validated in encode()
    val h = new Array[Byte](BlockSize)
    System.arraycopy(nameB, 0, h, 0, nameB.length)
    writeOctal(h, 100, 8, 0x1a4) // mode 0644
    writeOctal(h, 108, 8, 0) // uid
    writeOctal(h, 116, 8, 0) // gid
    writeOctal(h, 124, 12, size.toLong)
    writeOctal(h, 136, 12, 0) // mtime
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces
    h(156) = '0' // typeflag: regular file
    System.arraycopy("ustar".getBytes(ISO_8859_1), 0, h, 257, 5)
    h(262) = 0
    h(263) = '0'; h(264) = '0' // version
    var sum = 0L
    var i = 0
    while (i < BlockSize) { sum += h(i) & 0xff; i += 1 }
    // checksum: 6 octal digits, NUL, space (the historical layout)
    val cs = java.lang.Long.toOctalString(sum)
    val pad = 6 - cs.length
    i = 0
    while (i < pad) { h(148 + i) = '0'; i += 1 }
    cs.foreach { c => h(148 + i) = c.toByte; i += 1 }
    h(154) = 0
    h(155) = ' '
    h
  }

  /** Serialize entries in order; two zero blocks terminate. */
  def encode(entries: Seq[Entry]): Array[Byte] = {
    entries.foreach { e =>
      require(e.name.getBytes(UTF_8).length <= 100,
        s"entry name '${e.name}' exceeds the 100-byte ustar name field")
    }
    val total = entries.iterator.map { e =>
      BlockSize + ((e.data.length + BlockSize - 1) / BlockSize) * BlockSize
    }.sum + 2 * BlockSize
    val out = new Array[Byte](total)
    var off = 0
    entries.foreach { e =>
      System.arraycopy(headerFor(e.name, e.data.length), 0, out, off, BlockSize)
      off += BlockSize
      System.arraycopy(e.data, 0, out, off, e.data.length)
      off += ((e.data.length + BlockSize - 1) / BlockSize) * BlockSize
    }
    out
  }

  // ---- decode ----------------------------------------------------------

  private def readOctal(b: Array[Byte], off: Int, width: Int): Long = {
    var i = off
    val end = off + width
    while (i < end && (b(i) == ' ')) i += 1
    var v = 0L
    var any = false
    while (i < end && b(i) != 0 && b(i) != ' ') {
      val c = b(i) - '0'
      require(c >= 0 && c <= 7, s"bad octal digit '${b(i).toChar}' in tar header at $off")
      v = v * 8 + c
      any = true
      i += 1
    }
    require(any, s"empty octal field in tar header at offset $off")
    v
  }

  private def isZeroBlock(b: Array[Byte], off: Int): Boolean = {
    var i = off
    while (i < off + BlockSize) { if (b(i) != 0) return false; i += 1 }
    true
  }

  /** Parse all regular-file entries, in order. */
  def decode(bytes: Array[Byte]): Seq[Entry] = {
    require(bytes != null && bytes.length % BlockSize == 0,
      s"tar size ${if (bytes == null) -1 else bytes.length} is not a multiple of 512")
    val out = Seq.newBuilder[Entry]
    var off = 0
    var done = false
    while (!done && off < bytes.length) {
      if (isZeroBlock(bytes, off)) done = true // end-of-archive marker
      else {
        // checksum: unsigned byte sum with the chksum field as spaces
        var sum = 0L
        var i = 0
        while (i < BlockSize) {
          sum += (if (i >= 148 && i < 156) ' '.toLong else (bytes(off + i) & 0xff).toLong)
          i += 1
        }
        require(readOctal(bytes, off + 148, 8) == sum,
          s"tar header checksum mismatch at offset $off")
        require(bytes(off + 257) == 'u' && bytes(off + 258) == 's' &&
          bytes(off + 259) == 't' && bytes(off + 260) == 'a' && bytes(off + 261) == 'r',
          s"missing ustar magic at offset $off")
        var nameEnd = off
        while (nameEnd < off + 100 && bytes(nameEnd) != 0) nameEnd += 1
        var name = new String(bytes, off, nameEnd - off, UTF_8)
        // ustar prefix field extends long names
        var pEnd = off + 345
        while (pEnd < off + 345 + 155 && bytes(pEnd) != 0) pEnd += 1
        if (pEnd > off + 345)
          name = new String(bytes, off + 345, pEnd - (off + 345), UTF_8) + "/" + name
        val size = readOctal(bytes, off + 124, 12)
        require(size >= 0 && size <= Int.MaxValue, s"bad tar entry size $size")
        val dataBlocks = ((size + BlockSize - 1) / BlockSize).toInt
        require(off + BlockSize + dataBlocks * BlockSize <= bytes.length,
          s"tar entry '$name' truncated (need $size bytes)")
        val tf = bytes(off + 156)
        tf match {
          case '0' | 0 =>
            out += Entry(name,
              java.util.Arrays.copyOfRange(bytes, off + BlockSize,
                off + BlockSize + size.toInt))
          case '5' => // directory: no data, skip
          case other =>
            throw new IllegalArgumentException(
              s"unsupported tar typeflag '${other.toChar}' for entry '$name'")
        }
        off += BlockSize + dataBlocks * BlockSize
      }
    }
    out.result()
  }

  // ---- WebDataset shards ----------------------------------------------

  /** Build gzipped WebDataset shards: docs(doc_id, text, meta) →
    * (shard_id, data) — one `.tar.gz` blob per `doc_id % shards`
    * group, entries `<id>.txt` + `<id>.meta` in doc_id order (the
    * stem-pairing convention). The groupBy is the one corpus shuffle,
    * exactly like a shard writer's re-shard. */
  def webdatasetBuild(docs: DataFrame, shards: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id").cast("long"), col("text"), col("meta"))
      .as[(Long, String, String)]
      .groupByKey(_._1 % shards)
      .mapGroups { (g, it) =>
        val entries = it.toSeq.sortBy(_._1).flatMap { case (id, text, meta) =>
          Seq(Entry(s"$id.txt", text.getBytes(UTF_8)),
            Entry(s"$id.meta", meta.getBytes(UTF_8)))
        }
        (g, Gzip.gzip(encode(entries)))
      }
      .toDF("shard_id", "data")
  }

  /** Build gzipped WebDataset shards of MEDIA payloads:
    * (media_id, data) → one `.tar.gz` per `media_id % shards`, entry
    * `<id>.<ext>` with the extension sniffed from the container magic
    * (webm/ivf/bin) — the shard layout a multimodal training pipeline
    * reads. Same single-shuffle shape as [[webdatasetBuild]]. */
  def webdatasetBuildMedia(media: DataFrame, shards: Int): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("media_id").cast("long"), col("data"))
      .as[(Long, Array[Byte])]
      .groupByKey(_._1 % shards)
      .mapGroups { (g, it) =>
        val entries = it.toSeq.sortBy(_._1).map { case (id, d) =>
          val ext =
            if (EbmlMeta.isEbml(d)) "webm"
            else if (WebmVideo.isIvf(d)) "ivf"
            else "bin"
          Entry(s"$id.$ext", d)
        }
        (g, Gzip.gzip(encode(entries)))
      }
      .toDF("shard_id", "data")
  }

  /** Ingest media shards: gunzip, tar-walk, one row per entry —
    * (media_id, data), the input shape of every media kernel here.
    * Row-local. */
  def webdatasetIngestMedia(shards: DataFrame): DataFrame = {
    val s = shards.sparkSession
    import s.implicits._
    shards.select(col("data")).as[Array[Byte]]
      .flatMap { blob =>
        decode(Gzip.gunzip(blob)).map { e =>
          val stem = e.name.substring(0, e.name.lastIndexOf('.'))
          (stem.toLong, e.data)
        }
      }
      .toDF("media_id", "data")
  }

  /** Ingest shards(data): gunzip, tar-walk, pair entries by stem —
    * one row per sample: (doc_id, txt, meta). A stem missing either
    * half fails loudly (a torn sample must not become a silent
    * null). Row-local. */
  def webdatasetIngest(shards: DataFrame): DataFrame = {
    val s = shards.sparkSession
    import s.implicits._
    shards.select(col("data")).as[Array[Byte]]
      .flatMap { blob =>
        val entries = decode(Gzip.gunzip(blob))
        entries.grouped(2).map {
          case Seq(a, b) =>
            val stemA = a.name.substring(0, a.name.lastIndexOf('.'))
            val stemB = b.name.substring(0, b.name.lastIndexOf('.'))
            require(stemA == stemB,
              s"torn WebDataset sample: '${a.name}' paired with '${b.name}'")
            require(a.name.endsWith(".txt") && b.name.endsWith(".meta"),
              s"unexpected entry pair '${a.name}', '${b.name}'")
            (stemA.toLong, new String(a.data, UTF_8), new String(b.data, UTF_8))
          case other =>
            throw new IllegalArgumentException(
              s"odd entry count in shard: dangling '${other.head.name}'")
        }
      }
      .toDF("doc_id", "txt", "meta")
  }
}
