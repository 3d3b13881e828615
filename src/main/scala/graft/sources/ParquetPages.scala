package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.operators.{Gzip, Snappy, Zstd}

/** Hand-written Parquet DATA-PAGE reader — the engine can now read real
  * column chunks end-to-end without parquet-mr: footer ([[ParquetFooter]])
  * → per-page `PageHeader` (Thrift compact) → page decompression through
  * the repo's OWN codecs (Snappy raw-block, gzip member, zstd frame) →
  * RLE/bit-packed-hybrid definition levels → PLAIN or RLE_DICTIONARY
  * values. Everything is off the public `parquet-format` spec
  * (`Encodings.md`, `parquet.thrift`).
  *
  * Scope (loud fences, not silent wrongness): FLAT columns only
  * (max repetition level 0 — no nested lists/maps), data pages V1
  * (parquet-mr's default; V2 rejects with a named error), PLAIN and
  * PLAIN_DICTIONARY/RLE_DICTIONARY encodings (what Spark writes),
  * UNCOMPRESSED/SNAPPY/GZIP/ZSTD codecs (all four decoders are the
  * repo's own hand-written implementations — reading a zstd parquet
  * chunk exercises the RFC 8878 decoder against real writer output).
  *
  * Scale shape: one column chunk per task; the chunk walk is sequential
  * within a task by construction (pages chain), tasks fan out per
  * (file, row group) exactly like the metadata scans.
  *
  * Reference scope: lithops-dataframe re-parses CSV byte ranges per
  * worker (`core.py:254`); this is the columnar-format analog of that
  * ingest path, spec-grounded and oracle-checked.
  */
object ParquetPages {

  // ---- RLE/bit-packed hybrid (Encodings.md §RLE) -------------------------

  /** Decode `n` values of `bitWidth` from the hybrid encoding starting
    * at `off`: LEB128 header — low bit 1 ⇒ bit-packed group count
    * (header >> 1 groups of 8 values, LSB-first within each byte),
    * low bit 0 ⇒ RLE run (header >> 1 repeats of a fixed-width
    * little-endian value). Returns (values, next offset). */
  private[graft] def rleHybrid(b: Array[Byte], off: Int, bitWidth: Int,
                                 n: Int): (Array[Int], Int) = {
    val out = new Array[Int](n)
    var p = off
    var filled = 0
    if (bitWidth == 0) return (out, p) // all zeros, nothing stored
    val byteWidth = (bitWidth + 7) / 8
    while (filled < n) {
      // LEB128 header
      var header = 0L; var shift = 0; var bb = 0
      do {
        require(p < b.length, "truncated RLE header")
        bb = b(p) & 0xff; p += 1
        header |= (bb & 0x7fL) << shift; shift += 7
      } while ((bb & 0x80) != 0)
      if ((header & 1) == 1) { // bit-packed: header>>1 groups of 8
        val groups = (header >>> 1).toInt
        val count = groups * 8
        require(p + groups.toLong * bitWidth <= b.length, "truncated bit-packed run")
        var bitPos = 0
        var i = 0
        while (i < count && filled < n) {
          var v = 0; var got = 0
          while (got < bitWidth) {
            val byteI = p + (bitPos >> 3)
            val avail = 8 - (bitPos & 7)
            val take = math.min(avail, bitWidth - got)
            val bits = ((b(byteI) & 0xff) >>> (bitPos & 7)) & ((1 << take) - 1)
            v |= bits << got
            got += take; bitPos += take
          }
          out(filled) = v; filled += 1; i += 1
        }
        // a group's padding values beyond n are legal filler — skip them
        p += groups * bitWidth
      } else { // RLE run
        val count = (header >>> 1).toInt
        require(count >= 0 && p + byteWidth <= b.length, "truncated RLE run")
        var v = 0; var k = 0
        while (k < byteWidth) { v |= (b(p + k) & 0xff) << (8 * k); k += 1 }
        p += byteWidth
        var i = 0
        while (i < count && filled < n) { out(filled) = v; filled += 1; i += 1 }
        require(i == count || filled == n, "RLE run overflows value count")
      }
    }
    (out, p)
  }

  // ---- PageHeader (parquet.thrift) ----------------------------------------

  /** The fields of PageHeader + DataPageHeader/DictionaryPageHeader the
    * walk needs. `kind`: 0 = data v1, 2 = dictionary (thrift PageType). */
  private[sources] final case class PageHead(
      kind: Int, uncompressedSize: Int, compressedSize: Int,
      numValues: Int, valueEncoding: Int, defLevelEncoding: Int,
      headerLen: Int)

  private[sources] def parsePageHeader(buf: Array[Byte]): PageHead = {
    val r = new ParquetFooter.HeaderReader(buf)
    var kind = -1; var us = -1; var cs = -1
    var nv = -1; var enc = -1; var defEnc = -1
    r.struct {
      case (1, 5) => kind = r.zigzagInt(); true
      case (2, 5) => us = r.zigzagInt(); true
      case (3, 5) => cs = r.zigzagInt(); true
      case (5, 12) => // DataPageHeader
        r.struct {
          case (1, 5) => nv = r.zigzagInt(); true
          case (2, 5) => enc = r.zigzagInt(); true
          case (3, 5) => defEnc = r.zigzagInt(); true
          case _ => false
        }; true
      case (7, 12) => // DictionaryPageHeader
        r.struct {
          case (1, 5) => nv = r.zigzagInt(); true
          case (2, 5) => enc = r.zigzagInt(); true
          case _ => false
        }; true
      case (8, 12) =>
        throw new IllegalArgumentException(
          "data page V2 not supported (parquet-mr writes V1 by default)")
      case _ => false
    }
    require(kind >= 0 && us >= 0 && cs >= 0, "PageHeader missing required fields")
    require(kind == 0 || kind == 2, s"unsupported page type $kind (INDEX_PAGE?)")
    PageHead(kind, us, cs, nv, enc, defEnc, r.position)
  }

  // ---- chunk walk -----------------------------------------------------------

  /** One decoded flat column chunk: `values(i)` is null where the
    * definition level said so. Values are Long (INT32/INT64), Double
    * (FLOAT/DOUBLE), String (BYTE_ARRAY/UTF8) or Boolean. */
  final case class DecodedChunk(typ: Int, values: Array[Any])

  private def inflatePage(codec: Int, b: Array[Byte], off: Int, clen: Int,
                          ulen: Int): Array[Byte] = codec match {
    case 0 => java.util.Arrays.copyOfRange(b, off, off + clen)
    case 1 => Snappy.uncompressBlock(b, off, off + clen)
    case 2 => Gzip.gunzip(java.util.Arrays.copyOfRange(b, off, off + clen))
    case 6 => Zstd.decode(java.util.Arrays.copyOfRange(b, off, off + clen))
    case c => throw new IllegalArgumentException(
      s"unsupported page codec ${ParquetFooter.CodecNames.lift(c).getOrElse(c.toString)}")
  }

  private def plainValues(typ: Int, b: Array[Byte], off0: Int, n: Int,
                          typeLength: Int = 0): Array[Any] = {
    val out = new Array[Any](n)
    var p = off0
    var i = 0
    typ match {
      case 0 => // BOOLEAN: bit-packed LSB-first
        while (i < n) { out(i) = ((b(p + (i >> 3)) >>> (i & 7)) & 1) == 1; i += 1 }
      case 1 => // INT32 LE
        while (i < n) {
          out(i) = ((b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
            ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)).toInt.toLong
          p += 4; i += 1
        }
      case 2 => // INT64 LE
        while (i < n) {
          var v = 0L; var k = 7
          while (k >= 0) { v = (v << 8) | (b(p + k) & 0xffL); k -= 1 }
          out(i) = v; p += 8; i += 1
        }
      case 4 => // FLOAT LE
        while (i < n) {
          val bits = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
            ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
          out(i) = java.lang.Float.intBitsToFloat(bits).toDouble; p += 4; i += 1
        }
      case 5 => // DOUBLE LE
        while (i < n) {
          var v = 0L; var k = 7
          while (k >= 0) { v = (v << 8) | (b(p + k) & 0xffL); k -= 1 }
          out(i) = java.lang.Double.longBitsToDouble(v); p += 8; i += 1
        }
      case 6 => // BYTE_ARRAY: 4-byte LE length + bytes
        while (i < n) {
          val len = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
            ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
          out(i) = new String(b, p + 4, len, java.nio.charset.StandardCharsets.UTF_8)
          p += 4 + len; i += 1
        }
      case 7 => // FIXED_LEN_BYTE_ARRAY: big-endian two's-complement
        // unscaled decimal (the >18-precision DECIMAL physical form);
        // surfaced as the unscaled Long — callers apply the scale
        require(typeLength > 0, "FIXED_LEN_BYTE_ARRAY needs type_length from the schema")
        while (i < n) {
          var v = (b(p) >> 7).toLong // sign-extend from the first byte
          var k = 0
          while (k < typeLength) { v = (v << 8) | (b(p + k) & 0xffL); k += 1 }
          require(typeLength <= 8 || BigInt(java.util.Arrays.copyOfRange(b, p, p + typeLength)).isValidLong,
            "FLBA decimal exceeds Long unscaled range")
          out(i) = v; p += typeLength; i += 1
        }
      case t => throw new IllegalArgumentException(
        s"unsupported physical type ${ParquetFooter.TypeNames.lift(t).getOrElse(t.toString)}")
    }
    out
  }

  /** Decode one flat column chunk of `columnPath` in row group `rgi`.
    * `maxDef` is 1 for OPTIONAL leaves, 0 for REQUIRED (from the footer
    * schema); repeated fields are rejected upstream. */
  def readChunk(conf: org.apache.hadoop.conf.Configuration, path: String,
                meta: ParquetFooter.ColumnMeta, maxDef: Int,
                typeLength: Int = 0): DecodedChunk = {
    require(meta.numValues >= 0 && meta.numValues <= Int.MaxValue,
      s"implausible chunk value count ${meta.numValues}")
    require(meta.totalCompressedSize > 0 && meta.totalCompressedSize <= (1L << 31) - 1,
      s"implausible chunk size ${meta.totalCompressedSize}")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val start = meta.dictionaryPageOffset.getOrElse(meta.dataPageOffset)
    val chunkBytes = new Array[Byte](meta.totalCompressedSize.toInt)
    val in = fs.open(p)
    try in.readFully(start, chunkBytes, 0, chunkBytes.length) finally in.close()

    var off = 0
    var dict: Array[Any] = null
    val out = new Array[Any](meta.numValues.toInt)
    var filled = 0
    while (filled < meta.numValues) {
      require(off < chunkBytes.length, "chunk exhausted before all values decoded")
      val hdrWindow = java.util.Arrays.copyOfRange(
        chunkBytes, off, math.min(chunkBytes.length, off + 256))
      val ph = parsePageHeader(hdrWindow)
      require(ph.compressedSize >= 0 &&
        off.toLong + ph.headerLen + ph.compressedSize <= chunkBytes.length,
        s"page at $off overruns the chunk (${ph.compressedSize} compressed bytes)")
      require(ph.uncompressedSize >= 0 && ph.uncompressedSize <= (1 << 30),
        s"implausible uncompressed page size ${ph.uncompressedSize}")
      val body = inflatePage(meta.codec, chunkBytes, off + ph.headerLen,
        ph.compressedSize, ph.uncompressedSize)
      require(body.length == ph.uncompressedSize,
        s"page inflated to ${body.length}, header says ${ph.uncompressedSize}")
      off += ph.headerLen + ph.compressedSize
      if (ph.kind == 2) { // dictionary page: PLAIN values
        require(ph.valueEncoding == 0 || ph.valueEncoding == 2,
          s"dictionary page encoding ${ph.valueEncoding} not PLAIN")
        dict = plainValues(meta.typ, body, 0, ph.numValues, typeLength)
      } else {
        // data page v1: [def levels if maxDef>0][values]
        var vp = 0
        val defs: Array[Int] =
          if (maxDef > 0) {
            require(ph.defLevelEncoding == 3, "definition levels must be RLE")
            val rleLen = (body(0) & 0xff) | ((body(1) & 0xff) << 8) |
              ((body(2) & 0xff) << 16) | ((body(3) & 0xff) << 24)
            val (lv, _) = rleHybrid(body, 4, 1, ph.numValues)
            vp = 4 + rleLen
            lv
          } else null
        val nPresent = if (defs == null) ph.numValues else defs.count(_ == 1)
        ph.valueEncoding match {
          case 0 => // PLAIN
            val vs = plainValues(meta.typ, body, vp, nPresent, typeLength)
            var vi = 0; var i = 0
            while (i < ph.numValues) {
              if (defs == null || defs(i) == 1) { out(filled) = vs(vi); vi += 1 }
              filled += 1; i += 1
            }
          case 2 | 8 => // PLAIN_DICTIONARY / RLE_DICTIONARY indices
            require(dict != null, "dictionary-encoded page before dictionary page")
            val bw = body(vp) & 0xff
            val (idx, _) = rleHybrid(body, vp + 1, bw, nPresent)
            var vi = 0; var i = 0
            while (i < ph.numValues) {
              if (defs == null || defs(i) == 1) { out(filled) = dict(idx(vi)); vi += 1 }
              filled += 1; i += 1
            }
          case e => throw new IllegalArgumentException(
            s"unsupported value encoding ${ParquetFooter.EncodingNames.lift(e).getOrElse(e.toString)}")
        }
      }
    }
    DecodedChunk(meta.typ, out)
  }

  /** Max definition level of a FLAT leaf from the footer schema:
    * 1 if the leaf is OPTIONAL, 0 if REQUIRED. Rejects REPEATED and
    * group-nested paths loudly (out of the flat-column scope). */
  private def maxDefOf(fm: ParquetFooter.FileMeta, columnPath: String): (Int, Int) = {
    val leaf = fm.schema.find(_.name == columnPath).getOrElse(
      throw new IllegalArgumentException(s"column $columnPath not in schema"))
    require(leaf.numChildren.forall(_ == 0), s"$columnPath is a group, not a leaf")
    val maxDef = leaf.repetition.getOrElse(0) match {
      case 0 => 0 // REQUIRED
      case 1 => 1 // OPTIONAL
      case r => throw new IllegalArgumentException(
        s"$columnPath has repetition $r (REPEATED) — flat columns only")
    }
    (maxDef, leaf.typeLength.getOrElse(0))
  }

  /** Read two flat columns of every file under `dir` through the hand
    * reader, zipped by row position — one task per file, each decoding
    * its chunks with the repo's own codecs. Output: (file, row_idx,
    * a, b) with the columns surfaced as untyped strings-or-numerics
    * cast by the caller. */
  def scanTwoColumns(spark: SparkSession, dir: String,
                     colA: String, colB: String): DataFrame = {
    val files = ParquetFooter.listDataFiles(spark, dir)
    val parts = math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism))
    val schema = StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("row_idx", LongType, nullable = false),
      StructField("a_long", LongType, nullable = true),
      StructField("a_double", DoubleType, nullable = true),
      StructField("a_string", StringType, nullable = true),
      StructField("b_long", LongType, nullable = true),
      StructField("b_double", DoubleType, nullable = true),
      StructField("b_string", StringType, nullable = true)))
    val rows = spark.sparkContext.parallelize(files, parts).flatMap { case (path, len) =>
      val conf = new org.apache.hadoop.conf.Configuration()
      val fm = ParquetFooter.readFooter(conf, path, len)
      val (defA, tlA) = maxDefOf(fm, colA); val (defB, tlB) = maxDefOf(fm, colB)
      var base = 0L
      fm.rowGroups.flatMap { rg =>
        val ma = rg.columns.flatMap(_.meta).find(_.path == colA).get
        val mb = rg.columns.flatMap(_.meta).find(_.path == colB).get
        val ca = readChunk(conf, path, ma, defA, tlA)
        val cb = readChunk(conf, path, mb, defB, tlB)
        require(ca.values.length == rg.numRows && cb.values.length == rg.numRows,
          "chunk value count != row-group rows (flat column invariant)")
        val rs = (0 until rg.numRows.toInt).map { i =>
          def split(c: DecodedChunk, i: Int): (Any, Any, Any) = c.values(i) match {
            case null => (null, null, null)
            case v: Long => (Long.box(v), null, null)
            case v: Double => (null, Double.box(v), null)
            case v: Boolean => (Long.box(if (v) 1L else 0L), null, null)
            case v: String => (null, null, v)
          }
          val (al, ad, as) = split(ca, i)
          val (bl, bd, bs) = split(cb, i)
          Row(path, base + i, al, ad, as, bl, bd, bs)
        }
        base += rg.numRows
        rs
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
