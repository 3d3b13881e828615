package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.operators.Snappy

/** Hand-written parquet WRITER — the write half of the self-contained
  * parquet stack (footer/stats/pages READ landed in rounds 16-17).
  * Emits spec-conformant files from scratch: V1 PLAIN data pages,
  * RLE/bit-packed definition levels for OPTIONAL columns, per-column
  * chunks, row groups, and the Thrift COMPACT-protocol FileMetaData
  * footer — zero parquet-mr anywhere. Spark's own vectorized reader
  * (an independent implementation) and DuckDB both read the output;
  * the repo's own [[ParquetFooter]]/[[ParquetPages]] complete the
  * three-way cross-check.
  *
  * Scope (loud fences): flat REQUIRED/OPTIONAL columns of
  * BOOLEAN/INT32/INT64/DOUBLE/BYTE_ARRAY(UTF8); PLAIN encoding;
  * UNCOMPRESSED or SNAPPY pages (the repo's own compressor). No
  * dictionary pages, no nested columns, no stats — the honest minimum
  * a re-compaction sink needs, not a parquet-mr replacement.
  *
  * Scale shape: one file per task ([[writeDir]] maps partitions), the
  * column buffers bounded by `rowGroupRows`; nothing shuffles.
  *
  * Reference scope: lithops-dataframe has NO write path at all
  * (`SURVEY.md` §2.1 sinks row); this extends the engine's sink tier
  * the same way the hand reader extends its scan tier.
  */
object ParquetWriter {

  /** Thrift compact-protocol writer — the mirror of
    * [[ParquetFooter.HeaderReader]]. */
  private final class TWriter {
    val out = new java.io.ByteArrayOutputStream(256)
    private var lastId = List(0)

    def varint(v0: Long): Unit = {
      var v = v0
      do {
        val b = (v & 0x7f).toInt
        v >>>= 7
        out.write(if (v != 0) b | 0x80 else b)
      } while (v != 0)
    }
    def zig(v: Long): Unit = varint((v << 1) ^ (v >> 63))

    private def fieldHeader(id: Int, tpe: Int): Unit = {
      val delta = id - lastId.head
      if (delta > 0 && delta <= 15) out.write((delta << 4) | tpe)
      else { out.write(tpe); zig(id.toLong) }
      lastId = id :: lastId.tail
    }
    def structBegin(): Unit = lastId = 0 :: lastId
    def structEnd(): Unit = { out.write(0); lastId = lastId.tail }
    def structField(id: Int): Unit = { fieldHeader(id, 12); structBegin() }
    def i32(id: Int, v: Int): Unit = { fieldHeader(id, 5); zig(v.toLong) }
    def i64(id: Int, v: Long): Unit = { fieldHeader(id, 6); zig(v) }
    def str(id: Int, s: String): Unit =
      listlessBinary(id, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def listlessBinary(id: Int, b: Array[Byte]): Unit = {
      fieldHeader(id, 8)
      varint(b.length.toLong); out.write(b, 0, b.length)
    }
    def listBegin(id: Int, elemType: Int, size: Int): Unit = {
      fieldHeader(id, 9)
      if (size < 15) out.write((size << 4) | elemType)
      else { out.write(0xf0 | elemType); varint(size.toLong) }
    }
    def bytes: Array[Byte] = out.toByteArray
  }

  /** One column's spec: parquet physical type (0 BOOLEAN, 1 INT32,
    * 2 INT64, 5 DOUBLE, 6 BYTE_ARRAY), nullability, and the UTF8
    * converted-type flag for strings. `list = true` writes the
    * standard 3-level LIST shape (`optional group (LIST) { repeated
    * group list { optional T element } }`) — values are Seq[Any] per
    * row (null = null list, elements may be null). */
  final case class ColSpec(name: String, typ: Int, optional: Boolean,
      list: Boolean = false) {
    require(Set(0, 1, 2, 5, 6).contains(typ),
      s"unsupported physical type $typ for the hand writer")
    require(!list || optional, "LIST columns are written as optional groups")
  }

  // ---- page encoding --------------------------------------------------------

  /** PLAIN-encode the PRESENT values of `vals(from until to)`. */
  private def plainEncode(typ: Int, vals: Array[Any], from: Int, to: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(4 * (to - from) + 16)
    def le(v: Long, n: Int): Unit = {
      var k = 0
      while (k < n) { out.write(((v >>> (8 * k)) & 0xff).toInt); k += 1 }
    }
    typ match {
      case 0 =>
        var bit = 0; var acc = 0
        var i = from
        while (i < to) {
          if (vals(i) != null) {
            if (vals(i).asInstanceOf[Boolean]) acc |= 1 << bit
            bit += 1
            if (bit == 8) { out.write(acc); acc = 0; bit = 0 }
          }
          i += 1
        }
        if (bit > 0) out.write(acc)
      case 1 =>
        var i = from
        while (i < to) {
          if (vals(i) != null) le(vals(i) match {
            case v: Int => v.toLong
            case v: Long => v
          }, 4)
          i += 1
        }
      case 2 =>
        var i = from
        while (i < to) { if (vals(i) != null) le(vals(i).asInstanceOf[Long], 8); i += 1 }
      case 5 =>
        var i = from
        while (i < to) {
          if (vals(i) != null)
            le(java.lang.Double.doubleToLongBits(vals(i).asInstanceOf[Double]), 8)
          i += 1
        }
      case 6 =>
        var i = from
        while (i < to) {
          if (vals(i) != null) {
            val b = vals(i).asInstanceOf[String]
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
            le(b.length.toLong, 4); out.write(b, 0, b.length)
          }
          i += 1
        }
    }
    out.toByteArray
  }

  /** A 4-byte-length-prefixed RLE/bit-packed-hybrid level section of
    * arbitrary bit width — one bit-packed run of ceil(n/8) groups (the
    * layout [[ParquetPages.rleHybrid]] reads back). */
  private def levelSection(levels: Array[Int], n: Int, width: Int): Array[Byte] = {
    val groups = (n + 7) / 8
    val hdr = new java.io.ByteArrayOutputStream(5)
    var h = (groups.toLong << 1) | 1L
    do {
      val b = (h & 0x7f).toInt; h >>>= 7
      hdr.write(if (h != 0) b | 0x80 else b)
    } while (h != 0)
    val hb = hdr.toByteArray
    val packed = new Array[Byte](groups * width)
    var bitPos = 0
    var i = 0
    while (i < n) {
      var got = 0
      val v = levels(i)
      while (got < width) {
        val byteI = bitPos >> 3
        val avail = 8 - (bitPos & 7)
        val take = math.min(avail, width - got)
        packed(byteI) = (packed(byteI) |
          (((v >> got) & ((1 << take) - 1)) << (bitPos & 7))).toByte
        got += take; bitPos += take
      }
      i += 1
    }
    val rleLen = hb.length + packed.length
    val out = new Array[Byte](4 + rleLen)
    out(0) = (rleLen & 0xff).toByte
    out(1) = ((rleLen >> 8) & 0xff).toByte
    out(2) = ((rleLen >> 16) & 0xff).toByte
    out(3) = ((rleLen >> 24) & 0xff).toByte
    System.arraycopy(hb, 0, out, 4, hb.length)
    System.arraycopy(packed, 0, out, 4 + hb.length, packed.length)
    out
  }

  /** Definition levels for an OPTIONAL column over `vals(from until
    * to)`: 4-byte-length-prefixed RLE/bit-packed hybrid, width 1,
    * bit-packed groups of 8 (the layout [[ParquetPages.rleHybrid]]
    * reads back). */
  private def defLevels(vals: Array[Any], from: Int, to: Int): Array[Byte] = {
    val n = to - from
    val groups = (n + 7) / 8
    val body = new java.io.ByteArrayOutputStream(groups + 5)
    // varint header: (groups << 1) | 1
    var h = (groups.toLong << 1) | 1L
    do {
      val b = (h & 0x7f).toInt; h >>>= 7
      body.write(if (h != 0) b | 0x80 else b)
    } while (h != 0)
    var acc = 0; var bit = 0
    var i = from
    while (i < to) {
      if (vals(i) != null) acc |= 1 << bit
      bit += 1
      if (bit == 8) { body.write(acc); acc = 0; bit = 0 }
      i += 1
    }
    if (bit > 0) body.write(acc)
    val rle = body.toByteArray
    val out = new Array[Byte](4 + rle.length)
    out(0) = (rle.length & 0xff).toByte
    out(1) = ((rle.length >> 8) & 0xff).toByte
    out(2) = ((rle.length >> 16) & 0xff).toByte
    out(3) = ((rle.length >> 24) & 0xff).toByte
    System.arraycopy(rle, 0, out, 4, rle.length)
    out
  }

  // ---- file assembly ---------------------------------------------------------

  /** Build a complete parquet file in memory. `cols(c)._2` holds one
    * Any per row (null = SQL null; requires the column be optional). */
  def writeBytes(cols: Seq[(ColSpec, Array[Any])], numRows: Int,
      codec: Int = 0, pageRows: Int = 20000,
      rowGroupRows: Int = 1 << 20): Array[Byte] = {
    require(cols.nonEmpty, "no columns")
    require(codec == 0 || codec == 1, "hand writer codecs: UNCOMPRESSED or SNAPPY")
    require(pageRows > 0 && rowGroupRows > 0, "positive page/row-group sizes")
    cols.foreach { case (spec, vals) =>
      require(vals.length == numRows, s"${spec.name}: ${vals.length} values for $numRows rows")
      require(spec.optional || vals.forall(_ != null),
        s"${spec.name} is REQUIRED but carries nulls")
    }
    val out = new java.io.ByteArrayOutputStream(1 << 16)
    out.write('P'); out.write('A'); out.write('R'); out.write('1')

    // (colIdx -> (dataPageOffset, compressedSize, uncompressedSize)) per row group
    final case class ChunkInfo(offset: Long, compressed: Long, uncompressed: Long,
        numValues: Long, nullCount: Long,
        minBytes: Option[Array[Byte]], maxBytes: Option[Array[Byte]])

    // PLAIN value encoding of a single stat value (the form statLong/
    // statDouble/statString decode back — LE numerics, raw UTF8 bytes)
    def statBytes(typ: Int, v: Any): Array[Byte] = typ match {
      case 0 => Array[Byte](if (v.asInstanceOf[Boolean]) 1 else 0)
      case 1 =>
        val x = v match { case i: Int => i.toLong; case l: Long => l }
        Array.tabulate(4)(k => ((x >>> (8 * k)) & 0xff).toByte)
      case 2 =>
        val x = v.asInstanceOf[Long]
        Array.tabulate(8)(k => ((x >>> (8 * k)) & 0xff).toByte)
      case 5 =>
        val x = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
        Array.tabulate(8)(k => ((x >>> (8 * k)) & 0xff).toByte)
      case _ => v.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
    }
    def statOrder(typ: Int): Ordering[Any] = typ match {
      case 0 => Ordering.by((a: Any) => a.asInstanceOf[Boolean])
      case 1 => Ordering.by((a: Any) => a match { case i: Int => i.toLong; case l: Long => l })
      case 2 => Ordering.by((a: Any) => a.asInstanceOf[Long])
      case 5 => Ordering.by((a: Any) => a.asInstanceOf[Double])
      case _ => Ordering.by((a: Any) => a.asInstanceOf[String])
    }
    val groups = Seq.newBuilder[(Seq[ChunkInfo], Int)] // (chunks, rows)

    var rgStart = 0
    while (rgStart < numRows) {
      val rgEnd = math.min(numRows, rgStart + rowGroupRows)
      val chunks = cols.map { case (spec, vals) =>
        val chunkOffset = out.size().toLong
        var comp = 0L
        var uncomp = 0L
        var totalEntries = 0L
        def emitPage(raw: Array[Byte], numValues: Int): Unit = {
          val body = if (codec == 1) Snappy.compress(raw) else raw
          val ph = new TWriter
          ph.structBegin()
          ph.i32(1, 0) // type = DATA_PAGE
          ph.i32(2, raw.length) // uncompressed_page_size
          ph.i32(3, body.length) // compressed_page_size
          ph.structField(5) // DataPageHeader
          ph.i32(1, numValues)
          ph.i32(2, 0) // encoding = PLAIN
          ph.i32(3, 3) // definition_level_encoding = RLE
          ph.i32(4, 3) // repetition_level_encoding = RLE
          ph.structEnd()
          ph.structEnd()
          val hb = ph.bytes
          out.write(hb, 0, hb.length)
          out.write(body, 0, body.length)
          comp += hb.length + body.length
          uncomp += hb.length + raw.length
          totalEntries += numValues
        }
        var p = rgStart
        while (p < rgEnd) {
          val pEnd = math.min(rgEnd, p + pageRows)
          if (spec.list) {
            // 3-level LIST page: rep + def level sections (widths 1/2)
            // then the PLAIN-encoded present elements. One level entry
            // per element, or one per null/empty list.
            val reps = new scala.collection.mutable.ArrayBuffer[Int]
            val defs = new scala.collection.mutable.ArrayBuffer[Int]
            val elems = new scala.collection.mutable.ArrayBuffer[Any]
            var i = p
            while (i < pEnd) {
              vals(i) match {
                case null => reps += 0; defs += 0
                case s: scala.collection.Seq[_] if s.isEmpty => reps += 0; defs += 1
                case s: scala.collection.Seq[_] =>
                  var j = 0
                  s.foreach { e =>
                    reps += (if (j == 0) 0 else 1)
                    if (e == null) defs += 2 else { defs += 3; elems += e }
                    j += 1
                  }
                case other => throw new IllegalArgumentException(
                  s"${spec.name}: LIST column row is ${other.getClass.getName}, not a Seq")
              }
              i += 1
            }
            val repSec = levelSection(reps.toArray, reps.length, 1)
            val defSec = levelSection(defs.toArray, defs.length, 2)
            val plain = plainEncode(spec.typ, elems.toArray, 0, elems.length)
            val raw = new Array[Byte](repSec.length + defSec.length + plain.length)
            System.arraycopy(repSec, 0, raw, 0, repSec.length)
            System.arraycopy(defSec, 0, raw, repSec.length, defSec.length)
            System.arraycopy(plain, 0, raw, repSec.length + defSec.length, plain.length)
            emitPage(raw, reps.length)
          } else {
            val defs = if (spec.optional) defLevels(vals, p, pEnd) else Array.emptyByteArray
            val plain = plainEncode(spec.typ, vals, p, pEnd)
            val raw = new Array[Byte](defs.length + plain.length)
            System.arraycopy(defs, 0, raw, 0, defs.length)
            System.arraycopy(plain, 0, raw, defs.length, plain.length)
            emitPage(raw, pEnd - p)
          }
          p = pEnd
        }
        if (spec.list)
          ChunkInfo(chunkOffset, comp, uncomp, totalEntries, -1L, None, None)
        else {
          // chunk stats: min/max over present values, null count
          var nulls = 0L
          var mn: Any = null
          var mx: Any = null
          val ord = statOrder(spec.typ)
          var i = rgStart
          while (i < rgEnd) {
            val v = vals(i)
            if (v == null) nulls += 1
            else {
              if (mn == null || ord.lt(v, mn)) mn = v
              if (mx == null || ord.gt(v, mx)) mx = v
            }
            i += 1
          }
          ChunkInfo(chunkOffset, comp, uncomp, (rgEnd - rgStart).toLong, nulls,
            Option(mn).map(statBytes(spec.typ, _)),
            Option(mx).map(statBytes(spec.typ, _)))
        }
      }
      groups += ((chunks, rgEnd - rgStart))
      rgStart = rgEnd
    }

    // ---- footer ----
    val f = new TWriter
    f.structBegin()
    f.i32(1, 1) // version
    val nSchemaElems = 1 + cols.map { case (s, _) => if (s.list) 3 else 1 }.sum
    f.listBegin(2, 12, nSchemaElems) // schema
    // root
    f.structBegin()
    f.str(4, "graft_schema")
    f.i32(5, cols.size) // num_children
    f.structEnd()
    cols.foreach { case (spec, _) =>
      if (spec.list) {
        // optional group <name> (LIST) { repeated group list { optional T element } }
        f.structBegin()
        f.i32(3, 1); f.str(4, spec.name); f.i32(5, 1); f.i32(6, 3) // LIST
        f.structEnd()
        f.structBegin()
        f.i32(3, 2); f.str(4, "list"); f.i32(5, 1)
        f.structEnd()
        f.structBegin()
        f.i32(1, spec.typ); f.i32(3, 1); f.str(4, "element")
        if (spec.typ == 6) f.i32(6, 0)
        f.structEnd()
      } else {
        f.structBegin()
        f.i32(1, spec.typ)
        f.i32(3, if (spec.optional) 1 else 0) // repetition
        f.str(4, spec.name)
        if (spec.typ == 6) f.i32(6, 0) // converted_type UTF8
        f.structEnd()
      }
    }
    f.i64(3, numRows.toLong)
    val built = groups.result()
    f.listBegin(4, 12, built.size) // row_groups
    built.foreach { case (chunks, rows) =>
      f.structBegin()
      f.listBegin(1, 12, chunks.size) // columns
      chunks.zip(cols).foreach { case (ci, (spec, _)) =>
        f.structBegin()
        f.i64(2, ci.offset) // file_offset
        f.structField(3) // ColumnMetaData
        f.i32(1, spec.typ)
        f.listBegin(2, 5, 2); f.zig(0L); f.zig(3L) // encodings: PLAIN, RLE
        val pathParts =
          if (spec.list) Seq(spec.name, "list", "element") else Seq(spec.name)
        f.listBegin(3, 8, pathParts.size) // path_in_schema
        pathParts.foreach { part =>
          val nb = part.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          f.varint(nb.length.toLong); f.out.write(nb, 0, nb.length)
        }
        f.i32(4, codec)
        f.i64(5, ci.numValues)
        f.i64(6, ci.uncompressed)
        f.i64(7, ci.compressed)
        f.i64(9, ci.offset) // data_page_offset
        if (ci.nullCount >= 0L) { // flat columns carry stats; lists don't
          f.structField(12) // Statistics
          f.i64(3, ci.nullCount)
          ci.maxBytes.foreach { b =>
            f.listlessBinary(5, b) // max_value (modern signed-ordered field)
          }
          ci.minBytes.foreach { b =>
            f.listlessBinary(6, b) // min_value
          }
          f.structEnd()
        }
        f.structEnd()
        f.structEnd()
      }
      f.i64(2, chunks.map(_.uncompressed).sum) // total_byte_size
      f.i64(3, rows.toLong)
      f.structEnd()
    }
    f.str(6, "graft hand writer")
    f.structEnd()
    val fb = f.bytes
    out.write(fb, 0, fb.length)
    out.write(fb.length & 0xff); out.write((fb.length >> 8) & 0xff)
    out.write((fb.length >> 16) & 0xff); out.write((fb.length >> 24) & 0xff)
    out.write('P'); out.write('A'); out.write('R'); out.write('1')
    out.toByteArray
  }

  private def physicalType(dt: DataType): Int = dt match {
    case BooleanType => 0
    case IntegerType => 1
    case LongType => 2
    case DoubleType => 5
    case StringType => 6
    case other => throw new IllegalArgumentException(
      s"hand writer does not support Spark type $other")
  }

  /** Write `df` as hand-built parquet files under `dir` — one file per
    * partition, written through the Hadoop FS (the task-parallel sink
    * shape). Returns the file count. */
  def writeDir(df: DataFrame, dir: String, codec: Int = 0,
      pageRows: Int = 20000): Int = {
    val schema = df.schema
    val specs = schema.fields.map { fd =>
      fd.dataType match {
        case ArrayType(et, _) =>
          ColSpec(fd.name, physicalType(et), optional = true, list = true)
        case dt => ColSpec(fd.name, physicalType(dt), fd.nullable)
      }
    }.toSeq
    val n = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val rows = it.toArray
      val cols = specs.zipWithIndex.map { case (spec, c) =>
        val vals = new Array[Any](rows.length)
        var i = 0
        while (i < rows.length) { vals(i) = if (rows(i).isNullAt(c)) null else rows(i).get(c); i += 1 }
        (spec, vals)
      }
      val bytes = writeBytes(cols, rows.length, codec, pageRows)
      val path = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.parquet")
      val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
      val os = fs.create(path, true)
      try os.write(bytes) finally os.close()
      Iterator.single(1)
    }.sum().toInt
    n
  }
}
