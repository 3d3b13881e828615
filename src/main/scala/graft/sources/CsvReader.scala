package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** pandas-`read_csv`-flavored CSV source over `spark.read.csv`
  * (reference: dataframe/io.py:13-88 — the module's entire public surface,
  * dataframe/__init__.py:1).
  *
  * Option mapping (reference kwarg → Spark):
  *  - `sep`/`delimiter` → `sep`
  *  - `header`          → `header` (None → false + `names` required, as in
  *                        the reference's own smoke test, test_df.py:14-15)
  *  - `names`           → post-read rename of `_c0..` (keeps inference) or
  *                        explicit schema when `dtype` is also given
  *  - `usecols`         → `.select(...)` (column pruning reaches the scan
  *                        via Catalyst, io.py:21's scan-time pruning)
  *  - `dtype`           → explicit `StructType` / post-read casts
  *  - `na_values`       → `nullValue`
  *  - `parse_dates`     → post-read `to_timestamp` casts (io.py:42-47)
  *  - `sample=250000` bytes (io.py:72) → `samplingRatio` (row fraction —
  *    Spark's schema inference is already a sampled pass)
  *  - `npartitions` (io.py:73) → `repartition(n)`; at scale prefer leaving
  *    split planning to `spark.sql.files.maxPartitionBytes`
  *  - `compression`/`encoding`/`quotechar`/`escapechar`/`comment` → same-
  *    named Spark options; object-store URL schemes (io.py:80-81) are
  *    Hadoop FileSystem URIs (`s3a://…`) — no custom parsing needed.
  *  - `skiprows=N` → Spark CSV has no skip option, so the file is read
  *    as lines, the first N dropped by line index (`zipWithIndex` — a
  *    per-partition line-count job, no shuffle), and the remainder
  *    parsed via `csv(Dataset[String])`; `header` then applies to the
  *    first KEPT line, as in pandas. This path decodes through the text
  *    reader (UTF-8).
  *  - `skipfooter=N` → drop the last N file lines. Needs the total
  *    line count, so it costs ONE extra counting job over the text —
  *    the same whole-file buffering pandas' python engine does for this
  *    option; leave it 0 on data too big to pay that.
  *  - `dayfirst` → pandas' hint for ambiguous slashed/dashed dates
  *    ("03/02/21" = Feb 3). Applied in `parse_dates` as a
  *    day-first-format parse chain (slash, dash, then ISO fallback);
  *    an explicit `timestampFormat` always wins.
  *  - `decimal` / `thousands` → pandas applies these during numeric
  *    parse; Spark's parser and inference know neither, and inference
  *    would silently MISparse "1.234" (thousands='.') as 1.234. So when
  *    either is set, inference is disabled and the separators are
  *    stripped/normalized post-read on the columns `dtype` declares
  *    numeric, then cast. Columns not covered by `dtype` come back as
  *    raw strings (pandas parity for separator-formatted numerics
  *    REQUIRES dtype — pinned in CsvReaderSpec).
  *
  * Unlike the reference, which re-parses chunk byte-ranges with a bare
  * `pd.read_csv` and mis-reads headers on non-first chunks
  * (core.py:254-255 + io.py:17-18), Spark's text input splits are
  * header-aware — results are independent of partitioning.
  */
final case class CsvOptions(
    sep: String = ",",
    header: Boolean = true,
    names: Seq[String] = Nil,
    usecols: Seq[String] = Nil,
    dtype: Map[String, DataType] = Map.empty,
    naValues: Seq[String] = Nil,
    parseDates: Seq[String] = Nil,
    timestampFormat: Option[String] = None,
    inferSchema: Boolean = true,
    samplingRatio: Double = 1.0,
    npartitions: Option[Int] = None,
    encoding: String = "UTF-8",
    quote: String = "\"",
    escape: String = "\\",
    comment: Option[String] = None,
    mode: String = "PERMISSIVE",
    // pandas `converters` (io.py:30): per-column post-read transform —
    // a Column expression, not an opaque closure, so it stays codegen'd
    converters: Map[String, org.apache.spark.sql.Column => org.apache.spark.sql.Column] =
      Map.empty,
    // pandas `nrows`: cap rows read (a LIMIT — pushes into the scan)
    nrows: Option[Int] = None,
    // pandas `skiprows` (int form): drop the first N file lines before
    // header detection
    skiprows: Int = 0,
    // pandas `skipfooter`: drop the last N file lines (costs a count
    // job — see header doc)
    skipfooter: Int = 0,
    // pandas `dayfirst`: day-before-month for ambiguous parse_dates
    dayfirst: Boolean = false,
    // pandas `decimal` / `thousands`: numeric separator characters —
    // effective on dtype-declared numeric columns (see header doc)
    decimal: String = ".",
    thousands: Option[String] = None,
    // pandas `index_col` (io.py:19): Spark frames have no index, so the
    // named column is VALIDATED and moved to the front — the
    // `reset_index()` shape of the same frame (documented divergence,
    // same spirit as the `names` rightmost-binding rule)
    indexCol: Option[String] = None,
    // pandas `true_values`/`false_values` (io.py:29-30): sentinel
    // strings parsed as booleans. Effective on dtype-declared
    // BooleanType columns (the decimal/thousands rule: cross-engine
    // sentinel parsing REQUIRES dtype); unmatched cells become null
    trueValues: Seq[String] = Nil,
    falseValues: Seq[String] = Nil,
    // pandas `skipinitialspace` (io.py:31): skip spaces after the
    // delimiter (Spark's ignoreLeadingWhiteSpace, off by default on
    // read — same default as pandas)
    skipinitialspace: Boolean = false,
    // pandas `skip_blank_lines` (io.py:40, default true): when FALSE,
    // blank lines become all-null rows (pandas' NaN rows); when true
    // they are dropped (Spark's own default behavior)
    skipBlankLines: Boolean = true,
    // pandas `lineterminator` (io.py:54): explicit line separator
    // (Spark's lineSep; None = auto-detect \r, \r\n, \n)
    lineterminator: Option[String] = None,
    // pandas `quoting` (io.py:56): "minimal" (default — quotes are
    // processed) or "none" (csv.QUOTE_NONE: quote chars are plain data)
    quoting: String = "minimal",
    // pandas `doublequote` (io.py:57, default True): "" inside a quoted
    // field is an escaped quote — ON by default for pandas/RFC-4180
    // parity (overrides `escape` with the quote char). Files written by
    // Spark's own CSV writer backslash-escape quotes instead: pass
    // doublequote=false (plus `escape`) to read those back.
    doublequote: Boolean = true)

object CsvReader {

  /** pandas `mangle_dupe_cols` (io.py:24 inherits it from `pd.read_csv`;
    * always-on in modern pandas): duplicate names become `x`, `x.1`,
    * `x.2`, …, and a mangled name that collides with a LATER literal
    * name keeps incrementing (`["a","a","a.1"]` → `a, a.1, a.1.1` —
    * pandas' `maybe_dedup_names` truth table, pinned in CsvReaderSpec). */
  def mangleDupeCols(names: Seq[String]): Seq[String] = {
    val counts = scala.collection.mutable.Map.empty[String, Int]
    val used = scala.collection.mutable.Set.empty[String]
    names.map { n =>
      if (!used.contains(n)) { used += n; n }
      else {
        var k = counts.getOrElse(n, 0) + 1
        while (used.contains(s"$n.$k")) k += 1
        counts(n) = k
        val m = s"$n.$k"
        used += m
        m
      }
    }
  }

  /** Bind user `names` to file columns, pandas-style: names attach to
    * the RIGHTMOST columns (pandas turns the leading unnamed columns
    * into the index; Spark has no index, so they keep their inferred
    * names — the one documented divergence). More names than columns is
    * an error, as in pandas. */
  private[sources] def bindNames(fileCols: Seq[String], names: Seq[String]): Seq[String] = {
    require(names.length <= fileCols.length,
      s"Too many columns specified: expected at most ${fileCols.length} names, " +
        s"got ${names.length}")
    fileCols.dropRight(names.length) ++ mangleDupeCols(names)
  }

  def readCsv(spark: SparkSession, path: String, opts: CsvOptions = CsvOptions()): DataFrame = {
    require(opts.skiprows >= 0, s"skiprows must be >= 0, got ${opts.skiprows}")
    require(opts.skipfooter >= 0, s"skipfooter must be >= 0, got ${opts.skipfooter}")
    require(opts.decimal.length == 1, s"decimal must be one char, got '${opts.decimal}'")
    opts.thousands.foreach(t =>
      require(t.length == 1 && t != opts.decimal,
        s"thousands must be one char distinct from decimal, got '$t'"))
    require(opts.quoting == "minimal" || opts.quoting == "none",
      s"quoting must be 'minimal' or 'none', got '${opts.quoting}'")
    require(opts.trueValues.intersect(opts.falseValues).isEmpty,
      "true_values and false_values must be disjoint")
    // decimal/thousands: the parser and schema inference know neither
    // separator, so the clean-then-cast rewrite below owns the numeric
    // conversion and inference must not pre-empt it with a misparse.
    val needsClean = opts.decimal != "." || opts.thousands.isDefined
    // skiprows/skipfooter: drop lines by global line index, then parse
    // the remainder as CSV. zipWithIndex costs one per-partition
    // line-count pass (no shuffle); text-file splits keep line order.
    // skipfooter additionally needs the TOTAL count — one more job.
    val skipped: Option[org.apache.spark.sql.Dataset[String]] =
      if (opts.skiprows == 0 && opts.skipfooter == 0 && opts.skipBlankLines) None
      else {
        val lines = spark.read.textFile(path).rdd.zipWithIndex()
        val upper: Long =
          if (opts.skipfooter == 0) Long.MaxValue
          else lines.count() - opts.skipfooter
        var kept = lines
          .filter { case (_, i) => i >= opts.skiprows && i < upper }
          .map(_._1)
        if (!opts.skipBlankLines) {
          // pandas skip_blank_lines=False: a blank line is an all-null
          // row. Rewrite it as (ncols−1) bare separators — the parser
          // reads empty unquoted cells as null. ncols comes from the
          // first non-blank line (assumes no quoted separators there —
          // headers in practice never quote the delimiter). Blank lines
          // BEFORE that first non-blank line are dropped, as pandas
          // always skips blanks preceding the header.
          val sepQ = java.util.regex.Pattern.quote(opts.sep)
          val indexed = kept.zipWithIndex()
          val nonBlank = indexed.filter { case (l, _) => l.trim.nonEmpty }
          require(!nonBlank.isEmpty(),
            "skip_blank_lines=false: file has no non-blank lines after skiprows")
          val (firstLine, firstIdx) = nonBlank.first()
          val ncols = firstLine.split(sepQ, -1).length
          val nullLine = opts.sep * (ncols - 1)
          kept = indexed.flatMap { case (l, i) =>
            if (l.trim.nonEmpty) Some(l)
            else if (i < firstIdx) None // pre-header blank: always skipped
            else Some(nullLine)
          }
        }
        Some(spark.createDataset(kept)(org.apache.spark.sql.Encoders.STRING))
      }
    def load(rr: org.apache.spark.sql.DataFrameReader): DataFrame =
      skipped.map(rr.csv).getOrElse(rr.csv(path))
    var r = spark.read
      .option("sep", opts.sep)
      .option("header", opts.header.toString)
      .option("encoding", opts.encoding)
      // quoting='none' (csv.QUOTE_NONE): quote chars are plain data —
      // a NUL quote char can never match; doublequote: RFC-4180 ""
      // escaping = escape char IS the quote char
      .option("quote", if (opts.quoting == "none") "\u0000" else opts.quote)
      .option("escape", if (opts.doublequote) opts.quote else opts.escape)
      .option("ignoreLeadingWhiteSpace", opts.skipinitialspace.toString)
      .option("mode", opts.mode)
      .option("samplingRatio", opts.samplingRatio.toString)
    opts.lineterminator.foreach(l => r = r.option("lineSep", l))
    opts.comment.foreach(c => r = r.option("comment", c))
    opts.timestampFormat.foreach(f => r = r.option("timestampFormat", f))
    // pandas accepts a LIST of na_values (io.py:33); Spark's `nullValue`
    // is a single string. First sentinel goes to the reader; the rest are
    // nulled post-read (see below).
    if (opts.naValues.nonEmpty) r = r.option("nullValue", opts.naValues.head)

    // The explicit-schema fast path hands numeric types to the PARSER,
    // which nulls separator-formatted cells ("1,5" as double) in
    // PERMISSIVE mode — so it is disabled when cleaning is needed, and
    // likewise when boolean sentinels must be mapped post-read (the
    // parser would null "yes" in a BooleanType column).
    val needsBool = (opts.trueValues.nonEmpty || opts.falseValues.nonEmpty) &&
      opts.dtype.values.exists(_ == BooleanType)
    val fullDtype = opts.names.nonEmpty && opts.dtype.nonEmpty &&
      opts.names.forall(opts.dtype.contains) && !needsClean && !needsBool
    var df =
      if (fullDtype) {
        // Explicit schema: skips the inference pass entirely (fast path).
        // Binds LEFT-to-right and assumes `names` covers every file
        // column (duplicate names are mangled; dtype is looked up by the
        // pre-mangle name, positionally).
        val mangled = mangleDupeCols(opts.names)
        val schema = StructType(opts.names.zip(mangled).map { case (orig, m) =>
          StructField(m, opts.dtype(orig), nullable = true)
        })
        load(r.schema(schema))
      } else {
        val inferred = load(
          r.option("inferSchema", (opts.inferSchema && !needsClean).toString))
        if (opts.names.nonEmpty)
          inferred.toDF(bindNames(inferred.columns.toSeq, opts.names): _*)
        else inferred
      }

    // Remaining na_values sentinels → null. With an explicit schema the
    // PERMISSIVE reader already nulls unparseable cells, so only string
    // columns can still carry sentinels; with inference, a sentinel in a
    // numeric column forces StringType (pass dtype= to recover the
    // numeric type — the cast below happens after this rewrite).
    if (opts.naValues.size > 1) {
      val rest = opts.naValues.tail
      df = df.select(df.schema.fields.map { f =>
        if (f.dataType == StringType)
          when(col(f.name).isin(rest: _*), lit(null)).otherwise(col(f.name)).as(f.name)
        else col(f.name)
      }.toSeq: _*)
    }

    // Numeric separator normalization: strip thousands, then swap the
    // decimal char for '.', then cast — on dtype-declared numerics only.
    def cleanNumeric(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val noTh = opts.thousands.fold(c)(t =>
        regexp_replace(c, java.util.regex.Pattern.quote(t), ""))
      if (opts.decimal == ".") noTh
      else regexp_replace(noTh, java.util.regex.Pattern.quote(opts.decimal), ".")
    }
    if (!fullDtype && opts.dtype.nonEmpty)
      df = df.select(df.columns.map { c =>
        opts.dtype.get(c) match {
          case Some(t: NumericType) if needsClean => cleanNumeric(col(c)).cast(t).as(c)
          case Some(BooleanType) if needsBool =>
            // true_values/false_values sentinel mapping (io.py:29-30):
            // sentinel hits win; anything else is null (the PERMISSIVE
            // convention — and ANSI-safe: no string→boolean cast ever
            // runs on non-sentinel data)
            when(col(c).isin(opts.trueValues.map(lit): _*), lit(true))
              .when(col(c).isin(opts.falseValues.map(lit): _*), lit(false))
              .otherwise(lit(null).cast(BooleanType)).as(c)
          case Some(t) => col(c).cast(t).as(c)
          case None => col(c)
        }
      }.toSeq: _*)
    opts.parseDates.foreach { c =>
      df = df.withColumn(c, opts.timestampFormat
        .map(f => to_timestamp(col(c), f))
        .getOrElse(
          if (opts.dayfirst)
            // day-first chain: slashed, dashed (with and without time),
            // 2-digit-year variants (strict 'yyyy' needs 4 digits, so
            // '03/02/21' falls through to 'd/M/yy' → Feb 3 2021; 'yy'
            // pivots at 2000-2099 where pandas pivots at 69 — dates
            // that old should use 4-digit years), then the ISO default.
            // try_to_timestamp, not to_timestamp: under ANSI (Spark 4
            // default) a non-matching format THROWS instead of
            // yielding null, which would kill the chain on the first
            // row that needs a later format.
            coalesce(
              try_to_timestamp(col(c), lit("d/M/yyyy H:mm:ss")),
              try_to_timestamp(col(c), lit("d/M/yyyy")),
              try_to_timestamp(col(c), lit("d-M-yyyy H:mm:ss")),
              try_to_timestamp(col(c), lit("d-M-yyyy")),
              try_to_timestamp(col(c), lit("d/M/yy")),
              try_to_timestamp(col(c), lit("d-M-yy")),
              try_to_timestamp(col(c)))
          else to_timestamp(col(c))))
    }
    opts.converters.foreach { case (c, f) => df = df.withColumn(c, f(col(c))) }
    opts.nrows.foreach(n => df = df.limit(n))
    if (opts.usecols.nonEmpty) df = df.select(opts.usecols.map(col): _*)
    // index_col: Spark has no index — validate and surface the column
    // FIRST (the reset_index() shape; see CsvOptions doc)
    opts.indexCol.foreach { ic =>
      require(df.columns.contains(ic),
        s"index_col '$ic' is not a column (have: ${df.columns.mkString(", ")})")
      df = df.select(col(ic) +: df.columns.filterNot(_ == ic).map(col).toSeq: _*)
    }
    // The reference's `npartitions` means "number of read chunks"
    // (io.py:73), not "shuffle everything". Reducing → shuffle-free
    // coalesce; increasing → repartition (unavoidable shuffle, explicit
    // user request). At scale prefer spark.sql.files.maxPartitionBytes
    // to control read width instead.
    opts.npartitions match {
      case Some(n) =>
        // current count computed only when asked for — df.rdd forces
        // physical planning, which the npartitions=None path must skip
        val cur = df.rdd.getNumPartitions
        if (n == cur) df
        else if (n < cur) df.coalesce(n)
        else df.repartition(n)
      case None => df
    }
  }
}
