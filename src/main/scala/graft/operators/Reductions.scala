package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.ProductAgg.product

/** The reference's nine named reductions
  * `all/any/sum/prod/max/min/count/mean/std`
  * (reference: dataframe/core.py:264-404) re-expressed as Spark column
  * aggregates with pandas semantics (`skipna`, `min_count`, `ddof`).
  *
  * Execution model: the reference maps a per-chunk pandas reduction over
  * byte-range partitions and (per the blueprint stratum, core.py:15-144)
  * intends a tree combine + final aggregate. Spark's two-phase
  * `HashAggregateExec` (partial per partition → exchange → final) IS that
  * plan, with whole-stage codegen; nothing custom is needed except
  * `product` ([[graft.functions.ProductAgg]]).
  *
  * Scale note: every axis=0 reduction below is a full-table scan with
  * map-side partial aggregation — the shuffle carries exactly one row per
  * partition per column, so these hold at 100 TB unchanged. axis=1
  * reductions are pure row-local expressions (no shuffle at all).
  */
object Reductions {

  /** Numeric columns of a frame, in schema order (pandas reduces over
    * numeric columns by default). */
  def numericCols(df: DataFrame): Seq[String] =
    df.schema.fields.collect {
      case StructField(n, _: NumericType, _, _) => n
    }.toSeq

  private def boolish(df: DataFrame): Seq[String] =
    df.schema.fields.collect {
      case StructField(n, BooleanType, _, _)    => n
      case StructField(n, _: NumericType, _, _) => n
    }.toSeq

  /** pandas `min_count` gate: null out an aggregate computed from fewer
    * than `minCount` non-null values (core.py:290-310 `sum(min_count=)`). */
  private def gated(agg: Column, c: Column, minCount: Int): Column =
    if (minCount <= 0) agg else when(count(c) >= minCount, agg)

  private def requireCols(cs: Seq[String], op: String): Unit =
    require(
      cs.nonEmpty,
      s"$op: no numeric columns to reduce (pass cols= explicitly for non-numeric frames)")

  /** Per-column `sum`. pandas returns 0 for an all-null column when
    * `min_count == 0` — Spark's `sum` returns null — so we coalesce with a
    * zero of the sum's own result type (keeps int64 sums integral, as
    * pandas does for non-empty int columns). */
  def sum0(df: DataFrame, cols: Seq[String] = Nil, minCount: Int = 0): DataFrame = {
    val cs = if (cols.nonEmpty) cols else numericCols(df)
    requireCols(cs, "sum")
    def zero(c: String) = df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType => lit(0L)
      // a decimal zero of the column's own type: a 0.0 double literal
      // would coerce the whole coalesce — every row, not just the
      // all-null fallback — to DoubleType, silently losing precision
      case d: DecimalType => lit(java.math.BigDecimal.ZERO).cast(d)
      case _              => lit(0.0)
    }
    def one(c: String) = gated(coalesce(sum(col(c)), zero(c)), col(c), minCount).as(c)
    df.agg(one(cs.head), cs.tail.map(one): _*)
  }

  /** Per-column `prod` via the native product aggregate. Empty product
    * identity is 1.0 (pandas), gated by `min_count`. */
  def prod0(df: DataFrame, cols: Seq[String] = Nil, minCount: Int = 0): DataFrame = {
    val cs = if (cols.nonEmpty) cols else numericCols(df)
    requireCols(cs, "prod")
    def one(c: String) = gated(coalesce(product(col(c)), lit(1.0)), col(c), minCount).as(c)
    df.agg(one(cs.head), cs.tail.map(one): _*)
  }

  def max0(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val cs = if (cols.nonEmpty) cols else numericCols(df)
    requireCols(cs, "max")
    df.agg(max(cs.head).as(cs.head), cs.tail.map(c => max(c).as(c)): _*)
  }

  def min0(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val cs = if (cols.nonEmpty) cols else numericCols(df)
    requireCols(cs, "min")
    df.agg(min(cs.head).as(cs.head), cs.tail.map(c => min(c).as(c)): _*)
  }

  /** Per-column non-null count (pandas `count`). */
  def count0(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val cs = if (cols.nonEmpty) cols else numericCols(df)
    requireCols(cs, "count")
    df.agg(count(col(cs.head)).as(cs.head), cs.tail.map(c => count(col(c)).as(c)): _*)
  }

  def mean0(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val cs = if (cols.nonEmpty) cols else numericCols(df)
    requireCols(cs, "mean")
    df.agg(avg(cs.head).as(cs.head), cs.tail.map(c => avg(c).as(c)): _*)
  }

  /** Per-column standard deviation with general `ddof` (pandas default
    * ddof=1 == `stddev_samp`; the reference declares the param at
    * core.py:390-404 but its body is buggy — we implement the intent).
    * General ddof is derived from var_samp: M2/(n-ddof) =
    * var_samp*(n-1)/(n-ddof). */
  def std0(df: DataFrame, cols: Seq[String] = Nil, ddof: Int = 1): DataFrame = {
    val cs = if (cols.nonEmpty) cols else numericCols(df)
    requireCols(cs, "std")
    def one(c: String): Column = {
      val base =
        if (ddof == 1) stddev_samp(col(c))
        else if (ddof == 0) stddev_pop(col(c))
        else {
          val n = count(col(c))
          sqrt(var_samp(col(c)) * (n - lit(1)).cast(DoubleType) / (n - lit(ddof)).cast(DoubleType))
        }
      base.as(c)
    }
    df.agg(one(cs.head), cs.tail.map(one): _*)
  }

  /** Per-column conjunction (pandas `all`, skipna: nulls ignored). Spark's
    * `bool_and` ignores nulls natively. Numeric columns are truthy-cast
    * (pandas semantics: nonzero == true). */
  def all0(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val cs = if (cols.nonEmpty) cols else boolish(df)
    requireCols(cs, "all")
    def truthy(c: String) = df.schema(c).dataType match {
      case BooleanType => col(c)
      case _           => col(c) =!= lit(0)
    }
    df.agg(bool_and(truthy(cs.head)).as(cs.head), cs.tail.map(c => bool_and(truthy(c)).as(c)): _*)
  }

  /** Per-column disjunction (pandas `any`). */
  def any0(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val cs = if (cols.nonEmpty) cols else boolish(df)
    requireCols(cs, "any")
    def truthy(c: String) = df.schema(c).dataType match {
      case BooleanType => col(c)
      case _           => col(c) =!= lit(0)
    }
    df.agg(bool_or(truthy(cs.head)).as(cs.head), cs.tail.map(c => bool_or(truthy(c)).as(c)): _*)
  }

  // ---------------------------------------------------------------------
  // axis=1 (row-wise) variants: pure expressions, no shuffle. The
  // reference routes axis=1 through map_partitions (core.py:146-169); in
  // Spark a row-wise reduction is just column arithmetic, which stays in
  // whole-stage codegen.
  // ---------------------------------------------------------------------

  /** Row-wise sum across `cols` with pandas skipna (nulls contribute 0;
    * all-null row yields 0.0). */
  def rowSum(cols: Seq[Column]): Column =
    cols.map(c => coalesce(c.cast(DoubleType), lit(0.0))).reduce(_ + _)

  /** Row-wise non-null count. */
  def rowCount(cols: Seq[Column]): Column =
    cols.map(c => c.isNotNull.cast(LongType)).reduce(_ + _)

  /** Row-wise mean with skipna (null when every value in the row is null). */
  def rowMean(cols: Seq[Column]): Column = {
    val n = rowCount(cols)
    when(n > 0, rowSum(cols) / n.cast(DoubleType))
  }

  /** Row-wise max/min via `greatest`/`least` (null-skipping).
    * `greatest`/`least` require ≥ 2 arguments; a one-column row
    * reduction is the column itself. */
  def rowMax(cols: Seq[Column]): Column =
    if (cols.size == 1) cols.head else greatest(cols: _*)
  def rowMin(cols: Seq[Column]): Column =
    if (cols.size == 1) cols.head else least(cols: _*)
}
