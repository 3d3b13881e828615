package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering for
  * multi-dimensional scan pruning — the table-maintenance step that
  * makes "WHERE x BETWEEN … AND y BETWEEN …" prune row groups at
  * 100 TB. A range-partitioned sort on the interleaved key places
  * rows close in BOTH dimensions into the same files, so parquet
  * min/max statistics cut most of the scan for 2-D selective queries
  * (the same public technique Delta/Iceberg OPTIMIZE ZORDER applies).
  *
  * The z-value is built from plain bitwise Column expressions —
  * whole-stage-codegen folds them into straight-line long arithmetic,
  * no UDF — and the clustering itself is ONE range-partitioned sort,
  * the same shuffle any global sort costs.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * integer columns: bit i of `x` lands at position 2i, bit i of `y`
    * at 2i+1. `bits` ≤ 31 (the result uses 2·bits bits of a long).
    * Inputs must already be bucketed to [0, 2^bits) — callers
    * quantize (e.g. `% (1 << bits)` or a width-based bucket) so the
    * interleave sees the full bit budget. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val xs = x.cast("long")
    val ys = y.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftrightunsigned(xs, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftrightunsigned(ys, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Rewrite `df` into Z-order: compute the interleaved key over the
    * two quantized dimension columns and range-partition + sort by
    * it. One shuffle; the returned frame carries the `zCol` key so
    * writers can drop or keep it. */
  def zorderBy(df: DataFrame, x: Column, y: Column, bits: Int,
      zCol: String = "z"): DataFrame = {
    val keyed = df.withColumn(zCol, zValue(x, y, bits))
    keyed.repartitionByRange(col(zCol)).sortWithinPartitions(col(zCol))
  }
}
