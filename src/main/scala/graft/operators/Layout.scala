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

  /** Hilbert-curve index of a cell on the 2^bits × 2^bits grid — the
    * space-filling curve with strictly better locality than Morton
    * (every pair of consecutive indexes is an ADJACENT cell; Z-order
    * jumps across the grid at quadrant seams), which is why newer
    * lakehouse clustering (e.g. Databricks liquid clustering, public
    * docs) prefers it over Z-order for multi-dimensional layout.
    *
    * The classic iterative quadrant-rotation algorithm (public, e.g.
    * Wikipedia "Hilbert curve", converted from the C xy2d routine):
    * per bit level s = 2^(bits−1) … 1, accumulate s²·((3·rx) ⊕ ry)
    * and rotate/reflect the remaining coordinates — as the NATIVE
    * [[graft.functions.HilbertIndex]] expression (one codegen loop,
    * O(bits) per row). The earlier pure-Column unrolling doubled the
    * Catalyst tree per bit level (each round references the previous
    * x AND y) and measured 124 s for a 150k-row rewrite at bits = 8;
    * the native loop is the fix, per the codebase's
    * CosineSimilarity/DsirBuckets precedent.
    *
    * Inputs must be bucketed to [0, 2^bits) like [[zValue]]. */
  def hilbertValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    graft.functions.HilbertIndex(x.cast("long"), y.cast("long"), bits)
  }

  /** Scalar mirror of [[hilbertValue]] — the spec's oracle for
    * bijection/adjacency and Column-parity checks. */
  def hilbertD(x: Long, y: Long, bits: Int): Long = {
    val n = 1L << bits
    var (xc, yc, d) = (x, y, 0L)
    var i = bits - 1
    while (i >= 0) {
      val s = 1L << i
      val rx = if ((xc & s) > 0L) 1L else 0L
      val ry = if ((yc & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        val (fx, fy) = if (rx == 1L) (n - 1L - xc, n - 1L - yc) else (xc, yc)
        xc = fy; yc = fx
      }
      i -= 1
    }
    d
  }

  /** Rewrite `df` into Hilbert order — [[zorderBy]]'s shape (one
    * range-partitioned sort) on the Hilbert key. */
  def hilbertBy(df: DataFrame, x: Column, y: Column, bits: Int,
      hCol: String = "h"): DataFrame = {
    val keyed = df.withColumn(hCol, hilbertValue(x, y, bits))
    keyed.repartitionByRange(col(hCol)).sortWithinPartitions(col(hCol))
  }
}
