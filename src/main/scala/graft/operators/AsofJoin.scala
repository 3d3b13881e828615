package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — pandas `merge_asof` semantics re-expressed as a
  * single shuffle + sort, never a range cross-join.
  *
  * For each LEFT row, find the single RIGHT row with the closest timestamp
  * at-or-before it (`backward`, the pandas default) or at-or-after it
  * (`forward`), matching within `by` groups, and append the right row's
  * value columns.
  *
  * The reference declares `merge` as a required dataframe capability
  * (reference: dataframe/utils.py:323) but ships no join; an as-of join is
  * the canonical extension a time-keyed pipeline needs (the `events`
  * fixture is exactly that shape).
  *
  * Plan shape (the 100 TB contract): tag both sides, union, then ONE hash
  * shuffle on `by` + sort on (`on`, side-tag) inside each partition, then a
  * running `last(value, ignoreNulls)` window. No join node at all — cost is
  * O(n log n) per key-group, vs the O(|L|·|R|) blow-up of the naive
  * `l.ts >= r.ts` range join. Hot `by` keys are the skew caveat; AQE skew
  * handling does not split a single window partition, so extreme single-key
  * skew would need a two-level (coarse-bucketed) variant.
  *
  * Tie semantics: a right row at exactly the left timestamp IS matched
  * (pandas `allow_exact_matches=True`): the side-tag sorts right rows
  * before left rows at equal `on`.
  */
object AsofJoin {

  /** @param valueCols right-side columns to carry to matched left rows
    *                  (must not collide with left column names)
    * @param direction "backward" (right.ts <= left.ts, pandas default) or
    *                  "forward" (right.ts >= left.ts)
    * @param toleranceSeconds if set, a match further than this from the
    *                  left timestamp is nulled out (pandas `tolerance`)
    */
  def mergeAsof(
      left: DataFrame,
      right: DataFrame,
      on: String,
      by: String,
      valueCols: Seq[String],
      direction: String = "backward",
      toleranceSeconds: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val collisions = valueCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"value columns collide with left: $collisions")

    val leftCols = left.columns.toSeq
    // Common layout: by, on, side, every left col, plus ONE struct
    // carrying the whole right row (value cols + right timestamp).
    // A single struct — not per-column fills — so the match has pandas'
    // whole-row semantics: last(ignoreNulls) picks the latest right ROW
    // atomically, and a null INSIDE that row stays null instead of
    // falling through to a value stitched from an older right row.
    val rStructType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(c).copy()) :+
        right.schema(on).copy(name = "__r_on"))
    val lTagged = left.select(
      (leftCols.map(col) :+ lit(1).as("__side")) :+
        lit(null).cast(rStructType).as("__rrow"): _*)
    val rTagged = right.select(
      leftCols.map(c =>
        if (c == on || c == by) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(lit(0).as("__side"),
          struct(valueCols.map(col) :+ col(on).as("__r_on"): _*).as("__rrow")): _*)

    // backward: ascending scan, right-before-left at ties, running last().
    // forward: the same scan mirrored (descending), so "first right row at
    // or after" becomes "last seen" again.
    val ordered =
      if (direction == "backward") Seq(col(on).asc, col("__side").asc)
      else Seq(col(on).desc, col("__side").asc)
    val w = Window.partitionBy(col(by)).orderBy(ordered: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = lTagged.unionByName(rTagged)
      .select(
        (leftCols.map(col) :+ col("__side")) :+
          last(col("__rrow"), ignoreNulls = true).over(w).as("__rrow"): _*)
      .where(col("__side") === 1)

    val matched = toleranceSeconds match {
      case None => filled
      case Some(tol) =>
        // Tolerance nulls the WHOLE matched row (pandas semantics), and
        // the gap is measured against the same row the values come from.
        val gap = abs(col(on).cast("long") - col("__rrow.__r_on").cast("long"))
        filled.withColumn("__rrow", when(gap <= tol, col("__rrow")))
    }
    matched.select(
      leftCols.map(col) ++ valueCols.map(c => col(s"__rrow.$c").as(c)): _*)
  }
}
