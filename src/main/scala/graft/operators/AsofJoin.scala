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

  /** Skew-proof two-level as-of join. [[mergeAsof]] windows on `by`
    * alone, so one hot key (one user generating 1% of a 100 TB event
    * stream) serializes into a single window partition that AQE cannot
    * split. This variant windows on (`by`, coarse time bucket) —
    * parallelism = keys × buckets — then stitches bucket boundaries:
    *
    *  1. within-bucket pass: the same union + running-last window, but
    *     partitioned by (`by`, `floor(on / bucketSeconds)`);
    *  2. per-bucket summary: the boundary right-row of each (key,
    *     bucket) — ONE row per key×bucket, grouped not windowed;
    *  3. carry pass: a running-last window over the summaries (tiny:
    *     |buckets| rows per key) yields each bucket's carry-in — the
    *     match a row would have found in earlier buckets;
    *  4. stitch: `coalesce(within-bucket match, carry-in)`, joined back
    *     on (`by`, bucket) — the big side is already hash-partitioned
    *     on exactly those keys by the window, so no extra exchange.
    *
    * Same results as [[mergeAsof]] (asserted in AsofJoinSpec and by the
    * shared oracle); `bucketSeconds` only tunes parallelism. */
  def mergeAsofBucketed(
      left: DataFrame,
      right: DataFrame,
      on: String,
      by: String,
      valueCols: Seq[String],
      direction: String = "backward",
      toleranceSeconds: Option[Long] = None,
      bucketSeconds: Long = 3600L): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    val collisions = valueCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"value columns collide with left: $collisions")

    val leftCols = left.columns.toSeq
    val rStructType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(c).copy()) :+
        right.schema(on).copy(name = "__r_on"))
    val bucketOf = floor(col(on).cast("long") / bucketSeconds).as("__bucket")
    val lTagged = left.select(
      (leftCols.map(col) :+ lit(1).as("__side")) ++
        Seq(lit(null).cast(rStructType).as("__rrow"), bucketOf): _*)
    val rTagged = right.select(
      leftCols.map(c =>
        if (c == on || c == by) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(lit(0).as("__side"),
          struct(valueCols.map(col) :+ col(on).as("__r_on"): _*).as("__rrow"),
          bucketOf): _*)
    val unioned = lTagged.unionByName(rTagged)

    val backward = direction == "backward"
    val ordered =
      if (backward) Seq(col(on).asc, col("__side").asc)
      else Seq(col(on).desc, col("__side").asc)
    // (1) within-bucket running last — parallel across key×bucket.
    val w1 = Window.partitionBy(col(by), col("__bucket")).orderBy(ordered: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = unioned.select(
      (leftCols.map(col) :+ col("__side") :+ col("__bucket")) :+
        last(col("__rrow"), ignoreNulls = true).over(w1).as("__within"): _*)

    // (2) boundary right-row per (key, bucket): the row the mirrored
    // scan would leave the bucket holding — max `on` for backward, min
    // for forward. A grouped aggregate, so the hot key still fans out.
    // Aggregate over the UNION, not just the right side: a bucket that
    // holds only left rows still needs a spine row (with a null
    // boundary), or its carry-in would be lost in the stitch join.
    // max_by/min_by ignore rows with a null ordering key, so gating the
    // key on __side keeps left rows out of the boundary pick.
    val rOn = when(col("__side") === 0, col(on))
    val boundaryPick =
      if (backward) max_by(col("__rrow"), rOn) else min_by(col("__rrow"), rOn)
    val summaries = unioned
      .groupBy(col(by), col("__bucket"))
      .agg(boundaryPick.as("__blast"))

    // (3) carry-in per bucket = last boundary row of any PRIOR bucket
    // (scan order mirrored for forward). |buckets| rows per key — the
    // only per-key-serial work, and it is tiny by construction.
    val bucketOrder = if (backward) col("__bucket").asc else col("__bucket").desc
    val wCarry = Window.partitionBy(col(by)).orderBy(bucketOrder)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = summaries.select(
      col(by), col("__bucket"),
      last(col("__blast"), ignoreNulls = true).over(wCarry).as("__carry"))

    // (4) stitch. Left join: buckets with no right rows have no carry
    // row. The big side arrives hash-partitioned on (by, bucket) from
    // the w1 exchange, so this adds no exchange on the big side.
    val filled = within
      .where(col("__side") === 1)
      .join(carries, Seq(by, "__bucket"), "left")
      .withColumn("__rrow", coalesce(col("__within"), col("__carry")))

    val matched = toleranceSeconds match {
      case None => filled
      case Some(tol) =>
        val gap = abs(col(on).cast("long") - col("__rrow.__r_on").cast("long"))
        filled.withColumn("__rrow", when(gap <= tol, col("__rrow")))
    }
    matched.select(
      leftCols.map(col) ++ valueCols.map(c => col(s"__rrow.$c").as(c)): _*)
  }
}
