package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (fuzzy) join for entity matching/reconciliation —
  * "the same name, misspelled" is a standard curation join (author
  * names, domains, product titles) that a naive formulation makes a
  * cartesian product of levenshtein calls.
  *
  * Blocking is the PUBLIC deletion-neighborhood scheme (FastSS /
  * SymSpell family): for maxDist = d, each value expands to every
  * string obtainable by deleting up to d characters. COMPLETE by the
  * alignment argument — an optimal edit script of cost ≤ d aligns the
  * two strings with ≤ d unmatched characters per side, so deleting
  * each side's unmatched characters (≤ d deletions each) reaches a
  * common string; hence every true pair shares a block key. SOUND
  * because candidates are re-verified with the real `levenshtein`
  * (Spark's codegen'd built-in) before emission.
  *
  * Scale shape: values are DISTINCT'd first (repeated entities cost
  * once), the variant explode is bounded (≤ 1 + L at d=1,
  * ≤ 1 + L + L² at d=2 — hence the d ≤ 2 cap), candidates come from
  * one equi-join on short string keys, and the verify filter is a
  * row-local expression. No cartesian product anywhere —
  * `PlanAuditSpec` pins it. Variant generation is native
  * `transform`/`sequence`/`substr` expressions (codegen), not a UDF. */
object FuzzyJoin {

  /** All single-character deletions of `s` (empty array for empty
    * input — the sequence(1,0) descending-step trap is guarded). */
  private def delOnce(s: Column): Column =
    when(length(s) <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(s)), i =>
        concat(substr(s, lit(1), i - lit(1)), substr(s, i + lit(1), length(s)))))

  /** The deletion neighborhood of `s` up to depth `d`, distinct,
    * including `s` itself. */
  private[graft] def variants(s: Column, d: Int): Column = d match {
    case 0 => array(s)
    case 1 => array_distinct(concat(array(s), delOnce(s)))
    case _ =>
      val l1 = delOnce(s)
      array_distinct(concat(array(s), l1,
        flatten(transform(l1, v => delOnce(v)))))
  }

  /** All (left value, right value, dist) pairs with
    * `levenshtein ≤ maxDist` between the DISTINCT values of the two
    * columns. Callers carrying ids join back on the value — one cheap
    * equi-join, and repeated values were matched once, not per row. */
  def editDistancePairs(left: DataFrame, leftCol: String,
      right: DataFrame, rightCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist <= 2,
      s"maxDist must be 0..2 (deletion-neighborhood size is ~L^d per value), got $maxDist")
    val l = left.select(col(leftCol).cast("string").as("left_val"))
      .where(col("left_val").isNotNull).distinct()
    val r = right.select(col(rightCol).cast("string").as("right_val"))
      .where(col("right_val").isNotNull).distinct()
    val lv = l.select(col("left_val"),
      explode(variants(col("left_val"), maxDist)).as("__block"))
    val rv = r.select(col("right_val"),
      explode(variants(col("right_val"), maxDist)).as("__block"))
    lv.join(rv, "__block")
      .select("left_val", "right_val").distinct()
      .withColumn("dist", levenshtein(col("left_val"), col("right_val")))
      .where(col("dist") <= maxDist)
  }
}
