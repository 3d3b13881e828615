package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Shared guards/derivations for operators that add internal columns. */
private[graft] object OpUtil {

  /** Loud failure when `df` already carries a column an operator needs
    * for itself (silent `withColumn` would clobber user data). */
  def requireNoColumns(df: DataFrame, reserved: Set[String], op: String): Unit = {
    val clash = df.columns.toSet.intersect(reserved)
    require(clash.isEmpty,
      s"$op reserves column name(s) ${clash.mkString(", ")} — rename before calling")
  }

  private def hashUnsupported(dt: DataType): Boolean = dt match {
    case _: MapType => true
    case s: StructType => s.fields.exists(f => hashUnsupported(f.dataType))
    case a: ArrayType => hashUnsupported(a.elementType)
    case _ => false
  }

  /** Deterministic per-row salt in [0, salts): content hash of every
    * hashable column. NEVER `monotonically_increasing_id` — that id is
    * assigned by execution order, so a task retry downstream of an
    * exchange re-salts rows differently and an aggregation/join mixing
    * original and re-executed map output double-counts or loses rows
    * (the SPARK-23207 failure class). A content hash replays
    * identically; fully identical rows share a salt, which only costs
    * balance, never correctness.
    *
    * DEGENERATE CASE (documented contract, silent at runtime): if a hot
    * key's rows are IDENTICAL on the hashed columns — exact-duplicate
    * rows with `saltCols = Nil`, or a `saltCols` subset that is
    * constant within the key — every such row gets the SAME salt and
    * the hot key collapses back into one reducer: the skew returns.
    * Callers with duplicate-heavy data must pass `saltCols` covering a
    * row-distinguishing column (a unique id is ideal; a composite line
    * key works). Detecting this at runtime would need its own grouped
    * count over the data (a shuffle as big as the one being salted), so
    * it is a caller contract, not a check. Map-typed columns (at any
    * nesting) are excluded — `xxhash64` rejects them; if NO column is
    * hashable the salt degrades to a constant (correct, no
    * balancing). */
  def contentSalt(df: DataFrame, salts: Int, saltCols: Seq[String] = Nil): Column = {
    val fields =
      if (saltCols.isEmpty) df.schema.fields.toSeq
      else saltCols.map(n => df.schema(n))
    val hashable = fields
      .filterNot(f => hashUnsupported(f.dataType))
      .map(f => col(s"`${f.name}`"))
    if (hashable.isEmpty) lit(0L)
    else pmod(xxhash64(hashable: _*), lit(salts.toLong))
  }
}
