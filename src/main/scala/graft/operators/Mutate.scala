package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-mutation operators — the lakehouse maintenance tier a
  * 100 TB corpus store runs daily: MERGE INTO (upsert with
  * delete-tombstones), CDC changelog application (Debezium-style
  * I/U/D logs), and SCD type-2 dimension history. Reference scope:
  * the reference engine is read-only pandas surface (dataframe/
  * core.py); this is extension-tier, but it is what turns a pile of
  * immutable parquet into a maintainable table.
  *
  * Scale shape: every operator here is ONE key-shuffle join (or
  * window) over the target plus bounded work — no driver loops, no
  * collects, no second pass over the big side. The small side
  * (source batch / changelog / update batch) broadcasts under AQE
  * when it fits, and each operator's output is produced in a single
  * pass (SCD2 uses an explode over per-row output structs rather
  * than unioning three scans of the same join).
  *
  * All semantics are deterministic and oracle-replayable in plain
  * SQL — the `merge_upsert` / `cdc_apply` / `scd2_history` gates.
  */
object Mutate {

  /** MERGE INTO `target` USING `source` ON `keys` (Delta-style,
    * simplified to the deterministic core):
    *  - matched rows take the source's values (WHEN MATCHED UPDATE);
    *  - matched rows where `deleteWhen` (evaluated on the source row)
    *    holds are dropped (WHEN MATCHED AND cond DELETE);
    *  - unmatched source rows insert (WHEN NOT MATCHED INSERT) —
    *    unless `deleteWhen` holds, in which case the row is a
    *    tombstone and is skipped;
    *  - unmatched target rows carry through.
    * `source` must have `target`'s columns and be unique on `keys`
    * (caller contract, as in Delta: a multi-match MERGE is
    * non-deterministic by definition).
    *
    * One full-outer shuffle join on the keys; AQE broadcasts the
    * source side when the batch is small. */
  def mergeInto(target: DataFrame, source: DataFrame, keys: Seq[String],
      deleteWhen: Option[Column] = None): DataFrame = {
    require(keys.nonEmpty, "mergeInto needs at least one key column")
    val missing = target.columns.filterNot(source.columns.contains)
    require(missing.isEmpty, s"source lacks target columns: ${missing.mkString(", ")}")
    val attrs = target.columns.filterNot(keys.contains).toSeq
    val s1 = source.withColumn("_del", deleteWhen.getOrElse(lit(false)))
    val s2 = attrs.foldLeft(s1)((d, c) => d.withColumnRenamed(c, s"_src_$c"))
      .withColumn("_src", lit(1))
      .select((keys.map(col) ++ attrs.map(c => col(s"_src_$c")) ++ Seq(col("_del"), col("_src"))): _*)
    val joined = target.join(s2, keys, "full_outer")
    val resolved = keys.map(col) ++ attrs.map { c =>
      when(col("_src") === 1, col(s"_src_$c")).otherwise(col(c)).as(c)
    }
    joined
      .where(!coalesce(col("_del"), lit(false)))
      .select(resolved: _*)
  }

  /** Apply a CDC changelog to a base table: `log` carries the base's
    * columns plus `opCol` ('I' | 'U' | 'D') and a monotone `seqCol`;
    * per key the HIGHEST seq wins (caller guarantees seq is unique
    * per key — ties are a malformed log). Keys whose final op is 'D'
    * drop; 'I'/'U' upsert the row's values.
    *
    * One window shuffle over the log (keyed, so log-sized not
    * base-sized) + one anti join on the base — the base's payload
    * never moves except for keys the log touches. */
  def applyChangeLog(base: DataFrame, log: DataFrame, keys: Seq[String],
      opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    require(keys.nonEmpty, "applyChangeLog needs at least one key column")
    val missing = base.columns.filterNot(log.columns.contains)
    require(missing.isEmpty, s"log lacks base columns: ${missing.mkString(", ")}")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seqCol).desc)
    val latest = log
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
    val untouched = base.join(latest.select(keys.map(col): _*), keys, "left_anti")
    val upserts = latest
      .where(col(opCol) =!= "D")
      .select(base.columns.map(col).toSeq: _*)
    untouched.unionByName(upserts)
  }

  /** SCD type-2 apply: `hist` is a versioned dimension — `key`,
    * `attrs`, `fromCol`/`toCol` (version interval; `toCol` null on
    * the open version), `currentCol` (boolean) — and `updates` is a
    * batch of new attribute values effective at `ts`:
    *  - a current row whose attrs differ (null-safe compare) from its
    *    update closes (`toCol` = ts, current = false) and a new open
    *    version inserts;
    *  - a current row with no update, or an update equal to the
    *    current values, carries through untouched;
    *  - an update key with no current row inserts a first open
    *    version;
    *  - closed history rows carry through untouched.
    * `updates` must be unique on `key` (caller contract).
    *
    * One full-outer shuffle join of the CURRENT slice against the
    * batch; each joined row emits its 1-2 output rows through one
    * explode — closed history never joins anything. */
  def scd2Apply(hist: DataFrame, updates: DataFrame, key: String, attrs: Seq[String],
      ts: Column, fromCol: String = "valid_from", toCol: String = "valid_to",
      currentCol: String = "is_current"): DataFrame = {
    require(attrs.nonEmpty, "scd2Apply needs at least one tracked attribute")
    val missing = (key +: attrs).filterNot(updates.columns.contains)
    require(missing.isEmpty, s"updates lacks columns: ${missing.mkString(", ")}")
    val cur = hist.where(col(currentCol))
    val closedHist = hist.where(!col(currentCol))
    val u2 = attrs.foldLeft(updates.select((key +: attrs).map(col): _*)) {
      (d, c) => d.withColumnRenamed(c, s"_new_$c")
    }.withColumn("_upd", lit(1))
    val joined = cur.withColumn("_cur", lit(1)).join(u2, Seq(key), "full_outer")
    val differs = attrs.map(c => !(col(c) <=> col(s"_new_$c"))).reduce(_ || _)

    def ver(vals: String => Column, from: Column, to: Column, current: Column) =
      struct((attrs.map(c => vals(c).as(c)) ++
        Seq(from.as(fromCol), to.as(toCol), current.as(currentCol))): _*)

    val curVer = ver(col, col(fromCol), col(toCol), col(currentCol))
    val closedVer = ver(col, col(fromCol), ts, lit(false))
    val newVer = ver(c => col(s"_new_$c"), ts, lit(null).cast(hist.schema(toCol).dataType), lit(true))
    val emitted = joined.select(col(key),
      explode(
        when(col("_cur").isNotNull && col("_upd").isNull, array(curVer))
          .when(col("_cur").isNotNull && col("_upd").isNotNull && !differs, array(curVer))
          .when(col("_cur").isNotNull && col("_upd").isNotNull && differs,
            array(closedVer, newVer))
          .otherwise(array(newVer))
      ).as("_v"))
      .select((col(key) +: (attrs ++ Seq(fromCol, toCol, currentCol)).map(c => col(s"_v.$c"))): _*)
    closedHist.select(emitted.columns.map(col).toSeq: _*).unionByName(emitted)
  }
}
