package graft.operators

import scala.reflect.ClassTag

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Row}
import org.apache.spark.sql.functions.col

/** The reference's UDF surface: per-row `apply(func, axis=1)`
  * (reference: dataframe/core.py:171-262), per-partition `map_partitions`
  * (core.py:407-548), and the generic `reduction(chunk, combine,
  * aggregate, split_every)` engine (core.py:15-144).
  *
  * Spark-first mapping: `apply` is `Dataset.map` with an explicit output
  * Encoder (the analog of the reference's `meta` declaration);
  * `map_partitions` is `Dataset.mapPartitions`; the chunk/combine/
  * aggregate contract is `treeReduce` over per-partition chunk results,
  * with `splitEvery` as the tree depth control — the same bounded fan-in
  * the reference documents at core.py:57-59.
  *
  * Unlike the reference (whose workers discard their results and return
  * `self` — core.py:253-262), these return real distributed results.
  */
object Apply {

  /** Per-row UDF with declared output type — `df.apply(f, axis=1)`.
    * The Encoder plays the role of the reference's `meta`: it declares
    * the output schema statically so the plan resolves before execution
    * (core.py:452-457 infers it by emulation; Catalyst gets it for free).
    */
  def applyRows[T: Encoder](df: DataFrame)(f: Row => T): Dataset[T] =
    df.map(f)

  /** Per-partition UDF — `map_partitions(func, meta=...)`. The function
    * sees the full partition iterator, preserving the reference's
    * "function runs once per pandas chunk" semantics (core.py:429-433).
    */
  def mapPartitions[T: Encoder](df: DataFrame)(f: Iterator[Row] => Iterator[T]): Dataset[T] =
    df.mapPartitions(f)

  /** Typed variant aligned with `map_partitions` over a typed frame. */
  def mapPartitionsTyped[I, T: Encoder](ds: Dataset[I])(f: Iterator[I] => Iterator[T]): Dataset[T] =
    ds.mapPartitions(f)

  /** The reference's `partition_info` injection (core.py:434-435,
    * 531-545): the per-partition `{number, division}` context a
    * partition function can request. Spark's analog of `number` is the
    * task's partition id; `division` (the range boundary) only exists
    * under explicit range partitioning, so the total partition count —
    * which IS statically known — stands in as the scale context. */
  final case class PartitionInfo(number: Int, numPartitions: Int)

  /** `map_partitions(func, partition_info=True)`: the function receives
    * ([[PartitionInfo]], rows). Implemented with `TaskContext` inside
    * the closure — no extra column, no shuffle; the partition id is
    * exactly the id the scheduler runs the task under. */
  def mapPartitionsWithInfo[T: Encoder](df: DataFrame)(
      f: (PartitionInfo, Iterator[Row]) => Iterator[T]): Dataset[T] = {
    val np = df.rdd.getNumPartitions
    df.mapPartitions { it =>
      f(PartitionInfo(TaskContext.getPartitionId(), np), it)
    }
  }

  /** Multi-frame `map_partitions` (the reference aligns partitions
    * across frame args before zipping them — core.py:445-448
    * `_maybe_align_partitions`): both frames are hash-repartitioned on
    * `keys` into `numPartitions` shards — the SAME deterministic
    * partitioner, so equal keys co-locate by construction — then the
    * function sees the two aligned partition iterators.
    *
    * Scale: this is the partition-local merge shape — two shuffles to
    * align, then zero further data movement regardless of what `f`
    * computes. If both inputs are ALREADY co-partitioned (bucketed
    * tables, reused prior shuffle), use [[zipPartitionsStrict]] and
    * skip the shuffles entirely. */
  def zipPartitionsAligned[T: Encoder: ClassTag](
      a: DataFrame, b: DataFrame, keys: Seq[String], numPartitions: Int)(
      f: (Iterator[Row], Iterator[Row]) => Iterator[T]): Dataset[T] = {
    require(keys.nonEmpty, "zipPartitionsAligned needs at least one alignment key")
    val ap = a.repartition(numPartitions, keys.map(col): _*)
    val bp = b.repartition(numPartitions, keys.map(col): _*)
    zipPartitionsStrict(ap, bp)(f)
  }

  /** Zip two frames partition-by-partition with NO alignment shuffle —
    * the caller asserts co-partitioning (same partition count and same
    * key→partition mapping, e.g. both sides just repartitioned on the
    * same keys). Mis-matched counts fail fast with a clear message
    * instead of zipPartitions' opaque error. */
  def zipPartitionsStrict[T: Encoder: ClassTag](a: DataFrame, b: DataFrame)(
      f: (Iterator[Row], Iterator[Row]) => Iterator[T]): Dataset[T] = {
    val spark = a.sparkSession
    val (na, nb) = (a.rdd.getNumPartitions, b.rdd.getNumPartitions)
    require(na == nb,
      s"zipPartitions needs equal partition counts, got $na vs $nb — " +
        "align first (zipPartitionsAligned / repartition on the join keys)")
    spark.createDataset(a.rdd.zipPartitions(b.rdd)(f))
  }

  /** Generic chunk → tree-combine → aggregate reduction
    * (core.py:15-144): `chunk` runs once per partition, partial results
    * are merged with `combine` in a tree of fan-in `splitEvery`
    * (core.py:57-59, default 8), and `aggregate` finishes on the driver.
    *
    * At 100 TB the tree matters: with tens of thousands of partitions a
    * flat reduce would funnel every chunk result to the driver;
    * `treeReduce` inserts O(log_splitEvery(n)) distributed combine
    * rounds so driver traffic is bounded.
    *
    * Contract notes: `combine` must be associative AND commutative —
    * Spark's tree reduce merges partials in completion order, not
    * partition order (the reference's concat order is not guaranteed
    * here). For SQL-expressible aggregations prefer `df.agg(...)`: this
    * path deserializes rows out of Tungsten and exits codegen; it exists
    * for opaque-closure parity with the reference.
    *
    * An empty frame (zero rows) still runs `chunk` on each (possibly
    * empty) partition iterator; a frame with ZERO partitions degrades to
    * `aggregate(chunk(empty))` on the driver rather than treeReduce's
    * opaque UnsupportedOperationException.
    */
  def reduction[B: ClassTag, O](df: DataFrame)(
      chunk: Iterator[Row] => B,
      combine: (B, B) => B,
      aggregate: B => O,
      splitEvery: Int = 8): O = {
    val parts = df.rdd.mapPartitions(it => Iterator.single(chunk(it)))
    val np = parts.getNumPartitions
    if (np == 0) return aggregate(chunk(Iterator.empty))
    val n = math.max(np, 2)
    val fanIn = math.max(splitEvery, 2)
    val depth = math.max(1, math.ceil(math.log(n) / math.log(fanIn)).toInt)
    aggregate(parts.treeReduce(combine, depth))
  }
}
