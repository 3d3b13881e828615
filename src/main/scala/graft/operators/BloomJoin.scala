package graft.operators

import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter-accelerated semi-join — the explicit form of the
  * runtime-filter pattern for big-probe/small-build joins at scale.
  *
  * Why: a plain semi-join shuffles (or at best broadcast-hashes) EVERY
  * probe row, including the overwhelming majority that match nothing.
  * Building a bloom filter over the build side's keys first and pushing
  * `might_contain` into the probe scan drops non-matching rows BEFORE
  * the join's exchange — at 100 TB the exchange is the job, and a
  * selective filter shrinks it by orders of magnitude. Spark's AQE
  * injects this automatically in narrow cases
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`); this operator
  * is the deterministic, always-on form with an explicit size contract.
  *
  * Mechanics mirror Spark's own `InjectRuntimeFilter` (public source):
  * build = `BloomFilterAggregate(xxhash64(key))` — a mergeable partial
  * aggregate, so the build side reduces map-side and only filter blobs
  * hit the driver; probe = `BloomFilterMightContain(lit(blob),
  * xxhash64(key))`, a codegen'd predicate evaluated at scan speed. The
  * blob is `O(numBits)` and rides to executors like any literal
  * (Catalyst auto-broadcasts reference objects); false positives are
  * removed by the exact semi-join that follows, so results are EXACTLY
  * the plain semi-join's — the bloom stage only prunes.
  */
object BloomJoin {

  /** `large LEFT SEMI JOIN small` on the given keys, with a bloom
    * pre-filter on the probe side. `expectedItems` sizes the filter
    * (~1.2 bytes/item at the default 3% fpp Spark's sketch targets);
    * oversizing is cheap, undersizing just raises the false-positive
    * rate — never wrong results. */
  def bloomSemiJoin(
      large: DataFrame, largeKey: String,
      small: DataFrame, smallKey: String,
      expectedItems: Long = 1000000L): DataFrame = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    // xxhash64 hashes the RAW bytes of its input type, so the two sides
    // must hash the SAME type even though the semi-join would coerce
    // them (int 5 and bigint 5 hash differently — the bloom would then
    // reject every true match). Mirror the join's coercion: widen both
    // integral keys to long; otherwise require identical types.
    val (lt, st) = (large.schema(largeKey).dataType, small.schema(smallKey).dataType)
    val integral = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    val (probeKey, buildKey) =
      if (lt == st) (col(largeKey), col(smallKey))
      else if (integral(lt) && integral(st))
        (col(largeKey).cast("long"), col(smallKey).cast("long"))
      else throw new IllegalArgumentException(
        s"bloomSemiJoin keys must share a type (or both be integral): " +
          s"$largeKey is ${lt.catalogString}, $smallKey is ${st.catalogString}")
    val buildAgg = GraftColumnBridge.column(
      new BloomFilterAggregate(
        GraftColumnBridge.expression(xxhash64(buildKey)), expectedItems)
        .toAggregateExpression())
    // One tiny driver fetch: the serialized filter (the fitted-model
    // pattern — same shape as any broadcast dimension table's hash map).
    val blob = small.agg(buildAgg.as("bf")).head.getAs[Array[Byte]](0)
    // Empty build side → null blob → nothing can match; keep the exact
    // join (it returns empty) and skip the bloom stage.
    val pre =
      if (blob == null) large
      else large.where(GraftColumnBridge.column(BloomFilterMightContain(
        Literal(blob, BinaryType),
        GraftColumnBridge.expression(xxhash64(probeKey)))))
    // No distinct on the build keys: a semi-join never duplicates left
    // rows, so deduping first would only add a shuffle.
    val rightKeys = small.select(col(smallKey).as(largeKey))
    pre.join(rightKeys, Seq(largeKey), "left_semi")
  }
}
