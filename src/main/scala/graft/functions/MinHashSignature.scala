package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a shingle set as a native Catalyst expression:
  * `array<string>` shingles → `array<long>` of `numHashes` minima.
  *
  * One pass over the shingles computes all k hashes (the reference's
  * near-dup ambition has no implementation to cite; the algorithm is the
  * standard Broder MinHash: per shingle a 64-bit base hash (FNV-1a over
  * UTF-8 bytes), then k affine transforms `a_i*h + b_i` with odd `a_i`
  * drawn from SplitMix64(seed), taking the per-i minimum). O(|shingles|·k)
  * multiply-adds per row, no allocation besides the output array — this
  * is the hot loop of 100 TB dedup, so it must not box per element.
  *
  * Row-local (no shuffle); the LSH banding that follows it is where the
  * one shuffle happens ([[graft.operators.Dedup]]).
  *
  * Returns null for a null or EMPTY shingle array (a doc too short to
  * shingle has no signature; callers filter those out explicitly).
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"numHashes must be positive, got $numHashes")
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"minhash_signature requires array<string>, got ${t.catalogString}")
  }

  // Affine coefficients from SplitMix64 ([[Hashing.splitMixCoefs]]).
  @transient private lazy val (coefA: Array[Long], coefB: Array[Long]) =
    Hashing.splitMixCoefs(seed, numHashes)

  /** FNV-1a 64-bit over UTF-8 bytes (public-domain hash). */
  private def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Single-pass k-way min; called from both interpreted and generated code. */
  def compute(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val base = fnv1a64(shingles.getUTF8String(i))
      var j = 0
      while (j < numHashes) {
        val v = coefA(j) * base + coefB(j)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhashExpr", this, classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $self.compute($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** `minhash_signature(shingles)` as a [[Column]]. */
  def minhash(shingles: Column, numHashes: Int = 128, seed: Long = 42L): Column =
    GraftColumnBridge.column(
      MinHashSignature(GraftColumnBridge.expression(shingles), numHashes, seed))
}

/** Fused MinHash → LSH band hashes: `array<string>` shingles →
  * `array<long>` of `bands` band hashes, where band j is a 64-bit hash
  * of signature rows [j·r, (j+1)·r), r = numHashes / bands.
  *
  * This is [[MinHashSignature]] plus the banding step in ONE codegen'd
  * pass — no intermediate numHashes-long array column, and no
  * interpreted higher-order `transform`/`slice`/`xxhash64` pipeline
  * (measured ~2× the banding cost at sf0.1). Band hashes only ever
  * feed equality grouping, so any deterministic 64-bit mix works; this
  * uses FNV-1a over the row bytes, seeded per band.
  */
case class MinHashBands(child: Expression, numHashes: Int, bands: Int, seed: Long)
    extends UnaryExpression {

  override def prettyName: String = "minhash_bands"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _)
        if numHashes > 0 && bands > 0 && numHashes % bands == 0 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"bands=$bands must be positive and divide numHashes=$numHashes")
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"minhash_bands requires array<string>, got ${t.catalogString}")
  }

  @transient private lazy val sig = MinHashSignature(child, numHashes, seed)

  def compute(shingles: ArrayData): ArrayData = {
    val mins = sig.compute(shingles)
    if (mins == null) return null
    new GenericArrayData(Hashing.bandFold(mins.toLongArray(), numHashes, bands))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhashBandsExpr", this, classOf[MinHashBands].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $self.compute($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object MinHashBands {
  /** `minhash_bands(shingles)` as a [[Column]]. */
  def minhashBands(
      shingles: Column, numHashes: Int = 128, bands: Int = 32,
      seed: Long = 42L): Column =
    GraftColumnBridge.column(
      MinHashBands(GraftColumnBridge.expression(shingles), numHashes, bands, seed))
}

/** Fully-fused text → LSH band hashes: raw string in, `array<long>` of
  * `bands` band hashes out, ONE pass over the UTF-8 bytes.
  *
  * Pipeline folded into the loop: whitespace tokenize + lowercase,
  * per-token FNV-1a, word-n-gram hash from consecutive token hashes
  * (no shingle strings), k affine minima, band fold. Works because
  * minhash is DUPLICATE-INSENSITIVE — a repeated shingle can't change
  * any minimum — so the distinct-shingle set materialized by
  * [[WordNGrams]]+[[MinHashBands]] is unnecessary for candidate
  * generation. Gram hashes differ from the string-based path (hash
  * family choice is arbitrary for LSH); recall/banding behavior is
  * identical, and pair VERIFICATION (exact jaccard) stays on the
  * canonical shingle sets.
  *
  * Tokenization is EXACTLY [[WordNGrams]]'s (full Unicode lowercase +
  * `Character.isWhitespace`): pure-ASCII rows take a zero-copy byte
  * path that is equal by construction; any row with a multi-byte
  * character falls back to the canonical path — so a pair that the
  * canonical shingle sets would bucket together is never missed due to
  * tokenization drift.
  *
  * Fewer than n tokens → null (no shingles → no signature), matching
  * [[MinHashSignature]] on an empty array.
  */
case class TextMinHashBands(
    child: Expression, n: Int, numHashes: Int, bands: Int, seed: Long)
    extends UnaryExpression {

  override def prettyName: String = "text_minhash_bands"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 && numHashes > 0 && bands > 0 && numHashes % bands == 0 =>
      TypeCheckResult.TypeCheckSuccess
    case StringType =>
      TypeCheckResult.TypeCheckFailure(
        s"need n>0, bands>0, bands | numHashes; got n=$n numHashes=$numHashes bands=$bands")
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"text_minhash_bands requires string, got ${t.catalogString}")
  }

  @transient private lazy val (coefA: Array[Long], coefB: Array[Long]) =
    Hashing.splitMixCoefs(seed, numHashes)

  /** Per-token FNV hashes: byte fast path for pure-ASCII input (exact
    * vs the canonical tokenization by construction), Unicode fallback
    * ([[Hashing.tokenHashesUnicode]] — full lowercase +
    * `Character.isWhitespace`, matching [[WordNGrams]]) otherwise. */
  private def tokenHashes(s: UTF8String): Array[Long] = {
    val bytes = s.getBytes
    if (!Hashing.isAscii(bytes)) return Hashing.tokenHashesUnicode(s, 0L)
    val len = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[Long](64)
    var i = 0
    while (i < len) {
      while (i < len && Hashing.isAsciiSpace(bytes(i))) i += 1
      val start = i
      while (i < len && !Hashing.isAsciiSpace(bytes(i))) i += 1
      if (i > start) out += Hashing.fnv1aAsciiLower(bytes, start, i, 0L)
    }
    out.toArray
  }

  def compute(s: UTF8String): ArrayData = {
    val th = tokenHashes(s)
    val nGrams = th.length - n + 1
    if (nGrams <= 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var g = 0
    while (g < nGrams) {
      // order-sensitive combine of the window's n token hashes
      var gh = Hashing.FnvOffset
      var j = g
      while (j < g + n) {
        gh = (gh ^ th(j)) * Hashing.FnvPrime
        j += 1
      }
      var k = 0
      while (k < numHashes) {
        val v = coefA(k) * gh + coefB(k)
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      g += 1
    }
    new GenericArrayData(Hashing.bandFold(mins, numHashes, bands))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("textMinhashBandsExpr", this, classOf[TextMinHashBands].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $self.compute($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): TextMinHashBands =
    copy(child = newChild)
}

object TextMinHashBands {
  /** `text_minhash_bands(text)` as a [[Column]]. */
  def textMinhashBands(
      text: Column, n: Int = 3, numHashes: Int = 128, bands: Int = 32,
      seed: Long = 42L): Column =
    GraftColumnBridge.column(
      TextMinHashBands(GraftColumnBridge.expression(text), n, numHashes, bands, seed))
}
