package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashed word-n-gram feature kernels for DSIR-style importance
  * resampling (Xie et al., "Data Selection for Language Models via
  * Importance Resampling", NeurIPS 2023): documents are featurized as
  * counts over `numBuckets` hash buckets of their word n-grams, and
  * scored by a per-bucket log-likelihood-ratio model.
  *
  * Shared kernel contract (the fit and score sides MUST agree, so both
  * expressions delegate to [[DsirFeatures.forEachBucket]]):
  *   - tokenization = full lowercase + `Character.isWhitespace` splits,
  *     identical to [[WordNGrams]] / [[Hashing.tokenHashesUnicode]];
  *   - an n-gram's hash = seeded FNV-1a over the UTF-8 bytes of the
  *     space-joined gram string;
  *   - bucket = low bits of the hash (`numBuckets` must be a power of
  *     two so unsigned-mod equals the mask on two's-complement longs —
  *     which is what an external HUGEINT `% numBuckets` replay computes);
  *   - grams are emitted in document order, n=ns(0) grams first, then
  *     ns(1), … (oracle-relevant only for multiplicity, not order:
  *     downstream consumers are order-free counts and sums).
  */
object DsirFeatures {

  /** Visit every n-gram bucket of `text` in document order. */
  private[functions] def forEachBucket(
      text: UTF8String, ns: Seq[Int], mask: Int, seed: Long)(f: Int => Unit): Unit = {
    val s = text.toLowerCase.toString
    val tokens = new scala.collection.mutable.ArrayBuffer[String](64)
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < len && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) tokens += s.substring(start, i)
    }
    val sb = new java.lang.StringBuilder(64)
    ns.foreach { n =>
      val m = tokens.length - n + 1
      var g = 0
      while (g < m) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(tokens(g + j))
          j += 1
        }
        val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var h = Hashing.FnvOffset ^ seed
        var b = 0
        while (b < bytes.length) {
          h ^= (bytes(b) & 0xffL)
          h *= Hashing.FnvPrime
          b += 1
        }
        f((h & mask).toInt)
        g += 1
      }
    }
  }

  /** `dsir_buckets(text)` — all hashed n-gram buckets of a document,
    * with multiplicity, as `array<int>`. The FIT-side kernel: explode +
    * group-by over this column builds the per-corpus bucket histogram
    * (map-side partial agg caps the shuffle at `numBuckets` rows per
    * partition regardless of corpus size). */
  def dsirBuckets(text: Column, ns: Seq[Int], numBuckets: Int, seed: Long): Column =
    GraftColumnBridge.column(
      DsirBuckets(GraftColumnBridge.expression(text), ns, numBuckets, seed))

  /** `dsir_score(text)` — the document's total nano-scaled importance
    * log-weight `Σ_g nanoRatios[bucket(g)]` as a LONG. The SCORE-side
    * kernel: integer summation is exact and order-free, so the result
    * is bit-reproducible across engines and partition layouts — the fp
    * non-associativity that plagues floating-point log-weight sums is
    * confined to the 1/1e9 display division. */
  def dsirScore(text: Column, nanoRatios: Array[Long],
      ns: Seq[Int], numBuckets: Int, seed: Long): Column =
    GraftColumnBridge.column(
      DsirScore(GraftColumnBridge.expression(text), nanoRatios, ns, numBuckets, seed))

  private[functions] def checkArgs(
      ns: Seq[Int], numBuckets: Int): Option[String] = {
    if (ns.isEmpty || ns.exists(_ <= 0)) Some(s"ns must be positive, got $ns")
    else if (numBuckets <= 0 || (numBuckets & (numBuckets - 1)) != 0)
      Some(s"numBuckets must be a positive power of two, got $numBuckets")
    else None
  }
}

case class DsirBuckets(child: Expression, ns: Seq[Int], numBuckets: Int, seed: Long)
    extends UnaryExpression {

  override def prettyName: String = "dsir_buckets"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    DsirFeatures.checkArgs(ns, numBuckets) match {
      case Some(msg) => TypeCheckResult.TypeCheckFailure(msg)
      case None => child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"dsir_buckets requires a string input, got ${t.catalogString}")
      }
    }

  def compute(text: UTF8String): GenericArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Any](128)
    DsirFeatures.forEachBucket(text, ns, numBuckets - 1, seed)(out += _)
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("dsirBuckets", this, classOf[DsirBuckets].getName)
    defineCodeGen(ctx, ev, c => s"$self.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): DsirBuckets =
    copy(child = newChild)
}

case class DsirScore(child: Expression, nanoRatios: Array[Long],
    ns: Seq[Int], numBuckets: Int, seed: Long)
    extends UnaryExpression {

  override def prettyName: String = "dsir_score"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    DsirFeatures.checkArgs(ns, numBuckets) match {
      case Some(msg) => TypeCheckResult.TypeCheckFailure(msg)
      case None if nanoRatios.length != numBuckets =>
        TypeCheckResult.TypeCheckFailure(
          s"model has ${nanoRatios.length} buckets, expression expects $numBuckets")
      case None => child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"dsir_score requires a string input, got ${t.catalogString}")
      }
    }

  def compute(text: UTF8String): Long = {
    var sum = 0L
    DsirFeatures.forEachBucket(text, ns, numBuckets - 1, seed)(b => sum += nanoRatios(b))
    sum
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("dsirScore", this, classOf[DsirScore].getName)
    defineCodeGen(ctx, ev, c => s"$self.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): DsirScore =
    copy(child = newChild)
}
