package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashed character-n-gram feature buckets — the fastText-langid
  * featurization (Joulin et al. 2017; CCNet's language-ID stage runs a
  * char-n-gram linear model): a document becomes the multiset of its
  * lowercased char n-grams, each FNV-1a-hashed into a power-of-two
  * bucket. The char-level sibling of [[DsirFeatures.dsirBuckets]],
  * feeding [[graft.operators.MultiClass]].
  *
  * Contract (what the SQL oracle mirrors):
  *   - the WHOLE lowercased string is shingled, spaces and punctuation
  *     included — word boundaries are themselves language evidence;
  *   - positions step by Unicode code point, and the gram hash is
  *     FNV-1a over the gram's UTF-8 bytes (byte == code point on
  *     ASCII, where the oracle replay is exact);
  *   - bucket = hash & (numBuckets−1), numBuckets a power of two, so
  *     an unsigned `% numBuckets` replay computes the same bucket.
  */
object CharGramBuckets {

  /** Visit every char-n-gram bucket of `text` in document order. */
  private[functions] def forEachBucket(
      text: UTF8String, ns: Seq[Int], mask: Int, seed: Long)(f: Int => Unit): Unit = {
    val s = text.toLowerCase.toString
    val cps = s.codePoints().toArray
    ns.foreach { n =>
      val m = cps.length - n + 1
      var i = 0
      while (i < m) {
        val gram = new String(cps, i, n)
        val bytes = gram.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var h = Hashing.FnvOffset ^ seed
        var b = 0
        while (b < bytes.length) {
          h ^= (bytes(b) & 0xffL)
          h *= Hashing.FnvPrime
          b += 1
        }
        f((h & mask).toInt)
        i += 1
      }
    }
  }

  /** `char_gram_buckets(text)` — all hashed char-n-gram buckets of a
    * document, with multiplicity, as `array<int>`. */
  def charGramBuckets(text: Column, ns: Seq[Int], numBuckets: Int,
      seed: Long): Column =
    GraftColumnBridge.column(
      CharGramBucketsExpr(GraftColumnBridge.expression(text), ns, numBuckets, seed))
}

case class CharGramBucketsExpr(child: Expression, ns: Seq[Int],
    numBuckets: Int, seed: Long)
    extends UnaryExpression {

  override def prettyName: String = "char_gram_buckets"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    DsirFeatures.checkArgs(ns, numBuckets) match {
      case Some(msg) => TypeCheckResult.TypeCheckFailure(msg)
      case None => child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"char_gram_buckets requires a string input, got ${t.catalogString}")
      }
    }

  def compute(text: UTF8String): GenericArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Any](128)
    CharGramBuckets.forEachBucket(text, ns, numBuckets - 1, seed)(out += _)
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("charGramBuckets", this,
      classOf[CharGramBucketsExpr].getName)
    defineCodeGen(ctx, ev, c => s"$self.compute($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CharGramBucketsExpr =
    copy(child = newChild)
}
