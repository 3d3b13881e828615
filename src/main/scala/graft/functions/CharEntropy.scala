package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (nats) of a document's character distribution — the
  * cheap compressibility proxy curation pipelines use to catch
  * low-entropy spam (repeated filler, `aaaa…`) and high-entropy
  * gibberish (base64 blobs, minified code) that token-level quality
  * rules miss. Pure row-local one-pass expression, codegen'd like the
  * other text kernels.
  *
  * Determinism contract (what makes the value engine-replayable): the
  * sum −Σ p·ln p is accumulated over characters in ASCENDING code-unit
  * order with p = cnt/n computed as one divide per distinct char — an
  * external replay that sorts its per-char counts and folds in the
  * same order reproduces the identical double. Characters are UTF-16
  * code units (= codepoints for ASCII fixtures; supplementary-plane
  * text counts surrogate halves — documented, deterministic, and
  * consistent with [[WordNGrams]]'s char handling).
  *
  * Empty or null text has no distribution: null (undefined, not 0 —
  * a genuinely single-char doc DOES score 0.0).
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def prettyName: String = "char_entropy"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_entropy requires a string input, got ${t.catalogString}")
  }

  def compute(text: UTF8String): Any = {
    val s = text.toString
    val n = s.length
    if (n == 0) return null
    // sorted map => ascending iteration order, matching the contract
    val counts = new java.util.TreeMap[Char, Long]()
    var i = 0
    while (i < n) {
      counts.merge(s.charAt(i), 1L, (a, b) => a + b)
      i += 1
    }
    var h = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n
      h -= p * math.log(p)
    }
    h
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("charEntropy", this, classOf[CharEntropy].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed = $self.compute($c);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) $boxed).doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  /** `char_entropy(text)` as a [[Column]] (nats). */
  def charEntropy(text: Column): Column =
    GraftColumnBridge.column(CharEntropy(GraftColumnBridge.expression(text)))
}
