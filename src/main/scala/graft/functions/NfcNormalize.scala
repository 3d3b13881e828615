package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) — the
  * prerequisite for every HASH-identity operator in this engine: exact
  * dedup, MinHash/SimHash shingles, line dedup, and decontamination
  * all fingerprint raw bytes, so `é` (U+00E9) and `e`+combining-acute
  * (U+0065 U+0301) — canonically the SAME text — would otherwise
  * land in different buckets and silently miss duplicates. CCNet and
  * Dolma both normalize before fingerprinting for exactly this reason.
  *
  * Row-local, codegen'd like the other text kernels. Fast path: the
  * `Normalizer.isNormalized` quick-check (a table lookup per char,
  * trivially true for pure-ASCII) returns the INPUT UTF8String
  * untouched — web corpora are overwhelmingly already-NFC, so the
  * common row allocates nothing.
  *
  * JDK `java.text.Normalizer` implements the same UAX #15 tables as
  * ICU/DuckDB's `nfc_normalize` — the oracle replays this exactly.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def prettyName: String = "nfc_normalize"
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string input, got ${t.catalogString}")
  }

  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nfcNormalize", this, classOf[NfcNormalize].getName)
    defineCodeGen(ctx, ev, c => s"$self.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** `nfc_normalize(text)` as a [[Column]]. */
  def nfc(text: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(text)))
}
