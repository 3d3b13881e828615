package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column, lowercased, in ONE
  * pass — the native replacement for the
  * `transform(sequence(...), slice+concat_ws)` + `array_distinct`
  * higher-order pipeline, which costs ~0.7 ms/doc (measured at sf0.1:
  * 5.7 s for 7.8k docs) because every shingle allocates a slice array
  * and `array_distinct` re-compares UTF8Strings quadratically. This
  * expression tokenizes once, joins n consecutive tokens per shingle,
  * and dedupes through a hash set: ~50 µs/doc, 10×+ faster, and it's
  * the per-row stage of every near-dedup pipeline at 100 TB.
  *
  * Tokenization: full Unicode lowercase, split on runs of
  * `Character.isWhitespace` — a SUPERSET of Java regex `\s` (it adds
  * U+001C-1F and Unicode separators like U+2028), so documents using
  * such separators tokenize here but not in a `split(..., "\\s+")`
  * pipeline. Docs with fewer than n tokens yield an empty array.
  */
case class WordNGrams(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {

  override def prettyName: String = "word_ngrams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType =>
      TypeCheckResult.TypeCheckFailure(s"n must be positive, got $n")
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"word_ngrams requires a string input, got ${t.catalogString}")
  }

  def compute(text: UTF8String): GenericArrayData = {
    val s = text.toLowerCase.toString
    val tokens = new mutable.ArrayBuffer[String](64)
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < len && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) tokens += s.substring(start, i)
    }
    val m = tokens.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val sb = new java.lang.StringBuilder(64)
    if (distinct) {
      val seen = new java.util.LinkedHashSet[String](m * 2)
      var g = 0
      while (g < m) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(tokens(g + j))
          j += 1
        }
        seen.add(sb.toString)
        g += 1
      }
      val out = new Array[Any](seen.size())
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    } else {
      // all occurrences in document order — repetition metrics need the
      // multiplicity that shingle dedup intentionally throws away
      val out = new Array[Any](m)
      var g = 0
      while (g < m) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(tokens(g + j))
          j += 1
        }
        out(g) = UTF8String.fromString(sb.toString)
        g += 1
      }
      new GenericArrayData(out)
    }
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("ngramsExpr", this, classOf[WordNGrams].getName)
    defineCodeGen(ctx, ev, c => s"$self.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object WordNGrams {
  /** `word_ngrams(text, n)` as a [[Column]] — distinct shingles. */
  def wordNGrams(text: Column, n: Int = 3): Column =
    GraftColumnBridge.column(WordNGrams(GraftColumnBridge.expression(text), n))

  /** All word n-grams with multiplicity, in document order — the input
    * repetition metrics need (`distinct=false` keeps every occurrence
    * that shingle dedup intentionally throws away). */
  def wordNGramsAll(text: Column, n: Int): Column =
    GraftColumnBridge.column(
      WordNGrams(GraftColumnBridge.expression(text), n, distinct = false))
}
