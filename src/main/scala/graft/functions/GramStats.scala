package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character-coverage statistics of word n-grams in ONE hash-map pass —
  * the two Gopher repetition signals (Rae et al. 2021, table A1 —
  * public) that [[graft.operators.TextOps.repetitionMetrics]]'
  * excess-occurrence fractions do not cover:
  *
  *   - `top`: characters covered by the single most-repeated n-gram,
  *     as a fraction of document characters — `max over grams of
  *     count(g) * len(g) / len(text)`. Catches the "same slogan 500
  *     times" page whose OTHER lines are unique enough to pass the
  *     duplicate-line fractions.
  *   - `dup`: characters covered by ALL n-grams occurring more than
  *     once — `sum over grams with count > 1 of count(g) * len(g) /
  *     len(text)`. The long-n (5..10 in Gopher) boilerplate signal.
  *
  * Both deliberately count every occurrence of a repeated gram and let
  * overlapping grams double-count characters (so `dup` can exceed 1.0
  * on highly repetitive text) — the fraction is a repetition SCORE
  * thresholded by a filter, not a partition of the document, and this
  * definition is exactly mirrorable in SQL list functions for the
  * oracle. `len(g)` includes the single joining spaces; the
  * denominator is the raw text length.
  *
  * Why an expression: the composable higher-order form — `max over
  * array_distinct(grams) of size(filter(grams, eq))` — is O(distinct ×
  * total) per document with a fresh array allocation per probe. This
  * node tokenizes once and makes one O(total) pass over a count map:
  * the per-row stage of a quality filter that must run at full scan
  * speed over 100 TB. Tokenization matches [[WordNGrams]] (Unicode
  * lowercase, `Character.isWhitespace` runs — see the superset caveat
  * there). Returns null for a null text; a document with fewer than n
  * tokens or zero length scores null (no grams to measure — the
  * junk-row convention of `qualityMetrics`).
  */
case class GramStats(child: Expression, n: Int, stat: String)
    extends UnaryExpression {

  require(stat == "top" || stat == "dup", s"unknown gram stat: $stat")

  override def prettyName: String = s"gram_${stat}_char_frac"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType =>
      TypeCheckResult.TypeCheckFailure(s"n must be positive, got $n")
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"gram stats require a string input, got ${t.catalogString}")
  }

  def compute(text: UTF8String): Any = {
    val s = text.toLowerCase.toString
    val totalChars = s.length
    if (totalChars == 0) return null
    val tokens = new mutable.ArrayBuffer[String](64)
    var i = 0
    while (i < totalChars) {
      while (i < totalChars && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < totalChars && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) tokens += s.substring(start, i)
    }
    val m = tokens.length - n + 1
    if (m <= 0) return null
    val counts = new java.util.HashMap[String, Int](m * 2)
    val sb = new java.lang.StringBuilder(64)
    var g = 0
    while (g < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(g + j))
        j += 1
      }
      counts.merge(sb.toString, 1, Integer.sum)
      g += 1
    }
    var acc = 0L
    val it = counts.entrySet().iterator()
    if (stat == "top") {
      while (it.hasNext) {
        val e = it.next()
        val cover = e.getValue.toLong * e.getKey.length
        if (cover > acc) acc = cover
      }
    } else {
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue > 1) acc += e.getValue.toLong * e.getKey.length
      }
    }
    acc.toDouble / totalChars
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("gramStats", this, classOf[GramStats].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed = $self.compute($c);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) $boxed).doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): GramStats =
    copy(child = newChild)
}

object GramStats {
  /** Fraction of document characters covered by the most-repeated word
    * n-gram (Gopher's "top n-gram character fraction"). */
  def topNGramCharFrac(text: Column, n: Int): Column =
    GraftColumnBridge.column(GramStats(GraftColumnBridge.expression(text), n, "top"))

  /** Fraction of document characters covered by word n-grams occurring
    * more than once (Gopher's "duplicate n-gram character fraction"). */
  def dupNGramCharFrac(text: Column, n: Int): Column =
    GraftColumnBridge.column(GramStats(GraftColumnBridge.expression(text), n, "dup"))
}
