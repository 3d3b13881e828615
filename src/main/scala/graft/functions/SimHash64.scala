package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a token array (Charikar, "Similarity estimation
  * techniques from rounding algorithms", STOC'02): each token's 64-bit
  * hash votes ±1 per bit position; the sign of each accumulated vote
  * becomes the output bit. Near-duplicate docs land within a small
  * Hamming distance of each other.
  *
  * Row-local single pass, O(|tokens|·64) adds; null/empty input → null.
  * Pairing is done downstream by banding the 64 bits into 16-bit chunks
  * (pigeonhole: hamming ≤ 3 ⇒ at least one of 4 chunks identical) —
  * see [[graft.operators.Dedup.simHashPairs]].
  */
case class SimHash64(child: Expression, seed: Long)
    extends UnaryExpression {

  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | StringType => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires array<string> or string, got ${t.catalogString}")
  }

  private def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  private def vote(votes: Array[Int], h: Long): Unit = {
    var b = 0
    while (b < 64) {
      if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
      b += 1
    }
  }

  private def sign(votes: Array[Int]): Long = {
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def compute(tokens: ArrayData): Any = {
    val n = tokens.numElements()
    if (n == 0) return null
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      vote(votes, fnv1a64(tokens.getUTF8String(i)))
      i += 1
    }
    sign(votes)
  }

  /** Fused tokenize+hash path for a raw string child: pure-ASCII rows
    * tokenize inline over the UTF-8 bytes (no token array, no
    * lowercased copy — the `lower`+`split`+array pipeline measured ~2×
    * this); rows with multi-byte characters fall back to the canonical
    * Unicode tokenization ([[Hashing.tokenHashesUnicode]] — full
    * lowercase + `Character.isWhitespace`), so both paths agree with
    * [[graft.functions.WordNGrams]]'s token boundaries. */
  def computeText(s: UTF8String): Any = {
    val bytes = s.getBytes
    if (!Hashing.isAscii(bytes)) {
      val th = Hashing.tokenHashesUnicode(s, seed)
      if (th.isEmpty) return null
      val votes = new Array[Int](64)
      th.foreach(vote(votes, _))
      return sign(votes)
    }
    val len = bytes.length
    val votes = new Array[Int](64)
    var nTokens = 0
    var i = 0
    while (i < len) {
      while (i < len && Hashing.isAsciiSpace(bytes(i))) i += 1
      val start = i
      while (i < len && !Hashing.isAsciiSpace(bytes(i))) i += 1
      if (i > start) {
        vote(votes, Hashing.fnv1aAsciiLower(bytes, start, i, seed))
        nTokens += 1
      }
    }
    if (nTokens == 0) null else sign(votes)
  }

  @transient private lazy val isTextInput: Boolean = child.dataType == StringType

  override def nullSafeEval(input: Any): Any =
    if (isTextInput) computeText(input.asInstanceOf[UTF8String])
    else compute(input.asInstanceOf[ArrayData])

  def computeAny(input: Any): Any =
    if (isTextInput) computeText(input.asInstanceOf[UTF8String])
    else compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simhashExpr", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed = $self.computeAny($c);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $boxed).longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** `simhash64(tokens)` as a [[Column]]. */
  def simhash(tokens: Column, seed: Long = 42L): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(tokens), seed))
}
