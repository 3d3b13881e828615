package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Hilbert-curve index of a 2^bits × 2^bits grid cell as a native
  * Catalyst expression — the classic iterative quadrant-rotation xy2d
  * algorithm as ONE codegen loop.
  *
  * Why native: the same algorithm unrolled into Column expressions
  * doubles in tree size every bit level (each round references the
  * previous x AND y), so at bits = 8 the Catalyst tree is ~2^8× the
  * base expression — measured at 124 s for a 150k-row layout rewrite
  * at sf0.1 (bench round 14). The generated loop below is O(bits)
  * per row and stays inside whole-stage codegen.
  *
  * Semantics are pinned by [[graft.operators.Layout.hilbertD]] (the
  * scalar mirror LayoutSpec proves bijective with unit steps) and by
  * the `layout_hilbert` oracle's CTE-per-round SQL replay. Inputs
  * must already be bucketed to [0, 2^bits); `bits` ≤ 31. */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def prettyName: String = "hilbert_index"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (bits < 1 || bits > 31)
      TypeCheckResult.TypeCheckFailure(s"bits must be in [1, 31], got $bits")
    else (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hilbert_index requires (bigint, bigint), got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val n = 1L << bits
    var x = a.asInstanceOf[Long]
    var y = b.asInstanceOf[Long]
    var d = 0L
    var s = n >> 1
    while (s > 0L) {
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = n - 1L - x; y = n - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = 1L << bits
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $a; long $y = $b; long $d = 0L;
         |for (long $s = ${n >> 1}L; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = ${n - 1L}L - $x; $y = ${n - 1L}L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  def apply(x: Column, y: Column, bits: Int): Column =
    GraftColumnBridge.column(HilbertIndex(
      GraftColumnBridge.expression(x), GraftColumnBridge.expression(y), bits))
}
