package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Cosine similarity of one `array<double>` vector against a FIXED
  * centroid matrix, returning `array<double>` of one sim per centroid —
  * the cell-assignment kernel of IVF indexing and k-means
  * ([[graft.operators.Similarity]]).
  *
  * Why an expression holding the matrix as a reference object: the
  * composable alternative — `array(cosineSim(vec, array(lit…)), …)` —
  * materializes `cells × dim` literal NODES in the plan (16×64 = 1024+),
  * which Catalyst must analyze and Janino must compile on every
  * instantiation; at sf0.1 that compile time dominated the whole IVF
  * query. Here the matrix rides along as one broadcast-able Java
  * `double[][]` (`ctx.addReferenceObj`), the tree is a single node, and
  * the loop is compiled once. Per-row it also beats the unrolled form:
  * the query vector is decoded and its norm computed ONCE for all
  * cells, not per centroid, and centroid norms are precomputed.
  *
  * Per-cell semantics are bit-identical to
  * [[CosineSimilarity]]`(vec, lit(centroid))`: sequential 0..n-1
  * accumulation (engine-comparable determinism), null element or
  * dimension mismatch → null sim for that cell (data error, not a
  * number), zero norm → 0.0.
  */
case class CentroidSims(child: Expression, cents: Array[Array[Double]],
    metric: String = "cosine")
    extends UnaryExpression {

  require(metric == "cosine" || metric == "l2sq", s"unknown metric: $metric")

  override def prettyName: String = s"centroid_${if (metric == "cosine") "sims" else "dists_sq"}"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if cents.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckFailure("centroid_sims requires at least one centroid")
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"centroid_sims requires an array<double> input, got ${t.catalogString}")
  }

  // sqrt of sum-of-squares accumulated 0..n-1 — the same order
  // CosineSimilarity uses, so the product sqrt(nx)*sqrt(ny) is the
  // identical double.
  @transient private lazy val norms: Array[Double] = cents.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    math.sqrt(s)
  }

  def compute(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](cents.length)
    val v = new Array[Double](n)
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) {
      if (arr.isNullAt(i)) hasNull = true
      else { v(i) = arr.getDouble(i); i += 1 }
    }
    if (!hasNull) {
      var nx = 0.0
      i = 0
      while (i < n) { nx += v(i) * v(i); i += 1 }
      val nxs = math.sqrt(nx)
      var c = 0
      while (c < cents.length) {
        val cv = cents(c)
        if (cv.length != n) { out(c) = null }
        else if (metric == "l2sq") {
          // squared L2, sequential 0..n-1 accumulation (PQ's ADC /
          // codebook-assignment distance; no sqrt — argmin and additive
          // lookup tables only ever need the square)
          var acc = 0.0
          var j = 0
          while (j < n) { val d = v(j) - cv(j); acc += d * d; j += 1 }
          out(c) = acc
        } else {
          var dot = 0.0
          var j = 0
          while (j < n) { dot += v(j) * cv(j); j += 1 }
          val denom = nxs * norms(c)
          out(c) = if (denom == 0.0) 0.0 else dot / denom
        }
        c += 1
      }
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("centroidSims", this, classOf[CentroidSims].getName)
    defineCodeGen(ctx, ev, c => s"$self.compute($c)")
  }

  // Array fields default to reference equality, which would make two
  // content-identical nodes (e.g. the corpus and query branches of one
  // IVF plan) semantically unequal — defeating subexpression
  // elimination and plan/exchange reuse. Compare the matrix by value.
  override def equals(o: Any): Boolean = o match {
    case c: CentroidSims => child == c.child && metric == c.metric &&
      java.util.Arrays.deepEquals(
        cents.asInstanceOf[Array[AnyRef]], c.cents.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + metric.hashCode) +
      java.util.Arrays.deepHashCode(cents.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildInternal(newChild: Expression): CentroidSims =
    copy(child = newChild)
}

object CentroidSims {
  /** `centroid_sims(vec)` against a fixed matrix, as a [[Column]].
    * Input must be `array<double>`. */
  def centroidSims(vec: Column, cents: Array[Array[Double]]): Column =
    GraftColumnBridge.column(
      CentroidSims(GraftColumnBridge.expression(vec), cents))

  /** Squared-L2 distance of `vec` to each centroid — the PQ codebook
    * assignment / ADC kernel. Input must be `array<double>`. */
  def centroidDistsSq(vec: Column, cents: Array[Array[Double]]): Column =
    GraftColumnBridge.column(
      CentroidSims(GraftColumnBridge.expression(vec), cents, "l2sq"))

  /** `vec − cents(cell)` as a [[Column]] — the residual kernel of
    * by-residual IVF-PQ ([[graft.operators.Similarity]]): the matrix
    * rides as one reference object (same rationale as
    * [[centroidSims]]), the subtraction is exact double arithmetic
    * (order-free, so any engine replays it bit-for-bit). */
  def centroidResidual(vec: Column, cell: Column,
      cents: Array[Array[Double]]): Column =
    GraftColumnBridge.column(CentroidResidual(
      GraftColumnBridge.expression(vec),
      GraftColumnBridge.expression(cell), cents))
}

/** Element-wise `vec − cents(cell)` against a fixed centroid matrix —
  * see [[CentroidSims.centroidResidual]]. Null vec/cell or a null
  * element → null; a cell outside the matrix or a dimension mismatch
  * is a data error → null (matching [[CentroidSims]]' convention). */
case class CentroidResidual(left: Expression, right: Expression,
    cents: Array[Array[Double]]) extends BinaryExpression {

  override def prettyName: String = "centroid_residual"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType) if cents.nonEmpty =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          "centroid_residual requires (array<double>, int) inputs and " +
            "a non-empty centroid matrix")
    }

  def compute(arr: ArrayData, cell: Int): GenericArrayData = {
    if (cell < 0 || cell >= cents.length) return null
    val cv = cents(cell)
    val n = arr.numElements()
    if (cv.length != n) return null
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      out(i) = arr.getDouble(i) - cv(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any, c: Any): Any =
    compute(v.asInstanceOf[ArrayData], c.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("centroidResidual", this,
      classOf[CentroidResidual].getName)
    nullSafeCodeGen(ctx, ev, (v, c) => s"""
      ${ev.value} = $self.compute($v, $c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  // value-compare the matrix (see CentroidSims.equals)
  override def equals(o: Any): Boolean = o match {
    case c: CentroidResidual => left == c.left && right == c.right &&
      java.util.Arrays.deepEquals(
        cents.asInstanceOf[Array[AnyRef]], c.cents.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * left.hashCode() + right.hashCode()) +
      java.util.Arrays.deepHashCode(cents.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CentroidResidual =
    copy(left = newLeft, right = newRight)
}
