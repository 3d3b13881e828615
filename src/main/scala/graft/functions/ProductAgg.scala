package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Product aggregate as a native Catalyst [[DeclarativeAggregate]].
  *
  * Spark has no built-in `product` aggregate; the reference declares `prod`
  * (reference: dataframe/core.py:312-332, per-chunk `pd.DataFrame.prod`).
  * A DeclarativeAggregate is pure expressions, so it participates in
  * whole-stage codegen and two-phase (partial/final) aggregation — i.e. it
  * distributes with map-side combine exactly like the built-in `sum`, which
  * is what the reference's chunk→combine→aggregate contract
  * (core.py:38-46) intends.
  *
  * Null semantics: nulls are skipped (pandas `skipna=True`); the result is
  * null when no non-null input was seen (SQL convention — the pandas
  * `prod()==1.0` empty-product identity is applied by the
  * [[graft.operators.Reductions]] facade via `min_count`).
  */
case class ProductAgg(child: Expression)
    extends DeclarativeAggregate
    with UnaryLike[Expression] {

  override def prettyName: String = "product"
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[NumericType] || child.dataType == NullType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"product requires a numeric input, got ${child.dataType.catalogString}")
    }

  private lazy val product = AttributeReference("product", DoubleType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = product :: Nil

  override lazy val initialValues: Seq[Expression] = Seq(Literal(null, DoubleType))

  private def childAsDouble: Expression = child.dataType match {
    case DoubleType => child
    case _          => Cast(child, DoubleType)
  }

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(
      IsNull(childAsDouble),
      product,
      Multiply(Coalesce(Seq(product, Literal(1.0))), childAsDouble))
  )

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    If(
      IsNull(product.right),
      product.left,
      If(
        IsNull(product.left),
        product.right,
        Multiply(product.left, product.right)))
  )

  override lazy val evaluateExpression: Expression = product

  override protected def withNewChildInternal(newChild: Expression): ProductAgg =
    copy(child = newChild)
}

object ProductAgg {
  /** `product(col)` as a [[Column]], usable inside `df.agg(...)`. */
  def product(c: Column): Column =
    GraftColumnBridge.column(
      ProductAgg(GraftColumnBridge.expression(c)).toAggregateExpression())
}
