package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native kernel for the deterministic (decimal-quantized) dot
  * product behind `Similarity.dotExact`.
  *
  * Exactness contract: each float·float product is widened to double
  * (exact), quantized to scale 12 via Spark's OWN `Decimal` conversion
  * (`Decimal(d).changePrecision(18,12)` — the same code path as
  * `CAST(x AS DECIMAL(18,12))`), and the quantized values are summed
  * as unscaled longs (exact integer arithmetic, |Σ| < 2⁶³ for any
  * realistic embedding). The result is therefore bit-identical to the
  * HOF decimal-aggregate formulation at ANY parallelism and matches
  * the DuckDB oracle — just without a BigDecimal accumulator object
  * per element.
  */
object DotExactKernel {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var sumUnscaled = 0L
    var i = 0
    while (i < n) {
      val p = a.getFloat(i).toDouble * b.getFloat(i).toDouble
      val d = Decimal(p)
      if (d.changePrecision(18, 12)) sumUnscaled += d.toUnscaledLong
      i += 1
    }
    Decimal(sumUnscaled, 38, 12).toDouble
  }
}

/** Plain double dot product as a native loop — same left-to-right
  * fold order as the HOF `aggregate(zip_with(...), 0.0, _+_)`
  * formulation, so results are bit-identical (unit-tested), minus the
  * per-element lambda dispatch.
  */
object DotFastKernel {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }
}

case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires ARRAY<FLOAT> args, got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotFastKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotFastKernel.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

case class DotExact(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot_exact requires ARRAY<FLOAT> args, got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_exact"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotExactKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotExactKernel.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotExact =
    copy(left = l, right = r)
}

object DotExactExpression {
  def dotExact(a: Column, b: Column): Column =
    ColumnBridge.column(DotExact(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def dotFast(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
