package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Symmetric per-vector int8 quantization kernels — the compressed
  * scan path for embedding similarity at 100 TB (Similarity
  * .quantizedTopK). A float vector v becomes (scale s, bytes q) with
  * s = max|vᵢ|/127 and qᵢ = round(vᵢ/s), so every reconstruction
  * error obeys |vᵢ − s·qᵢ| ≤ s/2 — a RIGOROUS per-pair dot-product
  * bound falls out (see [[graft.operators.Similarity.quantizedTopK]]),
  * which is what lets the int8 estimate prune WITHOUT giving up exact
  * top-k. Byte arrays are 4× smaller than float32 on the pair-scan
  * hot path and the inner loop is pure integer multiply-accumulate.
  *
  * All four kernels are deterministic pure functions of their input
  * vector (fixed round-half-up, no data-dependent branching), so
  * quantized plans reproduce bit-identically at any parallelism.
  */
object Int8QuantKernel {
  /** s = max|vᵢ|/127 (0.0 for an all-zero or empty vector). */
  def scale(v: ArrayData): Double = {
    val n = v.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(v.getFloat(i).toDouble)
      if (a > m) m = a
      i += 1
    }
    m / 127.0
  }

  /** qᵢ = round(vᵢ/s) ∈ [−127, 127] as bytes; all-zero when s = 0.
    * v/s ≤ 127·(1+ε) < 127.5, so Math.round never overflows a byte.
    */
  def quantize(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val s = scale(v)
    val out = new Array[Byte](n)
    if (s > 0.0) {
      var i = 0
      while (i < n) {
        out(i) = Math.round(v.getFloat(i).toDouble / s).toByte
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Σ qaᵢ·qbᵢ — exact integer arithmetic (|Σ| ≤ 127²·n ≪ 2⁶³). */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getByte(i).toLong * b.getByte(i).toLong
      i += 1
    }
    s
  }

  /** Σ |qᵢ| — the per-vector term of the quantization error bound. */
  def absSum(a: ArrayData): Long = {
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      s += math.abs(a.getByte(i).toLong)
      i += 1
    }
    s
  }
}

case class Int8Scale(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_i8_scale requires ARRAY<FLOAT>, got ${t.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_i8_scale"
  override protected def nullSafeEval(v: Any): Any =
    Int8QuantKernel.scale(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.Int8QuantKernel.scale($v)")
  override protected def withNewChildInternal(c: Expression): Int8Scale = copy(child = c)
}

case class Int8Quantize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_i8_quant requires ARRAY<FLOAT>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "graft_i8_quant"
  override protected def nullSafeEval(v: Any): Any =
    Int8QuantKernel.quantize(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.Int8QuantKernel.quantize($v)")
  override protected def withNewChildInternal(c: Expression): Int8Quantize = copy(child = c)
}

case class Int8Dot(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_i8_dot requires ARRAY<TINYINT> args, got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_i8_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Int8QuantKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Int8QuantKernel.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Int8Dot =
    copy(left = l, right = r)
}

case class Int8AbsSum(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_i8_abssum requires ARRAY<TINYINT>, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_i8_abssum"
  override protected def nullSafeEval(v: Any): Any =
    Int8QuantKernel.absSum(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.Int8QuantKernel.absSum($v)")
  override protected def withNewChildInternal(c: Expression): Int8AbsSum = copy(child = c)
}

object QuantExpressions {
  def i8Scale(v: Column): Column =
    ColumnBridge.column(Int8Scale(ColumnBridge.expression(v)))
  def i8Quantize(v: Column): Column =
    ColumnBridge.column(Int8Quantize(ColumnBridge.expression(v)))
  def i8Dot(a: Column, b: Column): Column =
    ColumnBridge.column(Int8Dot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def i8AbsSum(v: Column): Column =
    ColumnBridge.column(Int8AbsSum(ColumnBridge.expression(v)))
}
