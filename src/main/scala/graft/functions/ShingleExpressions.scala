package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for word-shingle construction and Jaccard
  * similarity — the two remaining interpreted HOF costs on the
  * near-dup hot path. Same set semantics as the composable
  * formulations (`NearDup.shinglesHof` / size-of-intersect ÷
  * size-of-union over distinct arrays); equivalence is unit-tested.
  */
object ShingleKernels {

  private val Space = UTF8String.fromString(" ")

  /** Distinct word n-grams in first-occurrence order; a single
    * under-n-tokens input yields one shingle of all tokens (matches
    * the HOF `when(size < n, ...)` branch).
    */
  def shingles(tokens: ArrayData, n: Int): ArrayData = {
    val cnt = tokens.numElements()
    val seen = new java.util.LinkedHashSet[UTF8String]()
    if (cnt < n) {
      val all = new Array[UTF8String](cnt)
      var i = 0
      while (i < cnt) { all(i) = tokens.getUTF8String(i); i += 1 }
      seen.add(UTF8String.concatWs(Space, all: _*))
    } else {
      var i = 0
      val window = new Array[UTF8String](n)
      while (i + n <= cnt) {
        var j = 0
        while (j < n) { window(j) = tokens.getUTF8String(i + j); j += 1 }
        seen.add(UTF8String.concatWs(Space, window: _*))
      i += 1
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** |A∩B| / max(|A∪B|, 1) over distinct string arrays. */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val setA = new java.util.HashSet[UTF8String](math.max(16, na * 2))
    var i = 0
    while (i < na) { setA.add(a.getUTF8String(i)); i += 1 }
    var inter = 0
    val seenB = new java.util.HashSet[UTF8String](math.max(16, nb * 2))
    i = 0
    while (i < nb) {
      val s = b.getUTF8String(i)
      if (seenB.add(s) && setA.contains(s)) inter += 1
      i += 1
    }
    val union = setA.size + seenB.size - inter
    inter.toDouble / math.max(union, 1).toDouble
  }
}

case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires ARRAY<STRING>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"
  override protected def nullSafeEval(input: Any): Any =
    ShingleKernels.shingles(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernels.shingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

case class JaccardSim(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_jaccard requires ARRAY<STRING> args, got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ShingleKernels.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ShingleKernels.jaccard($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
    copy(left = l, right = r)
}

object ShingleExpressions {
  def shingles(tokens: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(tokens), n))
  def jaccard(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
