package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native kernels for centroid-model distance work
  * ([[graft.operators.Similarity]]: Lloyd's k-means, IVF cell
  * assignment, PQ encode/serve). The HOF formulations build one
  * `aggregate(zip_with(vec, lit(centroid), …))` PER CENTROID/CODEWORD
  * — interpreted per element (lambda subtrees are excluded from
  * whole-stage codegen) and, because the centroids enter as literals,
  * every training iteration plans + codegens a FRESH k-lambda tree.
  * These kernels take the model as a REFERENCE OBJECT: one static
  * call per row, byte-identical generated source across iterations
  * (Janino cache hit), O(k·d) primitive flops.
  *
  * Bit-identity contracts (all spec-locked against the HOF forms):
  *  - fold order matches the HOF `aggregate` exactly (sequential over
  *    dims, then over subspaces);
  *  - float elements widen to double before subtract/multiply (the
  *    `x.cast("double")` image);
  *  - exact distances quantize each (xᵢ−cᵢ)² at scale 12 through
  *    [[DotExactKernel.quantUnscaledOrSkip]] — the same provably-
  *    agreeing fast path as the dot kernels — and sum unscaled longs;
  *  - argmins tie to the FIRST index (= `array_position(dists,
  *    array_min(dists))`), with null (length-mismatch) entries
  *    skipped, as array_min/array_position skip nulls.
  */
object CentroidKernels {

  @inline private def elem(v: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)

  /** Squared euclidean distances to every centroid: array<double>,
    * null entry on length mismatch (the zip_with null-propagation
    * image).
    */
  def dists(v: ArrayData, isFloat: Boolean,
      cents: Array[Array[Double]]): ArrayData = {
    val k = cents.length
    val n = v.numElements()
    val out = new Array[Any](k)
    var c = 0
    while (c < k) {
      val w = cents(c)
      if (w.length != n) out(c) = null
      else {
        var s = 0.0
        var i = 0
        while (i < n) { val t = elem(v, i, isFloat) - w(i); s += t * t; i += 1 }
        out(c) = java.lang.Double.valueOf(s)
      }
      c += 1
    }
    new GenericArrayData(out)
  }

  /** First-occurrence argmin cell (null when no centroid matches the
    * vector's length) — `(array_position(d, array_min(d)) - 1)`.
    */
  def nearest(v: ArrayData, isFloat: Boolean,
      cents: Array[Array[Double]]): Any = {
    val k = cents.length
    val n = v.numElements()
    var best = -1
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < k) {
      val w = cents(c)
      if (w.length == n) {
        var s = 0.0
        var i = 0
        while (i < n) { val t = elem(v, i, isFloat) - w(i); s += t * t; i += 1 }
        if (best < 0 || s < bestD) { best = c; bestD = s }
      }
      c += 1
    }
    if (best < 0) null else java.lang.Integer.valueOf(best)
  }

  /** First-occurrence argmin cell under the DECIMAL-EXACT distance
    * (scale-12 quantized terms, exact long sums): the value the
    * epsilon-banded fast-prune + exact-refine pipeline converges to —
    * with a native kernel the k·d exact quantizations per row are
    * cheap enough to skip the banding (and its posexplode + argmin
    * exchange) entirely. Ties resolve to the LOWEST cell, the
    * `min(struct(dist, cell))` image. Null on length mismatch.
    */
  def nearestExact(v: ArrayData, isFloat: Boolean,
      cents: Array[Array[Double]]): Any = {
    val k = cents.length
    val n = v.numElements()
    var best = -1
    var bestL = Long.MaxValue
    var c = 0
    while (c < k) {
      val w = cents(c)
      if (w.length == n) {
        var s = 0L
        var i = 0
        while (i < n) {
          val t = elem(v, i, isFloat) - w(i)
          val u = DotExactKernel.quantUnscaledOrSkip(t * t)
          if (u == Long.MinValue) {
            val d = Decimal(t * t)
            if (!d.changePrecision(18, 12))
              throw new ArithmeticException(
                s"nearestExact: (x-c)^2 = ${t * t} does not fit DECIMAL(18,12)")
            s += d.toUnscaledLong
          } else s += u
          i += 1
        }
        if (best < 0 || s < bestL) { best = c; bestL = s }
      }
      c += 1
    }
    if (best < 0) null else java.lang.Integer.valueOf(best)
  }

  /** Decimal-exact squared distance to centroid `idx`: each (xᵢ−cᵢ)²
    * quantized at scale 12, summed as unscaled longs →
    * DECIMAL(28,12). An element that cannot fit DECIMAL(18,12) (the
    * cast-overflow case — needs |xᵢ−cᵢ| ≥ 10³) takes the original
    * Spark Decimal path, which throws like the ANSI cast would.
    */
  def distExactSel(v: ArrayData, isFloat: Boolean, idx: Int,
      cents: Array[Array[Double]]): Any = {
    val w = cents(idx)
    val n = v.numElements()
    if (w.length != n) return null
    var sum = 0L
    var i = 0
    while (i < n) {
      val t = elem(v, i, isFloat) - w(i)
      val u = DotExactKernel.quantUnscaledOrSkip(t * t)
      if (u == Long.MinValue) {
        val d = Decimal(t * t)
        if (!d.changePrecision(18, 12))
          throw new ArithmeticException(
            s"distExactSel: (x-c)^2 = ${t * t} does not fit DECIMAL(18,12)")
        sum += d.toUnscaledLong
      } else sum += u
      i += 1
    }
    Decimal(sum, 28, 12)
  }

  /** PQ ADC lookup table: lut(j·ks + c) = sub-vector j · codeword c —
    * m·ks doubles per row, null entry when the vector is too short
    * for subspace j (the slice/zip_with null image).
    */
  def pqLut(v: ArrayData, isFloat: Boolean,
      books: Array[Array[Array[Double]]]): ArrayData = {
    val m = books.length
    val ks = books(0).length
    val ds = books(0)(0).length
    val n = v.numElements()
    val out = new Array[Any](m * ks)
    var j = 0
    while (j < m) {
      val off = j * ds
      val ok = off + ds <= n
      var c = 0
      while (c < ks) {
        if (!ok) out(j * ks + c) = null
        else {
          val w = books(j)(c)
          var s = 0.0
          var i = 0
          while (i < ds) { s += elem(v, off + i, isFloat) * w(i); i += 1 }
          out(j * ks + c) = java.lang.Double.valueOf(s)
        }
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Decimal-exact PQ ADC lookup table: each entry is
    * Σᵢ quant12(subⱼ(i)·codeword(i)) summed as unscaled longs, read
    * back through DECIMAL(38,12)→double — the
    * `dotExactHof(slice(v,…), lit(codeword))` image (same skip
    * convention as [[DotExactKernel]]).
    */
  def pqLutExact(v: ArrayData, isFloat: Boolean,
      books: Array[Array[Array[Double]]]): ArrayData = {
    val m = books.length
    val ks = books(0).length
    val ds = books(0)(0).length
    val n = v.numElements()
    val out = new Array[Any](m * ks)
    var j = 0
    while (j < m) {
      val off = j * ds
      val ok = off + ds <= n
      var c = 0
      while (c < ks) {
        if (!ok) out(j * ks + c) = null
        else {
          val w = books(j)(c)
          var s = 0L
          var i = 0
          while (i < ds) {
            val u = DotExactKernel.quantUnscaledOrSkip(elem(v, off + i, isFloat) * w(i))
            if (u != Long.MinValue) s += u
            i += 1
          }
          out(j * ks + c) = java.lang.Double.valueOf(Decimal(s, 38, 12).toDouble)
        }
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** PQ code assignment: codes(j) = first-occurrence argmin codeword
    * of sub-vector j. `exact` compares scale-12 quantized exact
    * distances (the decimal argmin image); plain compares doubles.
    */
  def pqAssign(v: ArrayData, isFloat: Boolean, exact: Boolean,
      books: Array[Array[Array[Double]]]): ArrayData = {
    val m = books.length
    val ks = books(0).length
    val ds = books(0)(0).length
    val n = v.numElements()
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val off = j * ds
      require(off + ds <= n,
        s"pqAssign: vector has $n elements, subspace $j needs ${off + ds}")
      var best = 0
      var bestD = Double.PositiveInfinity
      var bestL = Long.MaxValue
      var c = 0
      while (c < ks) {
        val w = books(j)(c)
        if (exact) {
          var s = 0L
          var i = 0
          while (i < ds) {
            val t = elem(v, off + i, isFloat) - w(i)
            val u = DotExactKernel.quantUnscaledOrSkip(t * t)
            if (u == Long.MinValue) {
              val d = Decimal(t * t)
              if (!d.changePrecision(18, 12))
                throw new ArithmeticException(
                  s"pqAssign: (x-c)^2 = ${t * t} does not fit DECIMAL(18,12)")
              s += d.toUnscaledLong
            } else s += u
            i += 1
          }
          if (c == 0 || s < bestL) { best = c; bestL = s }
        } else {
          var s = 0.0
          var i = 0
          while (i < ds) {
            val t = elem(v, off + i, isFloat) - w(i); s += t * t; i += 1
          }
          if (c == 0 || s < bestD) { best = c; bestD = s }
        }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Σⱼ ‖subⱼ − codeword(codesⱼ)‖² (plain double, sequential over j —
    * the `(0 until m).map(resid2).reduce(_ + _)` image).
    */
  def pqResid2(v: ArrayData, isFloat: Boolean, codes: ArrayData,
      books: Array[Array[Array[Double]]]): Double = {
    val m = books.length
    val ds = books(0)(0).length
    var total = 0.0
    var j = 0
    while (j < m) {
      val w = books(j)(codes.getInt(j))
      val off = j * ds
      var s = 0.0
      var i = 0
      while (i < ds) { val t = elem(v, off + i, isFloat) - w(i); s += t * t; i += 1 }
      total += s
      j += 1
    }
    total
  }
}

object CentroidExpressions {

  private def vecCheck(dt: DataType, fn: String): TypeCheckResult = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn requires ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }

  private def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  case class CentroidDists(child: Expression, cents: Array[Array[Double]])
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      vecCheck(child.dataType, prettyName)
    override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
    override def prettyName: String = "graft_centroid_dists"
    private def f = isFloat(child.dataType)
    override protected def nullSafeEval(v: Any): Any =
      CentroidKernels.dists(v.asInstanceOf[ArrayData], f, cents)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("cents", cents, "double[][]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.CentroidKernels.dists($c, $f, $ref)")
    }
    override protected def withNewChildInternal(c: Expression): CentroidDists =
      copy(child = c)
  }

  case class NearestCentroid(child: Expression, cents: Array[Array[Double]])
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      vecCheck(child.dataType, prettyName)
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_nearest_centroid"
    private def f = isFloat(child.dataType)
    override protected def nullSafeEval(v: Any): Any =
      CentroidKernels.nearest(v.asInstanceOf[ArrayData], f, cents)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("cents", cents, "double[][]")
      nullSafeCodeGen(ctx, ev, c => s"""
        Object r = graft.functions.CentroidKernels.nearest($c, $f, $ref);
        if (r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ((java.lang.Integer) r).intValue(); }
      """)
    }
    override protected def withNewChildInternal(c: Expression): NearestCentroid =
      copy(child = c)
  }

  case class NearestCentroidExact(child: Expression, cents: Array[Array[Double]])
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      vecCheck(child.dataType, prettyName)
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_nearest_centroid_exact"
    private def f = isFloat(child.dataType)
    override protected def nullSafeEval(v: Any): Any =
      CentroidKernels.nearestExact(v.asInstanceOf[ArrayData], f, cents)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("cents", cents, "double[][]")
      nullSafeCodeGen(ctx, ev, c => s"""
        Object r = graft.functions.CentroidKernels.nearestExact($c, $f, $ref);
        if (r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ((java.lang.Integer) r).intValue(); }
      """)
    }
    override protected def withNewChildInternal(c: Expression): NearestCentroidExact =
      copy(child = c)
  }

  case class CentroidDistExactSel(left: Expression, right: Expression,
      cents: Array[Array[Double]]) extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(FloatType, _) | ArrayType(DoubleType, _), IntegerType) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (ARRAY<FLOAT|DOUBLE>, INT), got (${l.sql}, ${r.sql})")
      }
    override def dataType: DataType = DecimalType(28, 12)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_centroid_dist_exact"
    private def f = isFloat(left.dataType)
    override protected def nullSafeEval(v: Any, idx: Any): Any =
      CentroidKernels.distExactSel(v.asInstanceOf[ArrayData], f,
        idx.asInstanceOf[Int], cents)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("cents", cents, "double[][]")
      nullSafeCodeGen(ctx, ev, (c, i) => s"""
        Object r = graft.functions.CentroidKernels.distExactSel($c, $f, $i, $ref);
        if (r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = (org.apache.spark.sql.types.Decimal) r; }
      """)
    }
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): CentroidDistExactSel = copy(left = l, right = r)
  }

  case class PqLutExpr(child: Expression, books: Array[Array[Array[Double]]])
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      vecCheck(child.dataType, prettyName)
    override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
    override def prettyName: String = "graft_pq_lut"
    private def f = isFloat(child.dataType)
    override protected def nullSafeEval(v: Any): Any =
      CentroidKernels.pqLut(v.asInstanceOf[ArrayData], f, books)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("books", books, "double[][][]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.CentroidKernels.pqLut($c, $f, $ref)")
    }
    override protected def withNewChildInternal(c: Expression): PqLutExpr =
      copy(child = c)
  }

  case class PqLutExactExpr(child: Expression, books: Array[Array[Array[Double]]])
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      vecCheck(child.dataType, prettyName)
    override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
    override def prettyName: String = "graft_pq_lut_exact"
    private def f = isFloat(child.dataType)
    override protected def nullSafeEval(v: Any): Any =
      CentroidKernels.pqLutExact(v.asInstanceOf[ArrayData], f, books)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("books", books, "double[][][]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.CentroidKernels.pqLutExact($c, $f, $ref)")
    }
    override protected def withNewChildInternal(c: Expression): PqLutExactExpr =
      copy(child = c)
  }

  case class PqAssignExpr(child: Expression, books: Array[Array[Array[Double]]],
      exact: Boolean) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      vecCheck(child.dataType, prettyName)
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "graft_pq_assign"
    private def f = isFloat(child.dataType)
    override protected def nullSafeEval(v: Any): Any =
      CentroidKernels.pqAssign(v.asInstanceOf[ArrayData], f, exact, books)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("books", books, "double[][][]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.CentroidKernels.pqAssign($c, $f, $exact, $ref)")
    }
    override protected def withNewChildInternal(c: Expression): PqAssignExpr =
      copy(child = c)
  }

  case class PqResid2Expr(left: Expression, right: Expression,
      books: Array[Array[Array[Double]]]) extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(FloatType, _) | ArrayType(DoubleType, _),
            ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (ARRAY<FLOAT|DOUBLE>, ARRAY<INT>), got (${l.sql}, ${r.sql})")
      }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_pq_resid2"
    private def f = isFloat(left.dataType)
    override protected def nullSafeEval(v: Any, codes: Any): Any =
      CentroidKernels.pqResid2(v.asInstanceOf[ArrayData], f,
        codes.asInstanceOf[ArrayData], books)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("books", books, "double[][][]")
      defineCodeGen(ctx, ev, (c, cd) =>
        s"graft.functions.CentroidKernels.pqResid2($c, $f, $cd, $ref)")
    }
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): PqResid2Expr = copy(left = l, right = r)
  }

  def dists(v: Column, cents: Array[Array[Double]]): Column =
    ColumnBridge.column(CentroidDists(ColumnBridge.expression(v), cents))
  def nearest(v: Column, cents: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(v), cents))
  def nearestExact(v: Column, cents: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroidExact(ColumnBridge.expression(v), cents))
  def distExactSel(v: Column, idx: Column, cents: Array[Array[Double]]): Column =
    ColumnBridge.column(CentroidDistExactSel(ColumnBridge.expression(v),
      ColumnBridge.expression(idx), cents))
  def pqLut(v: Column, books: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqLutExpr(ColumnBridge.expression(v), books))
  def pqLutExact(v: Column, books: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqLutExactExpr(ColumnBridge.expression(v), books))
  def pqAssign(v: Column, books: Array[Array[Array[Double]]], exact: Boolean): Column =
    ColumnBridge.column(PqAssignExpr(ColumnBridge.expression(v), books, exact))
  def pqResid2(v: Column, codes: Column, books: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqResid2Expr(ColumnBridge.expression(v),
      ColumnBridge.expression(codes), books))
}
