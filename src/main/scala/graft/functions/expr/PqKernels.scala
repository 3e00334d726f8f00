package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Product-quantization kernels — the map-only hot path of PQ-ANN.
  *
  * A PQ index splits each `dim`-vector into `m` subvectors and replaces
  * every subvector with the id of its nearest codeword from a per-
  * subspace codebook (k codewords each): a vector compresses to `m`
  * small ints, and distances are evaluated against the codes with one
  * table lookup per subspace (ADC). At 100 TB this is what makes the
  * similarity index fit in memory: 64 floats → 8 bytes per vector.
  *
  * All three steps are custom codegen'd expressions (one tight loop per
  * row, codebook attached as a reference object) so encoding runs at
  * scan bandwidth with NO shuffle and scoring stays inside whole-stage
  * codegen — the interpreted higher-order-function formulation would pay
  * ~1 µs per element-touch (see the engine's HOF performance contract).
  *
  * Codebook layout: flat `[sub][code][d]` row-major, length m·k·subDim.
  */
private[graft] object PqCommon {
  def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  def checkVec(dt: DataType, what: String)
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$what requires array<float|double>, got ${other.simpleString}")
  }

  def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** vector → array<int> of m codewords (argmin L2² per subspace, ties to
  * the lowest code id). */
case class PqEncode(child: Expression, m: Int, k: Int, codebook: Array[Double])
    extends UnaryExpression {

  require(m >= 1 && k >= 1 && codebook.length % (m * k) == 0 && codebook.nonEmpty,
    s"codebook length ${codebook.length} must be a positive multiple of m*k=${m * k}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    PqCommon.checkVec(child.dataType, "pq_encode")

  override def nullSafeEval(input: Any): Any =
    PqEncode.compute(input.asInstanceOf[ArrayData],
      PqCommon.isFloat(child), m, k, codebook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.PqEncode.compute($c, ${PqCommon.isFloat(child)}, $m, $k, $cbRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  def compute(v: ArrayData, isFloat: Boolean, m: Int, k: Int,
              cb: Array[Double]): ArrayData = {
    val subDim = cb.length / (m * k)
    require(v.numElements() == m * subDim,
      s"vector dim ${v.numElements()} != m*subDim ${m * subDim}")
    val codes = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      var best = 0; var bestD = Double.MaxValue
      var code = 0
      while (code < k) {
        var d = 0.0; var i = 0
        val cbOff = (sub * k + code) * subDim
        val vOff = sub * subDim
        while (i < subDim) {
          val diff = PqCommon.elem(v, vOff + i, isFloat) - cb(cbOff + i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = code }
        code += 1
      }
      codes(sub) = best
      sub += 1
    }
    new GenericArrayData(codes)
  }
}

/** query vector → flat m·k array<double> of squared distances to every
  * codeword (the ADC lookup table, built once per query row). */
case class PqDistTable(child: Expression, m: Int, k: Int, codebook: Array[Double])
    extends UnaryExpression {

  require(m >= 1 && k >= 1 && codebook.length % (m * k) == 0 && codebook.nonEmpty)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    PqCommon.checkVec(child.dataType, "pq_dist_table")

  override def nullSafeEval(input: Any): Any =
    PqDistTable.compute(input.asInstanceOf[ArrayData],
      PqCommon.isFloat(child), m, k, codebook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.PqDistTable.compute($c, ${PqCommon.isFloat(child)}, $m, $k, $cbRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqDistTable =
    copy(child = newChild)
}

object PqDistTable {
  def compute(v: ArrayData, isFloat: Boolean, m: Int, k: Int,
              cb: Array[Double]): ArrayData = {
    val subDim = cb.length / (m * k)
    require(v.numElements() == m * subDim,
      s"vector dim ${v.numElements()} != m*subDim ${m * subDim}")
    val table = new Array[Double](m * k)
    var sub = 0
    while (sub < m) {
      var code = 0
      while (code < k) {
        var d = 0.0; var i = 0
        val cbOff = (sub * k + code) * subDim
        val vOff = sub * subDim
        while (i < subDim) {
          val diff = PqCommon.elem(v, vOff + i, isFloat) - cb(cbOff + i)
          d += diff * diff
          i += 1
        }
        table(sub * k + code) = d
        code += 1
      }
      sub += 1
    }
    new GenericArrayData(table)
  }
}

/** (codes, distTable) → approximate squared distance: Σ_sub
  * table[sub·k + codes[sub]]. One lookup per subspace. */
case class PqAdc(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc requires (array<int>, array<double>), got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(codes: Any, table: Any): Any =
    PqAdc.compute(codes.asInstanceOf[ArrayData], table.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t) =>
      s"${ev.value} = graft.functions.expr.PqAdc.compute($c, $t, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  def compute(codes: ArrayData, table: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    require(table.numElements() == m * k,
      s"table length ${table.numElements()} != m*k ${m * k}")
    var s = 0.0; var sub = 0
    while (sub < m) {
      s += table.getDouble(sub * k + codes.getInt(sub))
      sub += 1
    }
    s
  }
}
