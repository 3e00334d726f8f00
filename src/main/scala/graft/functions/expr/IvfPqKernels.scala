package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** IVF-PQ kernels: coarse-quantizer cell assignment and RESIDUAL
  * product-quantization (encode `v − c_cell` instead of `v` — residuals
  * cluster far tighter than raw vectors, so the same codebook budget
  * buys much lower quantization error; the FAISS IVFPQ construction).
  *
  * Same design rules as [[PqEncode]]: one codegen'd pass per row, the
  * driver-held models (centroid table, codebook) attached as reference
  * objects, map-only — the corpus is never shuffled to be assigned,
  * encoded, or scored. The residual subtraction is fused INTO the
  * distance loops (`(v_i − cent_i) − cw_i`), so no intermediate
  * residual vector is materialized per row.
  *
  * Centroid layout: flat `[cell][d]` row-major, length nCells·dim.
  */
case class NearestCell(child: Expression, cents: Array[Double], dim: Int)
    extends UnaryExpression {

  require(dim >= 1 && cents.nonEmpty && cents.length % dim == 0,
    s"centroid array length ${cents.length} must be a multiple of dim=$dim")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    PqCommon.checkVec(child.dataType, "nearest_cell")

  override def nullSafeEval(input: Any): Any =
    NearestCell.compute(input.asInstanceOf[ArrayData],
      PqCommon.isFloat(child), cents, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCents", cents, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.NearestCell.compute($c, ${PqCommon.isFloat(child)}, $cRef, $dim);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

object NearestCell {
  /** argmin over cells of |v − c|² (ties to the lowest cell id). */
  def compute(v: ArrayData, isFloat: Boolean, cents: Array[Double],
              dim: Int): Int = {
    require(v.numElements() == dim, s"vector dim ${v.numElements()} != $dim")
    val nCells = cents.length / dim
    var best = 0; var bestD = Double.MaxValue
    var cell = 0
    while (cell < nCells) {
      var d = 0.0; var i = 0
      val off = cell * dim
      while (i < dim) {
        val diff = PqCommon.elem(v, i, isFloat) - cents(off + i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = cell }
      cell += 1
    }
    best
  }
}

/** vector → array<double> of squared distances to every cell centroid
  * (query-side multi-probe: rank and take the closest nProbe cells). */
case class CellDists(child: Expression, cents: Array[Double], dim: Int)
    extends UnaryExpression {

  require(dim >= 1 && cents.nonEmpty && cents.length % dim == 0)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    PqCommon.checkVec(child.dataType, "cell_dists")

  override def nullSafeEval(input: Any): Any =
    CellDists.compute(input.asInstanceOf[ArrayData],
      PqCommon.isFloat(child), cents, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCents", cents, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.CellDists.compute($c, ${PqCommon.isFloat(child)}, $cRef, $dim);")
  }

  override protected def withNewChildInternal(newChild: Expression): CellDists =
    copy(child = newChild)
}

object CellDists {
  def compute(v: ArrayData, isFloat: Boolean, cents: Array[Double],
              dim: Int): ArrayData = {
    require(v.numElements() == dim, s"vector dim ${v.numElements()} != $dim")
    val nCells = cents.length / dim
    val out = new Array[Double](nCells)
    var cell = 0
    while (cell < nCells) {
      var d = 0.0; var i = 0
      val off = cell * dim
      while (i < dim) {
        val diff = PqCommon.elem(v, i, isFloat) - cents(off + i)
        d += diff * diff
        i += 1
      }
      out(cell) = d
      cell += 1
    }
    new GenericArrayData(out)
  }
}

/** (vector, cell) → array<int> of m codes for the RESIDUAL v − c_cell. */
case class PqEncodeRes(left: Expression, right: Expression,
                       cents: Array[Double], dim: Int,
                       m: Int, k: Int, codebook: Array[Double])
    extends BinaryExpression {

  require(dim >= 1 && cents.length % dim == 0 && cents.nonEmpty)
  require(m >= 1 && dim % m == 0, s"dim $dim must divide into m=$m subspaces")
  require(k >= 1 && codebook.length == m * k * (dim / m),
    s"codebook length ${codebook.length} != m*k*subDim ${m * k * (dim / m)}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    PqCommon.checkVec(left.dataType, "pq_encode_res") match {
      case r if !r.isSuccess => r
      case _ => right.dataType match {
        case IntegerType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"pq_encode_res cell must be int, got ${other.simpleString}")
      }
    }

  override def nullSafeEval(v: Any, cell: Any): Any =
    PqEncodeRes.compute(v.asInstanceOf[ArrayData], cell.asInstanceOf[Int],
      PqCommon.isFloat(left), cents, dim, m, k, codebook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCents", cents, "double[]")
    val cbRef = ctx.addReferenceObj("pqCb", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, (v, cell) =>
      s"${ev.value} = graft.functions.expr.PqEncodeRes.compute($v, $cell, ${PqCommon.isFloat(left)}, $cRef, $dim, $m, $k, $cbRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeRes =
    copy(left = newLeft, right = newRight)
}

object PqEncodeRes {
  def compute(v: ArrayData, cell: Int, isFloat: Boolean,
              cents: Array[Double], dim: Int,
              m: Int, k: Int, cb: Array[Double]): ArrayData = {
    require(v.numElements() == dim, s"vector dim ${v.numElements()} != $dim")
    require(cell >= 0 && cell < cents.length / dim,
      s"cell $cell out of range [0, ${cents.length / dim})")
    val subDim = dim / m
    val cOff = cell * dim
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
          // residual subtraction fused into the distance loop
          val diff = (PqCommon.elem(v, vOff + i, isFloat) - cents(cOff + vOff + i)) - cb(cbOff + i)
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

/** (query vector, probed cell) → flat m·k ADC table for the residual
  * q − c_cell (one table per probed cell, built on the tiny query side). */
case class PqDistTableRes(left: Expression, right: Expression,
                          cents: Array[Double], dim: Int,
                          m: Int, k: Int, codebook: Array[Double])
    extends BinaryExpression {

  require(dim >= 1 && cents.length % dim == 0 && cents.nonEmpty)
  require(m >= 1 && dim % m == 0, s"dim $dim must divide into m=$m subspaces")
  require(k >= 1 && codebook.length == m * k * (dim / m))

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    PqCommon.checkVec(left.dataType, "pq_dist_table_res") match {
      case r if !r.isSuccess => r
      case _ => right.dataType match {
        case IntegerType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"pq_dist_table_res cell must be int, got ${other.simpleString}")
      }
    }

  override def nullSafeEval(v: Any, cell: Any): Any =
    PqDistTableRes.compute(v.asInstanceOf[ArrayData], cell.asInstanceOf[Int],
      PqCommon.isFloat(left), cents, dim, m, k, codebook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCents", cents, "double[]")
    val cbRef = ctx.addReferenceObj("pqCb", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, (v, cell) =>
      s"${ev.value} = graft.functions.expr.PqDistTableRes.compute($v, $cell, ${PqCommon.isFloat(left)}, $cRef, $dim, $m, $k, $cbRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqDistTableRes =
    copy(left = newLeft, right = newRight)
}

object PqDistTableRes {
  def compute(v: ArrayData, cell: Int, isFloat: Boolean,
              cents: Array[Double], dim: Int,
              m: Int, k: Int, cb: Array[Double]): ArrayData = {
    require(v.numElements() == dim, s"vector dim ${v.numElements()} != $dim")
    require(cell >= 0 && cell < cents.length / dim,
      s"cell $cell out of range [0, ${cents.length / dim})")
    val subDim = dim / m
    val cOff = cell * dim
    val out = new Array[Double](m * k)
    var sub = 0
    while (sub < m) {
      var code = 0
      while (code < k) {
        var d = 0.0; var i = 0
        val cbOff = (sub * k + code) * subDim
        val vOff = sub * subDim
        while (i < subDim) {
          val diff = (PqCommon.elem(v, vOff + i, isFloat) - cents(cOff + vOff + i)) - cb(cbOff + i)
          d += diff * diff
          i += 1
        }
        out(sub * k + code) = d
        code += 1
      }
      sub += 1
    }
    new GenericArrayData(out)
  }
}

/** vector → nearest centroid index by COSINE (argmax, ties to the lowest
  * cell id) — the assignment kernel of the cosine Lloyd's trainer
  * ([[graft.ops.Ann.kmeansCentroids]]). Same design rules as
  * [[NearestCell]]: the driver-held model rides as a reference object,
  * one codegen'd pass per row, map-only — the corpus is never joined or
  * windowed to be assigned. Centroid norms are precomputed once on the
  * driver (k values), so each row pays one self-dot plus k dot products
  * — not 3k array folds. */
case class NearestCentroidCos(child: Expression, cents: Array[Double], dim: Int)
    extends UnaryExpression {

  require(dim >= 1 && cents.nonEmpty && cents.length % dim == 0,
    s"centroid array length ${cents.length} must be a multiple of dim=$dim")

  @transient private lazy val norms: Array[Double] =
    NearestCentroidCos.cellNorms(cents, dim)

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    PqCommon.checkVec(child.dataType, "nearest_centroid_cos")

  override def nullSafeEval(input: Any): Any =
    NearestCentroidCos.compute(input.asInstanceOf[ArrayData],
      PqCommon.isFloat(child), cents, norms, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("kmCents", cents, "double[]")
    val nRef = ctx.addReferenceObj("kmNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.NearestCentroidCos.compute($c, ${PqCommon.isFloat(child)}, $cRef, $nRef, $dim);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidCos =
    copy(child = newChild)
}

object NearestCentroidCos {
  def cellNorms(cents: Array[Double], dim: Int): Array[Double] = {
    val n = cents.length / dim
    val out = new Array[Double](n)
    var cell = 0
    while (cell < n) {
      var s = 0.0; var i = 0
      val off = cell * dim
      while (i < dim) { val x = cents(off + i); s += x * x; i += 1 }
      out(cell) = math.sqrt(s)
      cell += 1
    }
    out
  }

  /** argmax over cells of cos(v, c) — zero-norm pairs score 0, matching
    * [[graft.functions.Vectors.cosine]]. */
  def compute(v: ArrayData, isFloat: Boolean, cents: Array[Double],
              norms: Array[Double], dim: Int): Int = {
    require(v.numElements() == dim, s"vector dim ${v.numElements()} != $dim")
    val nCells = cents.length / dim
    var nv = 0.0
    var i = 0
    while (i < dim) { val x = PqCommon.elem(v, i, isFloat); nv += x * x; i += 1 }
    val sv = math.sqrt(nv)
    var best = 0; var bestCos = Double.NegativeInfinity
    var cell = 0
    while (cell < nCells) {
      var dot = 0.0; var j = 0
      val off = cell * dim
      while (j < dim) { dot += PqCommon.elem(v, j, isFloat) * cents(off + j); j += 1 }
      val denom = sv * norms(cell)
      val cos = if (denom > 0.0) dot / denom else 0.0
      if (cos > bestCos) { bestCos = cos; best = cell }
      cell += 1
    }
    best
  }
}
