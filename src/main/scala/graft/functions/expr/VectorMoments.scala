package graft.functions.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass first + second moments of a dense `array<float|double>`
  * column of fixed dimension `dim`:
  *
  *   n, s_i = Σ x_i, ss_{ij} = Σ x_i·x_j (upper triangle, i ≤ j)
  *
  * — everything a covariance/Gram/PCA fit needs, as a single native
  * [[TypedImperativeAggregate]]. The buffer is one double array of
  * `1 + d + d(d+1)/2` slots (d = 64 → ~17 KB), so partial aggregation
  * runs map-side and only O(d²) summaries cross the exchange — the
  * 100 TB shape for covariance: one scan, one tiny shuffle, never a
  * per-row outer-product explosion (a posexplode/self-join formulation
  * ships d² rows per input row through the shuffle).
  *
  * Count lives in slot 0 as a double: exact to 2⁵³ rows, far beyond
  * any corpus. Rows whose vector is null, has a null element, or has
  * fewer than `dim` elements are skipped (counted in neither n nor the
  * sums) — same row-discipline as the ANN kernels. Merge is slot-wise
  * addition, associative and commutative; double-rounding differences
  * across partitionings stay at the 1-ulp level and every consumer
  * rounds (the oracle compares at 6 decimals).
  */
case class VectorMoments(child: Expression, dim: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]]
    with UnaryLike[Expression] {

  require(dim >= 1, s"dim must be >= 1, got $dim")

  private val triLen = dim * (dim + 1) / 2
  private val bufLen = 1 + dim + triLen

  override def prettyName: String = "vector_moments"

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("s", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("ss", ArrayType(DoubleType, containsNull = false), nullable = false)))

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_moments requires array<float|double>, got ${other.simpleString}")
  }

  // lazy: child.dataType is not an ArrayType until the plan resolves
  private lazy val elemIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def createAggregationBuffer(): Array[Double] = new Array[Double](bufLen)

  override def update(buf: Array[Double], row: InternalRow): Array[Double] = {
    val v = child.eval(row)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() >= dim) {
        val x = new Array[Double](dim)
        var i = 0
        while (i < dim) {
          if (arr.isNullAt(i)) return buf
          x(i) = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          i += 1
        }
        buf(0) += 1.0
        i = 0
        var t = 1 + dim
        while (i < dim) {
          buf(1 + i) += x(i)
          var j = i
          while (j < dim) {
            buf(t) += x(i) * x(j)
            t += 1; j += 1
          }
          i += 1
        }
      }
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < bufLen) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any = {
    val s = new Array[Any](dim)
    var i = 0
    while (i < dim) { s(i) = buf(1 + i); i += 1 }
    val ss = new Array[Any](triLen)
    i = 0
    while (i < triLen) { ss(i) = buf(1 + dim + i); i += 1 }
    new GenericInternalRow(Array[Any](
      buf(0).toLong, new GenericArrayData(s), new GenericArrayData(ss)))
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bufLen * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < bufLen) { out.writeDouble(buf(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Double](bufLen)
    var i = 0
    while (i < bufLen) { buf(i) = in.readDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorMoments =
    copy(child = newChild)
}
