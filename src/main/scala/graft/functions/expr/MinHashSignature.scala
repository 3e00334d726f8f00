package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-signature MinHash in one codegen'd pass per row.
  *
  * Replaces the explode→hash→k×min-aggregate formulation
  * (graft.ops.Dedup.minhashSignatures' original shape): that pipeline
  * shuffles one row per (doc, shingle) and re-aggregates, while this
  * expression walks the token array once — shingle bytes → md5 prefix →
  * k affine permutations, tracking k running minima in registers — and
  * emits the finished signature from the scan stage with NO exchange.
  * At 100 TB that converts the signature build from a full shuffle of
  * the shingle instance table into a map-only projection.
  *
  * Parity contract (bit-identical with the DuckDB oracle and the
  * aggregate formulation):
  *  - shingle string = `shingleLen` consecutive tokens joined by " ";
  *  - base hash = first 7 hex chars of md5(shingle) as a 28-bit long;
  *  - sig[j] = min over shingles of (h·a_j + b_j) mod P  (P = 2^31−1);
  *  - fewer than `shingleLen` tokens → NULL signature (callers let the
  *    null band key fall out of the inner bucket join — an isNotNull
  *    filter would be alias-substituted below the projection by
  *    PushDownPredicates and evaluate the signature twice).
  *
  * Duplicate shingles need no dedup: min() is duplicate-insensitive.
  */
case class MinHashSignature(child: Expression, shingleLen: Int,
                            as: Array[Long], bs: Array[Long])
    extends UnaryExpression {

  require(as.length == bs.length && as.nonEmpty)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature requires array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], shingleLen, as, bs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("mhAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("mhBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.expr.MinHashSignature.compute(
         |  $c, $shingleLen, $asRef, $bsRef);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  val P: Long = 2147483647L // Mersenne prime; 28-bit base × 31-bit coeff stays exact

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static helper invoked from generated code (one call per row; tight
    * loops inside — no per-element dispatch). Returns null when the doc
    * has fewer than `n` tokens. */
  def compute(toks: ArrayData, n: Int, as: Array[Long], bs: Array[Long]): ArrayData = {
    val nToks = toks.numElements()
    if (nToks < n) return null
    val k = as.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val digest = md5.get()
    val space = ' '.toByte
    var i = 0
    while (i <= nToks - n) {
      digest.reset()
      var j = 0
      while (j < n) {
        if (j > 0) digest.update(space)
        val t = toks.getUTF8String(i + j)
        if (t == null) return null // null token: mirror lambda null semantics
        digest.update(t.getBytes)
        j += 1
      }
      val d = digest.digest()
      // first 7 hex chars = top 28 bits, big-endian
      val h = ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
        ((d(2) & 0xffL) << 4) | ((d(3) & 0xf0L) >> 4)
      var c = 0
      while (c < k) {
        val v = (h * as(c) + bs(c)) % P
        if (v < mins(c)) mins(c) = v
        c += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
