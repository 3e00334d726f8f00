package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Shared md5-prefix hashing for the one-pass text expressions.
  * Parity: `hexLen` hex chars of md5(bytes) as a non-negative Long —
  * identical to Spark `conv(substring(md5(x),1,hexLen),16,10)` and
  * DuckDB `CAST('0x'||substr(md5(x),1,hexLen) AS BIGINT)`. */
private[expr] object Md5Prefix {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def digest(): java.security.MessageDigest = { val d = tl.get(); d.reset(); d }

  /** First `hexLen` (≤ 15) hex digits of the digest as a Long. */
  def prefix(d: Array[Byte], hexLen: Int): Long = {
    var v = 0L; var i = 0
    while (i < hexLen) {
      val b = d(i / 2) & 0xff
      val nibble = if (i % 2 == 0) b >> 4 else b & 0xf
      v = (v << 4) | nibble
      i += 1
    }
    v
  }
}

/** DISTINCT hashes of the `n`-token shingles of a token array, one
  * codegen'd pass per row — replaces the interpreted
  * zip_with-chain + array_distinct + per-shingle md5 pipeline
  * (Spark higher-order lambdas run through the interpreter). Output
  * order = first occurrence; callers treat it as a set. Fewer than `n`
  * tokens → empty array (mirrors the zip_with formulation). */
case class ShingleHashes(child: Expression, n: Int, hexLen: Int)
    extends UnaryExpression {

  require(n >= 1 && hexLen >= 1 && hexLen <= 15)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes requires array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[ArrayData], n, hexLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.ShingleHashes.compute($c, $n, $hexLen);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private val space = ' '.toByte

  def compute(toks: ArrayData, n: Int, hexLen: Int): ArrayData = {
    val nToks = toks.numElements()
    if (nToks < n) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= nToks - n) {
      val d = Md5Prefix.digest()
      var j = 0
      var ok = true
      while (j < n && ok) {
        if (j > 0) d.update(space)
        val t = toks.getUTF8String(i + j)
        if (t == null) ok = false else d.update(t.getBytes)
        j += 1
      }
      if (ok) seen.add(Md5Prefix.prefix(d.digest(), hexLen))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator(); var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

/** 48-bit SimHash over the DISTINCT tokens of a token array, one
  * codegen'd pass per row — replaces 48 interpreted `aggregate` vote
  * folds each re-reading the token-hash array. Parity contract: token
  * hash = 15-hex-char md5 prefix of ("0" ++ token) (seed 0, matching
  * `Text.hash64`); signature bit i set iff strictly more distinct-token
  * hashes have bit i set than clear. */
case class SimHash48(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash48 requires array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    SimHash48.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // Scala default args don't exist in bytecode — the JVM method is
    // compute(ArrayData, int), so the bits argument must be emitted here.
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.SimHash48.compute($c, ${SimHash48.BITS});")

  override protected def withNewChildInternal(newChild: Expression): SimHash48 =
    copy(child = newChild)
}

object SimHash48 {
  private val zero = '0'.toByte
  val BITS = 48

  def compute(toks: ArrayData, bits: Int = BITS): Long = {
    val nToks = toks.numElements()
    val votes = new Array[Int](bits)
    // distinct at the TOKEN level, exactly like array_distinct(tokens)
    // in the reference formulation and list_distinct in the oracle
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i < nToks) {
      val t = toks.getUTF8String(i)
      if (t != null && seen.add(t)) {
        val d = Md5Prefix.digest()
        d.update(zero) // seed 0 prefix, matching Text.hash64(_, 0)
        d.update(t.getBytes)
        val h = Md5Prefix.prefix(d.digest(), 15)
        var b = 0
        while (b < bits) {
          if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L; var b = 0
    while (b < bits) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }
}
