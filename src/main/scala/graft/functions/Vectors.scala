package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns.
  *
  * Pure Column expressions (`zip_with` + `aggregate`) → codegen'd, no UDF,
  * no driver round-trip. Elements are cast to double before multiply so
  * accumulation is a deterministic left-to-right double sum — the DuckDB
  * oracle reproduces the identical fold.
  */
object Vectors {

  /** Dot product of two equal-length float/double arrays, accumulated in
    * double in index order. Backed by the codegen'd [[graft.functions.
    * expr.VectorDot]] expression (the equivalent `aggregate∘zip_with`
    * fold runs interpreted per element and dominates ANN pair joins). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.expr.VectorDot(ColumnBridge.expr(a), ColumnBridge.expr(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 for zero-norm inputs. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn > 0.0, d / nn).otherwise(lit(0.0))
  }

  /** Deterministic ±1 hyperplane coefficients: plane j's i-th entry from
    * the low bit of md5("j:i") (md5("seed:j:i") for seed ≠ 0 —
    * independent plane families for banded LSH), computed at
    * plan-build time (JVM) and inlined as literals into both the Spark
    * plan and the DuckDB oracle. */
  def deterministicPlanes(dim: Int, planes: Int, seed: Int = 0): Seq[Seq[Double]] =
    (0 until planes).map { j =>
      (0 until dim).map { i =>
        val key = if (seed == 0) s"$j:$i" else s"$seed:$j:$i"
        val dig = java.security.MessageDigest.getInstance("MD5")
          .digest(key.getBytes("UTF-8"))
        if ((dig(dig.length - 1) & 1) == 1) 1.0 else -1.0
      }
    }

  /** Johnson-Lindenstrauss random projection to `k` dims: the VALUE
    * path of the same deterministic ±1 planes the LSH bucket uses for
    * signs — `(1/√k)·Rx` (Achlioptas 2003: ±1 entries satisfy the JL
    * lemma with the same guarantees as Gaussian R). Map-only: k
    * codegen'd dots against literal coefficient arrays; the identical
    * literals inline into the DuckDB oracle, so projections
    * hash-match. The model-free cousin of [[graft.ops.Pca.project]] —
    * no training pass, distance preservation in expectation instead
    * of variance-optimal. */
  def randomProject(vec: Column, dim: Int, k: Int, seed: Int = 0): Seq[Column] = {
    val scale = 1.0 / math.sqrt(k.toDouble)
    deterministicPlanes(dim, k, seed).map(p =>
      dot(vec, typedLit(p)) * scale)
  }

  /** Random-hyperplane (SimHash-for-vectors) LSH bucket id: the p-bit
    * sign pattern of the plane dot products. Coefficients are literal
    * arrays → the whole bucket id is one codegen'd projection per row.
    */
  def hyperplaneBucket(vec: Column, dim: Int, planes: Int, seed: Int = 0): Column = {
    val coefs = deterministicPlanes(dim, planes, seed)
    coefs.zipWithIndex.map { case (plane, j) =>
      val s = dot(vec, typedLit(plane))
      when(s > 0.0, lit(1L << j)).otherwise(0L)
    }.reduce[Column](_ + _)
  }
}
