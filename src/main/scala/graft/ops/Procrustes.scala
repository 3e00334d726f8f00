package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Orthogonal Procrustes alignment between two embedding SPACES — the
  * model-migration primitive: when an embedding model is retrained or
  * upgraded, re-embedding 100 TB of corpus is a full recompute, but the
  * two spaces usually differ by (approximately) a rotation. Fit R =
  * argmin over orthogonal R of ‖A·R − B‖_F on a PAIRED sample (docs
  * embedded under both models), then map old vectors into the new space
  * with one map-only pass — the stored ANN index, centroids, and
  * codebooks keep serving.
  *
  * Classic closed form (Schönemann 1966): R = U·Vᵀ with U·Σ·Vᵀ the SVD
  * of M = Aᵀ·B. Distributed shape:
  *   - M comes from ONE [[Pca.moments]] pass over concat(a, b): the
  *     2d-dim upper-triangle Σxxᵀ contains every cross term Σ aᵢ·bⱼ in
  *     its off-diagonal block — per-partition summaries of ~(2d)²/2
  *     doubles, never a per-row outer-product explosion (the
  *     covariance shape at d=64: ~67 KB per partition);
  *   - the SVD is a driver-side d×d solve on the symmetric Jacobi
  *     eigensolver already backing PCA (MᵀM = V·Σ²·Vᵀ, U = M·V·Σ⁻¹);
  *     R is invariant to the solver's per-column sign/order
  *     conventions (flipping a column of V flips the matching column
  *     of U; U·Vᵀ is unchanged);
  *   - application is map-only: output coordinate l is a codegen'd
  *     in-order dot of the input with column l of R
  *     ([[graft.functions.expr.VectorDot]]), so the DuckDB oracle can
  *     replay it from the exported rotation exactly.
  */
object Procrustes {

  /** M[i][j] = Σ_rows a_i · b_j via one moments pass over concat(a,b).
    * Upper-triangle flat index for (i ≤ j) at dim D: i·D − i(i−1)/2 +
    * (j − i); the cross block is i < d ≤ j, always upper. */
  def crossGram(pairs: DataFrame, aCol: String, bCol: String,
                dim: Int): Array[Array[Double]] = {
    val bigDim = 2 * dim
    val row = pairs
      .agg(Pca.moments(
        concat(col(aCol).cast("array<double>"), col(bCol).cast("array<double>")),
        bigDim).as("m"))
      .select(col("m.ss")).head()
    val ss = row.getSeq[Double](0)
    def idx(i: Int, j: Int) = i * bigDim - (i * (i - 1)) / 2 + (j - i)
    Array.tabulate(dim, dim)((i, j) => ss(idx(i, dim + j)))
  }

  /** R = U·Vᵀ from the SVD of `m`, via the symmetric eigenproblem.
    * Near-zero singular values leave their subspace uncontributed (the
    * data does not constrain it); full-rank pairs never hit this. */
  def rotationFromGram(m: Array[Array[Double]]): Array[Array[Double]] = {
    val d = m.length
    val mtm = Array.tabulate(d, d) { (i, j) =>
      var s = 0.0; var k = 0
      while (k < d) { s += m(k)(i) * m(k)(j); k += 1 }
      s
    }
    val (ev, vecs) = Pca.jacobiEigen(mtm) // vecs(j) = eigenvector j
    val r = Array.ofDim[Double](d, d)
    var j = 0
    while (j < d) {
      val sigma = math.sqrt(math.max(ev(j), 0.0))
      if (sigma > 1e-9) {
        val u = Array.tabulate(d) { i =>
          var s = 0.0; var k = 0
          while (k < d) { s += m(i)(k) * vecs(j)(k); k += 1 }
          s / sigma
        }
        var i = 0
        while (i < d) {
          var l = 0
          while (l < d) { r(i)(l) += u(i) * vecs(j)(l); l += 1 }
          i += 1
        }
      }
      j += 1
    }
    r
  }

  def fit(pairs: DataFrame, aCol: String, bCol: String,
          dim: Int): Array[Array[Double]] =
    rotationFromGram(crossGram(pairs, aCol, bCol, dim))

  /** Train-once rotation store (the PCA-projector lifecycle): rows
    * (comp_id = output coordinate l, vec = column l of R, i.e. the
    * weights the in-order dot applies to the OLD vector). */
  def fitStored(spark: SparkSession, pairs: DataFrame, aCol: String,
                bCol: String, dim: Int, path: String): Array[Array[Double]] = {
    import spark.implicits._
    if (!Stores.exists(spark, path, "_SUCCESS")) {
      val r = fit(pairs, aCol, bCol, dim)
      (0 until dim).map(l => (l, (0 until dim).map(i => r(i)(l))))
        .toDF("comp_id", "vec")
        .coalesce(1).write.mode("overwrite").parquet(path)
    }
    val back = spark.read.parquet(path).orderBy(col("comp_id"))
      .collect().map(_.getSeq[Double](1).toArray)
    require(back.length == dim, s"malformed rotation store at $path")
    Array.tabulate(dim, dim)((i, l) => back(l)(i))
  }

  /** Map-only application: aligned_l = Σ_i v_i · R[i][l], one codegen'd
    * in-order dot per output coordinate. */
  def align(df: DataFrame, vecCol: String, r: Array[Array[Double]],
            outCol: String = "avec"): DataFrame = {
    val d = r.length
    val coords = (0 until d).map { l =>
      graft.functions.Vectors.dot(col(vecCol),
        typedlit((0 until d).map(i => r(i)(l))))
    }
    df.withColumn(outCol, array(coords: _*))
  }
}
