package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.expr.VectorMoments

/** Principal-component analysis over an embedding column, Spark-first:
  *
  *  - FIT is one pass — a single [[VectorMoments]] aggregation yields
  *    (n, Σx, Σxxᵀ); the d×d covariance and its eigendecomposition are
  *    driver-side on a model-sized matrix (d = 64 → 4k doubles), the
  *    same collect-the-model lifecycle as the k-means/PQ trainers.
  *    At 100 TB the corpus pass is a map-side-combined scan shipping
  *    one ~17 KB summary per partition — no per-row outer-product
  *    rows ever exist, on the wire or anywhere else.
  *  - PROJECT is map-only: the top-k eigenvectors are inlined as
  *    literal arrays and each output coordinate is one codegen'd
  *    [[graft.functions.expr.VectorDot]]; mean-centering folds into a
  *    per-component constant offset (dot(x−μ, v) = dot(x,v) − dot(μ,v))
  *    so the hot loop never materializes a centered copy of the vector.
  *
  * Training-data uses: dimensionality reduction ahead of ANN /
  * clustering (project to k ≪ d, then the existing brute/IVF kernels
  * run on vectors k/d the size), and embedding-drift diagnostics (the
  * covariance spectrum). `q_pca_cov` oracle-checks the moments path;
  * recall of PCA-space ANN vs full-dimension truth is `q_pca_recall`.
  */
object Pca {

  /** Fitted model: `mean` and the top-k eigenpairs of the population
    * covariance (eigvals desc; vectors unit-norm, sign-normalized so
    * the largest-magnitude component is positive — deterministic). */
  case class Model(n: Long, mean: Array[Double],
                   eigvals: Array[Double], comps: Array[Array[Double]]) {
    def dim: Int = mean.length
    def k: Int = comps.length
    /** Fraction of total variance captured by the kept components. */
    def energy(totalVariance: Double): Double =
      if (totalVariance <= 0) 0.0 else eigvals.sum / totalVariance
  }

  /** The one-pass moments aggregate as a Column:
    * struct(n, s: array(d), ss: array(d(d+1)/2) upper-triangular). */
  def moments(vec: Column, dim: Int): Column =
    ColumnBridge.column(
      VectorMoments(ColumnBridge.expr(vec), dim).toAggregateExpression())

  /** (n, mean, covariance) from one corpus pass. Population covariance
    * (divide by n) — matches the oracle's avg(x·y) − avg(x)·avg(y). */
  def covariance(df: DataFrame, vecCol: String, dim: Int)
      : (Long, Array[Double], Array[Array[Double]]) = {
    val row = df.agg(moments(col(vecCol), dim).as("m"))
      .select(col("m.n"), col("m.s"), col("m.ss")).head()
    val n = row.getLong(0)
    require(n > 0, s"covariance: no usable rows in $vecCol")
    val s = row.getSeq[Double](1).toArray
    val ss = row.getSeq[Double](2).toArray
    val mean = s.map(_ / n)
    val cov = Array.ofDim[Double](dim, dim)
    var t = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = ss(t) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        t += 1; j += 1
      }
      i += 1
    }
    (n, mean, cov)
  }

  /** Eigendecomposition of a symmetric matrix by cyclic Jacobi
    * rotations — deterministic (fixed sweep order, fixed convergence
    * budget), dependency-free, O(d³) on the driver where d is the
    * embedding dimension (model-sized by definition). Returns
    * (eigenvalues desc, matching unit eigenvectors, sign-normalized).
    */
  def jacobiEigen(matrix: Array[Array[Double]], maxSweeps: Int = 64)
      : (Array[Double], Array[Array[Double]]) = {
    val d = matrix.length
    val a = Array.tabulate(d, d)((i, j) => matrix(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val eps = 1e-12
    var sweep = 0
    var off = offDiag(a)
    while (sweep < maxSweeps && off > eps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > eps) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case sgn => sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < d) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    val pairs = (0 until d).map { j =>
      val vec = Array.tabulate(d)(i => v(i)(j))
      // sign convention: largest-|component| entry positive (first wins
      // ties) so the decomposition is reproducible run-to-run
      var best = 0
      var i = 1
      while (i < d) { if (math.abs(vec(i)) > math.abs(vec(best))) best = i; i += 1 }
      val signed = if (vec(best) < 0) vec.map(x => -x) else vec
      (a(j)(j), signed)
    }
    // stable sort: equal eigenvalues keep their column order
    val sorted = pairs.zipWithIndex
      .sortBy { case ((value, _), idx) => (-value, idx) }
      .map(_._1)
    (sorted.map(_._1).toArray, sorted.map(_._2).toArray)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    val d = a.length
    var s = 0.0
    var i = 0
    while (i < d) {
      var j = i + 1
      while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  /** Fit the top-k model: one corpus pass + driver eigensolve. */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int): Model = {
    require(k >= 1 && k <= dim, s"need 1 <= k=$k <= dim=$dim")
    val (n, mean, cov) = covariance(df, vecCol, dim)
    val (vals, vecs) = jacobiEigen(cov)
    Model(n, mean, vals.take(k), vecs.take(k))
  }

  /** Train-once projector store (write-iff-absent, like the PQ
    * codebooks): rows (comp_id, eigval, vec), with the mean as
    * comp_id = −1 / eigval = n. Reruns read the parquet back instead
    * of re-fitting — the fleet-wide share shape for a projector that
    * many pipelines apply. */
  def fitStored(spark: SparkSession, df: DataFrame, vecCol: String,
                dim: Int, k: Int, path: String): Model = {
    import spark.implicits._
    if (!Stores.exists(spark, path, "_SUCCESS")) {
      val m = fit(df, vecCol, dim, k)
      val rows = ((-1, m.n.toDouble, m.mean.toSeq) +:
        m.comps.indices.map(i => (i, m.eigvals(i), m.comps(i).toSeq)))
      rows.toDF("comp_id", "eigval", "vec")
        .coalesce(1).write.mode("overwrite").parquet(path)
    }
    val back = spark.read.parquet(path)
      .orderBy(col("comp_id"))
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getSeq[Double](2).toArray))
    val meanRow = back.head
    require(meanRow._1 == -1, s"malformed PCA store at $path")
    Model(meanRow._2.toLong, meanRow._3,
      back.tail.map(_._2), back.tail.map(_._3))
  }

  /** INCREMENTAL fit — the store-append lifecycle applied to a linear
    * model: moments are ADDITIVE, so the store holds one (n, Σx, Σxxᵀ)
    * row per ingested batch and the model refits from their sum
    * without ever re-scanning earlier data. A crawl increment costs
    * one scan of ITSELF plus a d²-sized row append; the refit reads
    * back rows-per-batch (model-sized) and runs the same driver
    * eigensolve. Idempotent per `batchTag` via marker files (the
    * `minhashStoreAppend` replay contract): a re-delivered batch
    * cannot double-count. */
  def momentsStored(spark: SparkSession, df: DataFrame, vecCol: String,
                    dim: Int, path: String, batchTag: String): Unit = {
    val row = df.agg(moments(col(vecCol), dim).as("m"))
      .select(col("m.n"), col("m.s"), col("m.ss"))
    // bootstrap an EMPTY store (overwrite-idempotent, no data rows) so
    // EVERY batch — the first included — lands through the same staged
    // marker-LAST commit: no branch where a crash between data write
    // and marker could double-post on retry
    if (!Stores.exists(spark, path, "_SUCCESS"))
      row.limit(0).write.mode("overwrite").parquet(path)
    Stores.appendCommit(spark, path, batchTag) { staging =>
      row.coalesce(1).write.mode("overwrite").parquet(staging)
    }
  }

  /** Total moments from a store: element-wise sum over the per-batch
    * rows (batch-count-sized — trivially driver-safe). */
  def momentsOfStore(spark: SparkSession, path: String, dim: Int)
      : (Long, Array[Double], Array[Double]) = {
    val rows = spark.read.parquet(path)
      .select(col("n"), col("s"), col("ss")).collect()
    require(rows.nonEmpty, s"empty moments store at $path")
    val triLen = dim * (dim + 1) / 2
    val s = new Array[Double](dim)
    val ss = new Array[Double](triLen)
    var n = 0L
    rows.foreach { r =>
      n += r.getLong(0)
      val rs = r.getSeq[Double](1); val rss = r.getSeq[Double](2)
      var i = 0
      while (i < dim) { s(i) += rs(i); i += 1 }
      i = 0
      while (i < triLen) { ss(i) += rss(i); i += 1 }
    }
    (n, s, ss)
  }

  /** Fit the top-k model from a moments store (no corpus access). */
  def fitFromStore(spark: SparkSession, path: String, dim: Int, k: Int)
      : Model = {
    val (n, s, ss) = momentsOfStore(spark, path, dim)
    require(n > 0, s"moments store at $path has no rows")
    val mean = s.map(_ / n)
    val cov = Array.ofDim[Double](dim, dim)
    var t = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = ss(t) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        t += 1; j += 1
      }
      i += 1
    }
    val (vals, vecs) = jacobiEigen(cov)
    Model(n, mean, vals.take(k), vecs.take(k))
  }

  /** Map-only projection: adds `outCol` = array<double> of length k.
    * Eigenvectors ride into the plan as literals; each coordinate is a
    * codegen'd dot minus the constant mean offset. */
  def project(df: DataFrame, vecCol: String, model: Model,
              outCol: String = "pvec", whiten: Boolean = false): DataFrame = {
    val comps = model.comps.map(_.toSeq)
    val offsets = model.comps.map(c =>
      c.indices.map(i => c(i) * model.mean(i)).sum)
    // whitening folds into the same per-component constants: coordinate
    // j scales by 1/√λ_j, so the projected covariance is the identity
    // (PcaSpec pins it via a VectorMoments pass over the projections) —
    // the right input space for Euclidean ANN/k-means when the spectrum
    // is skewed. Still map-only, still one codegen'd dot per coordinate.
    val scales = model.eigvals.map(v =>
      if (whiten) 1.0 / math.sqrt(math.max(v, 1e-12)) else 1.0)
    val coords = comps.zipWithIndex.map { case (c, j) =>
      (graft.functions.Vectors.dot(col(vecCol), typedlit(c))
        - lit(offsets(j))) * lit(scales(j))
    }
    df.withColumn(outCol, array(coords: _*))
  }
}
