package graft

import org.apache.spark.sql.functions._
import graft.ops.Procrustes

/** Procrustes alignment: the Schönemann closed form recovered from the
  * one-pass cross-gram — orthogonality, exact-rotation recovery, and
  * the noisy-map case the query exercises. */
class ProcrustesSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 64

  /** Planted orthogonal map: coordinate permutation i → 7i mod 64 with
    * alternating signs (the query's map). Q(i)(l): b_l = Σ_i a_i Q(i)(l). */
  private val planted: Array[Array[Double]] = {
    val q = Array.ofDim[Double](dim, dim)
    for (l <- 0 until dim)
      q((l * 7) % dim)(l) = if (l % 2 == 0) 1.0 else -1.0
    q
  }

  private def withMapped(noise: Boolean) = {
    val emb = graft.core.Tables.embeddings(spark, sf0001)
    emb.select(col("vec_id"), col("embedding"),
      transform(sequence(lit(0), lit(dim - 1)), i =>
        element_at(col("embedding"), pmod(i * 7, lit(dim)) + 1).cast("double")
          * when(pmod(i, lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))
          + (if (noise)
              pmod(col("vec_id") * 37 + i * 101, lit(1000)).cast("double")
                / lit(100000.0) - lit(0.005)
            else lit(0.0))).as("b"))
  }

  test("exact rotation is recovered: R == planted map, residual ~ 0, R orthogonal") {
    val pairs = withMapped(noise = false)
    val r = Procrustes.fit(pairs, "embedding", "b", dim)
    for (i <- 0 until dim; l <- 0 until dim)
      assert(math.abs(r(i)(l) - planted(i)(l)) < 1e-8,
        s"R($i)($l) = ${r(i)(l)} vs planted ${planted(i)(l)}")
    // orthogonality: RᵀR = I
    for (a <- 0 until dim; b <- 0 until dim) {
      val dot = (0 until dim).map(i => r(i)(a) * r(i)(b)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-8)
    }
    val resid = Procrustes.align(pairs, "embedding", r, "av")
      .select(sqrt(aggregate(
        zip_with(col("av"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0.0), _ + _)).as("resid"))
      .agg(max(col("resid"))).as[Double].head()
    assert(resid < 1e-6, s"max residual $resid")
  }

  test("noisy map: fitted R stays orthogonal, alignment cosine ~ 1, residual noise-sized") {
    val pairs = withMapped(noise = true)
    val r = Procrustes.fit(pairs, "embedding", "b", dim)
    for (a <- 0 until dim; b <- 0 until dim) {
      val dot = (0 until dim).map(i => r(i)(a) * r(i)(b)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-6,
        "R must be orthogonal even when the map is not exactly orthogonal")
    }
    val stats = Procrustes.align(pairs, "embedding", r, "av")
      .select(
        sqrt(aggregate(zip_with(col("av"), col("b"), (x, y) => (x - y) * (x - y)),
          lit(0.0), _ + _)).as("resid"),
        graft.functions.Vectors.cosine(col("av"), col("b")).as("cos"))
      .agg(max(col("resid")), min(col("cos"))).as[(Double, Double)].head()
    assert(stats._1 > 1e-4 && stats._1 < 0.1,
      s"residual should be perturbation-sized, got ${stats._1}")
    assert(stats._2 > 0.999, s"min aligned cosine ${stats._2}")
  }

  test("fit is layout-robust: repartitioned pairs give the same rotation") {
    val pairs = withMapped(noise = true)
    val r1 = Procrustes.fit(pairs, "embedding", "b", dim)
    val r2 = Procrustes.fit(pairs.repartition(7), "embedding", "b", dim)
    val maxDiff = (for (i <- 0 until dim; l <- 0 until dim)
      yield math.abs(r1(i)(l) - r2(i)(l))).max
    assert(maxDiff < 1e-9, s"rotation drifted $maxDiff across layouts")
  }
}
