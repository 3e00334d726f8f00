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

  /** Dot product of two equal-length float arrays, accumulated in double
    * in index order. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 for zero-norm inputs. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn > 0.0, d / nn).otherwise(lit(0.0))
  }

  /** Random-hyperplane (SimHash-for-vectors) LSH bucket id with `p`
    * deterministic pseudo-random planes. Plane j's i-th coefficient is a
    * ±1 derived from md5(j,i) — reproducible on any engine, no RNG state.
    * Bucket = p-bit sign pattern of the plane dot products.
    */
  def hyperplaneBucket(vec: Column, dim: Int, planes: Int): Column = {
    val bits = (0 until planes).map { j =>
      // coefficient c_ji = +1 if low bit of md5("j:i") else -1
      val prods = (0 until dim).map { i =>
        val coef = when(
          conv(substring(md5(lit(s"$j:$i")), 1, 15), 16, 10).cast("long")
            .bitwiseAND(1L) === 1L, 1.0).otherwise(-1.0)
        coef * element_at(vec, i + 1).cast("double")
      }
      val s = prods.reduce(_ + _)
      when(s > 0.0, shiftleft(lit(1L), j)).otherwise(0L)
    }
    bits.reduce[Column](_ + _)
  }
}
