package graft

import org.apache.spark.sql.functions._
import graft.ops.Ann
import graft.functions.{Vectors => V}

/** Lloyd's refinement for IVF centroids: determinism, non-degradation of
  * the clustering objective, and empty-cell carry-over. */
class KmeansSpec extends SparkTestBase {
  import spark.implicits._

  private def objective(cents: org.apache.spark.sql.DataFrame): Double = {
    // mean best-cosine over the corpus (higher = tighter clustering)
    val emb = graft.core.Tables.embeddings(spark, sf0001)
      .select(col("vec_id").as("n_id"), col("embedding").as("n_v"))
    emb.join(broadcast(cents))
      .select(col("n_id"), V.cosine(col("n_v"), col("c_v")).as("cos"))
      .groupBy(col("n_id")).agg(max(col("cos")).as("best"))
      .agg(avg(col("best"))).as[Double].head()
  }

  test("refinement is deterministic and does not degrade the objective") {
    val emb = graft.core.Tables.embeddings(spark, sf0001)
    val seeds = (0L until 8L).toSeq
    val initial = emb.filter(col("vec_id").isin(seeds: _*))
      .select(col("vec_id").cast("long").as("c_id"),
        transform(col("embedding"), x => x.cast("double")).as("c_v"))
    val refined = Ann.kmeansCentroids(emb, seeds, iters = 2, dim = 64)
    assert(refined.count() === 8, "every cell survives")
    val before = objective(initial)
    val after = objective(refined)
    assert(after >= before - 1e-9,
      s"Lloyd iteration must not degrade mean best-cosine ($before -> $after)")
    // determinism: a second run yields identical centroids
    val again = Ann.kmeansCentroids(emb, seeds, iters = 2, dim = 64)
    val a = refined.orderBy(col("c_id")).as[(Long, Seq[Double])].collect()
    val b = again.orderBy(col("c_id")).as[(Long, Seq[Double])].collect()
    assert(a.toSeq === b.toSeq)
  }
}
