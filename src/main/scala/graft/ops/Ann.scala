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

  /** IVF (inverted-file) top-k: the corpus is partitioned into cells by
    * nearest centroid; a query searches only its `nprobe` closest cells.
    * Centroids here are `k` fixed corpus vectors (deterministic seed
    * selection — in production a k-means pass would refine them; the
    * index/probe machinery is identical). The cell table is the
    * "inverted file": at 100 TB it is written once, partitioned by
    * cell id, and queries prune to nprobe partitions.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              centroidIds: Seq[Long], nprobe: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = corpus
      .filter(col(idCol).isin(centroidIds: _*))
      .select(col(idCol).as("c_id"), col(vecCol).as("c_v"))
    def nearestCells(df: DataFrame, pre: String, n: Int) = {
      val w = Window.partitionBy(col(s"${pre}_id"))
        .orderBy(col("c_cos").desc, col("c_id").asc)
      df.select(col(idCol).as(s"${pre}_id"), col(vecCol).as(s"${pre}_v"))
        .join(broadcast(cents))
        .select(col(s"${pre}_id"), col(s"${pre}_v"), col("c_id"),
          Vectors.cosine(col(s"${pre}_v"), col("c_v")).as("c_cos"))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= n)
        .select(col(s"${pre}_id"), col(s"${pre}_v"), col("c_id").as("cell"))
    }
    val cells = nearestCells(corpus, "n", 1)      // inverted file: 1 cell/vector
    val probes = nearestCells(queries, "q", nprobe) // multi-probe
    val scored = cells.join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(Vectors.cosine(col("q_v"), col("n_v")), 6).as("cos"))
    // no dedup needed: each corpus vector lives in exactly one cell
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
