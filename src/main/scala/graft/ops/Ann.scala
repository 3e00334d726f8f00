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

  /** Lloyd's k-means refinement for the IVF centroids, DataFrame-native:
    * each iteration is one broadcast of the k current centroids, one
    * codegen'd nearest-centroid assignment pass over the corpus (no
    * corpus shuffle), and one k-group aggregation of element-wise sums —
    * the classic "train the coarse quantizer" pass before building the
    * inverted file. Deterministic: seeded from `seedIds` corpus vectors,
    * ties broken by centroid id; empty cells keep their previous
    * centroid. Returns (cell id, centroid array<double>).
    *
    * At 100 TB: iterations scan the corpus `iters` times but never
    * shuffle it — only k×dim partial sums cross the wire per partition;
    * train on a sample if even that is too much. */
  def kmeansCentroids(corpus: DataFrame, seedIds: Seq[Long], iters: Int,
                      dim: Int, idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    var cents: DataFrame = corpus
      .filter(col(idCol).isin(seedIds: _*))
      .select(col(idCol).cast("long").as("c_id"),
        transform(col(vecCol), x => x.cast("double")).as("c_v"))
    var prevPersisted: Option[DataFrame] = None
    (1 to iters).foreach { _ =>
      val assigned = corpus
        .select(col(idCol).as("n_id"), col(vecCol).as("n_v"))
        .join(broadcast(cents))
        .select(col("n_id"), col("n_v"), col("c_id"),
          Vectors.cosine(col("n_v"), col("c_v")).as("c_cos"))
        .withColumn("crank", row_number().over(
          Window.partitionBy(col("n_id")).orderBy(col("c_cos").desc, col("c_id").asc)))
        .filter(col("crank") === 1)
      // element-wise mean per cell: k×dim aggregate, decimal-free (the
      // mean is a model parameter, not an oracle-compared value)
      val sums = assigned.groupBy(col("c_id")).agg(
        count(lit(1)).as("n"),
        array((0 until dim).map(i =>
          sum(col("n_v").getItem(i).cast("double"))): _*).as("s"))
      val updated = sums.select(col("c_id"),
        zip_with(col("s"), array_repeat(col("n").cast("double"), dim),
          (si, ni) => si / ni).as("c_v"))
      // empty cells (no assigned vectors) keep their previous centroid
      val carried = cents.join(updated.select(col("c_id")), Seq("c_id"), "left_anti")
      cents = updated.union(carried).persist()
      cents.count() // materialize per iteration: the lineage must not re-run k passes
      prevPersisted.foreach(_.unpersist()) // previous iteration's frame is consumed
      prevPersisted = Some(cents)
    }
    // The model is k×dim doubles — collect it and hand back a fresh local
    // frame so no persisted lineage escapes (the caller would otherwise
    // own an executor-storage leak per invocation).
    val rows = cents.select(col("c_id"), col("c_v")).collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    prevPersisted.foreach(_.unpersist())
    import spark.implicits._
    rows.toDF("c_id", "c_v")
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
