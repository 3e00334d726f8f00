package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Semantic deduplication — the SemDeDup recipe (Abbas et al. 2023,
  * arXiv:2303.09540): cluster the corpus embeddings with k-means, then
  * within each cluster drop all but one representative of every pair of
  * semantically-near vectors. Near-duplicate *web text* is caught by
  * MinHash/SimHash ([[Dedup]]); this pass removes *semantic* duplicates
  * — paraphrases, templated rewrites, translations re-embedded close
  * together — that share almost no surface n-grams.
  *
  * Composition over new machinery:
  *   - cluster assignment is the codegen'd map-only
  *     [[graft.functions.expr.NearestCell]] kernel (squared-L2 argmin,
  *     ties → lowest cell) against a broadcast k×dim model — the same
  *     coarse quantizer the IVF-PQ index uses, so one trained model can
  *     serve both the dedup pass and the ANN index;
  *   - within-cluster pruning reuses [[Dedup.embeddingNearDupAdaptive]]
  *     with cell as the blocking column: small cells take the exact
  *     all-pairs kernel, popular cells the banded-LSH path, so a skewed
  *     cluster-size distribution (the k-means norm) never goes
  *     quadratic.
  *
  * At 100 TB: the model is k×dim doubles (driver-sized — train k
  * proportional to corpus so cells stay bounded); assignment is one
  * map-only pass; the only corpus exchange is the pair-generation
  * shuffle on (cell) / (cell, band, bucket), both bounded by design.
  */
object SemDedup {

  /** Corpus with a `cell` column: nearest coarse centroid by squared-L2
    * (map-only kernel, broadcast model; ties → lowest cell id). */
  def assignCells(emb: DataFrame, centroids: Array[Double], dim: Int,
                  vecCol: String = "embedding"): DataFrame = {
    def cc(x: org.apache.spark.sql.catalyst.expressions.Expression): Column =
      ColumnBridge.column(x)
    emb.withColumn("cell",
      cc(graft.functions.expr.NearestCell(
        ColumnBridge.expr(col(vecCol)), centroids, dim)))
  }

  /** Survivors of semantic dedup: a vector is dropped iff some lower-id
    * vector in the same cell sits at cosine ≥ tau from it (keep-lowest-id
    * — one deterministic pass, no transitive chasing: of every near pair
    * the lower id survives, exactly the pair relation
    * [[Dedup.embeddingNearDupAdaptive]] emits). Returns (idCol, cell).
    */
  def semDedup(emb: DataFrame, centroids: Array[Double], dim: Int,
               tau: Double, idCol: String = "vec_id",
               vecCol: String = "embedding", bands: Int = 32,
               planesPerBand: Int = 3, smallBlock: Long = 4096L): DataFrame = {
    val celled = assignCells(emb, centroids, dim, vecCol)
    val drops = Dedup.embeddingNearDupAdaptive(celled, tau, blockCol = "cell",
        idCol = idCol, vecCol = vecCol, dim = dim, bands = bands,
        planesPerBand = planesPerBand, smallBlock = smallBlock)
      .select(col("id_b").as(idCol)).distinct()
    celled.select(col(idCol), col("cell"))
      .join(drops, Seq(idCol), "left_anti")
  }

  /** [[semDedup]] with the paper's diversity-preserving keep rule: of
    * every near pair, KEEP the member FARTHEST from its cell centroid
    * (arXiv:2303.09540 §3 — edge examples carry more training signal
    * than cluster cores; ties → lower id). A vector is dropped iff some
    * same-cell near neighbor beats it on (centroid distance, id). Same
    * plan shape as the default: one extra map-only `CellDists` lookup
    * per row for the distance, pairs through the adaptive path. */
  def semDedupDiverse(emb: DataFrame, centroids: Array[Double], dim: Int,
                      tau: Double, idCol: String = "vec_id",
                      vecCol: String = "embedding", bands: Int = 32,
                      planesPerBand: Int = 3,
                      smallBlock: Long = 4096L): DataFrame = {
    def cc(x: org.apache.spark.sql.catalyst.expressions.Expression): Column =
      ColumnBridge.column(x)
    val celled = assignCells(emb, centroids, dim, vecCol)
      .withColumn("d2", element_at(
        cc(graft.functions.expr.CellDists(
          ColumnBridge.expr(col(vecCol)), centroids, dim)),
        col("cell") + 1))
    val pairs = Dedup.embeddingNearDupAdaptive(celled, tau, blockCol = "cell",
      idCol = idCol, vecCol = vecCol, dim = dim, bands = bands,
      planesPerBand = planesPerBand, smallBlock = smallBlock)
    val d2 = celled.select(col(idCol).as("_did"), col("d2"))
    val scored = pairs
      .join(d2.select(col("_did").as("id_a"), col("d2").as("d2_a")), Seq("id_a"))
      .join(d2.select(col("_did").as("id_b"), col("d2").as("d2_b")), Seq("id_b"))
    // the loser of each pair: nearer to the centroid, ties to higher id
    val drops = scored.select(
        when(col("d2_a") < col("d2_b")
          || (col("d2_a") === col("d2_b") && col("id_a") > col("id_b")),
          col("id_a")).otherwise(col("id_b")).as(idCol))
      .distinct()
    celled.select(col(idCol), col("cell"), col("d2"))
      .join(drops, Seq(idCol), "left_anti")
  }

  /** Cross-corpus SEMANTIC decontamination — the embedding-level analog
    * of [[Dedup.crossMinhashLsh]]: flag corpus vectors at cosine ≥ tau
    * from ANY probe (benchmark / eval-set) vector. Surface-level n-gram
    * screens miss paraphrased leakage; this pass catches it in
    * embedding space.
    *
    * Blocking: corpus side takes ONE cell each (map-only `NearestCell`);
    * the probe side — small by construction (it is a benchmark) — is
    * assigned to its `nProbe` nearest cells (`CellDists` + rank window
    * over probes only) and broadcast, so near-boundary pairs are caught
    * without ever shuffling the corpus: the join is
    * corpus-scan ⨝ broadcast(probes-by-cell), refined inline by exact
    * cosine. Raising `nProbe` trades cost for boundary recall, the IVF
    * recall knob.
    *
    * Output: (idCol, n_hits, max_cos) for contaminated corpus vectors
    * only — both aggregates are order-free (count, max) so the result
    * is hash-stable. */
  def crossSemContaminated(corpus: DataFrame, probe: DataFrame,
                           centroids: Array[Double], dim: Int, tau: Double,
                           nProbe: Int = 2, idCol: String = "vec_id",
                           vecCol: String = "embedding"): DataFrame = {
    import graft.functions.{Vectors => V}
    import org.apache.spark.sql.expressions.Window
    def e(c: Column) = ColumnBridge.expr(c)
    def cc(x: org.apache.spark.sql.catalyst.expressions.Expression): Column =
      ColumnBridge.column(x)
    val c = assignCells(corpus, centroids, dim, vecCol)
      .select(col(idCol).as("n_id"), col(vecCol).as("n_v"), col("cell"))
    val probeW = Window.partitionBy(col("p_id"))
      .orderBy(col("cd").asc, col("cell").asc)
    val p = probe.select(col(idCol).as("p_id"), col(vecCol).as("p_v"),
        posexplode(cc(graft.functions.expr.CellDists(e(col(vecCol)), centroids, dim))))
      .withColumnRenamed("pos", "cell").withColumnRenamed("col", "cd")
      .withColumn("crank", row_number().over(probeW))
      .filter(col("crank") <= nProbe)
      .select(col("p_id"), col("p_v"), col("cell"))
    c.join(broadcast(p), Seq("cell"))
      .select(col("n_id"), col("p_id"),
        round(V.cosine(col("n_v"), col("p_v")), 6).as("cos"))
      .filter(col("cos") >= tau)
      .groupBy(col("n_id"))
      .agg(count(lit(1)).as("n_hits"), max(col("cos")).as("max_cos"))
      .withColumnRenamed("n_id", idCol)
  }

  /** Export a (c_id, c_v) centroid frame as a parquet side-table (cell =
    * rank of c_id ascending — the same cell numbering
    * [[Pq.centroidArray]] produces) so an external engine can replay the
    * assignment. One local write of a k×dim model. */
  def exportCentroids(cents: DataFrame, dim: Int, path: String): Unit = {
    val spark = cents.sparkSession
    import spark.implicits._
    val rows = cents.select(col("c_id"), col("c_v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
      .zipWithIndex.map { case ((_, v), cell) => (cell, v) }.toSeq
    rows.toDF("cell", "c").coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load an [[exportCentroids]] side-table back into the flat k×dim
    * model array the kernels take (cell-ascending; parquet doubles
    * round-trip bit-exactly, so a loaded model scores identically to
    * the freshly-trained one). One driver-sized read. */
  def loadCentroidArray(spark: org.apache.spark.sql.SparkSession,
                        path: String, dim: Int): Array[Double] = {
    val rows = spark.read.parquet(path).select(col("cell"), col("c"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
    require(rows.nonEmpty, s"no centroids at $path")
    val flat = rows.flatMap(_._2.toArray)
    require(flat.length == rows.length * dim,
      s"centroid table at $path is not k×$dim")
    flat
  }

  /** The TRAIN-ONCE model lifecycle: train k-means and export iff the
    * side-table is absent, then serve the model FROM the store. First
    * call pays Lloyd's; every later call (and every bench repetition)
    * is one driver-sized parquet read + map-only assignment — the
    * steady-state corpus-maintenance shape, mirroring the durable
    * IVF-PQ index ([[Pq.writeIndex]]: encode once, probe many). The
    * trainer is deterministic (fixed seeds, fixed iteration count), so
    * a rebuilt store is bit-identical to a reused one. */
  def centroidsStored(emb: DataFrame, path: String, seedIds: Seq[Long],
                      iters: Int, dim: Int): Array[Double] = {
    val spark = emb.sparkSession
    if (!Stores.exists(spark, path, "_SUCCESS")) {
      val cents = Ann.kmeansCentroids(emb, seedIds = seedIds,
        iters = iters, dim = dim)
      exportCentroids(cents, dim, path)
    }
    loadCentroidArray(spark, path, dim)
  }
}
