package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.functions.expr.{PqAdc, PqDistTable, PqEncode, VectorDot}

/** Product-quantization ANN — the memory-bounded scale path for
  * similarity search (IVF narrows WHERE to look, PQ shrinks WHAT is
  * kept: 64 floats → m small codes per vector).
  *
  * Training runs Lloyd's jointly over all m subspaces: the corpus
  * explodes once into (id, sub, subvector) rows and each iteration is
  * ONE job for every subspace together — not m separate k-means runs.
  * The model lives on the driver between rounds (it is k·m·subDim
  * doubles by definition — MLlib KMeans' own shape), broadcast back as
  * a local relation. Assignment maximizes 2·q·c − |c|² (argmin L2²
  * with the |q|² term dropped) through the codegen'd [[VectorDot]]; the
  * corpus never shuffles — only k·m codeword partial sums do.
  *
  * Encoding and scoring are the [[PqEncode]]/[[PqDistTable]]/[[PqAdc]]
  * kernels: map-only, whole-stage-codegen, codebook as a reference
  * object. Model quality is asserted by recall against the exact
  * brute-force ranking (`PqSpec`) — a quantized index has no exact SQL
  * oracle by construction.
  */
object Pq {

  /** Train the flat `[sub][code][d]` codebook (length m·k·subDim).
    * Deterministic: seeded from `seedIds` corpus vectors (code = rank in
    * the sorted seed list), ties in assignment break to the lowest code,
    * empty cells keep their previous codeword. */
  def trainCodebooks(corpus: DataFrame, dim: Int, m: Int, k: Int, iters: Int,
                     seedIds: Seq[Long], idCol: String = "vec_id",
                     vecCol: String = "embedding"): Array[Double] = {
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    require(seedIds.size == k, s"need exactly k=$k seed ids, got ${seedIds.size}")
    val subDim = dim / m
    val spark = corpus.sparkSession
    import spark.implicits._

    def subRows(df: DataFrame): DataFrame = df
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .select(col("id"), explode_outer(sequence(lit(0), lit(m - 1))).as("sub"), col("v"))
      .select(col("id"), col("sub"),
        transform(slice(col("v"), col("sub") * subDim + 1, lit(subDim)),
          x => x.cast("double")).as("sv"))

    val corpusSub = subRows(corpus).persist()

    // The model is k·m·subDim doubles — driver-sized BY DEFINITION, so
    // the loop keeps it on the driver (exactly MLlib KMeans' shape):
    // each round is ONE job — assign against a broadcast local relation,
    // aggregate the per-cell means, collect them back. No growing
    // lineage, no persisted intermediates beyond the exploded corpus.
    val cb = new Array[Double](m * k * subDim)
    def fill(rows: Array[org.apache.spark.sql.Row]): Unit =
      rows.foreach { r =>
        val off = (r.getInt(0) * k + r.getInt(1)) * subDim
        val cv = r.getSeq[Double](2)
        var i = 0
        while (i < subDim) { cb(off + i) = cv(i); i += 1 }
      }

    val seedCodes = seedIds.sorted.zipWithIndex.map { case (id, c) => (id, c) }
      .toDF("id", "code")
    fill(corpusSub.join(broadcast(seedCodes), Seq("id"))
      .select(col("sub"), col("code"), col("sv").as("cv")).collect())

    def dot(a: Column, b: Column): Column =
      ColumnBridge.column(VectorDot(ColumnBridge.expr(a), ColumnBridge.expr(b)))

    (1 to iters).foreach { _ =>
      val centRows = for (sub <- 0 until m; code <- 0 until k) yield {
        val off = (sub * k + code) * subDim
        (sub, code, (0 until subDim).map(d => cb(off + d)))
      }
      val cents = centRows.toDF("sub", "code", "cv")
        .withColumn("nb2", dot(col("cv"), col("cv")))
      val updated = corpusSub
        .join(broadcast(cents), Seq("sub"))
        .select(col("id"), col("sub"), col("sv"), col("code"),
          (lit(2.0) * dot(col("sv"), col("cv")) - col("nb2")).as("score"))
        .groupBy(col("id"), col("sub"))
        .agg(max_by(col("code"), struct(col("score"), -col("code"))).as("code"),
          first(col("sv")).as("sv")) // sv is constant within the (id, sub) group
        .groupBy(col("sub"), col("code"))
        .agg(array((0 until subDim).map(d =>
          avg(col("sv").getItem(d))): _*).as("cv"))
        .collect()
      fill(updated) // empty cells simply keep their previous codeword
    }
    corpusSub.unpersist()
    cb
  }

  /** Train the codebook on a bounded, deterministically-chosen sample
    * collected to the driver in ONE job — the FAISS training shape.
    *
    * Codebook quality needs only O(k·100) vectors per subspace, so the
    * training input is capped by construction no matter the corpus
    * size; distributed Lloyd's (one job per iteration, see
    * [[trainCodebooks]]) only pays off when even that sample cannot sit
    * on the driver. Sample selection is hash-ordered (md5-unit, the
    * [[Sampling]] discipline) with the seed vectors forced in, so the
    * result is rerun-stable and independent of partitioning. Local
    * iteration semantics match the distributed trainer: seeds sorted →
    * code, assignment maximizes 2·q·c − |c|² with ties to the lowest
    * code, empty cells keep their previous codeword. */
  def trainCodebooksSampled(corpus: DataFrame, dim: Int, m: Int, k: Int,
                            iters: Int, seedIds: Seq[Long], sampleCap: Int,
                            seed: Int = 7, idCol: String = "vec_id",
                            vecCol: String = "embedding"): Array[Double] = {
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    require(seedIds.size == k, s"need exactly k=$k seed ids, got ${seedIds.size}")
    require(sampleCap >= k, s"sampleCap $sampleCap must cover the k=$k seeds")
    val subDim = dim / m
    val seedSet = seedIds.toSet
    // One TakeOrdered job: seeds first (priority -1), then hash order.
    val sample = corpus
      .select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("pri",
        when(col("id").isInCollection(seedSet), lit(-1L))
          .otherwise(Sampling.hashUnit(col("id"), seed)))
      .orderBy(col("pri"), col("id"))
      .limit(sampleCap)
      .select(col("id"), col("v"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val byId = sample.toMap

    val seeds = seedIds.sorted.map(id => byId.getOrElse(id,
      sys.error(s"seed id $id not present in corpus sample"))).toArray
    lloydLocal(sample.map(_._2), seeds, m, k, subDim, iters)
  }

  /** Driver-local joint Lloyd's over all m subspaces (shared by the
    * sampled raw and residual trainers). Semantics match the
    * distributed trainer: assignment maximizes 2·q·c − |c|², ties to
    * the lowest code, empty cells keep their previous codeword. */
  private def lloydLocal(vectors: Array[Array[Double]],
                         seeds: Array[Array[Double]],
                         m: Int, k: Int, subDim: Int, iters: Int): Array[Double] = {
    val cb = new Array[Double](m * k * subDim)
    seeds.zipWithIndex.foreach { case (v, code) =>
      var sub = 0
      while (sub < m) {
        System.arraycopy(v, sub * subDim, cb, (sub * k + code) * subDim, subDim)
        sub += 1
      }
    }
    var it = 0
    while (it < iters) {
      val sums = new Array[Double](m * k * subDim)
      val counts = new Array[Long](m * k)
      vectors.foreach { v =>
        var sub = 0
        while (sub < m) {
          val base = sub * subDim
          var best = 0; var bestScore = Double.NegativeInfinity
          var code = 0
          while (code < k) {
            val off = (sub * k + code) * subDim
            var dot = 0.0; var nb2 = 0.0; var i = 0
            while (i < subDim) {
              val c = cb(off + i); dot += v(base + i) * c; nb2 += c * c; i += 1
            }
            val score = 2.0 * dot - nb2
            if (score > bestScore) { bestScore = score; best = code } // ties → lowest
            code += 1
          }
          val off = (sub * k + best) * subDim
          var i = 0
          while (i < subDim) { sums(off + i) += v(base + i); i += 1 }
          counts(sub * k + best) += 1L
          sub += 1
        }
      }
      var cell = 0
      while (cell < m * k) {
        if (counts(cell) > 0) { // empty cells keep their previous codeword
          val off = cell * subDim
          var i = 0
          while (i < subDim) { cb(off + i) = sums(off + i) / counts(cell); i += 1 }
        }
        cell += 1
      }
      it += 1
    }
    cb
  }

  /** Export a flat `[sub][code][d]` codebook as a (sub, code, cv
    * array<double>) parquet side-table so an external engine — the
    * DuckDB oracle — can reproduce encode + ADC scoring bit-exactly
    * (the kernels' distance loops are left-to-right double folds, which
    * `list_sum∘list_transform` mirrors). The model is m·k·subDim doubles
    * — driver-sized by definition — so this is one local-relation write,
    * not a job over the corpus. */
  def exportCodebook(spark: SparkSession, cb: Array[Double], m: Int, k: Int,
                     path: String): Unit = {
    val subDim = cb.length / (m * k)
    import spark.implicits._
    val rows = for (sub <- 0 until m; code <- 0 until k) yield {
      val off = (sub * k + code) * subDim
      (sub, code, (0 until subDim).map(d => cb(off + d)))
    }
    rows.toDF("sub", "code", "cv").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load an [[exportCodebook]] side-table back into the flat
    * `[sub][code][d]` array the kernels take (parquet doubles
    * round-trip bit-exactly). One driver-sized read. */
  def loadCodebook(spark: SparkSession, path: String, m: Int,
                   k: Int): Array[Double] = {
    val rows = spark.read.parquet(path).select(col("sub"), col("code"), col("cv"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2)))
      .sortBy(_._1)
    require(rows.length == m * k, s"codebook at $path is not $m×$k")
    rows.flatMap(_._2.toArray)
  }

  /** TRAIN-ONCE residual codebook: train + export iff the side-table is
    * absent, then serve from the store (the [[writeIndexIfAbsent]] /
    * SemDedup.centroidsStored lifecycle — the trainer is deterministic,
    * so a rebuilt store is identical to a reused one). */
  def codebookStored(corpus: DataFrame, centroids: Array[Double], dim: Int,
                     m: Int, k: Int, iters: Int, sampleCap: Int,
                     path: String): Array[Double] = {
    val spark = corpus.sparkSession
    if (!Stores.exists(spark, path, "_SUCCESS")) {
      val cb = trainResidualCodebooksSampled(corpus, centroids,
        dim = dim, m = m, k = k, iters = iters, sampleCap = sampleCap)
      exportCodebook(spark, cb, m, k, path)
    }
    loadCodebook(spark, path, m, k)
  }

  /** Flatten a (c_id, c_v) centroid frame (e.g. [[Ann.kmeansCentroids]]'
    * output) into the `[cell][d]` array the IVF-PQ kernels take; cell
    * index = rank of c_id ascending. ONE collect of a k×dim model. */
  def centroidArray(cents: DataFrame, dim: Int): Array[Double] = {
    val rows = cents.select(col("c_id"), col("c_v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    val out = new Array[Double](rows.length * dim)
    rows.zipWithIndex.foreach { case ((_, v), cell) =>
      require(v.length == dim, s"centroid dim ${v.length} != $dim")
      var i = 0
      while (i < dim) { out(cell * dim + i) = v(i); i += 1 }
    }
    out
  }

  /** Train RESIDUAL codebooks for IVF-PQ on a bounded hash-ordered
    * sample (one job): each sampled vector is assigned to its nearest
    * coarse cell and the PQ codebook is fit to `v − c_cell` — residuals
    * cluster far tighter than raw vectors, so the same m·k budget buys
    * much lower quantization error (the FAISS IVFPQ construction).
    * Deterministic: hash-ordered sample, seeds = first k sampled
    * residuals. `centroids` is the flat `[cell][d]` coarse quantizer. */
  def trainResidualCodebooksSampled(corpus: DataFrame, centroids: Array[Double],
                                    dim: Int, m: Int, k: Int, iters: Int,
                                    sampleCap: Int, seed: Int = 7,
                                    idCol: String = "vec_id",
                                    vecCol: String = "embedding"): Array[Double] = {
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    require(centroids.nonEmpty && centroids.length % dim == 0)
    require(sampleCap >= k, s"sampleCap $sampleCap must cover k=$k seeds")
    val subDim = dim / m
    val nCells = centroids.length / dim
    val sample = corpus
      .select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("pri", Sampling.hashUnit(col("id"), seed))
      .orderBy(col("pri"), col("id"))
      .limit(sampleCap)
      .select(col("v"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.length >= k,
      s"corpus sample has ${sample.length} vectors, need at least k=$k seeds")
    val residuals = sample.map { v =>
      var best = 0; var bestD = Double.MaxValue
      var cell = 0
      while (cell < nCells) {
        var d = 0.0; var i = 0
        while (i < dim) {
          val diff = v(i) - centroids(cell * dim + i); d += diff * diff; i += 1
        }
        if (d < bestD) { bestD = d; best = cell }
        cell += 1
      }
      val r = new Array[Double](dim)
      var i = 0
      while (i < dim) { r(i) = v(i) - centroids(best * dim + i); i += 1 }
      r
    }
    lloydLocal(residuals, residuals.take(k), m, k, subDim, iters)
  }

  /** IVF-PQ top-k: coarse cells prune WHERE to look (a query probes only
    * its nProbe nearest cells), residual PQ codes shrink WHAT is kept.
    * All kernels map-only ([[graft.functions.expr.NearestCell]] /
    * [[graft.functions.expr.PqEncodeRes]] — the residual subtraction is
    * fused into the codegen'd distance loops); the corpus shuffles only
    * by the one cell-key join against the broadcast query tables, and
    * the residual ADC sum directly approximates |q − v|² (since
    * v̂ = c_cell + r̂). Returns (q_id, n_id, dist2, rank). */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, topK: Int,
                centroids: Array[Double], dim: Int, m: Int, k: Int,
                codebook: Array[Double], nProbe: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.expr.{CellDists, NearestCell, PqAdc, PqDistTableRes, PqEncodeRes}
    def e(c: Column) = ColumnBridge.expr(c)
    def cc(x: org.apache.spark.sql.catalyst.expressions.Expression) =
      ColumnBridge.column(x)

    val codes = corpus
      .select(col(idCol).as("n_id"), col(vecCol).as("nv"))
      .select(col("n_id"), cc(NearestCell(e(col("nv")), centroids, dim)).as("cell"),
        col("nv"))
      .select(col("n_id"), col("cell"),
        cc(PqEncodeRes(e(col("nv")), e(col("cell")), centroids, dim, m, k,
          codebook)).as("codes"))

    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("cd").asc, col("cell").asc)
    val qt = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("qv"))
      .select(col("q_id"), col("qv"),
        posexplode(cc(CellDists(e(col("qv")), centroids, dim))))
      .withColumnRenamed("pos", "cell").withColumnRenamed("col", "cd")
      .withColumn("crank", row_number().over(probeW))
      .filter(col("crank") <= nProbe)
      .select(col("q_id"), col("cell"),
        cc(PqDistTableRes(e(col("qv")), e(col("cell")), centroids, dim, m, k,
          codebook)).as("qtable"))

    val scored = codes.join(broadcast(qt), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        cc(PqAdc(e(col("codes")), e(col("qtable")), k)).as("dist2"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("dist2").asc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }

  /** (id, codes): the compressed index — one codegen'd pass per row,
    * emitted straight from the scan stage. */
  def encode(corpus: DataFrame, m: Int, k: Int, codebook: Array[Double],
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol).as("n_id"),
      ColumnBridge.column(PqEncode(
        ColumnBridge.expr(col(vecCol)), m, k, codebook)).as("codes"))

  /** Approximate top-k by asymmetric distance (query builds its m·k
    * lookup table once; every candidate costs m table reads). Returns
    * (q_id, n_id, dist2, rank) — rank 1 = closest. */
  def adcTopK(corpus: DataFrame, queries: DataFrame, topK: Int,
              m: Int, k: Int, codebook: Array[Double],
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val codes = encode(corpus, m, k, codebook, idCol, vecCol)
    val qt = queries.select(col(idCol).as("q_id"),
      ColumnBridge.column(PqDistTable(
        ColumnBridge.expr(col(vecCol)), m, k, codebook)).as("qtable"))
    val scored = codes.join(broadcast(qt), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        ColumnBridge.column(PqAdc(ColumnBridge.expr(col("codes")),
          ColumnBridge.expr(col("qtable")), k)).as("dist2"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("dist2").asc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }

  /** Materialize the compressed IVF-PQ inverted file: (n_id, codes)
    * parquet PARTITIONED BY cell — encode once over the corpus (one
    * codegen'd NearestCell + PqEncodeRes pass, map-only), probe many.
    * This is the durable form of the index [[ivfPqTopK]] builds inline;
    * at 100 TB the encode is the single big job and every later query
    * touches only its probe cells' directories. */
  def writeIndex(corpus: DataFrame, centroids: Array[Double], dim: Int,
                 m: Int, k: Int, codebook: Array[Double], path: String,
                 idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    encodeForIndex(corpus, centroids, dim, m, k, codebook, idCol, vecCol)
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  private def encodeForIndex(corpus: DataFrame, centroids: Array[Double],
                             dim: Int, m: Int, k: Int,
                             codebook: Array[Double], idCol: String,
                             vecCol: String): DataFrame = {
    import graft.functions.expr.{NearestCell, PqEncodeRes}
    corpus.select(col(idCol).as("n_id"), col(vecCol).as("nv"))
      .select(col("n_id"),
        ColumnBridge.column(NearestCell(
          ColumnBridge.expr(col("nv")), centroids, dim)).as("cell"),
        col("nv"))
      .select(col("n_id"), col("cell"),
        ColumnBridge.column(PqEncodeRes(ColumnBridge.expr(col("nv")),
          ColumnBridge.expr(col("cell")), centroids, dim, m, k,
          codebook)).as("codes"))
  }

  /** Fold NEW vectors into a [[writeIndex]]-materialized index — the
    * FAISS `add()` lifecycle: encode with the index's FROZEN model
    * (same centroids/codebook — additions never retrain) and append
    * the coded rows into their cell partitions as new files; probes
    * see them through the same partition-pruned scan. Marker-file
    * idempotent per `batchTag` (the
    * [[graft.ops.Dedup.minhashStoreAppend]] contract). The standard
    * caveat applies and is the caller's schedule to own: under
    * distribution drift the frozen cells degrade recall, and the
    * remedy is a periodic retrain + [[writeIndex]] rebuild. */
  def indexAppend(newVecs: DataFrame, centroids: Array[Double], dim: Int,
                  m: Int, k: Int, codebook: Array[Double], path: String,
                  batchTag: String, idCol: String = "vec_id",
                  vecCol: String = "embedding"): Unit = {
    Stores.requireStore(newVecs.sparkSession, path,
      "build it with writeIndex")
    // staged write + marker-LAST commit; the `cell=` partition subdirs
    // are preserved relative to the staging root, so pruning survives
    Stores.appendCommit(newVecs.sparkSession, path, batchTag) { staging =>
      encodeForIndex(newVecs, centroids, dim, m, k, codebook, idCol, vecCol)
        .write.mode("overwrite").partitionBy("cell").parquet(staging)
    }
  }

  /** [[writeIndex]] iff the index is absent (no `_SUCCESS` marker) —
    * the write-once/probe-many lifecycle: the first call pays the
    * encode job, every later call goes straight to the probe. Encode
    * is deterministic given (centroids, codebook), so a rebuilt index
    * is identical to a reused one. */
  def writeIndexIfAbsent(corpus: DataFrame, centroids: Array[Double],
                         dim: Int, m: Int, k: Int, codebook: Array[Double],
                         path: String, idCol: String = "vec_id",
                         vecCol: String = "embedding"): Unit =
    if (!Stores.exists(corpus.sparkSession, path, "_SUCCESS"))
      writeIndex(corpus, centroids, dim, m, k, codebook, path, idCol, vecCol)

  /** Query a [[writeIndex]]-materialized index. The probe cells are a
    * driver-sized list (nProbe × |queries|), pushed as a PARTITION
    * filter onto the index scan — only the probed cell directories are
    * read (assert via PartitionFilters in the plan; PqIndexSpec does).
    * Scoring is identical to [[ivfPqTopK]]'s: broadcast residual ADC
    * tables, m lookups per candidate. */
  def ivfPqTopKFromIndex(spark: org.apache.spark.sql.SparkSession,
                         path: String, queries: DataFrame, topK: Int,
                         centroids: Array[Double], dim: Int, m: Int, k: Int,
                         codebook: Array[Double], nProbe: Int,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    import graft.functions.expr.{CellDists, PqAdc, PqDistTableRes}
    def e(c: Column) = ColumnBridge.expr(c)
    def cc(x: org.apache.spark.sql.catalyst.expressions.Expression) =
      ColumnBridge.column(x)
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("cd").asc, col("cell").asc)
    // ranked (q_id, cell, qv) BEFORE the ADC-table build: the cell list
    // is collected from this cheap frame, so the m·k table kernels run
    // once (in the join), not once per consumer
    val probePairs = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("qv"))
      .select(col("q_id"), col("qv"),
        posexplode(cc(CellDists(e(col("qv")), centroids, dim))))
      .withColumnRenamed("pos", "cell").withColumnRenamed("col", "cd")
      .withColumn("crank", row_number().over(probeW))
      .filter(col("crank") <= nProbe)
      .select(col("q_id"), col("cell"), col("qv"))
    val probeCells = probePairs.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted // nProbe × |queries| ints — driver-sized
    val qt = probePairs.select(col("q_id"), col("cell"),
      cc(PqDistTableRes(e(col("qv")), e(col("cell")), centroids, dim, m, k,
        codebook)).as("qtable"))
    val codes = spark.read.parquet(path)
      .filter(col("cell").isin(probeCells.toIndexedSeq: _*))
    val scored = codes.join(broadcast(qt), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        cc(PqAdc(e(col("codes")), e(col("qtable")), k)).as("dist2"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("dist2").asc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }
}
