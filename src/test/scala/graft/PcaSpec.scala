package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Pca

/** PCA: the one-pass moments aggregate, the Jacobi eigensolver, the
  * stored-projector lifecycle, and the PCA-space ANN quality floor. */
class PcaSpec extends SparkTestBase {
  import spark.implicits._

  test("jacobiEigen reproduces a hand eigendecomposition") {
    // symmetric 3x3 with known spectrum: eigvals {6, 3, 1} (diag(6,3,1)
    // conjugated by a rotation would do; use a directly computed case)
    val a = Array(
      Array(4.0, 1.0, 1.0),
      Array(1.0, 4.0, 1.0),
      Array(1.0, 1.0, 4.0))
    // spectrum: 6 (vector (1,1,1)/√3), 3, 3
    val (vals, vecs) = Pca.jacobiEigen(a)
    assert(math.abs(vals(0) - 6.0) < 1e-10)
    assert(math.abs(vals(1) - 3.0) < 1e-10)
    assert(math.abs(vals(2) - 3.0) < 1e-10)
    val top = vecs(0)
    val s = 1.0 / math.sqrt(3.0)
    top.foreach(x => assert(math.abs(x - s) < 1e-10,
      s"top eigenvector must be (1,1,1)/sqrt(3), got ${top.mkString(",")}"))
  }

  test("eigenpairs satisfy C v = λ v and are orthonormal on real embeddings") {
    val emb = Tables.embeddings(spark, sf0001)
    val (_, _, cov) = Pca.covariance(emb, "embedding", 64)
    val (vals, vecs) = Pca.jacobiEigen(cov)
    // residual ‖Cv − λv‖∞ per kept pair
    (0 until 16).foreach { j =>
      val v = vecs(j)
      val cv = cov.map(row => row.indices.map(i => row(i) * v(i)).sum)
      val resid = cv.indices.map(i => math.abs(cv(i) - vals(j) * v(i))).max
      assert(resid < 1e-9, s"component $j residual $resid")
    }
    // orthonormality of the kept frame
    for (i <- 0 until 16; j <- i until 16) {
      val d = vecs(i).indices.map(t => vecs(i)(t) * vecs(j)(t)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-9, s"<v$i, v$j> = $d")
    }
    // eigvals sorted desc and total variance preserved (trace identity)
    assert(vals.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    val trace = (0 until 64).map(i => cov(i)(i)).sum
    assert(math.abs(vals.sum - trace) < 1e-8, "Σλ must equal tr(C)")
  }

  test("moments aggregate matches a driver-side recompute") {
    val emb = Tables.embeddings(spark, sf0001).limit(50)
    val (n, mean, cov) = Pca.covariance(emb, "embedding", 64)
    val rows = emb.select(transform(col("embedding"), _.cast("double")))
      .as[Seq[Double]].collect()
    assert(n === rows.length)
    val d = 64
    val m2 = Array.fill(d)(0.0)
    rows.foreach(r => (0 until d).foreach(i => m2(i) += r(i)))
    (0 until d).foreach(i => assert(math.abs(mean(i) - m2(i) / n) < 1e-12))
    // spot-check a few covariance cells against the naive double loop
    for ((i, j) <- Seq((0, 0), (0, 5), (3, 3), (7, 2))) {
      val c = rows.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / n
      assert(math.abs(cov(i)(j) - c) < 1e-9, s"cov($i,$j)")
    }
  }

  test("projection is the centered dot product; store round-trips the model") {
    val emb = Tables.embeddings(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory("pca_store").toString
    val path = s"$dir/model"
    val m1 = Pca.fitStored(spark, emb, "embedding", 64, 4, path)
    val m2 = Pca.fitStored(spark, emb, "embedding", 64, 4, path) // read-back
    assert(m1.eigvals.toSeq === m2.eigvals.toSeq)
    assert(m1.comps.map(_.toSeq).toSeq === m2.comps.map(_.toSeq).toSeq)
    assert(m1.mean.toSeq === m2.mean.toSeq)
    val first = Pca.project(emb, "embedding", m1, "pvec")
      .orderBy(col("vec_id")).select(col("vec_id"),
        col("pvec"), transform(col("embedding"), _.cast("double")).as("e"))
      .as[(Long, Seq[Double], Seq[Double])].head()
    val (_, pvec, e) = first
    m1.comps.indices.foreach { j =>
      val c = m1.comps(j)
      val want = c.indices.map(i => (e(i) - m1.mean(i)) * c(i)).sum
      assert(math.abs(pvec(j) - want) < 1e-9, s"coord $j")
    }
  }

  test("PCA-space ANN recall beats the random baseline by a wide margin") {
    // the synthetic embeddings are near-isotropic (top eigenvalue ~2.8%
    // of variance), so absolute recall is theory-capped well below 1;
    // the floor asserted here is ~5x the random-overlap baseline
    // (k=10 of N≈50 at sf0.001 → random recall ≈ 10/N ≈ 0.2)
    val (impl, _) = graft.queries.Queries.qPcaRecall._2
    val rec = impl(spark, sf0001).agg(avg(col("recall"))).as[Double].head()
    assert(rec > 0.35, s"mean recall $rec at sf0.001")
  }

  test("whitened projections have identity covariance (self-check via moments)") {
    val emb = Tables.embeddings(spark, sf0001)
    val model = Pca.fit(emb, "embedding", 64, 8)
    val proj = Pca.project(emb, "embedding", model, "pvec", whiten = true)
    // run the SAME moments aggregate over the 8-dim projections: the
    // whitened covariance must be I (diag 1, off-diag 0)
    val (_, mean, cov) = Pca.covariance(proj, "pvec", 8)
    mean.foreach(m => assert(math.abs(m) < 1e-8, s"whitened mean $m"))
    for (i <- 0 until 8; j <- 0 until 8) {
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(cov(i)(j) - want) < 1e-6, s"cov($i,$j) = ${cov(i)(j)}")
    }
  }

  test("moments store: batch additivity, replay idempotence, store-only refit") {
    val emb = Tables.embeddings(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory("pca_m").toString + "/store"
    Pca.momentsStored(spark, emb.filter(col("vec_id") % 2 === 0),
      "embedding", 64, dir, "b0")
    Pca.momentsStored(spark, emb.filter(col("vec_id") % 2 === 1),
      "embedding", 64, dir, "b1")
    // replayed batch: the marker must stop a double-count
    Pca.momentsStored(spark, emb.filter(col("vec_id") % 2 === 1),
      "embedding", 64, dir, "b1")
    val fromStore = Pca.fitFromStore(spark, dir, 64, 4)
    val direct = Pca.fit(emb, "embedding", 64, 4)
    assert(fromStore.n === direct.n)
    (0 until 4).foreach { j =>
      assert(math.abs(fromStore.eigvals(j) - direct.eigvals(j)) < 1e-9)
      val dot = fromStore.comps(j).indices
        .map(i => fromStore.comps(j)(i) * direct.comps(j)(i)).sum
      assert(math.abs(math.abs(dot) - 1.0) < 1e-6,
        s"component $j from store must span the same direction (|<u,v>| = $dot)")
    }
  }

  test("moments plan: partial aggregation, single exchange, no explosion") {
    // raw scan (Tables.embeddings adds a parallelism-floor repartition
    // exchange at tiny SF that would obscure the operator's own shape)
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val plan = emb.agg(Pca.moments(col("embedding"), 64).as("m"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges === 1, s"covariance must shuffle ONCE (summaries only):\n$plan")
    assert(!plan.contains("Generate"), "no per-row explode in the moments path")
    assert(plan.contains("vector_moments"), "native aggregate in the plan")
  }
}
