package graft

import org.apache.spark.sql.functions._
import graft.ops.{Ann, Pq}

/** Product quantization: codebook shape/determinism, exact encoding on a
  * hand-built codebook, and recall of ADC ranking against the exact
  * brute-force ranking (the honest quality metric for a quantized
  * index — no SQL oracle can mirror it). */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 64; private val m = 8; private val k = 16

  test("encode: hand-built codebook, argmin per subspace, lowest-code ties") {
    // 2 subspaces of 2 dims, 2 codewords each:
    // sub0: c0=(0,0) c1=(10,10); sub1: c0=(5,5) c1=(0,0)
    val cb = Array(0.0, 0.0, 10.0, 10.0, 5.0, 5.0, 0.0, 0.0)
    val vecs = Seq(
      (1L, Seq(1.0f, 1.0f, 4.0f, 4.0f)),   // sub0→c0, sub1→c0
      (2L, Seq(9.0f, 9.0f, 0.5f, 0.5f)),   // sub0→c1, sub1→c1
      (3L, Seq(5.0f, 5.0f, 2.5f, 2.5f)))   // sub0 tie → c0; sub1 tie → c0
    val out = Pq.encode(vecs.toDF("vec_id", "embedding"), 2, 2, cb)
      .as[(Long, Seq[Int])].collect().toMap
    assert(out(1L) === Seq(0, 0))
    assert(out(2L) === Seq(1, 1))
    assert(out(3L) === Seq(0, 0), "equidistant → lowest code id")
  }

  test("training is deterministic and ADC recall beats random by a wide margin") {
    val emb = graft.core.Tables.embeddings(spark, sf0001)
    val seeds = (0L until k.toLong)
    val cb1 = Pq.trainCodebooks(emb, dim, m, k, iters = 2, seedIds = seeds)
    val cb2 = Pq.trainCodebooks(emb, dim, m, k, iters = 2, seedIds = seeds)
    assert(cb1.length === m * k * (dim / m))
    assert(cb1.toSeq === cb2.toSeq, "same seeds + iters → same model")

    val queries = emb.filter(col("vec_id") < 10)
    val topK = 10
    val approx = Pq.adcTopK(emb, queries, topK, m, k, cb1)
      .select("q_id", "n_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = Ann.bruteTopK(emb, queries, topK)
      .select("q_id", "n_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, ex) =>
      approx.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    // 500 corpus vectors: random top-10 would recall ~0.02; the quantized
    // index must stay far above that (L2-ADC vs cosine ranking + 8-byte
    // codes loses some order — full recall is not expected)
    assert(mean > 0.3, s"mean recall@$topK = $mean")
    spark.catalog.clearCache()
  }

  test("sampled-local training: deterministic, full-sample ≅ quality of distributed") {
    val emb = graft.core.Tables.embeddings(spark, sf0001)
    val seeds = (0L until k.toLong)
    val cb1 = Pq.trainCodebooksSampled(emb, dim, m, k, iters = 2,
      seedIds = seeds, sampleCap = 512)
    val cb2 = Pq.trainCodebooksSampled(emb, dim, m, k, iters = 2,
      seedIds = seeds, sampleCap = 512)
    assert(cb1.length === m * k * (dim / m))
    assert(cb1.toSeq === cb2.toSeq, "hash-ordered sample → rerun-stable model")
    // sample repartitioned differently → same model (partition-independent)
    val cb3 = Pq.trainCodebooksSampled(emb.repartition(7), dim, m, k,
      iters = 2, seedIds = seeds, sampleCap = 512)
    assert(cb1.toSeq === cb3.toSeq, "sample selection must not depend on layout")

    val queries = emb.filter(col("vec_id") < 10)
    val topK = 10
    val approx = Pq.adcTopK(emb, queries, topK, m, k, cb1)
      .select("q_id", "n_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = Ann.bruteTopK(emb, queries, topK)
      .select("q_id", "n_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, ex) =>
      approx.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean > 0.3, s"mean recall@$topK = $mean (sampled trainer)")
    spark.catalog.clearCache()
  }

  test("IVF-PQ: deterministic residual training, recall at a fraction of the scan") {
    val emb = graft.core.Tables.embeddings(spark, sf0001)
    // coarse quantizer: 8 fixed corpus vectors (collected once)
    val nCells = 8
    val cents = Pq.centroidArray(
      emb.filter(col("vec_id") < nCells)
        .select(col("vec_id").cast("long").as("c_id"),
          expr("transform(embedding, x -> cast(x as double))").as("c_v")),
      dim)
    val cb1 = Pq.trainResidualCodebooksSampled(emb, cents, dim, m, k,
      iters = 2, sampleCap = 512)
    val cb2 = Pq.trainResidualCodebooksSampled(emb.repartition(5), cents, dim,
      m, k, iters = 2, sampleCap = 512)
    assert(cb1.toSeq === cb2.toSeq, "residual training is layout-independent")

    val queries = emb.filter(col("vec_id") < 10)
    val topK = 10
    val approx = Pq.ivfPqTopK(emb, queries, topK, cents, dim, m, k, cb1,
        nProbe = 4)
      .select("q_id", "n_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = Ann.bruteTopK(emb, queries, topK)
      .select("q_id", "n_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, ex) =>
      approx.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    // nProbe=4 of 8 cells scans ~half the corpus; recall well above the
    // ~0.02 random floor shows cells + residual codes carry the ranking
    assert(mean > 0.25, s"mean recall@$topK = $mean (IVF-PQ, nProbe=4)")
    spark.catalog.clearCache()
  }

  test("exact re-rank: full shortlist reproduces brute force; over-fetch lifts recall") {
    val emb = graft.core.Tables.embeddings(spark, sf0001)
    val queries = emb.filter(col("vec_id") < 10)
    val n = emb.count().toInt
    val seeds = (0L until k.toLong)
    val cb = Pq.trainCodebooks(emb, dim, m, k, iters = 2, seedIds = seeds)

    // degenerate shortlist = the whole corpus → re-rank IS brute force
    val full = Pq.adcTopK(emb, queries, topK = n, m, k, cb)
    val rr = Ann.rerankExact(full, emb, queries, k = 3)
      .select("q_id", "n_id", "cos").as[(Long, Long, Double)].collect().toSet
    val brute = Ann.bruteTopK(emb, queries, k = 3)
      .select("q_id", "n_id", "cos").as[(Long, Long, Double)].collect().toSet
    assert(rr === brute, "re-rank over a full shortlist must equal brute force")

    // two-stage (over-fetch 10 → exact top-3) recall vs brute top-3 must
    // beat the PQ-only top-3: the exact metric can only fix the ordering
    // INSIDE the shortlist, and a 10-deep shortlist usually contains the
    // true top-3 even when ADC misorders them
    def recall(res: Map[Long, Set[Long]], truth: Map[Long, Set[Long]]) = {
      val rs = truth.map { case (q, t) =>
        res.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
      rs.sum / rs.size
    }
    val truth3 = brute.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val pqOnly = Pq.adcTopK(emb, queries, topK = 3, m, k, cb)
      .select("q_id", "n_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val staged = Ann.rerankExact(Pq.adcTopK(emb, queries, topK = 10, m, k, cb),
        emb, queries, k = 3)
      .select("q_id", "n_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(recall(staged, truth3) >= recall(pqOnly, truth3),
      "two-stage must not be worse than PQ-only at the same k")
    spark.catalog.clearCache()
  }

  test("multi-probe LSH: nProbe=1 equals single-probe; extra probes only add recall") {
    val emb = graft.core.Tables.embeddings(spark, sf0001)
    val queries = emb.filter(col("vec_id") < 20)
    def asMap(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "n_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val single = asMap(Ann.lshTopK(emb, queries, k = 5, dim = 64, planes = 6))
    val mp1 = asMap(Ann.multiProbeLshTopK(emb, queries, k = 5, dim = 64,
      planes = 6, nProbe = 1))
    assert(mp1 === single, "nProbe=1 must reduce to plain LSH")

    val mp3 = asMap(Ann.multiProbeLshTopK(emb, queries, k = 5, dim = 64,
      planes = 6, nProbe = 3))
    val truth = asMap(Ann.bruteTopK(emb, queries, k = 5))
    def recall(res: Map[Long, Set[Long]]) = {
      val rs = truth.map { case (q, t) =>
        res.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
      rs.sum / rs.size
    }
    assert(recall(mp3) >= recall(single),
      s"multi-probe recall ${recall(mp3)} < single ${recall(single)}")
    // candidate coverage strictly grows on this corpus: some query found
    // a neighbor single-probe missed (6 planes → sparse buckets)
    assert(mp3.values.map(_.size).sum >= single.values.map(_.size).sum)
    spark.catalog.clearCache()
  }
}
