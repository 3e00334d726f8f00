package graft

import org.apache.spark.sql.functions._
import graft.ops.Pq

/** Durable IVF-PQ inverted file: write-once encode partitioned by cell,
  * probe-time partition pruning, result parity with the inline index. */
class PqIndexSpec extends SparkTestBase {

  private def setup() = {
    val emb = graft.core.Tables.embeddings(spark, sf0001)
    val nCells = 8
    val cents = Pq.centroidArray(
      emb.filter(col("vec_id") < nCells)
        .select(col("vec_id").cast("long").as("c_id"),
          expr("transform(embedding, x -> cast(x as double))").as("c_v")),
      dim = 64)
    val cb = Pq.trainResidualCodebooksSampled(emb, cents,
      dim = 64, m = 8, k = 16, iters = 2, sampleCap = 512)
    (emb, cents, cb)
  }

  test("index round-trip: stored-index probe ≡ inline ivfPqTopK, scan prunes to probed cells") {
    val (emb, cents, cb) = setup()
    val dir = java.nio.file.Files.createTempDirectory("pq_index").toString
    Pq.writeIndex(emb, cents, dim = 64, m = 8, k = 16, codebook = cb,
      path = dir)
    // cell directories exist (partitioned layout)
    val cellDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.length === 8, s"one directory per cell: ${cellDirs.length}")

    val queries = emb.filter(col("vec_id") < 5)
    val fromIndex = Pq.ivfPqTopKFromIndex(spark, dir, queries, topK = 3,
      centroids = cents, dim = 64, m = 8, k = 16, codebook = cb, nProbe = 2)
    val inline = Pq.ivfPqTopK(emb, queries, topK = 3,
      centroids = cents, dim = 64, m = 8, k = 16, codebook = cb, nProbe = 2)

    import spark.implicits._
    val a = fromIndex.select("q_id", "n_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    val b = inline.select("q_id", "n_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(a === b, "stored index returns the same neighbors as inline encode")

    // the probe-cell filter reaches the scan as a PARTITION filter —
    // non-probed cell directories are never read
    val plan = fromIndex.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.exists(_.contains("cell")),
      s"probe cells must prune partitions, got: $pf")
  }
}
