package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.DqStream
import graft.streaming.DqStream._

/** Incremental data-quality report: batch ≡ streamed on the same rows
  * (the AnomalyStream/OhlcStream batch-twin contract), replay never
  * double-counts, dup counting exact across any batch split. */
class DqStreamSpec extends SparkTestBase {
  import spark.implicits._

  // (order_id, cust_id nullable, qty) — dups, nulls, orphans, nonpos
  private val rows: Seq[(java.lang.Long, java.lang.Long, java.lang.Long)] = Seq(
    (101L: java.lang.Long, 1L: java.lang.Long, 5L: java.lang.Long),
    (102L: java.lang.Long, 2L: java.lang.Long, 0L: java.lang.Long),   // nonpos
    (103L: java.lang.Long, null, 3L: java.lang.Long),                 // null cust (+orphan)
    (101L: java.lang.Long, 1L: java.lang.Long, 2L: java.lang.Long),   // dup 101
    (104L: java.lang.Long, 9L: java.lang.Long, -1L: java.lang.Long),  // orphan 9, nonpos
    (105L: java.lang.Long, 3L: java.lang.Long, 7L: java.lang.Long),
    (101L: java.lang.Long, 2L: java.lang.Long, 1L: java.lang.Long),   // dup 101 again
    (106L: java.lang.Long, 1L: java.lang.Long, 4L: java.lang.Long))
  private def df(rs: Seq[(java.lang.Long, java.lang.Long, java.lang.Long)]) =
    rs.toDF("order_id", "cust_id", "qty")

  private def checks = {
    val dim = Seq(1L, 2L, 3L).toDF("c_id")
    Seq(
      NullCheck("null_cust", "cust_id"),
      NonPositiveCheck("nonpos_qty", "qty"),
      DupKeyCheck("dup_order", "order_id"),
      OrphanCheck("orphan_cust", "cust_id", dim, "c_id"))
  }

  private def reportMap(r: org.apache.spark.sql.DataFrame): Map[String, Long] =
    r.as[(String, Long)].collect().toMap

  test("batchReport pins the expected violation counts") {
    val got = reportMap(DqStream.batchReport(df(rows), checks))
    assert(got === Map("null_cust" -> 1L, "nonpos_qty" -> 2L,
      "dup_order" -> 2L, "orphan_cust" -> 2L), s"got $got")
  }

  test("streamed report over micro-batches equals the one-shot batch report") {
    val path = java.nio.file.Files.createTempDirectory("dq_store").toString
    // a split that puts the dup key's occurrences in THREE different
    // batches — the non-additive check's hard case
    val slices = Seq(rows.slice(0, 3), rows.slice(3, 5), rows.slice(5, 8))
    slices.zipWithIndex.foreach { case (s, i) =>
      DqStream.processBatch(df(s), path, s"b$i", checks)
    }
    val streamed = reportMap(DqStream.report(spark, path, checks))
    val oneShot = reportMap(DqStream.batchReport(df(rows), checks))
    assert(streamed === oneShot, s"streamed $streamed vs batch $oneShot")

    // replay of a middle batch: marker no-op, report unchanged
    DqStream.processBatch(df(slices(1)), path, "b1", checks)
    assert(reportMap(DqStream.report(spark, path, checks)) === oneShot,
      "redelivered batch must not change the report")
  }

  test("range and match checks: additive counts, batch == streamed") {
    val path = java.nio.file.Files.createTempDirectory("dq_rm").toString
    val rows = Seq(
      ("SKU-1", 10.0), ("SKU-2", -3.0), ("bad id", 55.0),
      ("SKU-9", 200.0), (null, 42.0)).toDF("code", "v")
    val cks = Seq(
      RangeCheck("v_range", "v", 0.0, 100.0),
      MatchCheck("code_fmt", "code", "SKU-[0-9]+"))
    val expect = Map("v_range" -> 2L, "code_fmt" -> 1L) // -3, 200; "bad id"
    assert(reportMap(DqStream.batchReport(rows, cks)) === expect)
    DqStream.processBatch(rows.limit(2), path, "b0", cks)
    DqStream.processBatch(rows.offset(2), path, "b1", cks)
    assert(reportMap(DqStream.report(spark, path, cks)) === expect,
      "split-batch range/match counts must sum to the one-shot report")
  }

  test("OrphanStoreCheck: rows are judged against the dimension AS OF their batch") {
    val dimPath = java.nio.file.Files.createTempDirectory("dq_dim").toString
    val path = java.nio.file.Files.createTempDirectory("dq_orph").toString
    // maintained dimension starts with keys {1, 2}
    Seq(1L, 2L).toDF("c_id").write.mode("overwrite").parquet(dimPath)
    val cks = Seq(OrphanStoreCheck("orphan_cust", "cust_id", dimPath, "c_id"))
    // batch 0: cust 3 and 9 are orphans against dim v1 -> 2 violations
    DqStream.processBatch(
      Seq((1L, 1L), (2L, 3L), (3L, 9L)).toDF("order_id", "cust_id"),
      path, "b0", cks)
    assert(reportMap(DqStream.report(spark, path, cks)) === Map("orphan_cust" -> 2L))
    // the dimension GAINS key 3 mid-stream (another loop appends)
    Seq(1L, 2L, 3L).toDF("c_id").write.mode("overwrite").parquet(dimPath)
    // batch 1: cust 3 is no longer an orphan; cust 9 still is -> +1
    DqStream.processBatch(
      Seq((4L, 3L), (5L, 9L)).toDF("order_id", "cust_id"),
      path, "b1", cks)
    assert(reportMap(DqStream.report(spark, path, cks)) === Map("orphan_cust" -> 3L),
      "batch-0 judgment of key 3 is NOT retro-healed; batch 1 sees the new dim")
    // batchReport twin against the current dim state matches the same rule
    val oneShot = reportMap(DqStream.batchReport(
      Seq((4L, 3L), (5L, 9L)).toDF("order_id", "cust_id"), cks))
    assert(oneShot === Map("orphan_cust" -> 1L))
    // replay of b1 after the dim evolved again: marker no-op, unchanged
    Seq(1L, 2L, 3L, 9L).toDF("c_id").write.mode("overwrite").parquet(dimPath)
    DqStream.processBatch(
      Seq((4L, 3L), (5L, 9L)).toDF("order_id", "cust_id"),
      path, "b1", cks)
    assert(reportMap(DqStream.report(spark, path, cks)) === Map("orphan_cust" -> 3L),
      "redelivery must not re-judge against the newer dimension")
  }

  test("empty batches contribute zeros; report before any batch fails loudly") {
    val path = java.nio.file.Files.createTempDirectory("dq_empty").toString
    val err = intercept[IllegalArgumentException] {
      DqStream.report(spark, path, checks)
    }
    assert(err.getMessage.contains("processBatch"))
    DqStream.processBatch(df(rows.slice(0, 4)), path, "b0", checks)
    val before = reportMap(DqStream.report(spark, path, checks))
    DqStream.processBatch(df(Nil), path, "b1", checks) // empty micro-batch
    assert(reportMap(DqStream.report(spark, path, checks)) === before,
      "an empty batch must not move any counter")
  }

  test("crash retry between renames and marker recomputes identical keys (tag guard)") {
    val path = java.nio.file.Files.createTempDirectory("dq_crash").toString
    val slices = Seq(rows.slice(0, 3), rows.slice(3, 5), rows.slice(5, 8))
    DqStream.processBatch(df(slices(0)), path, "b0", checks)
    DqStream.processBatch(df(slices(1)), path, "b1", checks)
    // simulate a crash AFTER appendCommit's step-4 renames but BEFORE
    // the step-5 marker: b1's data files are already in the store, the
    // marker is not — delete it and retry. The retry's novel-key
    // anti-join sees b1's own key rows in the store; the strictly-
    // earlier-tag cut must exclude them or the re-staged batch loses
    // its keys and the dup count permanently overcounts.
    val marker = new java.io.File(path, "_appended_b1")
    assert(marker.isFile, "precondition: b1 committed")
    assert(marker.delete())
    DqStream.processBatch(df(slices(1)), path, "b1", checks)
    DqStream.processBatch(df(slices(2)), path, "b2", checks)
    val streamed = reportMap(DqStream.report(spark, path, checks))
    val oneShot = reportMap(DqStream.batchReport(df(rows), checks))
    assert(streamed === oneShot,
      s"crash-retried run $streamed must equal uninterrupted $oneShot")
  }

  test("pre-v4 store layouts are rejected with a migration message") {
    // layout v3: no tag column at all — the guard must name the
    // migration path, not die on an opaque missing-column analysis error
    val noTag = java.nio.file.Files.createTempDirectory("dq_v3").toString
    Seq(("dup_order", "101", 1L)).toDF("check", "key", "n")
      .write.mode("overwrite").parquet(noTag)
    val e1 = intercept[IllegalArgumentException] {
      DqStream.processBatch(df(rows.take(2)), noTag, "batch_000000001", checks)
    }
    assert(e1.getMessage.contains("recreate the store"), e1.getMessage)

    // tag column present but holding a bare (non-zero-padded) id —
    // mixing formats would mis-sort the strictly-earlier cut
    val bare = java.nio.file.Files.createTempDirectory("dq_bare").toString
    Seq(("dup_order", "101", 1L, "batch_10")).toDF("check", "key", "n", "tag")
      .write.mode("overwrite").parquet(bare)
    val e2 = intercept[IllegalArgumentException] {
      DqStream.processBatch(df(rows.take(2)), bare, "batch_000000011", checks)
    }
    assert(e2.getMessage.contains("non-zero-padded"), e2.getMessage)
  }

  test("store compaction preserves the report and the replay markers") {
    val path = java.nio.file.Files.createTempDirectory("dq_compact").toString
    val slices = Seq(rows.slice(0, 3), rows.slice(3, 5), rows.slice(5, 8))
    slices.zipWithIndex.foreach { case (s, i) =>
      DqStream.processBatch(df(s), path, s"b$i", checks)
    }
    val before = reportMap(DqStream.report(spark, path, checks))
    graft.ops.Stores.compact(spark, path) // 10^4 batches = 10^4 file sets otherwise
    assert(reportMap(DqStream.report(spark, path, checks)) === before,
      "compaction must not change the report")
    // a replayed batch must still find its marker AFTER compaction
    DqStream.processBatch(df(slices(0)), path, "b0", checks)
    assert(reportMap(DqStream.report(spark, path, checks)) === before,
      "post-compaction replay must no-op on the carried marker")
  }

  test("checkpoint kill-and-restart: crash after append, before commit — report converges") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.streaming.StreamingQueryException
    val root = java.nio.file.Files.createTempDirectory("dq_restart").toString
    val schema = StructType(Seq(
      StructField("order_id", LongType), StructField("cust_id", LongType),
      StructField("qty", LongType)))
    val batch0 = rows.slice(0, 4)
    val batch1 = rows.slice(4, 8) // carries a dup of batch0's 101

    def feed(in: String, name: String,
             rs: Seq[(java.lang.Long, java.lang.Long, java.lang.Long)]): Unit = {
      val stage = s"$root/stage-$name"
      df(rs).coalesce(1).write.mode("overwrite").parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).zipWithIndex.foreach { case (f, i) =>
          java.nio.file.Files.copy(f.toPath,
            java.nio.file.Paths.get(in, s"$name-$i.parquet"))
        }
    }

    def run(store: String, in: String, ckpt: String, crash: Boolean): Map[String, Long] = {
      new java.io.File(in).mkdirs()
      @volatile var armed = crash
      def start() = DqStream.attach(
          spark.readStream.schema(schema).parquet(in), store, checks) { (bid, _) =>
          // the crash window: processBatch's appendCommit already ran
          // (possibly only its renames, in the worst real crash — the
          // tag-guard test covers that half), the streaming commit has not
          if (bid == 1L && armed) {
            armed = false
            throw new RuntimeException("injected crash: append done, commit not")
          }
        }.option("checkpointLocation", ckpt).start()
      feed(in, "b0", batch0)
      val q1 = start()
      q1.processAllAvailable()
      feed(in, "b1", batch1)
      if (crash) {
        intercept[StreamingQueryException] { q1.processAllAvailable() }
        assert(!q1.isActive)
        val q2 = start()
        try q2.processAllAvailable() finally q2.stop()
      } else {
        try q1.processAllAvailable() finally q1.stop()
      }
      if (q1.isActive) q1.stop()
      reportMap(DqStream.report(spark, store, checks))
    }

    val crashed = run(s"$root/store", s"$root/inA", s"$root/ckpt", crash = true)
    val clean = run(s"$root/storeRef", s"$root/inB", s"$root/ckptRef", crash = false)
    val oneShot = reportMap(DqStream.batchReport(df(rows), checks))
    assert(crashed === clean && clean === oneShot,
      s"crashed $crashed / clean $clean / one-shot $oneShot must all agree")
  }

  test("attach: live MemoryStream run converges to the batch report") {
    implicit val sqlCtx = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("dq_live").toString
    val mem = MemoryStream[(java.lang.Long, java.lang.Long, java.lang.Long)]
    @volatile var last: Map[String, Long] = Map.empty
    val q = DqStream.attach(
        mem.toDF().toDF("order_id", "cust_id", "qty"), path, checks) {
        (_, rep) => last = reportMap(rep)
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("dq_ckpt").toString)
      .start()
    try {
      mem.addData(rows.slice(0, 4)); q.processAllAvailable()
      mem.addData(rows.slice(4, 8)); q.processAllAvailable()
      val oneShot = reportMap(DqStream.batchReport(df(rows), checks))
      assert(last === oneShot, s"live $last vs batch $oneShot")
    } finally q.stop()
  }
}
