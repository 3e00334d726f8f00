package graft

import graft.ops.Linkage
import org.apache.spark.sql.functions.{col, substring}

/** Blocked record linkage ([[graft.ops.Linkage.blockedBestMatch]]):
  * candidate generation stays within blocks, best-match tie-breaks are
  * deterministic, and the length prune never changes results. */
class LinkageSpec extends SparkTestBase {

  import spark.implicits._

  private val master = Seq(
    (1L, 10, "alice cooper"),
    (2L, 10, "alice cooperr"), // distance 1 from alice cooper
    (3L, 20, "bob marley"),
    (4L, 20, "bobby marley"),
    (5L, 30, "carol king")).toDF("id", "nation", "name")

  test("best match = lowest distance, ties broken by lowest master id") {
    val probes = Seq((100L, 10, "alice cooper")).toDF("pid", "nation", "pname")
    val r = Linkage.blockedBestMatch(probes, master, Seq("nation"),
      "pid", "pname", "id", "name", maxDist = 2).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("master_id") === 1L, "exact match (dist 0) wins")
    assert(row.getAs[Long]("dist") === 0L)
    assert(row.getAs[Long]("n_candidates") === 2L, "both block members within 2")
  }

  test("blocking: a closer name in ANOTHER block is never a candidate") {
    val probes = Seq((200L, 20, "alice cooper")).toDF("pid", "nation", "pname")
    val r = Linkage.blockedBestMatch(probes, master, Seq("nation"),
      "pid", "pname", "id", "name", maxDist = 2).collect()
    assert(r.isEmpty, "block 20 has no name within distance 2")
  }

  test("probe with no candidate inside maxDist is absent from output") {
    val probes = Seq(
      (300L, 30, "carole kingg"), // dist 2 from carol king
      (301L, 30, "zzzzzz")).toDF("pid", "nation", "pname")
    val r = Linkage.blockedBestMatch(probes, master, Seq("nation"),
      "pid", "pname", "id", "name", maxDist = 2)
      .collect().map(x => x.getAs[Long]("probe_id")).toSet
    assert(r === Set(300L))
  }

  test("equidistant candidates tie-break by master id") {
    val m = Seq((7L, 1, "abcd"), (9L, 1, "abce")).toDF("id", "nation", "name")
    val probes = Seq((1L, 1, "abcf")).toDF("pid", "nation", "pname")
    val r = Linkage.blockedBestMatch(probes, m, Seq("nation"),
      "pid", "pname", "id", "name", maxDist = 1).collect().head
    assert(r.getAs[Long]("dist") === 1L)
    assert(r.getAs[Long]("master_id") === 7L)
    assert(r.getAs[Long]("n_candidates") === 2L)
  }

  test("length prune is sound: |len diff| > maxDist cannot match anyway") {
    // "ab" vs "abcdef": length diff 4 > maxDist 2; prune removes it before
    // the DP, and the DP would have rejected it too (dist >= 4)
    val m = Seq((1L, 1, "abcdef")).toDF("id", "nation", "name")
    val probes = Seq((1L, 1, "ab")).toDF("pid", "nation", "pname")
    val r = Linkage.blockedBestMatch(probes, m, Seq("nation"),
      "pid", "pname", "id", "name", maxDist = 2).collect()
    assert(r.isEmpty)
  }

  test("streaming twin: candidates arrive in the probe's batch; reduction equals batch op") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, Int, String)]
    val probes = mem.toDF().toDF("pid", "nation", "pname")
    val out = graft.streaming.LinkageStream.candidates(probes, master,
      Seq("nation"), "pid", "pname", "id", "name", maxDist = 2)
    val q = out.writeStream.format("memory").queryName("link_cand")
      .outputMode("append").start()
    try {
      mem.addData((100L, 10, "alice cooper"))
      q.processAllAvailable()
      val b1 = spark.sql("select * from link_cand").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(b1 === Set((100L, 1L, 0L), (100L, 2L, 1L)),
        "verdict complete within the arrival batch; stateless plan")
      mem.addData((200L, 20, "bob marley"), (201L, 30, "zzzzzz"))
      q.processAllAvailable()
      val all = spark.sql("select * from link_cand").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(all.filter(_._1 == 200L).map(_._2) === Set(3L, 4L))
      assert(!all.exists(_._1 == 201L), "no candidate within maxDist")
      // stateless: no state store operators in the progress
      assert(q.lastProgress.stateOperators.isEmpty)
      // downstream min-reduction over the landed rows == the batch op
      val streamed = all.groupBy(_._1).map { case (pid, cs) =>
        val best = cs.toSeq.map(c => (c._3, c._2)).min
        (pid, best._2, best._1)
      }.toSet
      val probesBatch = Seq((100L, 10, "alice cooper"), (200L, 20, "bob marley"),
        (201L, 30, "zzzzzz")).toDF("pid", "nation", "pname")
      val batch = Linkage.blockedBestMatch(probesBatch, master, Seq("nation"),
        "pid", "pname", "id", "name", maxDist = 2).collect()
        .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("master_id"),
          r.getAs[Long]("dist"))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("blockedPairs -> duplicateClusters: transitive chain clusters once, blocks isolate") {
    val recs = Seq(
      (1L, 1, "abcd"), (2L, 1, "abce"), (3L, 1, "abef"), // chain 1~2~3 (1~3 dist 3)
      (4L, 1, "zzzz"),                                    // same block, no match
      (5L, 2, "abcd")                                     // other block: never pairs with 1
    ).toDF("id", "nation", "name")
    val pairs = Linkage.blockedPairs(recs, Seq("nation"), "id", "name", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // abcd~abce dist 1; abce~abef dist 2; abcd~abef dist 2
    assert(pairs === Set((1L, 2L), (2L, 3L), (1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L), "cross-block never pairs")
    val clusters = graft.ops.Dedup.duplicateClusters(
      Linkage.blockedPairs(recs, Seq("nation"), "id", "name", maxDist = 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(1L) === 1L && clusters(2L) === 1L && clusters(3L) === 1L,
      "transitive closure labels the chain with the component minimum")
    assert(!clusters.contains(4L), "unmatched records stay out of the cluster map")
  }

  test("maxBlockSize: a degenerate hot block is excluded, cold blocks unaffected") {
    // block 99 is the NULL-key-flood shape: 6 identical-name masters;
    // block 10 is a normal block of 2
    val hotMaster = (Seq((1L, 10, "alice cooper"), (2L, 10, "alice cooperr")) ++
      (100L to 105L).map(i => (i, 99, "dirty record"))).toDF("id", "nation", "name")
    val probes = Seq(
      (500L, 10, "alice cooper"),   // cold block: must still match
      (501L, 99, "dirty record")    // hot block: capped away -> no row
    ).toDF("pid", "nation", "pname")
    val r = Linkage.blockedBestMatch(probes, hotMaster, Seq("nation"),
      "pid", "pname", "id", "name", maxDist = 2, maxBlockSize = 5L)
      .collect().map(x => x.getAs[Long]("probe_id") -> x.getAs[Long]("master_id")).toMap
    assert(r === Map(500L -> 1L),
      "probe in the oversized block reports no match; cold block intact")
    // uncapped default: the hot-block probe matches (semantics differ only
    // where the cap bites)
    val u = Linkage.blockedBestMatch(probes, hotMaster, Seq("nation"),
      "pid", "pname", "id", "name", maxDist = 2)
      .collect().map(x => x.getAs[Long]("probe_id")).toSet
    assert(u === Set(500L, 501L))
  }

  test("maxBlockSize on blockedPairs: Σ|b|² stays linear when one block floods") {
    val recs = ((1L to 8L).map(i => (i, 1, "flooded")) ++
      Seq((20L, 2, "abcd"), (21L, 2, "abce"))).toDF("id", "nation", "name")
    val pairs = Linkage.blockedPairs(recs, Seq("nation"), "id", "name",
      maxDist = 2, maxBlockSize = 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((20L, 21L)), "only the cold block pairs survive the cap")
    val ex = intercept[IllegalArgumentException] {
      Linkage.blockedPairs(recs, Seq("nation"), "id", "name",
        maxDist = 2, maxBlockSize = 0L).collect()
    }
    assert(ex.getMessage.contains("positive"))
  }

  test("goldenRecords: modal vote, lexicographic ties, null exclusion, singleton suppression") {
    val recs = Seq(
      // cluster 1: modal name "ann" (2 of 3); segment tie bob/rob → "bob"
      (1L, "ann", "auto"), (2L, "ann", "build"), (3L, "anne", null),
      // cluster 10: all-null name column is simply absent from the vote
      (10L, "zed", "auto"), (11L, "zed", "auto"),
      // singleton 50: no golden row
      (50L, "solo", "x")
    ).toDF("id", "name", "seg")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "cluster_id")
    val g = Linkage.goldenRecords(recs, clusters, "id", Seq("name", "seg"))
      .collect().map(r => r.getAs[Long]("cluster_id") ->
        ((r.getAs[Long]("n_members"), r.getAs[String]("golden_name"),
          r.getAs[Long]("n_distinct_name"), r.getAs[String]("golden_seg"),
          r.getAs[Long]("n_distinct_seg")))).toMap
    assert(g(1L) === ((3L, "ann", 2L, "auto", 2L)),
      "modal name wins; null seg excluded; seg tie breaks lexicographically")
    assert(g(10L) === ((2L, "zed", 1L, "auto", 1L)))
    assert(!g.contains(50L), "singletons are their own golden record")
  }

  test("consonantSkeleton: invariant under vowel substitution/insertion/deletion, case-folded") {
    val df = Seq(
      ("Jonathan", "Janithon"),   // vowel substitutions
      ("Smith", "Smiith"),        // vowel insertion
      ("Carter", "Cartr"),        // vowel deletion
      ("MCDONALD", "mcdonald")    // case
    ).toDF("a", "b")
    val bad = df.filter(
      Linkage.consonantSkeleton(col("a")) =!=
        Linkage.consonantSkeleton(col("b"))).count()
    assert(bad === 0L, "every vowel-class typo must preserve the key")
    // and consonant edits DO move the key (the key discriminates)
    val moved = Seq(("Smith", "Smyth-x")).toDF("a", "b").filter(
      Linkage.consonantSkeleton(col("a")) =!=
        Linkage.consonantSkeleton(col("b"))).count()
    assert(moved === 1L)
  }

  test("phonetic blocking recovers vowel-typo'd probes that prefix blocking loses") {
    val masters = Seq((1L, "Benjamin"), (2L, "Margaret"), (3L, "Theodore"))
      .toDF("mid", "mname")
      .withColumn("blk", Linkage.consonantSkeleton(col("mname")))
    // typo in char 2 — inside any 4-char prefix window
    val probes = Seq((10L, "Binjamin"), (20L, "Mergaret"), (30L, "Thiodore"))
      .toDF("pid", "pname")
      .withColumn("blk", Linkage.consonantSkeleton(col("pname")))
    val got = Linkage.blockedBestMatch(probes, masters, Seq("blk"),
        "pid", "pname", "mid", "mname", maxDist = 2)
      .select("probe_id", "master_id").as[(Long, Long)].collect().toMap
    assert(got === Map(10L -> 1L, 20L -> 2L, 30L -> 3L),
      "skeleton blocks must contain the true master for vowel typos")
    // the same probes under 4-char-prefix blocking find NO candidates
    val pfxM = masters.withColumn("blk", substring(col("mname"), 1, 4))
    val pfxP = probes.withColumn("blk", substring(col("pname"), 1, 4))
    assert(Linkage.blockedBestMatch(pfxP, pfxM, Seq("blk"),
      "pid", "pname", "mid", "mname", maxDist = 2).count() === 0L)
  }

  test("goldenRecords: frequency beats lexicographic order when counts differ") {
    val recs = Seq((1L, "zeta"), (2L, "zeta"), (3L, "alpha"))
      .toDF("id", "name")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "cluster_id")
    val g = Linkage.goldenRecords(recs, clusters, "id", Seq("name"))
      .collect().head
    assert(g.getAs[String]("golden_name") === "zeta",
      "2×zeta outvotes 1×alpha despite sorting after it")
  }
}
