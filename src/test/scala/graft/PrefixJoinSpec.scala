package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Prefix-filtered exact Jaccard (SSJoin/PPJoin): completeness is the
  * whole point — pin it against the uncapped exact join, and pin the
  * case the df-capped plan documents away (a pair whose entire overlap
  * is corpus-hot grams). */
class PrefixJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame) = df
    .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
    .collect().map(p => (p._1, p._2, math.round(p._3 * 1e9))).toSet

  test("prefix join == uncapped exact join on the corpus (complete recall)") {
    val docs = graft.core.Tables.documents(spark, sf0001)
    val exact = pairs(Dedup.ngramJaccard(docs, tau = 0.4, blockCol = "lang"))
    spark.catalog.clearCache()
    val prefix = pairs(Dedup.ngramJaccardPrefix(docs, tau = 0.4, blockCol = "lang"))
    spark.catalog.clearCache()
    assert(prefix === exact, s"prefix ${prefix.size} vs exact ${exact.size}")
  }

  test("prefix join keeps the boilerplate-only pair the df cap drops") {
    val boiler = (1 to 12).map(i => s"bp$i").mkString(" ")
    val rows = (1L to 10L).map(i =>
      (i, "en", s"$boiler unique${i}a unique${i}b unique${i}c unique${i}d")) ++
      Seq((20L, "en", boiler), (21L, "en", boiler)) // overlap is ONLY hot grams
    val docs = rows.toDF("doc_id", "lang", "text")
    // every boilerplate gram has df = 12 > maxDf = 4: the capped plan
    // cannot surface (20, 21) — its documented recall trade
    val capped = pairs(Dedup.ngramJaccard(docs, tau = 0.9, blockCol = "lang",
      maxDf = 4))
    spark.catalog.clearCache()
    assert(!capped.exists(p => p._1 == 20L && p._2 == 21L))
    // the prefix plan is complete: (20, 21) at J = 1.0 must surface,
    // and nothing else reaches tau = 0.9
    val prefix = pairs(Dedup.ngramJaccardPrefix(docs, tau = 0.9, blockCol = "lang"))
    spark.catalog.clearCache()
    assert(prefix.exists(p => p._1 == 20L && p._2 == 21L && p._3 == 1000000000L),
      s"boilerplate-only pair missing: $prefix")
    val uncapped = pairs(Dedup.ngramJaccard(docs, tau = 0.9, blockCol = "lang"))
    spark.catalog.clearCache()
    assert(prefix === uncapped)
  }

  test("prefix size: only |g| - ceil(tau*|g|) + 1 rarest grams are indexed") {
    // 10 docs sharing a hot sentence + distinct rare grams: at tau=0.5
    // a doc with n grams indexes n - ceil(n/2) + 1, and the hot grams
    // (df=10) sort AFTER every rare gram (df=1), so candidates among
    // dissimilar docs stay empty even though they all share the hot run
    val hot = (1 to 8).map(i => s"h$i").mkString(" ")
    val docs = (1L to 10L).map(i =>
      (i, "en", s"r${i}a r${i}b r${i}c r${i}d r${i}e r${i}f r${i}g r${i}h $hot"))
      .toDF("doc_id", "lang", "text")
    val found = pairs(Dedup.ngramJaccardPrefix(docs, tau = 0.5, blockCol = "lang"))
    spark.catalog.clearCache()
    assert(found.isEmpty,
      s"dissimilar docs paired through hot-gram prefixes: $found")
  }
}
