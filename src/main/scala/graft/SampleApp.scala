package graft
import org.apache.spark.sql.functions._
import graft.examples._
object SampleApp {
  def main(args: Array[String]): Unit = {
    implicit val s = graft.core.GraftSession.local(4)
    import s.implicits._
    // typed example pipeline through the public API
    val evs = s.createDataset(Seq(
      MachineEvent("src1", "Drill1", 1, 1000L, started = true, "4711"),
      MachineEvent("src1", "Drill1", 2, 5000L, started = false, "4711"),
      MachineEvent("src1", "Drill2", 3, 2000L, started = true, "4713")))
    println("DASHBOARD " + Examples.dashboard(evs).collect().toList)
    println("USAGE     " + Examples.usage(evs).collect().toList)
    // salted join + batch-incremental sync through the public API
    val big = ((1 to 1000).map(_ => (1L, 1L)) ++ Seq((2L, 9L))).toDF("k", "v")
    val dim = Seq((1L, "hot"), (2L, "cold")).toDF("k", "name")
    println("SALTED    " + graft.ops.SkewJoin.saltedJoin(big, dim, Seq("k"), 4).groupBy("name").count().collect().toList)
    val sink = new graft.sink.JdbcDeltaSink("jdbc:derby:memory:sample;create=true",
      graft.sink.TableSpec("v", 1, Seq(graft.sink.ColumnSpec("k", "VARCHAR(8)"), graft.sink.ColumnSpec("n", "BIGINT"))))
    sink.bootstrap()
    graft.sink.BatchIncremental.sync(s, Seq(("a", 1L)).toDF("k", "n"), sink, Map("s" -> 1L), 0L)
    graft.sink.BatchIncremental.sync(s, Seq(("a", 2L), ("b", 1L)).toDF("k", "n"), sink, Map("s" -> 2L), 1L)
    println("SYNCED    " + sink.readRows() + " offsets=" + sink.getOffsets())
    s.stop()
  }
}
// (rolling fingerprint + simhash banding demo appended for API drive)
object SampleApp2 {
  def main(args: Array[String]): Unit = {
    val s = graft.core.GraftSession.local(4)
    import s.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.Text
    val docs = Seq((1L, "a b c"), (2L, "c b a")).toDF("doc_id", "text")
    val fp = docs.select(col("doc_id"),
        transform(Text.tokens(col("text")), t => Text.hash64(t, 0)).as("th"))
      .select(col("doc_id"), Text.rollingFingerprint(col("th")).as("rh"))
      .collect().toList
    println("ROLLING " + fp)
    println("SIMBAND " + graft.ops.Dedup.simhashNearDup(
      Seq((1L, "x y z w q r"), (2L, "x y z w q r s")).toDF("doc_id", "text"))
      .collect().toList)
    s.stop()
  }
}
// (round-4 curation ops drive: unigram quality → temperature mix →
// drift; semantic dedup + cross-corpus semantic decontamination)
object SampleApp3 {
  def main(args: Array[String]): Unit = {
    val s = graft.core.GraftSession.local(4)
    import s.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "web"),
      (2L, "the quick brown fox jumps over the lazy dog again", "web"),
      (3L, "zzz qqq xxx vvv kkk jjj", "spam"),
    ).toDF("doc_id", "text", "source")
    val (vocab, n) = graft.ops.TextStats.unigramModel(docs, vocabSize = 8)
    println("VOCAB   " + vocab.take(3) + s" (N=$n)")
    println("SCORES  " + graft.ops.TextStats.unigramScores(docs, vocab)
      .collect().toList)
    println("MIX     " + graft.ops.Sampling.temperatureMix(docs, "source",
      alpha = 0.5, totalFraction = 1.0, keyCol = "doc_id")
      .groupBy("source").count().collect().toList)
    println("DRIFT   " + graft.ops.TextStats.sourceDrift(docs)
      .collect().toList)
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)), (2L, Seq(2.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val cents = Array(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0)
    println("SEMDUP  " + graft.ops.SemDedup.semDedup(emb, cents, dim = 4,
      tau = 0.95).collect().toList)
    println("SEMCONT " + graft.ops.SemDedup.crossSemContaminated(
      emb.filter(col("vec_id") > 1), emb.filter(col("vec_id") === 1),
      cents, dim = 4, tau = 0.95).collect().toList)
    s.stop()
  }
}
