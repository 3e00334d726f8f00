package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Bloom-filter pre-screen for membership joins — the missing middle
  * between "broadcast the exact key set" and "shuffle everything".
  *
  * The decontamination rule (reference: the cross-corpus screens in
  * [[Dedup]]; actyxos_data_flow keeps reference sets as subscription
  * side-state, machine-dashboard/logic.rs:6-30 scale analog) joins a
  * huge corpus against a reference key set. Three regimes at 100 TB:
  *
  *   - reference set small (≤ broadcast threshold): Spark already
  *     broadcasts the exact set — nothing to add;
  *   - reference set huge: both sides shuffle — unavoidable;
  *   - the wide middle (tens of millions of keys — an eval-suite gram
  *     set; hundreds of MB exact, too big to broadcast as a join
  *     build side): TODAY'S plan shuffles EVERY corpus gram. A Bloom
  *     filter summarizes the same set in ~10 bits/key (a few dozen MB
  *     at 1% fpp), rides to every task once via the task-binary
  *     torrent broadcast, and filters corpus grams MAP-SIDE at the
  *     scan: only true hits plus an fpp-sized sliver of false
  *     positives ever reach the exchange. Shuffle volume drops from
  *     |corpus grams| to ≈ hits + fpp·|corpus grams|, and the exact
  *     confirm join over survivors keeps the result EXACT — the Bloom
  *     changes the plan, never the answer.
  *
  * Uses Spark's own codegen'd sketch kernels (the pair behind AQE's
  * runtime row-group filtering): `BloomFilterAggregate` to build,
  * `BloomFilterMightContain` to probe — both whole-stage-codegen
  * friendly, so the screen fuses into the scan's generate/project
  * stage. Caps on the sketch size are the standard runtime-filter
  * confs (`spark.sql.optimizer.runtime.bloomFilter.maxNumItems` /
  * `.maxNumBits`) — raise them alongside the corpus.
  */
object BloomScreen {

  /** Build a Bloom filter over a LONG key column; returns the
    * serialized sketch (driver-sized by construction: numBits/8 bytes,
    * the same "model comes to the driver" rule as the PQ codebooks),
    * or None when the set is empty. */
  def buildBloom(keys: DataFrame, keyCol: String,
                 expectedItems: Long, numBits: Long): Option[Array[Byte]] = {
    require(expectedItems > 0 && numBits > 0,
      s"expectedItems/numBits must be positive, got $expectedItems/$numBits")
    val agg = new BloomFilterAggregate(
      ColumnBridge.expr(col(keyCol)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    // one row out of a full hash-agg reduction; null when zero keys
    Option(keys.select(ColumnBridge.column(agg).as("bf"))
      .head.getAs[Array[Byte]](0))
  }

  /** Codegen'd membership probe of a LONG column against a built
    * sketch. False positives at the configured fpp, never false
    * negatives — callers follow with an exact confirm join. */
  def mightContain(bloomBits: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal.create(bloomBits, BinaryType), ColumnBridge.expr(key)))

  /** Corpus-side n-gram decontamination with a Bloom pre-screen — the
    * production direction of [[Dedup.crossNgramContaminated]]: flag
    * TRAINING docs that share any exact n-token shingle with the eval
    * set (the docs you drop before training). Returns one row per
    * contaminated corpus doc: (corpus_id, hits), hits = count of its
    * distinct contaminated grams.
    *
    * Scale shape: the eval gram set is distinct-collapsed once and
    * persisted (it feeds both the sketch build and the confirm join);
    * the corpus side is ONE codegen'd tokenize→shingle→hash→screen
    * pass — the Bloom filter is applied BEFORE the exchange, so the
    * gram shuffle carries only screen survivors. The confirm join then
    * discards false positives, so results are exactly the unscreened
    * join's. The corpus is scanned once and shuffles ≈nothing when
    * clean — the steady-state decontamination cost profile. */
  def corpusContaminatedBloom(corpus: DataFrame, eval: DataFrame,
                              n: Int = 13, idCol: String = "doc_id",
                              textCol: String = "text",
                              expectedItems: Long = 1L << 20,
                              numBits: Long = 1L << 23): DataFrame = {
    val evalGrams = Dedup.corpusGramSet(eval, n, idCol, textCol).persist()
    screenAndConfirm(corpus, evalGrams,
      buildBloom(evalGrams, "g", expectedItems, numBits), n, idCol, textCol)
  }

  /** The screen+confirm core shared by the inline and stored variants:
    * map-side sketch filter on the corpus grams, exact join against the
    * gram set, per-doc hit count. An absent sketch means the reference
    * set was empty — nothing can be contaminated. */
  private def screenAndConfirm(corpus: DataFrame, refGrams: DataFrame,
                               bloom: Option[Array[Byte]], n: Int,
                               idCol: String, textCol: String): DataFrame =
    bloom match {
      case None =>
        corpus.select(col(idCol).as("corpus_id"), lit(0L).as("hits")).limit(0)
      case Some(b) =>
        Dedup.ngramHashes(corpus, n, idCol, textCol)
          .filter(mightContain(b, col("g")))
          .join(refGrams.hint("shuffle_hash"), Seq("g"))
          .groupBy(col("id"))
          .agg(count(lit(1)).as("hits"))
          .select(col("id").as("corpus_id"), col("hits"))
    }

  /** The KEEP-CURRENT artifact lifecycle for the reference gram set —
    * the same write-iff-absent shape as the stored k-means centroids
    * and the durable IVF-PQ index: distinct-collapse the eval set's
    * grams to parquet and its Bloom sketch to `bloom.bin` iff the
    * store marker is absent, then serve every screen FROM the store.
    * First call pays the eval-side tokenize+distinct; every later
    * screen — batch or streaming, any corpus increment — is one
    * parquet read + one small file read. Both halves are
    * deterministic (the gram set is a distinct projection; a Bloom's
    * bit array is the OR of per-key bit sets, so build order cannot
    * change it) — a rebuilt store is bit-identical to a reused one.
    * Returns (gram set, sketch); sketch is None for an empty set. */
  def gramSetStored(eval: DataFrame, path: String, n: Int = 13,
                    idCol: String = "doc_id", textCol: String = "text",
                    expectedItems: Long = 1L << 20,
                    numBits: Long = 1L << 23): (DataFrame, Option[Array[Byte]]) = {
    val spark = eval.sparkSession
    val gramsPath = Stores.child(path, "grams")
    if (!Stores.exists(spark, path, "_SUCCESS")) {
      Dedup.corpusGramSet(eval, n, idCol, textCol)
        .write.mode("overwrite").parquet(gramsPath)
      buildBloom(spark.read.parquet(gramsPath), "g", expectedItems, numBits)
        .foreach(b => Stores.writeBytes(spark, path, "bloom.bin", b))
      Stores.touch(spark, path, "_SUCCESS")
    }
    (spark.read.parquet(gramsPath), Stores.readBytes(spark, path, "bloom.bin"))
  }

  /** [[corpusContaminatedBloom]] served from a [[gramSetStored]] store:
    * the steady-state decontamination shape — screening a corpus (or a
    * fresh crawl increment) never recomputes the eval side. */
  def corpusContaminatedFromStore(corpus: DataFrame, path: String,
                                  n: Int = 13, idCol: String = "doc_id",
                                  textCol: String = "text"): DataFrame = {
    val (grams, sketch) = {
      val spark = corpus.sparkSession
      Stores.requireStore(spark, path, "build it with gramSetStored")
      (spark.read.parquet(Stores.child(path, "grams")),
        Stores.readBytes(spark, path, "bloom.bin"))
    }
    screenAndConfirm(corpus, grams, sketch, n, idCol, textCol)
  }
}
