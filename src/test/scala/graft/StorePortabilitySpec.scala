package graft

import org.apache.spark.sql.functions._
import graft.ops.{Stores, Dedup, BloomScreen, QualityClassifier}

/** Pins that every store probe routes through the Hadoop FileSystem
  * API, not `java.io.File`: each lifecycle here runs against a
  * `file:`-scheme URI — a path Hadoop resolves to local disk but that
  * `java.io.File` CANNOT (it reads `file:` as a relative path
  * component), so a local-FS probe would see "absent" forever. Before
  * the r13 port, that inversion made write-iff-absent stores silently
  * rebuild on every call and made `require(_SUCCESS)` throw on a
  * perfectly valid store — the exact failure mode an object-store
  * (s3a/abfs) deployment would hit. */
class StorePortabilitySpec extends SparkTestBase {
  import spark.implicits._

  /** A store root addressed by scheme'd URI. */
  private def uriDir(prefix: String): String = {
    val local = java.nio.file.Files.createTempDirectory(prefix)
    // leave only the parent: the store dir itself must not pre-exist
    java.nio.file.Files.delete(local)
    "file://" + local.toString
  }

  private def dataFiles(path: String): Set[String] = {
    val fs = Stores.fileSystem(spark, path)
    fs.listStatus(new org.apache.hadoop.fs.Path(path)).toSeq
      .filter(st => !st.isDirectory)
      .map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))
      .toSet
  }

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "pack my box with five dozen liquor jugs today")
  ).toDF("doc_id", "text")

  test("the URI is genuinely java.io.File-hostile (fixture sanity)") {
    val dir = uriDir("probe_hostile")
    Stores.fileSystem(spark, dir)
      .mkdirs(new org.apache.hadoop.fs.Path(dir))
    Stores.touch(spark, dir, "_SUCCESS")
    assert(Stores.exists(spark, dir, "_SUCCESS"),
      "Hadoop FS must see the marker through the scheme'd URI")
    assert(!new java.io.File(dir, "_SUCCESS").isFile,
      "java.io.File must NOT resolve the scheme'd URI — otherwise " +
        "this suite can't distinguish the two probe routes")
  }

  test("minhashBandsStored is write-once through a scheme'd URI (no silent rebuild)") {
    val dir = uriDir("minhash_uri")
    val first = Dedup.minhashBandsStored(docs, dir, shingleLen = 2,
      bands = 4, rowsPerBand = 2)
    val files = dataFiles(dir)
    assert(first.count() > 0 && files.nonEmpty)
    // second call must SERVE the store: an overwrite-rebuild would land
    // fresh task-UUID part names, so identical file names pin reuse
    val again = Dedup.minhashBandsStored(docs, dir, shingleLen = 2,
      bands = 4, rowsPerBand = 2)
    assert(dataFiles(dir) === files,
      "second call rebuilt the store — probe fell back to java.io.File")
    assert(again.count() === first.count())
  }

  test("requireStore accepts a valid URI store and rejects a missing one") {
    val dir = uriDir("require_uri")
    Dedup.minhashBandsStored(docs, dir, shingleLen = 2,
      bands = 4, rowsPerBand = 2)
    // pre-port this threw: java.io.File(dir, "_SUCCESS") was never a file
    val inc = Dedup.minhashIncremental(
      docs.filter(col("doc_id") === 2L), dir, tau = 0.5,
      shingleLen = 2, bands = 4, rowsPerBand = 2)
    assert(inc.count() >= 1, "doc 2 near-dups doc 1 in the store")
    val missing = uriDir("require_missing")
    val e = intercept[IllegalArgumentException] {
      Dedup.minhashIncremental(docs, missing, tau = 0.5)
    }
    assert(e.getMessage.contains("no store at"))
  }

  test("modelStored's child paths, marker touch and reload work through a URI") {
    val dir = uriDir("quality_uri")
    val (model, cut) = QualityClassifier.modelStored(docs, dir,
      buckets = 64, labelThreshold = 0.0)
    assert(Stores.exists(spark, dir, "_SUCCESS"))
    val weightFiles = dataFiles(Stores.child(dir, "weights"))
    val (model2, cut2) = QualityClassifier.modelStored(docs, dir,
      buckets = 64, labelThreshold = 0.0)
    assert(dataFiles(Stores.child(dir, "weights")) === weightFiles,
      "second call retrained — probe fell back to java.io.File")
    assert(model2 === model && cut2 === cut)
  }

  test("gramSetStored round-trips the bloom.bin bytes through a URI") {
    val dir = uriDir("bloom_uri")
    val (grams, sketch) = BloomScreen.gramSetStored(docs, dir, n = 3)
    assert(grams.count() > 0)
    assert(sketch.nonEmpty, "non-empty gram set must persist a sketch")
    val gramFiles = dataFiles(Stores.child(dir, "grams"))
    val (_, sketch2) = BloomScreen.gramSetStored(docs, dir, n = 3)
    assert(dataFiles(Stores.child(dir, "grams")) === gramFiles,
      "second call rebuilt the gram set")
    assert(sketch2.map(_.toSeq) === sketch.map(_.toSeq),
      "reloaded sketch bytes must equal the stored ones")
    val screened = BloomScreen.corpusContaminatedFromStore(docs, dir, n = 3)
    assert(screened.count() > 0, "a doc always shares grams with itself")
  }
}
