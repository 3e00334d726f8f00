package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as an ADDITIVE
  * RELATIONAL TABLE — point-frequency estimates with a fixed d×w
  * footprint, the frequency analog of the [[Hll]] register table
  * (cardinality) and the [[graft.functions.expr.MisraGries]] aggregate
  * (top-k): MisraGries answers "which items are frequent", the CMS
  * answers "how frequent is THIS item" for any item, long after the
  * raw data is gone.
  *
  * Representation: rows (i, bucket, cnt) for i < depth, bucket < width —
  * at most depth·width rows total regardless of input size. Hash family
  * = the engine's md5-28-bit base + fixed xorshift affine coefficients
  * ([[Text.minhashCoeffs]]), so every cell index is exactly replayable
  * in ANSI SQL. Estimate(x) = min_i cnt[i][h_i(x)] — an overestimate,
  * NEVER an under-estimate (each cell only ever gains collisions), with
  * the standard (ε = e/w, δ = e^−d) guarantee.
  *
  * Merge algebra: union + per-cell SUM — associative and commutative
  * but NOT idempotent (unlike [[Hll]]'s max), so batch appends rely on
  * [[Stores.appendCommit]]'s exactly-once markers to stay
  * replay-convergent: a redelivered batch no-ops on its marker instead
  * of double-counting.
  *
  * Scale: the build collapses the corpus to per-item counts first (one
  * hash aggregation, vocabulary-sized), then scatters each DISTINCT
  * item into d cells — the d-fold blow-up is over the vocabulary, never
  * the corpus. Probes are a broadcast-sized join against the ≤ d·w-row
  * sketch. */
object Cms {

  /** Affine coefficients for the d hash rows — the MinHash family's
    * deterministic xorshift constants, consumed from the tail so the
    * two families never share a permutation. */
  def coeffs(depth: Int): Seq[(Long, Long)] = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    Text.minhashCoeffs(64).takeRight(depth)
  }

  private def checkWidth(width: Int): Unit =
    require(width >= 2 && width <= (1 << 24),
      s"width must be in [2, 2^24], got $width")

  private def baseSql(valueExpr: String) =
    s"cast(conv(substring(md5($valueExpr), 1, 7), 16, 10) as bigint)"

  /** Build the sketch over (possibly weighted) items: one row per
    * occupied cell, (i, bucket, cnt). `weightExpr` defaults to 1 per
    * input row. */
  def build(df: DataFrame, valueExpr: String, depth: Int, width: Int,
            weightExpr: String = "cast(1 as bigint)"): DataFrame = {
    checkWidth(width)
    val counts = df
      .select(expr(valueExpr).as("v"), expr(weightExpr).as("wt"))
      .groupBy("v").agg(sum(col("wt")).cast("long").as("cnt"))
      .withColumn("base", expr(baseSql("v")))
    // map-side explode into the d cells (one pass over the vocabulary —
    // a union of d branches would re-run the count aggregation d times)
    counts.select(explode(array(coeffs(depth).zipWithIndex.map {
        case ((a, b), i) =>
          struct(lit(i).cast("int").as("i"),
            expr(s"(base * $a + $b) % ${Text.MH_P} % $width")
              .cast("long").as("bucket"))
      }: _*)).as("c"), col("cnt"))
      .groupBy(col("c.i").as("i"), col("c.bucket").as("bucket"))
      .agg(sum(col("cnt")).cast("long").as("cnt"))
  }

  /** Point-frequency estimates for `probes(v)` against a (merged)
    * sketch: (v, est) where est = min over the d rows; an item hashing
    * to an untouched cell estimates 0. */
  def probe(probes: DataFrame, sketch: DataFrame, depth: Int,
            width: Int): DataFrame = {
    checkWidth(width)
    val keyed = probes.select(col("v")).distinct()
      .withColumn("base", expr(baseSql("v")))
      .select(col("v"), explode(array(coeffs(depth).zipWithIndex.map {
        case ((a, b), i) =>
          struct(lit(i).cast("int").as("i"),
            expr(s"(base * $a + $b) % ${Text.MH_P} % $width")
              .cast("long").as("bucket"))
      }: _*)).as("c"))
      .select(col("v"), col("c.i").as("i"), col("c.bucket").as("bucket"))
    keyed
      .join(broadcast(sketch), Seq("i", "bucket"), "left")
      .groupBy("v")
      .agg(min(coalesce(col("cnt"), lit(0L))).cast("long").as("est"))
  }

  /** DuckDB mirror of [[build]]+[[probe]]: emits CTEs ending in
    * `cms_est(v, est)` for a source relation `src(v)` (one row per
    * occurrence) probed by relation `probeRel(v)`. */
  def oracleCtes(src: String, probeRel: String, depth: Int,
                 width: Int): String = {
    val rowsSql = coeffs(depth).zipWithIndex.map { case ((a, b), i) =>
      s"SELECT $i AS i, (base * $a + $b) % ${Text.MH_P} % $width AS bucket, cnt FROM cms_counts"
    }.mkString("\n  UNION ALL ")
    val probeSql = coeffs(depth).zipWithIndex.map { case ((a, b), i) =>
      s"SELECT v, $i AS i, (base * $a + $b) % ${Text.MH_P} % $width AS bucket FROM cms_pb"
    }.mkString("\n  UNION ALL ")
    s"""cms_counts AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt,
       |    CAST('0x' || substr(md5(v), 1, 7) AS BIGINT) AS base
       |  FROM $src GROUP BY 1, 3),
       |cms_cells AS ($rowsSql),
       |cms AS (SELECT i, bucket, CAST(sum(cnt) AS BIGINT) AS cnt
       |  FROM cms_cells GROUP BY 1, 2),
       |cms_pb AS (SELECT DISTINCT v,
       |    CAST('0x' || substr(md5(v), 1, 7) AS BIGINT) AS base
       |  FROM $probeRel),
       |cms_keys AS ($probeSql),
       |cms_est AS (SELECT k.v,
       |    CAST(min(coalesce(cms.cnt, 0)) AS BIGINT) AS est
       |  FROM cms_keys k LEFT JOIN cms USING (i, bucket) GROUP BY 1)""".stripMargin
  }

  /** EQUI-JOIN SIZE estimate from two sketches (Cormode & Muthukrishnan
    * 2005 §4.2): |A ⋈_v B| = Σ_v fA(v)·fB(v), estimated as
    * min_i Σ_bucket cntA[i][bucket]·cntB[i][bucket] — the inner product
    * of each hash row, minimized over rows. Like the point estimate it
    * is an OVER-estimate, never under (collisions only add mass), with
    * the same (ε·N_A·N_B, δ) guarantee. This is THE planning number a
    * join optimizer wants before committing to a shuffle — computed
    * here from two ≤ d·w-row cell tables, with the raw relations long
    * gone. Setting B = A gives the second frequency moment F2 =
    * Σ_v f(v)² — the self-join size / skew statistic.
    *
    * Arithmetic: per-cell products accumulate in DECIMAL(38,0) (cell
    * counts are corpus-sized longs; a long×long product can overflow
    * where decimal cannot), min over exactly `depth` exact integers.
    * Returns one row: `est` DECIMAL(38,0) — callers needing a long
    * cast when their scale allows.
    *
    * Both sketches must share `depth`, `width`, and the hash family
    * (anything built by [[build]] with equal parameters does). */
  def innerProduct(a: DataFrame, b: DataFrame, depth: Int): DataFrame = {
    val d19 = "decimal(19,0)"
    val dots = a.select(col("i"), col("bucket"), col("cnt").as("cnt_a"))
      .join(b.select(col("i"), col("bucket"), col("cnt").as("cnt_b")),
        Seq("i", "bucket"))
      .groupBy("i")
      .agg(sum(col("cnt_a").cast(d19) * col("cnt_b").cast(d19)).as("dot"))
    // a hash row with zero overlapping cells has dot 0 and must still
    // participate in the min — materialize all depth rows explicitly
    val rows = a.sparkSession.range(depth.toLong)
      .select(col("id").cast("int").as("i"))
    rows.join(dots, Seq("i"), "left")
      .agg(min(coalesce(col("dot"), lit(0).cast("decimal(38,0)")))
        .cast("decimal(38,0)").as("est"))
  }

  /** DuckDB mirror of [[build]] on two sources + [[innerProduct]]:
    * CTEs ending in `cms_ip(est BIGINT)`. */
  def innerProductOracleCtes(srcA: String, srcB: String, depth: Int,
                             width: Int): String = {
    def cells(src: String, p: String) = {
      val rowsSql = coeffs(depth).zipWithIndex.map { case ((a, b), i) =>
        s"SELECT $i AS i, (base * $a + $b) % ${Text.MH_P} % $width AS bucket, cnt FROM ${p}_counts"
      }.mkString("\n  UNION ALL ")
      s"""${p}_counts AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt,
         |    CAST('0x' || substr(md5(v), 1, 7) AS BIGINT) AS base
         |  FROM $src GROUP BY 1, 3),
         |${p}_cells AS ($rowsSql),
         |$p AS (SELECT i, bucket, CAST(sum(cnt) AS BIGINT) AS cnt
         |  FROM ${p}_cells GROUP BY 1, 2)""".stripMargin
    }
    val iRows = (0 until depth).map(i => s"($i)").mkString(",")
    s"""${cells(srcA, "cms_ipa")},
       |${cells(srcB, "cms_ipb")},
       |cms_dot AS (SELECT a.i,
       |    CAST(sum(CAST(a.cnt AS HUGEINT) * b.cnt) AS HUGEINT) AS dot
       |  FROM cms_ipa a JOIN cms_ipb b USING (i, bucket) GROUP BY 1),
       |cms_ir AS (SELECT i FROM (VALUES $iRows) t(i)),
       |cms_ip AS (SELECT CAST(min(coalesce(dot, 0)) AS BIGINT) AS est
       |  FROM cms_ir LEFT JOIN cms_dot USING (i))""".stripMargin
  }

  /** Append one batch's cell counts into a parquet store — rows
    * (i, bucket, cnt, tag). Exactly-once per `batchTag` (the SUM merge
    * is not idempotent, so the marker is load-bearing here). */
  def storeAppend(df: DataFrame, path: String, batchTag: String,
                  valueExpr: String, depth: Int, width: Int): Unit = {
    val spark = df.sparkSession
    val cells = build(df, valueExpr, depth, width)
      .withColumn("tag", lit(batchTag))
    if (!Stores.exists(spark, path, "_SUCCESS"))
      cells.limit(0).write.mode("overwrite").parquet(path)
    Stores.appendCommit(spark, path, batchTag) { staging =>
      cells.write.mode("overwrite").parquet(staging)
    }
  }

  /** The merged sketch from an append store (sum across batch tags). */
  def fromStore(spark: SparkSession, path: String): DataFrame = {
    Stores.requireStore(spark, path, "append sketch batches first")
    spark.read.parquet(path)
      .groupBy("i", "bucket").agg(sum(col("cnt")).cast("long").as("cnt"))
  }

  /** [[fromStore]] cut at a batch tag (`tag <= asOfTag`) — frequency
    * time-travel: cell sums over an append-only prefix reconstruct the
    * sketch any reader probed after batch N, exactly. */
  def fromStoreAsOf(spark: SparkSession, path: String,
                    asOfTag: String): DataFrame = {
    Stores.requireStore(spark, path, "append sketch batches first")
    Stores.freshRead(spark, path).filter(col("tag") <= asOfTag)
      .groupBy("i", "bucket").agg(sum(col("cnt")).cast("long").as("cnt"))
  }
}
