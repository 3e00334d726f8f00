package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling — the DISCOVERY side of data quality (the
  * [[graft.streaming.DqStream]] checks are the assertion side): what do
  * the columns look like, and which near-functional dependencies hold?
  * Both are the first questions asked of an unfamiliar 100 TB table,
  * and both reduce to map-side-combinable aggregations.
  */
object Profile {

  /** Approximate functional-dependency profile (Kivinen & Mannila 1995's
    * g3 measure; Huhtala et al. 1999 TANE's `error`): for each
    * (determinant → dependent) candidate, the minimum number of rows to
    * remove for the FD to hold exactly — `violations` = Σ over
    * determinant groups of (group size − the group's modal dependent
    * count) — plus `conf` = 1 − violations/N, the fraction of rows the
    * dependency explains.
    *
    * Two hash aggregations per pair, both map-combinable: (det, dep)
    * counts (bounded by the pair's value-combination cardinality), then
    * per-det max/sum. All-integer until the one `conf` division.
    *
    * @param pairs (determinant, dependent) candidates — each side any
    *              SQL expression, so composite keys profile as e.g.
    *              `concat_ws('|', a, b)`; NULLs group as values (a NULL
    *              determinant is one group — a flood of NULLs showing
    *              up as a huge low-conf group is exactly what the
    *              profile should surface)
    * @return one row per pair: (determinant, dependent, n_rows,
    *         n_groups, violations, conf)
    */
  def fdProfile(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one (det, dep) candidate")
    pairs.map { case (det, dep) =>
      val pairCounts = df
        .groupBy(expr(det).cast("string").as("dv"),
          expr(dep).cast("string").as("pv"))
        .agg(count(lit(1)).as("c"))
      pairCounts
        .groupBy("dv")
        .agg(sum(col("c")).as("n"), max(col("c")).as("keep"))
        .agg(
          sum(col("n")).cast("long").as("n_rows"),
          count(lit(1)).cast("long").as("n_groups"),
          sum(col("n") - col("keep")).cast("long").as("violations"))
        .select(lit(det).as("determinant"), lit(dep).as("dependent"),
          col("n_rows"), col("n_groups"), col("violations"),
          (lit(1.0) - col("violations").cast("double") /
            col("n_rows").cast("double")).as("conf"))
    }.reduce(_ unionAll _)
  }

  /** The FD measure DECOMPOSES over an additive (dv, pv, cnt) store:
    * violations = Σ_dv (n_dv − max_pv cnt) is a pure function of the
    * pair counts, and pair counts merge by SUM across batches — so FD
    * confidence is INCREMENTALLY maintainable (the "is this dependency
    * eroding as data arrives" DQ drift monitor) without rescanning
    * history. Store size is the pair's value-combination cardinality
    * (the same bound the one-shot profile carries); sum-merge is not
    * idempotent, so the [[Stores.appendCommit]] marker is load-bearing
    * exactly as in [[Cms]]. */
  def fdStoreAppend(df: DataFrame, path: String, batchTag: String,
                    det: String, dep: String): Unit = {
    val spark = df.sparkSession
    val counts = df
      .groupBy(expr(det).cast("string").as("dv"),
        expr(dep).cast("string").as("pv"))
      .agg(count(lit(1)).cast("long").as("cnt"))
      .withColumn("tag", lit(batchTag))
    if (!Stores.exists(spark, path, "_SUCCESS"))
      counts.limit(0).write.mode("overwrite").parquet(path)
    Stores.appendCommit(spark, path, batchTag) { staging =>
      counts.write.mode("overwrite").parquet(staging)
    }
  }

  /** The g3 profile row from an append store (sum-merged pair counts);
    * `determinant`/`dependent` label the output as in [[fdProfile]]. */
  def fdFromStore(spark: org.apache.spark.sql.SparkSession, path: String,
                  det: String, dep: String): DataFrame = {
    Stores.requireStore(spark, path, "append FD pair-count batches first")
    spark.read.parquet(path)
      .groupBy("dv", "pv").agg(sum(col("cnt")).as("c"))
      .groupBy("dv")
      .agg(sum(col("c")).as("n"), max(col("c")).as("keep"))
      .agg(
        sum(col("n")).cast("long").as("n_rows"),
        count(lit(1)).cast("long").as("n_groups"),
        sum(col("n") - col("keep")).cast("long").as("violations"))
      .select(lit(det).as("determinant"), lit(dep).as("dependent"),
        col("n_rows"), col("n_groups"), col("violations"),
        (lit(1.0) - col("violations").cast("double") /
          col("n_rows").cast("double")).as("conf"))
  }

  /** TABLE-STATS card — the ANALYZE TABLE numbers (row count, null
    * count, NDV) per column, with NDV from the [[Hll]] register sketch:
    * the 100 TB path, where per-column exact count-distinct would
    * shuffle every distinct value of every column. `ndv_exact` rides
    * along as the witness at graded scale.
    *
    * The sketch NDV is the HIGH-cardinality path (join-key columns,
    * ids, prices): the raw HLL estimator carries the documented
    * small-range bias (see [[Hll]]'s class doc), so low-cardinality
    * columns (status flags, enums) belong to [[columnCard]]'s exact
    * value-bounded vote instead — the two cards split the column
    * population by exactly that line.
    *
    * One pass per column: a row/null aggregate + one register build
    * (≤ m rows out regardless of table size). */
  def tableStats(df: DataFrame, cols: Seq[String], m: Int = 256): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    cols.map { name =>
      val v = df.select(col(name).cast("string").as("v"))
      val nn = v.filter(col("v").isNotNull)
      val est = Hll.estimate(Hll.registers(nn, Nil, "v", m), Nil, m)
        .select(col("est").as("ndv_est"))
      v.agg(
          count(lit(1)).cast("long").as("n_rows"),
          sum(when(col("v").isNull, 1L).otherwise(0L)).cast("long")
            .as("n_null"),
          countDistinct(col("v")).cast("long").as("ndv_exact"))
        .crossJoin(est)
        .select(lit(name).as("column"), col("n_rows"), col("n_null"),
          col("ndv_exact"), col("ndv_est"))
    }.reduce(_ unionAll _)
  }

  /** SNAPSHOT DIFF card: what changed between two versions of a keyed
    * table — one row per tracked field with the table-level added/
    * removed/common key counts and that field's changed-value count
    * (null-aware: NULL→value and value→NULL are changes; NULL→NULL is
    * not). The data-versioning question ("what did this refresh
    * actually touch") asked of every ingest, answered as ONE full-outer
    * join + ONE aggregation — the [[graft.sink.BatchIncremental]]
    * snapshot-diff shape surfaced as an analytics card instead of a
    * sink transaction.
    *
    * Scale: the join shuffles both snapshots by key once; the
    * aggregation is map-side-combinable to a SINGLE row which then
    * unpivots to |fields| rows on the driver-free `stack` generator.
    * All counts are exact integers — trivially engine-identical.
    *
    * @param idCol join key, assumed NON-NULL in both snapshots (a NULL
    *              key row never joins and would count as added+removed;
    *              keyed tables with NULL keys have bigger problems —
    *              profile them with [[columnCard]] first)
    */
  def snapshotDiff(snapA: DataFrame, snapB: DataFrame, idCol: String,
                   fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "need at least one field to diff")
    val a = snapA.select((col(idCol).as("_ida") +: lit(1).as("_pa") +:
      fields.map(f => col(f).as(s"_a_$f"))): _*)
    val b = snapB.select((col(idCol).as("_idb") +: lit(1).as("_pb") +:
      fields.map(f => col(f).as(s"_b_$f"))): _*)
    val j = a.join(b, col("_ida") === col("_idb"), "full_outer")
    val changed = fields.map { f =>
      sum(when(col("_pa").isNotNull && col("_pb").isNotNull &&
        !(col(s"_a_$f") <=> col(s"_b_$f")), 1L).otherwise(0L))
        .cast("long").as(s"_ch_$f")
    }
    val baseAggs = Seq(
      sum(when(col("_pa").isNull, 1L).otherwise(0L)).cast("long")
        .as("n_added"),
      sum(when(col("_pb").isNull, 1L).otherwise(0L)).cast("long")
        .as("n_removed"),
      sum(when(col("_pa").isNotNull && col("_pb").isNotNull, 1L)
        .otherwise(0L)).cast("long").as("n_common")) ++ changed
    val counts = j.agg(baseAggs.head, baseAggs.tail: _*)
    val stackArgs = fields
      .map(f => s"'$f', _ch_$f").mkString(", ")
    counts.select(col("n_added"), col("n_removed"), col("n_common"),
        expr(s"stack(${fields.size}, $stackArgs) AS (field, n_changed)"))
      .select(col("field"), col("n_added"), col("n_removed"),
        col("n_common"), col("n_changed"))
  }

  /** DuckDB mirror of [[snapshotDiff]] over relations `srcA`/`srcB` —
    * CTEs ending in `sdiff(field, n_added, n_removed, n_common,
    * n_changed)`. */
  def snapshotDiffOracleCtes(srcA: String, srcB: String, idCol: String,
                             fields: Seq[String]): String = {
    val aCols = fields.map(f => s"a.$f AS a_$f").mkString(", ")
    val bCols = fields.map(f => s"b.$f AS b_$f").mkString(", ")
    val chSums = fields.map(f =>
      s"""CAST(sum(CASE WHEN ida IS NOT NULL AND idb IS NOT NULL
         |      AND a_$f IS DISTINCT FROM b_$f THEN 1 ELSE 0 END) AS BIGINT)
         |      AS ch_$f""".stripMargin).mkString(",\n    ")
    val unions = fields.map(f =>
      s"SELECT '$f' AS field, n_added, n_removed, n_common, ch_$f AS n_changed FROM sd_c")
      .mkString("\n  UNION ALL ")
    s"""sd_j AS (SELECT a.$idCol AS ida, b.$idCol AS idb, $aCols, $bCols
       |  FROM $srcA a FULL JOIN $srcB b ON a.$idCol = b.$idCol),
       |sd_c AS (SELECT
       |    CAST(sum(CASE WHEN ida IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_added,
       |    CAST(sum(CASE WHEN idb IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_removed,
       |    CAST(sum(CASE WHEN ida IS NOT NULL AND idb IS NOT NULL
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
       |    $chSums
       |  FROM sd_j),
       |sdiff AS (
       |  $unions)""".stripMargin
  }

  /** Column-profile card: one row per requested column — row/null/
    * distinct counts, lexicographic min/max (of the string rendering —
    * type-uniform across heterogeneous columns), and the modal value
    * with its count (ties to the smallest value; the
    * [[Linkage.goldenRecords]] vote rule). One (col, value) aggregation
    * per column, value-cardinality-bounded, plus a row-count pass.
    *
    * @return (column, n_rows, n_null, n_distinct, min_v, max_v, top_v,
    *         top_n) — `n_distinct` counts non-null values; min/max/top
    *         are NULL for an all-null column
    */
  def columnCard(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    cols.map { name =>
      val vc = df.groupBy(col(name).cast("string").as("v"))
        .agg(count(lit(1)).as("c"))
      vc.agg(
          sum(col("c")).cast("long").as("n_rows"),
          coalesce(sum(when(col("v").isNull, col("c"))), lit(0L))
            .cast("long").as("n_null"),
          count(col("v")).cast("long").as("n_distinct"),
          min(col("v")).as("min_v"),
          max(col("v")).as("max_v"),
          // null-value group gets a +inf sort key so it can never win
          // the vote unless the column is ALL null (then top_v = NULL)
          min_by(col("v"), struct(
            when(col("v").isNull, lit(Long.MaxValue))
              .otherwise(col("c") * -1).as("nc"), col("v"))).as("top_v"),
          max(when(col("v").isNotNull, col("c"))).cast("long").as("top_n"))
        .select(lit(name).as("column"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_v"), col("max_v"), col("top_v"),
          col("top_n"))
    }.reduce(_ unionAll _)
  }

  /** Gini concentration of a mass column over groups — "is this corpus
    * dominated by one source/domain/license" as one number: G = 0 is a
    * perfectly even split, G → 1 is single-group domination (the
    * curation red flag a domain cap exists to fix — this card is how
    * you notice you need one). Computed from the exact sorted-cumsum
    * identity G = (2·Σ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx), x ascending —
    * integer numerator/denominator, ONE double division; the sort and
    * window run over the GROUP table (model-sized), never the corpus
    * (which is touched once by the mass aggregation the caller already
    * did).
    * @param masses one row per group: (groupCol, massCol ≥ 0)
    * @return one row: n_groups, total, gini_num, gini_den, gini */
  def giniConcentration(masses: DataFrame, groupCol: String,
                        massCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // deterministic ascending order with the group name as tiebreak —
    // equal masses otherwise rank arbitrarily and flip i·x terms
    val w = Window.orderBy(col("x").asc, col(groupCol).asc)
    masses
      .select(col(groupCol), col(massCol).cast("decimal(18,0)").as("x"))
      .withColumn("i", row_number().over(w).cast("decimal(10,0)"))
      .agg(count(lit(1)).cast("long").as("n_groups"),
        sum(col("x")).cast("decimal(18,0)").as("sx"),
        sum(col("i") * col("x")).cast("decimal(38,0)").as("six"))
      .filter(col("sx") > 0)
      .withColumn("gini_num",
        (lit(2).cast("decimal(10,0)") * col("six")).cast("decimal(38,0)")
          - ((col("n_groups") + 1).cast("decimal(10,0)") * col("sx"))
            .cast("decimal(38,0)"))
      .withColumn("gini_den",
        (col("n_groups").cast("decimal(10,0)") * col("sx"))
          .cast("decimal(38,0)"))
      .withColumn("gini",
        col("gini_num").cast("double") / col("gini_den").cast("double"))
      .select(col("n_groups"), col("sx").cast("long").as("total"),
        col("gini_num").cast("long"), col("gini_den").cast("long"),
        col("gini"))
  }

  /** Leave-one-group-out influence: how much does dropping each group
    * (source/domain/shard) move the corpus mean of `valueExpr`? The
    * jackknife-style data-attribution card behind "which domain is
    * dragging the length/quality distribution" — the per-group numbers
    * a domain-cap decision reads. Exact: every leave-one-out mean is
    * one division of two integers ((T − T_g)/(n − n_g)); `delta` is
    * the deterministic difference of two such quotients. One hash
    * aggregation to group grain plus a broadcast of the single overall
    * row. NULL loo_mean/delta for a group that IS the whole corpus.
    *
    * @return per group: <groupCol>, n_g, t_g, loo_num (= T − T_g),
    *         loo_den (= n − n_g), loo_mean, delta (loo − overall) */
  def leaveOneOutInfluence(df: DataFrame, groupCol: String,
                           valueExpr: String): DataFrame = {
    val g = df.select(col(groupCol),
        expr(valueExpr).cast("long").as("v"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_g"),
        sum(col("v")).cast("long").as("t_g"))
    val overall = g.agg(sum(col("n_g")).cast("long").as("n_all"),
      sum(col("t_g")).cast("long").as("t_all"))
    g.crossJoin(broadcast(overall))
      .select(col(groupCol), col("n_g"), col("t_g"),
        (col("t_all") - col("t_g")).as("loo_num"),
        (col("n_all") - col("n_g")).as("loo_den"),
        when(col("n_all") === col("n_g"), lit(null).cast("double"))
          .otherwise((col("t_all") - col("t_g")).cast("double") /
            (col("n_all") - col("n_g")).cast("double")).as("loo_mean"),
        when(col("n_all") === col("n_g") || col("n_all") === 0L,
          lit(null).cast("double"))
          .otherwise((col("t_all") - col("t_g")).cast("double") /
            (col("n_all") - col("n_g")).cast("double") -
            col("t_all").cast("double") / col("n_all").cast("double"))
          .as("delta"))
  }
}
