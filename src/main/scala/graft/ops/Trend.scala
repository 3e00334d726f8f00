package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group least-squares trend — "is this metric drifting, and how
  * fast" as ONE aggregation: slope/intercept/r² of y over x per group
  * from the closed-form normal equations, every sum accumulated
  * EXACTLY in DECIMAL(38,6) (integer/low-scale-decimal inputs ⇒
  * order-free exact sums at any scale — the
  * [[Graph.degreeAssortativity]] discipline), the final statistics a
  * fixed IEEE expression over those exact sums.
  *
  * This is the monitoring shape for "quality score per source over
  * time", "tokens per doc per crawl batch", "value per event type per
  * day": one map-side-combinable aggregation, group-count-sized output,
  * no window, no sort.
  */
object Trend {

  /** One row per group: (group..., n, slope, intercept, r2).
    * `xExpr`/`yExpr` are SQL expressions cast to DECIMAL(38,6) — keep
    * them integer-valued or low-scale decimal (epoch days, counts,
    * money) so the casts are exact. Groups with a degenerate
    * denominator (all-equal x, or all-equal y for r²) report NULL
    * rather than ±Inf/NaN. */
  def linearTrend(df: DataFrame, groupCols: Seq[String], xExpr: String,
                  yExpr: String): DataFrame = {
    val gc = groupCols.map(col)
    val d = "decimal(38,6)"
    val sums = df
      .select((gc :+ expr(xExpr).cast(d).as("x") :+
        expr(yExpr).cast(d).as("y")): _*)
      .filter(col("x").isNotNull && col("y").isNotNull)
      .groupBy(gc: _*)
      .agg(
        count(lit(1)).cast("long").as("n"),
        // sums keep the NATIVE product scale (38,12) — a re-cast to
        // scale 6 here would round real sub-scale digits and break
        // engine parity; the one lossy step is the final cast-to-double
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sx2"),
        sum(col("y") * col("y")).as("sy2"))
    // fixed IEEE shapes over the exact sums, shared with the oracle:
    //   den  = n·Σx² − (Σx)²        num = n·Σxy − Σx·Σy
    //   slope = num/den   intercept = (Σy − slope·Σx)/n
    //   r²    = num² / (den · (n·Σy² − (Σy)²))
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double"); val syD = col("sy").cast("double")
    val sxyD = col("sxy").cast("double"); val sx2D = col("sx2").cast("double")
    val sy2D = col("sy2").cast("double")
    val num = nD * sxyD - sxD * syD
    val den = nD * sx2D - sxD * sxD
    val denY = nD * sy2D - syD * syD
    sums.select((gc :+ col("n") :+
      when(den === 0.0, lit(null)).otherwise(num / den).as("slope") :+
      when(den === 0.0, lit(null))
        .otherwise((syD - (num / den) * sxD) / nD).as("intercept") :+
      when(den === 0.0 || denY === 0.0, lit(null))
        .otherwise((num * num) / (den * denY)).as("r2")): _*)
  }

  /** Per-group SEASONAL profile: mean of y at each cycle position
    * p = x mod period (day-of-week, hour-of-day, month-of-year), plus
    * the group-level peak position and amplitude — the decomposition
    * companion to [[linearTrend]] ("WHEN does this metric run hot, and
    * by how much" after "is it drifting"). Classical seasonal means are
    * the S_t of the moving-average decomposition (Kendall & Stuart);
    * fixed integer periods make them a pure GROUP BY, no window over
    * the data.
    *
    * Exactness contract (the [[linearTrend]] discipline): y sums
    * accumulate in DECIMAL(38,6) (exact for integer-valued y), the mean
    * is ONE double division of exact operands, and peak/amplitude are
    * comparisons + one subtraction over the ≤ period per-position
    * means — no order-dependent float folds anywhere, so the whole card
    * is engine-bit-identical.
    *
    * Scale: one map-side-combinable aggregation to |groups|·period
    * rows, then a window over those model-sized partitions. The 100 TB
    * seasonality dashboard is this exact shape.
    *
    * @return one row per (group..., pos): n, mean_y, peak_pos (position
    *         of the largest mean — ties to the smallest position),
    *         amplitude (max mean − min mean across the group's
    *         positions). */
  def seasonalProfile(df: DataFrame, groupCols: Seq[String], xExpr: String,
                      yExpr: String, period: Int): DataFrame =
    finishSeasonal(seasonalSums(df, groupCols, xExpr, yExpr, period),
      groupCols)

  /** The additive (group..., pos, n, sy) aggregation [[seasonalProfile]]
    * is a pure function of — n and sy merge by SUM across any slicing,
    * so the card is incrementally maintainable through the same
    * append-store discipline as [[Profile.fdStoreAppend]]. */
  private def seasonalSums(df: DataFrame, groupCols: Seq[String],
                           xExpr: String, yExpr: String,
                           period: Int): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    val gc = groupCols.map(col)
    df.select((gc :+ expr(xExpr).cast("long").as("x") :+
        expr(yExpr).cast("decimal(38,6)").as("y")): _*)
      .filter(col("x").isNotNull && col("y").isNotNull)
      .groupBy((gc :+ pmod(col("x"), lit(period.toLong)).as("pos")): _*)
      .agg(count(lit(1)).cast("long").as("n"), sum(col("y")).as("sy"))
  }

  /** Mean + peak/amplitude windows over a merged (group..., pos, n, sy)
    * table — the one IEEE division and the model-sized window pass. */
  private def finishSeasonal(sums: DataFrame,
                             groupCols: Seq[String]): DataFrame = {
    val gc = groupCols.map(col)
    val agg = sums.select((gc :+ col("pos") :+ col("n") :+
      (col("sy").cast("double") / col("n").cast("double"))
        .as("mean_y")): _*)
    val part = Window.partitionBy(gc: _*)
    val full = part.orderBy(col("mean_y").desc, col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    agg
      .withColumn("peak_pos", first(col("pos")).over(full))
      .withColumn("amplitude",
        max(col("mean_y")).over(part) - min(col("mean_y")).over(part))
  }

  /** Append one batch's seasonal sums into a parquet store at `path` —
    * rows (group..., pos, n, sy, tag). Sum-merge is additive, NOT
    * idempotent, so the [[Stores.appendCommit]] marker is load-bearing
    * (the [[Cms]]/[[Profile.fdStoreAppend]] contract). Store size is
    * ≤ |groups|·period rows per batch regardless of batch volume. */
  def seasonalStoreAppend(df: DataFrame, path: String, batchTag: String,
                          groupCols: Seq[String], xExpr: String,
                          yExpr: String, period: Int): Unit = {
    val spark = df.sparkSession
    val sums = seasonalSums(df, groupCols, xExpr, yExpr, period)
      .withColumn("tag", lit(batchTag))
    if (!Stores.exists(spark, path, "_SUCCESS"))
      sums.limit(0).write.mode("overwrite").parquet(path)
    Stores.appendCommit(spark, path, batchTag) { staging =>
      sums.write.mode("overwrite").parquet(staging)
    }
  }

  /** The seasonal card from an append store: SUM-merge the batch sums
    * per (group, pos), then the same finishing arithmetic as the
    * one-shot — decimal sums of decimal sums stay exact, so the stored
    * card is bit-identical to [[seasonalProfile]] over the union. */
  def seasonalFromStore(spark: org.apache.spark.sql.SparkSession,
                        path: String, groupCols: Seq[String]): DataFrame = {
    Stores.requireStore(spark, path, "append seasonal batches first")
    val merged = spark.read.parquet(path)
      .groupBy((groupCols.map(col) :+ col("pos")): _*)
      .agg(sum(col("n")).cast("long").as("n"), sum(col("sy")).as("sy"))
    finishSeasonal(merged, groupCols)
  }

  /** DuckDB mirror of [[seasonalProfile]] for a relation
    * `src(<groupCols...>, x, y)` with INTEGER x/y — CTEs ending in
    * `seas(<groupCols...>, pos, n, mean_y, peak_pos, amplitude)`.
    * HUGEINT sums for the same reason as [[oracleCtes]]. */
  def seasonalOracleCtes(src: String, groupCols: Seq[String],
                         period: Int): String = {
    val g = groupCols.mkString(", ")
    s"""se_a AS (SELECT $g, ((x % $period) + $period) % $period AS pos,
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE)
       |      / CAST(count(*) AS DOUBLE) AS mean_y
       |  FROM $src WHERE x IS NOT NULL AND y IS NOT NULL GROUP BY ALL),
       |seas AS (SELECT $g, pos, n, mean_y,
       |    first_value(pos) OVER (PARTITION BY $g
       |      ORDER BY mean_y DESC, pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
       |      AS peak_pos,
       |    max(mean_y) OVER (PARTITION BY $g)
       |      - min(mean_y) OVER (PARTITION BY $g) AS amplitude
       |  FROM se_a)""".stripMargin
  }

  /** DuckDB mirror of [[linearTrend]] for a relation
    * `src(<groupCols...>, x, y)` with INTEGER x/y — CTEs ending in
    * `trend(<groupCols...>, n, slope, intercept, r2)`.
    *
    * The sums are HUGEINT (128-bit exact), NOT decimal: DuckDB's
    * DECIMAL(38,12)→DOUBLE conversion divides the raw backing integer
    * in floating point and lands ~1e-4 off once the backing exceeds
    * 2^53 (measured: Σx² of 7.8e11 came back as …851.0001), while an
    * integer→double cast is correctly rounded — so integer sums are
    * the only rendering that matches Spark's (correctly-rounded)
    * BigDecimal.toDouble bit-for-bit. Engine parity therefore holds
    * for integer-valued inputs, the op's documented domain. */
  /** One-sided CUSUM drift detector (Page 1954, "Continuous inspection
    * schemes") over a per-(group, period) count series — the
    * change-point monitor a volume/freshness pipeline runs where a
    * threshold-on-the-raw-count misses SLOW drifts: CUSUM accumulates
    * every period's excess over `allowance` and alarms when the
    * accumulation crosses `threshold`, catching a persistent small
    * shift long before any single period looks anomalous.
    *
    * Exactness: the textbook recurrence S_t = max(0, S_{t−1} + (x_t −
    * allowance)) is not a window aggregate, but its classical closed
    * form IS: with prefix sums P_t of (x_t − allowance),
    * S_t = P_t − min(0, min_{j≤t} P_j) — two running integer windows,
    * bit-identical in any engine, no recursion and no UDAF. All
    * integer; alarms are exact.
    *
    * Scale: the input is the MONITORING table (|groups|·|periods|,
    * bounded — e.g. [[Decay.decayedBuckets]]' store merge), not the
    * corpus; the one shuffle is the per-group window sort of that
    * bounded table.
    *
    * @return (groupCols..., period, x, cusum, alarm) per period
    */
  def cusum(counts: DataFrame, groupCols: Seq[String], periodCol: String,
            cntCol: String, allowance: Long, threshold: Long): DataFrame = {
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    val gc = groupCols.map(col)
    val w = Window.partitionBy(gc: _*).orderBy(col(periodCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .select((gc :+ col(periodCol).as("period") :+
        col(cntCol).cast("long").as("x")): _*)
      .withColumn("_p", sum(col("x") - allowance).over(w).cast("long"))
      .withColumn("_m", min(col("_p")).over(w).cast("long"))
      .withColumn("cusum", col("_p") - least(col("_m"), lit(0L)))
      .withColumn("alarm", col("cusum") >= threshold)
      .drop("_p", "_m")
  }

  /** [[cusum]] fed from a [[Decay.storeAppend]] per-period count store
    * — the maintained monitor: batches fold in, the detector reads the
    * merged series at any moment (and at any PAST tag via the as-of
    * read). */
  def cusumFromStore(spark: org.apache.spark.sql.SparkSession,
                     path: String, groupCols: Seq[String],
                     allowance: Long, threshold: Long): DataFrame = {
    Stores.requireStore(spark, path, "append period-count batches first")
    val merged = Stores.freshRead(spark, path)
      .groupBy((groupCols :+ "period").map(col): _*)
      .agg(sum(col("cnt")).cast("long").as("cnt"))
      .filter(col("cnt") =!= 0L)
    cusum(merged, groupCols, "period", "cnt", allowance, threshold)
  }

  /** Fano factor (index of dispersion, variance/mean) of a per-period
    * count series — the BURSTINESS card that characterizes what
    * [[cusum]] detects: F ≈ 1 is Poisson-like arrival (organic
    * traffic), F ≫ 1 is bursty/clumped (bot floods, batch re-ingests,
    * scraper storms), F ≪ 1 is suspiciously regular (synthetic or
    * rate-limited). Exact: F = (n·Σx² − (Σx)²) / (n·Σx) emitted as its
    * integer numerator and denominator plus ONE double division — the
    * decimal-exact-sums discipline.
    * @return per group: n_periods, total, fano_num, fano_den, fano */
  def fanoFactor(counts: DataFrame, groupCols: Seq[String],
                 cntCol: String): DataFrame = {
    val gc = groupCols.map(col)
    counts
      .select((gc :+ col(cntCol).cast("decimal(18,0)").as("x")): _*)
      .groupBy(gc: _*)
      .agg(count(lit(1)).cast("long").as("n_periods"),
        sum(col("x")).cast("decimal(18,0)").as("sx"),
        sum(col("x") * col("x")).cast("decimal(27,0)").as("sx2"))
      .filter(col("sx") > 0)
      .withColumn("fano_num",
        ((col("n_periods").cast("decimal(10,0)") * col("sx2"))
          .cast("decimal(38,0)")
          - (col("sx") * col("sx")).cast("decimal(38,0)"))
          .cast("decimal(38,0)"))
      .withColumn("fano_den",
        (col("n_periods").cast("decimal(10,0)") * col("sx"))
          .cast("decimal(38,0)"))
      .withColumn("fano",
        col("fano_num").cast("double") / col("fano_den").cast("double"))
      .select((gc :+ col("n_periods") :+ col("sx").cast("long").as("total") :+
        col("fano_num").cast("long") :+ col("fano_den").cast("long") :+
        col("fano")): _*)
  }

  def oracleCtes(src: String, groupCols: Seq[String]): String = {
    val g = groupCols.mkString(", ")
    s"""tr_s AS (SELECT $g, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
       |    CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
       |    CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
       |    CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sx2,
       |    CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS sy2
       |  FROM $src WHERE x IS NOT NULL AND y IS NOT NULL GROUP BY ALL),
       |trend AS (SELECT $g, n,
       |    CASE WHEN CAST(n AS DOUBLE) * sx2 - sx * sx = 0 THEN NULL
       |      ELSE (CAST(n AS DOUBLE) * sxy - sx * sy)
       |        / (CAST(n AS DOUBLE) * sx2 - sx * sx) END AS slope,
       |    CASE WHEN CAST(n AS DOUBLE) * sx2 - sx * sx = 0 THEN NULL
       |      ELSE (sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
       |          / (CAST(n AS DOUBLE) * sx2 - sx * sx)) * sx)
       |        / CAST(n AS DOUBLE) END AS intercept,
       |    CASE WHEN CAST(n AS DOUBLE) * sx2 - sx * sx = 0
       |        OR CAST(n AS DOUBLE) * sy2 - sy * sy = 0 THEN NULL
       |      ELSE ((CAST(n AS DOUBLE) * sxy - sx * sy)
       |          * (CAST(n AS DOUBLE) * sxy - sx * sy))
       |        / ((CAST(n AS DOUBLE) * sx2 - sx * sx)
       |          * (CAST(n AS DOUBLE) * sy2 - sy * sy)) END AS r2
       |  FROM tr_s)""".stripMargin
  }
}
