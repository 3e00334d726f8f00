package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B experiment readout — deterministic unit-level variant
  * assignment plus the two-proportion z statistic (the standard
  * large-sample test for conversion-rate experiments; see any treatment
  * of the two-sample binomial, e.g. Kohavi et al., "Trustworthy Online
  * Controlled Experiments").
  *
  * Assignment is a pure function of (unit, salt) — one md5 bit — which
  * is what real experiment platforms do (hash-based bucketing: sticky
  * across sessions, no assignment table to join, new salt = fresh
  * randomization). It also makes the whole readout exactly replayable
  * in any engine: counts are integers, rates one division each, and the
  * z denominator's `sqrt` is IEEE-754 correctly rounded — the one
  * "transcendental-looking" step that is actually bit-exact
  * cross-engine (unlike ln/exp, which this engine's exactness
  * discipline bans).
  *
  * Run against a corpus with no real treatment, the readout IS the
  * A/A test — the standard instrument validation: |z| repeatedly ≥ 2
  * on salt re-rolls means the bucketing or the metric is broken, not
  * the product.
  *
  * Scale: one hash aggregation to unit grain (conversion = did the
  * unit EVER convert), one map-combinable aggregation to a single row
  * per group. Nothing unit-level leaves the second aggregation.
  */
object Abtest {

  /** @param unitExpr randomization unit (user id — NEVER the event id:
    *                 unit-level independence is what the z test assumes)
    * @param convExpr boolean conversion predicate evaluated per row;
    *                 a unit converts if ANY of its rows does
    * @param salt     experiment name/seed — new salt = new assignment
    * @return one row per group: n_a, conv_a, n_b, conv_b, rate_a,
    *         rate_b, lift (rate_b − rate_a), z. rate/lift/z are NULL
    *         when either arm is empty (z also when the pooled rate is
    *         degenerate 0/1) — an explicit NULL on both engines, never
    *         Spark's NULL-on-div-by-zero vs IEEE Inf/NaN divergence */
  def readout(df: DataFrame, groupCols: Seq[String], unitExpr: String,
              convExpr: String, salt: String): DataFrame = {
    val gc = groupCols.map(col)
    val units = df
      .select((gc :+ expr(unitExpr).as("unit") :+
        expr(convExpr).cast("boolean").as("c")): _*)
      .groupBy((gc :+ col("unit")): _*)
      .agg(max(when(col("c"), 1L).otherwise(0L)).as("converted"))
      .withColumn("variant",
        expr(s"cast(conv(substring(md5(concat(cast(unit as string), " +
          s"'$salt')), 1, 7), 16, 10) as bigint) % 2"))
    val agg = units.groupBy(gc: _*).agg(
      sum(when(col("variant") === 0, 1L).otherwise(0L)).cast("long").as("n_a"),
      sum(when(col("variant") === 0, col("converted")).otherwise(0L))
        .cast("long").as("conv_a"),
      sum(when(col("variant") === 1, 1L).otherwise(0L)).cast("long").as("n_b"),
      sum(when(col("variant") === 1, col("converted")).otherwise(0L))
        .cast("long").as("conv_b"))
    val nA = col("n_a").cast("double"); val nB = col("n_b").cast("double")
    val pA = col("conv_a").cast("double") / nA
    val pB = col("conv_b").cast("double") / nB
    val pPool = (col("conv_a") + col("conv_b")).cast("double") / (nA + nB)
    val se = sqrt(pPool * (lit(1.0) - pPool) * (lit(1.0) / nA + lit(1.0) / nB))
    val emptyArm = col("n_a") === 0L || col("n_b") === 0L
    agg.select((gc ++ Seq(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      when(emptyArm, lit(null)).otherwise(pA).as("rate_a"),
      when(emptyArm, lit(null)).otherwise(pB).as("rate_b"),
      when(emptyArm, lit(null)).otherwise(pB - pA).as("lift"),
      when(emptyArm || pPool === 0.0 || pPool === 1.0, lit(null))
        .otherwise((pB - pA) / se).as("z"))): _*)
  }

  /** DuckDB mirror over `src(<groupCols...>, unit, c)` with c already
    * 0/1 — CTEs ending in `ab(<groupCols...>, n_a, conv_a, n_b, conv_b,
    * rate_a, rate_b, lift, z)`. */
  def oracleCtes(src: String, groupCols: Seq[String], salt: String): String = {
    val g = groupCols.mkString(", ")
    val gq = if (groupCols.isEmpty) "" else s"$g, "
    s"""ab_u AS (SELECT ${gq}unit, max(c) AS converted,
       |    CAST('0x' || substr(md5(CAST(unit AS VARCHAR) || '$salt'), 1, 7)
       |      AS BIGINT) % 2 AS variant
       |  FROM $src GROUP BY ALL),
       |ab_c AS (SELECT $gq
       |    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS BIGINT)
       |      AS conv_a,
       |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |    CAST(sum(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS BIGINT)
       |      AS conv_b
       |  FROM ab_u GROUP BY ALL),
       |ab AS (SELECT $gq n_a, conv_a, n_b, conv_b,
       |    CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
       |      ELSE CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) END AS rate_a,
       |    CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
       |      ELSE CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) END AS rate_b,
       |    CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
       |      ELSE CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
       |      - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) END AS lift,
       |    CASE WHEN n_a = 0 OR n_b = 0
       |        OR CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) = 0.0
       |        OR CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) = 1.0
       |      THEN NULL
       |      ELSE (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
       |          - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
       |        / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
       |          * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
       |          * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
       |      END AS z
       |  FROM ab_c)""".stripMargin
  }
}
