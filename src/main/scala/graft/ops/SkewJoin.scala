package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed —
  * the classic 100 TB failure mode (one hot key → one straggler task).
  *
  * AQE's skew-join splitting (on by default in GraftSession) handles
  * sort-merge joins; this explicit salt is for the cases AQE can't
  * touch: aggregation hotspots and broadcast-ineligible dimension joins
  * with a known hot side.
  *
  * `saltedJoin`: the skewed (big) side gets a random salt in [0, S);
  * the small side is replicated S× with every salt value. Join on
  * (key, salt) spreads each hot key over S tasks. Results are identical
  * to the plain join (each big-side row matches exactly one replica).
  */
object SkewJoin {

  /** Inner equi-join `big ⋈ small` on `keys`, with the big side salted
    * across `salts` partitions per key. `small` is replicated `salts`×
    * (keep it broadcast-sized). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int): DataFrame = {
    require(salts > 0)
    val saltedBig = big.withColumn("_salt",
      (rand(seed = 42) * salts).cast("int"))
    val replicatedSmall = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(replicatedSmall, keys :+ "_salt").drop("_salt")
  }

  /** Two-phase (partial → final) aggregation with salted keys: for
    * `sum`-like decomposable aggregates over hot keys. Spark's hash
    * aggregate already does map-side partials; explicit salting adds a
    * mid-level combine when single-key cardinality exceeds one reducer's
    * capacity. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                salts: Int, resultName: String): DataFrame = {
    val keyCols: Seq[Column] = keys.map(col)
    df.withColumn("_salt", (rand(seed = 42) * salts).cast("int"))
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(keyCols: _*)
      .agg(sum(col("_partial")).as(resultName))
  }
}
