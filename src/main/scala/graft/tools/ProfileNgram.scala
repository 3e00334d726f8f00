package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.core.Tables

/** Stage-by-stage timing of the ngramJaccard pipeline (scratch). */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.core.GraftSession.tune(
      SparkSession.builder().master("local[32]"), shufflePartitions = 32
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tau = 0.5
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s = $r"); r
    }
    (1 to 3).foreach { rep =>
      println(s"=== rep $rep ===")
      val docs = Tables.documents(spark, sfDir)
      val base = docs
        .select(col("lang").as("blk"), col("doc_id").as("id"),
          Text.tokens(col("text")).as("toks"))
        .select(col("blk"), col("id"),
          array_distinct(Text.shinglesFromTokens(col("toks"), 3)).as("gs"))
        .select(col("blk"), col("id"), size(col("gs")).as("n_sh"),
          explode(col("gs")).as("g"))
        .select(col("blk"), col("id"), col("n_sh"),
          conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long").as("gh"))
      t("base once")(base.count())
      val joined = base.as("x")
        .join(base.as("y").hint("shuffle_hash"),
          col("x.blk") === col("y.blk") && col("x.gh") === col("y.gh")
            && col("x.id") < col("y.id")
            && col("y.n_sh") * lit(tau) <= col("x.n_sh")
            && col("x.n_sh") * lit(tau) <= col("y.n_sh"))
      t("join only")(joined.count())
      val out = joined
        .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"),
          col("x.n_sh").as("na"), col("y.n_sh").as("nb"))
        .agg(count(lit(1)).as("common"))
        .select(col("id_a"), col("id_b"),
          (col("common") / (col("na") + col("nb") - col("common")).cast("double")).as("jaccard"))
        .filter(col("jaccard") >= tau)
      t("full")(out.count())
    }
    spark.stop()
  }
}
