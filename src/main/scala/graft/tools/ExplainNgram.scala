package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Text
object ExplainNgram {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.tune(
      SparkSession.builder().master("local[32]"), shufflePartitions = 32
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.1")
    val base = docs
      .select(col("lang").as("blk"), col("doc_id").as("id"), Text.tokens(col("text")).as("toks"))
      .select(col("blk"), col("id"),
        array_distinct(Text.shinglesFromTokens(col("toks"), 3)).as("gs"))
      .select(col("blk"), col("id"), size(col("gs")).as("n_sh"),
        explode_outer(col("gs")).as("g"))
      .select(col("blk"), col("id"), col("n_sh"),
        conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long").as("gh"))
    base.count()
    println(base.queryExecution.executedPlan.toString.linesIterator
      .map(_.take(120)).mkString("\n"))
    spark.stop()
  }
}
