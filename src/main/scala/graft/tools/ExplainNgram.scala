package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainNgram {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.tune(
      SparkSession.builder().master("local[32]"), shufflePartitions = 32
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("q_ngram_jaccard")(spark, "/root/testdata/sf0.01")
    df.count()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
