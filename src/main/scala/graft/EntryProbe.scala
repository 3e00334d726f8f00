package graft
import org.apache.spark.sql.SparkSession
object EntryProbe {
  def main(args: Array[String]): Unit = {
    // deliberately bare session: no nanosAsLong, default shuffle partitions —
    // mimics whatever the driver builds for the t1 smoke
    val s = SparkSession.builder().master("local[4]").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(s)
    println("ENTRY rows=" + df.count() + " cols=" + df.columns.mkString(","))
    s.stop()
  }
}
