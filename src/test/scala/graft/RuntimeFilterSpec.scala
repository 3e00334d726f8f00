package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — Catalyst's InjectRuntimeFilter:
  * when a shuffle join's build side is small and selective, the
  * optimizer plants a bloom-filter aggregate of the build keys as a
  * pre-shuffle FILTER on the probe side, so most of the big fact table
  * drops before the exchange. At 100 TB this is the difference between
  * shuffling the whole fact table and shuffling the ~matching slice —
  * and it needs zero operator code, only a plan that keeps the filter
  * visible to the optimizer. This spec pins that our session config
  * leaves the rewrite reachable. */
class RuntimeFilterSpec extends SparkTestBase {
  import spark.implicits._

  test("selective shuffle join injects a bloom filter on the fact side") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    try {
      // force a shuffle join (no broadcast) with a selective build side
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")

      spark.range(0, 100000).select(col("id").as("fk"), (col("id") % 97).as("v"))
        .write.parquet(s"$dir/fact")
      spark.range(0, 20000).select(col("id").as("pk"), pmod(col("id"), lit(50L)).as("grp"))
        .write.parquet(s"$dir/dim")

      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("grp") === 3)
      val joined = fact.join(dim, col("fk") === col("pk"))

      val optimized = joined.queryExecution.optimizedPlan.toString.toLowerCase
      assert(optimized.contains("bloom"),
        s"expected an injected bloom filter on the probe side:\n$optimized")
      // and the rewrite must not change results
      assert(joined.count() === dim.count(), "1:1 fk→pk join keeps dim row count")
    } finally {
      saved.foreach { case (k, v) =>
        v.fold(conf.unset(k))(conf.set(k, _))
      }
    }
  }
}
