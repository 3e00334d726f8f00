package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions registers the native kernels in the SQL function
  * registry (pure-SQL surface). */
class ExtensionsSpec extends SparkTestBase {

  test("vector_dot is callable from SQL via SparkSessionExtensions") {
    // force a fresh session build (getOrCreate would hand back the shared
    // session and silently skip extensions); the SparkContext is reused
    val prev = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = graft.core.GraftSession.tune(
      SparkSession.builder().master("local[2]")
        .withExtensions(new GraftExtensions),
      shufflePartitions = 2).getOrCreate()
    try {
      val r = s.sql(
        "SELECT vector_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
        .collect().head.getDouble(0)
      assert(r === 32.0)
      // float arrays too (the embedding column type)
      val rf = s.sql(
        "SELECT vector_dot(array(cast(1.5 as float)), array(cast(2.0 as float))) AS d")
        .collect().head.getDouble(0)
      assert(rf === 3.0)
      // the one-pass text kernels: parity with the column formulations
      val sh = s.sql(
        "SELECT simhash48(array('a','b','a')) = simhash48(array('b','a')) AS eq")
        .collect().head.getBoolean(0)
      assert(sh, "simhash48 is distinct-token based")
      val shingles = s.sql(
        "SELECT size(shingle_hashes(array('a','b','c','a','b','c'), 3, 15)) AS n")
        .collect().head.getInt(0)
      assert(shingles === 3, "4 shingle positions, 3 distinct ('a b c' repeats)")
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
