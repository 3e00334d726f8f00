package graft

import graft.sources.TextSources

/** Raw text-format ingest ([[graft.sources.TextSources]]): explicit
  * schema (never inference), strict-vs-permissive malformed-row policy,
  * and exact round-trips for the engine's column types. */
class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpWrite(lines: Seq[String], ext: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("src").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, s"part-0.$ext"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir
  }

  test("jsonl: explicit schema parses types exactly; no inference pass") {
    val dir = tmpWrite(Seq(
      """{"id": 1, "name": "a", "bal": 10.25}""",
      """{"id": 2, "name": "b", "bal": -3.50}"""), "json")
    val got = TextSources.jsonl(spark, dir,
        "id BIGINT, name STRING, bal DECIMAL(12,2)")
      .as[(Long, String, java.math.BigDecimal)].collect().toSet
    assert(got.map(_._1) === Set(1L, 2L))
    assert(got.find(_._1 == 1L).get._3 === new java.math.BigDecimal("10.25"))
    assert(got.find(_._1 == 2L).get._3 === new java.math.BigDecimal("-3.50"))
  }

  test("jsonl strict: a malformed line fails the read loudly") {
    val dir = tmpWrite(Seq(
      """{"id": 1, "name": "a", "bal": 1.00}""",
      """{"id": oops not json"""), "json")
    intercept[org.apache.spark.SparkException] {
      TextSources.jsonl(spark, dir,
        "id BIGINT, name STRING, bal DECIMAL(12,2)").collect()
    }
  }

  test("jsonl permissive: malformed lines route to the corrupt column and are countable") {
    val dir = tmpWrite(Seq(
      """{"id": 1, "name": "a", "bal": 1.00}""",
      """{"id": oops not json""",
      """also not json at all""",
      """{"id": 2, "name": "b", "bal": 2.00}"""), "json")
    val df = TextSources.jsonl(spark, dir,
      "id BIGINT, name STRING, bal DECIMAL(12,2)", strict = false)
    assert(TextSources.corruptCount(df) === 2L)
    // good rows still parse alongside the quarantined ones
    val good = df.filter("_corrupt IS NULL").select("id")
      .as[Long].collect().toSet
    assert(good === Set(1L, 2L))
  }

  test("csv: quoted fields with embedded delimiters survive; header is skipped by contract") {
    val dir = tmpWrite(Seq(
      "id,name,bal",
      """1,"last, first",5.75""",
      """2,plain,-0.25"""), "csv")
    val got = TextSources.csv(spark, dir,
        "id BIGINT, name STRING, bal DECIMAL(12,2)")
      .as[(Long, String, java.math.BigDecimal)].collect().toSet
    assert(got.map(_._2) === Set("last, first", "plain"))
    assert(got.find(_._1 == 1L).get._3 === new java.math.BigDecimal("5.75"))
  }

  test("csv strict: a row with the wrong arity fails; permissive quarantines it") {
    val lines = Seq("id,name,bal", "1,a,1.00", "2,b") // short row
    val dir = tmpWrite(lines, "csv")
    intercept[org.apache.spark.SparkException] {
      TextSources.csv(spark, dir,
        "id BIGINT, name STRING, bal DECIMAL(12,2)").collect()
    }
    val df = TextSources.csv(spark, dir,
      "id BIGINT, name STRING, bal DECIMAL(12,2)", strict = false)
    assert(TextSources.corruptCount(df) === 1L)
  }
}
