package graft

import graft.sink._

/** LIVE execution of the Postgres dialect (carried item since r3: the
  * container has no Postgres server and no H2 jar, but the pre-warmed
  * build cache ships a DuckDB JDBC driver — an engine whose SQL surface
  * is deliberately Postgres-flavored: `CREATE TABLE/INDEX IF NOT EXISTS`,
  * `INSERT ... ON CONFLICT ... DO UPDATE SET ... = excluded.*`). Running
  * the full sink protocol through [[PostgresDialect]] against DuckDB
  * proves the statements EXECUTE — parse, bind, and produce the protocol's
  * row/offset state — not merely that they equal golden strings
  * (reference postgre.rs:233-255 asserts the same statements against a
  * live server, env-gated just like this suite).
  *
  * The driver jar is loaded reflectively from the local build cache and
  * registered through a delegating shim (DriverManager ignores drivers
  * from foreign classloaders). No library dependency is added; when the
  * jar is absent the suite cancels (env-blocked), mirroring the
  * reference's own gating.
  */
class DuckDbDialectSpec extends SparkTestBase {

  // driver loading shared with MssqlLiveSpec (one registration per JVM)
  private def duckdbReady: Boolean = TestJdbc.duckdbReady

  private def freshUrl(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-duckdb-$tag")
    s"jdbc:duckdb:$dir/graft.db"
  }

  private val spec = TableSpec("test_record", 1, Seq(
    ColumnSpec("a", "VARCHAR(64)", index = true),
    ColumnSpec("b", "BIGINT")))

  test("Postgres dialect runs the full sink protocol live on DuckDB") {
    assume(duckdbReady, "duckdb_jdbc jar not in the local build cache — env-blocked")
    val sink = new JdbcDeltaSink(freshUrl("proto"), spec, PostgresDialect)
    // bootstrap twice: IF NOT EXISTS DDL must be live-idempotent, not
    // just golden-string-idempotent
    assert(sink.bootstrap(), "first bootstrap creates")
    assert(!sink.bootstrap(), "second bootstrap is a no-op (IF NOT EXISTS)")
    // insert + offsets upsert (the ON CONFLICT statement's insert arm)
    assert(sink.applyDeltas(Map("s" -> 1L), 0L,
      (1 to 50).map(i => (Seq[Any](s"k$i", i.toLong), 1L))))
    assert(sink.readRows().size === 50)
    assert(sink.getOffsets() === Map("s" -> 1L))
    // retraction (delete-all + reinsert remain) and a doubled row
    assert(sink.applyDeltas(Map("s" -> 2L), 1L,
      Seq((Seq[Any]("k1", 1L), -1L), (Seq[Any]("k2", 2L), 1L))))
    val rows = sink.readRows().map(_.head.toString)
    assert(rows.size === 50 && !rows.contains("k1") && rows.count(_ == "k2") === 2)
    // ON CONFLICT DO UPDATE arm: same source, new offset
    assert(sink.getOffsets() === Map("s" -> 2L))
    // idempotent redelivery: replayed batchId rolls back, changes nothing
    assert(!sink.applyDeltas(Map("s" -> 9L), 1L, Seq((Seq[Any]("zz", 0L), 1L))))
    assert(sink.getOffsets() === Map("s" -> 2L))
    assert(!sink.readRows().map(_.head.toString).contains("zz"))
  }

  test("schema-version bump drops and rebuilds live on DuckDB") {
    assume(duckdbReady, "duckdb_jdbc jar not in the local build cache — env-blocked")
    val url = freshUrl("ver")
    val v1 = new JdbcDeltaSink(url, spec, PostgresDialect)
    v1.bootstrap()
    assert(v1.applyDeltas(Map("s" -> 1L), 0L, Seq((Seq[Any]("x", 1L), 1L))))
    val v2 = new JdbcDeltaSink(url, spec.copy(version = 2), PostgresDialect)
    assert(v2.bootstrap(), "version mismatch recreates")
    assert(v2.readRows().isEmpty, "rebuild starts empty — caller replays from 0")
    assert(v2.getOffsets().isEmpty)
  }
}
