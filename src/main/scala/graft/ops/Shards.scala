package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) shard assignment — Thaler &
  * Ravishankar 1998, "Using name-based mappings to increase hit
  * rates": every key scores each shard with an independent hash and
  * lands on its argmax. The property a 100 TB EXPORT layer needs and
  * modulo sharding lacks: growing N → N+1 shards moves only the keys
  * whose argmax IS the new shard — 1/(N+1) of the corpus in
  * expectation — so an incremental re-export rewrites one shard's
  * worth of data, not all of it (mod-N reshuffles ~100% of keys).
  *
  * Exactness discipline: the score is integer (56 md5 bits · 16 + the
  * shard id), so the argmax is a plain integer `greatest` — no
  * floating point, no tie ambiguity (the appended shard id makes
  * scores distinct even on a 56-bit collision), bit-replayable in any
  * engine. Map-only: N md5 calls per row, no shuffle, no state.
  */
object Shards {

  /** Max shards per ring: the argmax is recovered from the score's low
    * 4 bits, so one ring holds ≤ 16 shards. Wider rings compose
    * hierarchically (ring-of-rings: shard = 16·outer + inner), the
    * same two-level trick consistent-hash rings use for locality. */
  val MaxShards = 16

  /** The rendezvous score of `key` for shard `s`: 56 md5 bits shifted
    * left 4, low bits carrying `s` (injective per (key, s), so
    * `greatest` is an exact argmax with deterministic tie-impossible
    * semantics). */
  def score(key: Column, s: Int, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(s":$s:$salt"))),
      1, 14), 16, 10).cast("long") * 16 + s

  /** The shard (0-based) `key` lands on among `nShards`. */
  def rendezvousShard(key: Column, nShards: Int, salt: String): Column = {
    require(nShards >= 1 && nShards <= MaxShards,
      s"nShards in [1, $MaxShards] per ring (compose rings above), got $nShards")
    val scores = (0 until nShards).map(s => score(key, s, salt))
    val best = if (scores.size == 1) scores.head else greatest(scores: _*)
    (best % 16).cast("int")
  }

  /** DuckDB mirror of [[rendezvousShard]] over `keyExpr` — the exact
    * same md5-prefix integer argmax, for oracle replay. */
  def rendezvousSql(keyExpr: String, nShards: Int, salt: String): String = {
    require(nShards >= 1 && nShards <= MaxShards)
    val scores = (0 until nShards).map { s =>
      s"CAST('0x' || substr(md5(CAST(($keyExpr) AS VARCHAR) || ':$s:$salt'), " +
        s"1, 14) AS BIGINT) * 16 + $s"
    }
    val best =
      if (scores.size == 1) scores.head
      else scores.mkString("greatest(", ", ", ")")
    s"CAST(($best) % 16 AS INT)"
  }
}
