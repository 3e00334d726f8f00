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

  /** CAPACITY-WEIGHTED rendezvous: shard i with integer capacity
    * `capacities(i)` owns that many VIRTUAL SLOTS of the ring (slot
    * scores stay independent hashes), so expected load is proportional
    * to capacity — heterogeneous export targets (a big shard and two
    * small ones) without the float-weighted form's transcendental
    * (−w/ln u) that the exactness discipline bans. All the unweighted
    * form's properties survive: growing ONE shard's capacity moves only
    * the keys its NEW replica slot wins (replica slots are addressed
    * (shard, replica), never renumbered); integer argmax, tie-free,
    * engine-replayable. ≤ [[MaxShards]] shards per ring (the shard id
    * rides the low 4 bits); capacities are small integers — only the
    * RATIOS matter, and each unit of capacity costs one md5 per row. */
  def rendezvousShardWeighted(key: Column, capacities: Seq[Int],
                              salt: String): Column = {
    require(capacities.nonEmpty && capacities.forall(_ >= 1),
      "capacities must all be >= 1")
    require(capacities.size <= MaxShards,
      s"<= $MaxShards shards per ring (the shard id rides the low 4 " +
        s"bits), got ${capacities.size}")
    // one independent score per (shard, replica), SHARD id in the low
    // bits — replica slots are addressed by (i, r), never by a global
    // slot index, so growing one shard's capacity appends scores
    // without renumbering anything (a sequential slot numbering would
    // silently remap existing slots and break the stability bound)
    val scores = capacities.zipWithIndex.flatMap { case (c, i) =>
      (0 until c).map { r =>
        conv(substring(md5(concat(key.cast("string"), lit(s":$i:$r:$salt"))),
          1, 14), 16, 10).cast("long") * 16 + i
      }
    }
    val best = if (scores.size == 1) scores.head else greatest(scores: _*)
    (best % 16).cast("int")
  }

  /** DuckDB mirror of [[rendezvousShardWeighted]]. */
  def rendezvousWeightedSql(keyExpr: String, capacities: Seq[Int],
                            salt: String): String = {
    require(capacities.nonEmpty && capacities.size <= MaxShards)
    val scores = capacities.zipWithIndex.flatMap { case (c, i) =>
      (0 until c).map { r =>
        s"CAST('0x' || substr(md5(CAST(($keyExpr) AS VARCHAR) " +
          s"|| ':$i:$r:$salt'), 1, 14) AS BIGINT) * 16 + $i"
      }
    }
    val best =
      if (scores.size == 1) scores.head
      else scores.mkString("greatest(", ", ", ")")
    s"CAST(($best) % 16 AS INT)"
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
