package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record linkage (entity resolution): match incoming "dirty" records to a
  * master table by fuzzy name similarity, WITHOUT the cartesian product —
  * candidates are generated only within equal blocking keys (Fellegi &
  * Sunter 1969 blocking; Christen 2012 survey).
  *
  * Scale: the candidate count is Σ_b |probes_b| × |master_b| over blocks b —
  * plan-time bounded by the block-key cardinality the caller chooses, never
  * |P| × |M|. The join shuffles both sides by the block key once; a cheap
  * length-difference prune runs before the O(len²) edit distance (an edit
  * distance of k changes length by at most k, so |len(a) − len(b)| > maxDist
  * disqualifies without the DP). A hot block is the same skew problem as any
  * hot join key — and dirty data MANUFACTURES hot blocks (a NULL/empty/
  * default blocking key collects every malformed record into one block whose
  * candidate count is quadratic). Both entry points therefore take a
  * `maxBlockSize` cap: blocks whose MASTER-side population exceeds it are
  * excluded from candidate generation entirely (the standard block-filtering
  * move — an oversized block is a useless discriminator, and record-linkage
  * practice drops rather than salts it because its candidates are almost all
  * non-matches anyway; Christen 2012 §4.2). With the cap, total candidates
  * are ≤ |P| × cap (best-match) / ≤ |M| × cap (pairs) — LINEAR in the input
  * for any key distribution. The size table is one cheap aggregation joined
  * back on the block key; excluded probes simply report no match, exactly as
  * if the block had no candidates. Pass `maxBlockSize = Long.MaxValue`
  * (default) for uncapped semantics.
  */
object Linkage {

  /** Best master match per probe record within shared blocking keys.
    *
    * @return one row per probe that has ≥1 candidate within maxDist:
    *         (probeId, bestId, dist, n_candidates) — best = lowest edit
    *         distance, ties broken by lowest master id (deterministic).
    */
  /** Within-table fuzzy-duplicate pairs (the master-data dedup shape):
    * every (id_a < id_b) pair inside a shared block whose names are
    * within maxDist. Feed the result to
    * [[graft.ops.Dedup.duplicateClusters]] for the transitive entity
    * clusters — pairwise dropping over-deletes when A~B~C.
    * Same scale bound as [[blockedBestMatch]]: Σ_b |block_b|² pairs,
    * never |M|²; the length prune runs before the O(len²) DP.
    */
  def blockedPairs(records: DataFrame, blockCols: Seq[String],
                   idCol: String, nameCol: String,
                   maxDist: Int,
                   maxBlockSize: Long = Long.MaxValue): DataFrame = {
    val m0 = records.select(
      (blockCols.map(col) :+ col(idCol).as("rid") :+ col(nameCol).as("rname")): _*)
    val m = capBlocks(m0, blockCols, maxBlockSize)
    val joinCond = blockCols.map(c => col(s"x.$c") === col(s"y.$c"))
      .reduce(_ && _) && col("x.rid") < col("y.rid")
    m.as("x").join(m.as("y"), joinCond)
      .filter(abs(length(col("x.rname")) - length(col("y.rname"))) <= maxDist)
      .filter(levenshtein(col("x.rname"), col("y.rname")) <= maxDist)
      .select(col("x.rid").as("id_a"), col("y.rid").as("id_b"))
  }

  def blockedBestMatch(probes: DataFrame, master: DataFrame,
                       blockCols: Seq[String],
                       probeIdCol: String, probeNameCol: String,
                       masterIdCol: String, masterNameCol: String,
                       maxDist: Int,
                       maxBlockSize: Long = Long.MaxValue): DataFrame = {
    val p = probes.select(
      (blockCols.map(col) :+ col(probeIdCol).as("probe_id")
        :+ col(probeNameCol).as("probe_name")): _*)
    val m0 = master.select(
      (blockCols.map(col) :+ col(masterIdCol).as("master_id")
        :+ col(masterNameCol).as("master_name")): _*)
    val m = capBlocks(m0, blockCols, maxBlockSize)
    val cand = p.join(m, blockCols)
      .filter(abs(length(col("probe_name")) - length(col("master_name")))
        <= maxDist)
      .withColumn("dist",
        levenshtein(col("probe_name"), col("master_name")).cast("long"))
      .filter(col("dist") <= maxDist)
    val w = Window.partitionBy(col("probe_id"))
    val rk = Window.partitionBy(col("probe_id"))
      .orderBy(col("dist"), col("master_id"))
    cand
      .withColumn("n_candidates", count(lit(1)).over(w).cast("long"))
      .withColumn("rn", row_number().over(rk))
      .filter(col("rn") === 1)
      .select(col("probe_id"), col("master_id"), col("dist"),
        col("n_candidates"))
  }

  /** PHONETIC blocking key: the consonant skeleton — uppercase the
    * string and delete every vowel (w/h/y kept: unlike Soundex's
    * drop-list they carry real signal in product/person names, and
    * keeping the rule to one character class keeps it portable).
    *
    * Why this and not Soundex proper (Russell 1918) or Metaphone:
    * their repeated-code collapse step needs either backreference
    * regexes or an iterative scan — neither renders in RE2-class
    * engines, so the key could not be oracle-replayed. The skeleton
    * retains the property blocking actually needs: it is INVARIANT
    * under vowel substitutions and vowel insertions/deletions — the
    * dominant typo classes phonetic blocking exists for (Christen 2012
    * §4.3 lists phonetic encodings precisely as typo-robust blocking
    * keys, not as match scores) — while staying one `regexp_replace`
    * that plans map-side and reads identically in any SQL engine.
    *
    * Recall contract: a probe whose corruption touches only vowels
    * lands in its master's block WITH CERTAINTY, where any
    * substring-based key (prefix, suffix, q-gram) misses whenever the
    * corruption overlaps the key window. Precision (block size) comes
    * from the surviving consonant/digit sequence, which at realistic
    * name entropy is nearly unique — and the [[blockedBestMatch]]
    * `maxBlockSize` cap guards the degenerate all-vowel key ("", the
    * NULL-flood shape) like any other hot block. */
  def consonantSkeleton(c: Column): Column =
    upper(regexp_replace(c, "[aeiouAEIOU]", ""))

  /** DuckDB rendering of [[consonantSkeleton]] (RE2 needs the explicit
    * 'g' flag where Spark's regexp_replace is global by default). Kept
    * beside the Column form so the two renderings cannot drift. */
  def consonantSkeletonSql(e: String): String =
    s"upper(regexp_replace($e, '[aeiouAEIOU]', '', 'g'))"

  /** Drop rows whose block exceeds `cap` members — the hot-block guard.
    * One aggregation over the block keys + one join back; the size table
    * has block-key cardinality (broadcast-sized in practice — AQE picks
    * it up, and at worst it co-shuffles with the candidate join's own
    * block-key exchange, adding no new shuffle stage). NULL block keys
    * group together like any equal keys, so a NULL-key flood is capped
    * too (equi-joins drop NULL keys later regardless — the cap keeps the
    * size table itself honest). */
  private def capBlocks(rows: DataFrame, blockCols: Seq[String],
                        cap: Long): DataFrame =
    if (cap == Long.MaxValue) rows
    else {
      require(cap > 0, s"maxBlockSize must be positive, got $cap")
      val keep = rows.groupBy(blockCols.map(col): _*)
        .agg(count(lit(1)).as("_bn"))
        .filter(col("_bn") <= cap)
        .drop("_bn")
      rows.join(keep, blockCols, "left_semi")
    }

  /** GOLDEN-RECORD consolidation (survivorship): collapse each entity
    * cluster (from [[blockedPairs]] →
    * [[graft.ops.Dedup.duplicateClusters]]) to one canonical record —
    * the step after matching that master-data practice calls merge
    * rules (Christen 2012 §2.5; Talburt's "survivorship"). Rules here,
    * each deterministic and engine-replayable:
    *
    *  - canonical id  = MIN member id (the cluster id itself — the
    *    hash-min contract [[graft.ops.Dedup.duplicateClusters]] already
    *    guarantees);
    *  - each requested string field = the MODAL non-null value,
    *    ties to the lexicographically smallest (frequency is the
    *    standard survivorship vote; the tie rule makes it a pure
    *    function of the multiset);
    *  - `n_members`, and per-field `n_distinct` (how contested the
    *    vote was — the audit column reviewers ask for first).
    *
    * One aggregation per field over cluster-sized groups (clusters are
    * small by construction — blocking bounds them), then a thin join of
    * the ≤ |fields| vote tables on cluster_id. Only multi-member
    * clusters are emitted: a singleton IS its own golden record, and at
    * 100 TB emitting them would duplicate the input for no information.
    *
    * @param clusters (id, cluster_id) from duplicateClusters
    * @param records  the master table carrying `idCol` + `fields`
    */
  def goldenRecords(records: DataFrame, clusters: DataFrame,
                    idCol: String, fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "need at least one field to consolidate")
    val members = clusters
      .join(records.withColumnRenamed(idCol, "_gid"),
        clusters("id") === col("_gid"))
    val sizes = members.groupBy("cluster_id")
      .agg(count(lit(1)).cast("long").as("n_members"))
      .filter(col("n_members") >= 2L)
    val votes = fields.map { f =>
      members.filter(col(f).isNotNull)
        .groupBy(col("cluster_id"), col(f))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("cluster_id")
        .agg(
          // min over (−count, value): largest count, then smallest value
          min_by(col(f), struct((col("cnt") * -1).as("nc"), col(f)))
            .as(s"golden_$f"),
          count(lit(1)).cast("long").as(s"n_distinct_$f"))
    }
    votes.foldLeft(sizes)((acc, v) => acc.join(v, Seq("cluster_id")))
      .orderBy(col("cluster_id"))
  }
}
