package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl curation — the step BEFORE
  * per-domain caps ([[Sampling.capPerGroup]]), leakage-safe splits,
  * and URL-level exact dedup: raw crawl URLs carry tracking params,
  * shuffled query order, default ports, fragments, and mixed-case
  * hosts that make byte-equality useless, and "domain" means the
  * REGISTRABLE domain (eTLD+1: news.example.co.uk → example.co.uk),
  * not the hostname, or a co.uk site's subdomains each get their own
  * cap bucket.
  *
  * Everything here is a pure map-side Column expression (no UDF, no
  * network): hosts come from one anchored regex over the authority,
  * the public-suffix decision is a LITERAL multi-part-TLD table (a
  * pinned subset of the public suffix list — the convention used for
  * every irrational-constant table in this engine: the approximation
  * lives in the design, the computation stays exact and replayable),
  * and query params are filtered + lexicographically sorted with
  * higher-order array functions. Each transform is mirrored verbatim
  * by DuckDB string/list ops in the paired oracles.
  *
  * At 100 TB this is the cheap stage: no shuffle, codegen-friendly,
  * and the canonical string feeds the SAME md5-groupBy exact-dedup
  * path as document text ([[Dedup]]).
  */
object Web {

  /** Multi-part public suffixes recognized by [[registrableDomain]] —
    * a pinned subset of the public suffix list covering the
    * high-traffic ccTLD second-level registries. A suffix missing
    * from the table degrades gracefully (the last two labels are
    * reported — a COARSER grouping, never a dropped row). */
  val MultiPartTlds: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "net.nz", "org.nz",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
    "co.in", "co.kr", "co.za", "com.eg", "com.sa", "co.th", "co.id")

  /** Tracking query-parameter names stripped by [[canonicalUrl]]
    * (any `utm_*` is stripped by prefix in addition). */
  val TrackingParams: Seq[String] = Seq(
    "gclid", "fbclid", "msclkid", "dclid", "yclid", "igshid",
    "mc_eid", "mc_cid", "s_kwcid", "ref", "ref_src", "spm", "_ga")

  private val schemeRe = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
  private val authorityRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
  private val pathRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
  private val trackingRe =
    "^(" + TrackingParams.mkString("|") + ")="

  /** Lowercased hostname (userinfo and port stripped, trailing dot
    * dropped); '' when the value is not a scheme://-style URL. */
  def host(url: Column): Column = {
    val auth = regexp_extract(url, authorityRe, 1)
    val afterUser = element_at(split(auth, "@"), -1)
    regexp_replace(
      regexp_replace(lower(afterUser), ":[0-9]+$", ""), "\\.$", "")
  }

  /** Registrable domain (eTLD+1) of the URL's host: the last THREE
    * labels when the last two form a [[MultiPartTlds]] suffix, else
    * the last two; single-label and IPv4 hosts pass through; NULL for
    * non-URLs. The per-domain cap / split key a crawl pipeline needs
    * BEFORE any grouping. */
  def registrableDomain(url: Column): Column = {
    val h = host(url)
    val labels = split(h, "\\.")
    val n = size(labels)
    val last2 = array_join(slice(labels, -2, 2), ".")
    val last3 = array_join(slice(labels, -3, 3), ".")
    when(h === "", lit(null).cast("string"))
      .otherwise(
        when(h.rlike("^[0-9.]+$"), h)
          .otherwise(
            when(n >= 3 && last2.isin(MultiPartTlds.map(x => x: Any): _*),
              last3)
              .otherwise(when(n >= 2, last2).otherwise(h))))
  }

  /** Canonical URL: lowercased scheme and host, default port dropped
    * (:80 for http, :443 for https — others kept), fragment dropped,
    * empty path normalized to '/', tracking params removed (any
    * `utm_*` prefix plus the [[TrackingParams]] names), remaining
    * query params sorted lexicographically as whole `k=v` strings.
    * NULL for values that are not scheme://-style URLs. Two crawl
    * records of the same page canonicalize to the same bytes — the
    * URL-level exact-dedup / leakage-split key. */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, schemeRe, 1))
    val auth = regexp_extract(url, authorityRe, 1)
    val afterUser = element_at(split(auth, "@"), -1)
    val h0 = regexp_replace(lower(afterUser), "\\.$", "")
    val h = when(scheme === "http", regexp_replace(h0, ":80$", ""))
      .when(scheme === "https", regexp_replace(h0, ":443$", ""))
      .otherwise(h0)
    val path0 = regexp_extract(url, pathRe, 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = filter(split(query, "&"), p =>
      p =!= "" && !startswith(p, lit("utm_")) && !p.rlike(trackingRe))
    val qs = array_join(sort_array(kept), "&")
    when(scheme === "" || h === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), h, path,
        when(qs === "", lit("")).otherwise(concat(lit("?"), qs))))
  }

  // ------------------------------------------------------- DuckDB mirrors

  /** DuckDB expression mirroring [[host]] over `u`. */
  def hostSql(u: String): String = {
    val auth = s"regexp_extract($u, '$authorityRe', 1)"
    val afterUser = s"string_split($auth, '@')[-1]"
    s"regexp_replace(regexp_replace(lower($afterUser), ':[0-9]+$$', ''), " +
      s"'\\.$$', '')"
  }

  /** DuckDB expression mirroring [[registrableDomain]]; expects a
    * column/expr `h` that already holds [[hostSql]]'s value. */
  def registrableDomainSql(h: String): String = {
    val tlds = MultiPartTlds.map(t => s"'$t'").mkString("[", ", ", "]")
    val labels = s"string_split($h, '.')"
    val last2 = s"array_to_string($labels[-2:], '.')"
    val last3 = s"array_to_string($labels[-3:], '.')"
    s"""CASE WHEN $h = '' THEN NULL
       | WHEN regexp_matches($h, '^[0-9.]+$$') THEN $h
       | WHEN len($labels) >= 3 AND list_contains($tlds, $last2)
       |   THEN $last3
       | WHEN len($labels) >= 2 THEN $last2
       | ELSE $h END""".stripMargin.replace("\n", "")
  }

  /** DuckDB expression mirroring [[canonicalUrl]] over `u`. */
  def canonicalUrlSql(u: String): String = {
    val scheme = s"lower(regexp_extract($u, '$schemeRe', 1))"
    val auth = s"regexp_extract($u, '$authorityRe', 1)"
    val h0 = s"regexp_replace(lower(string_split($auth, '@')[-1]), " +
      s"'\\.$$', '')"
    val h = s"""CASE WHEN $scheme = 'http'
      | THEN regexp_replace($h0, ':80$$', '')
      | WHEN $scheme = 'https' THEN regexp_replace($h0, ':443$$', '')
      | ELSE $h0 END""".stripMargin.replace("\n", "")
    val path0 = s"regexp_extract($u, '$pathRe', 1)"
    val path = s"CASE WHEN $path0 = '' THEN '/' ELSE $path0 END"
    val query = s"regexp_extract($u, '\\?([^#]*)', 1)"
    val kept = s"list_filter(string_split($query, '&'), " +
      s"p -> p <> '' AND NOT starts_with(p, 'utm_') " +
      s"AND NOT regexp_matches(p, '$trackingRe'))"
    val qs = s"array_to_string(list_sort($kept), '&')"
    s"""CASE WHEN $scheme = '' OR $h = '' THEN NULL
       | ELSE $scheme || '://' || $h || $path ||
       |   (CASE WHEN $qs = '' THEN '' ELSE '?' || $qs END) END"""
      .stripMargin.replace("\n", "")
  }
}
