package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl curation — the step BEFORE
  * per-domain caps ([[Sampling.capPerGroup]]), leakage-safe splits,
  * and URL-level exact dedup: raw crawl URLs carry tracking params,
  * shuffled query order, default ports, fragments, dot-segments
  * (`/a/../b`), inconsistent percent-encoding, and mixed-case hosts
  * that make byte-equality useless, and "domain" means the
  * REGISTRABLE domain (eTLD+1: news.example.co.uk → example.co.uk),
  * not the hostname, or a co.uk site's subdomains each get their own
  * cap bucket.
  *
  * Everything here is a pure map-side Column expression (no UDF, no
  * network): hosts come from one anchored regex over the authority,
  * the public-suffix decision is a LITERAL table (a pinned subset of
  * the public suffix list — the convention used for every
  * irrational-constant table in this engine: the approximation lives
  * in the design, the computation stays exact and replayable), query
  * params are filtered + lexicographically sorted with higher-order
  * array functions, and the RFC 3986 §6.2.2 path steps (percent
  * normalization, dot-segment removal) are string-accumulator folds
  * (`aggregate` / DuckDB `list_reduce`) running the IDENTICAL
  * algorithm in both engines. Each transform is mirrored verbatim in
  * the paired oracles.
  *
  * At 100 TB this is the cheap stage: no shuffle, and the canonical
  * string feeds the SAME md5-groupBy exact-dedup path as document
  * text ([[Dedup]]).
  */
object Web {

  /** Multi-part public suffixes recognized by [[registrableDomain]] —
    * a pinned subset of the public suffix list covering the top ~100
    * high-traffic ccTLD second-level registries. A suffix missing
    * from the table degrades gracefully (the last two labels are
    * reported — a COARSER grouping, never a dropped row). */
  val MultiPartTlds: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
    "gr.jp", "lg.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz",
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.mx", "org.mx", "gob.mx", "net.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "web.tr",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in",
    "edu.in", "gov.in", "res.in",
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    "co.za", "net.za", "org.za", "web.za", "ac.za", "gov.za",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa", "sch.sa",
    "co.th", "ac.th", "go.th", "in.th", "or.th", "net.th",
    "co.id", "web.id", "or.id", "ac.id", "sch.id", "go.id", "my.id",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "muni.il",
    "com.co", "net.co", "org.co", "edu.co", "gov.co",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe",
    "com.ec", "net.ec", "org.ec", "edu.ec", "gob.ec",
    "com.uy", "net.uy", "org.uy", "edu.uy", "gub.uy",
    "com.ve", "net.ve", "org.ve", "co.ve", "gob.ve")

  /** WILDCARD public-suffix TLDs (the public suffix list's `*.ck`-form
    * rules, pinned): EVERY second-level label under these is itself a
    * public suffix, so the registrable domain is the last THREE
    * labels (`shop.acme.ck` → `acme.ck` is the suffix, the +1 is
    * `shop.acme.ck`... i.e. eTLD+1 = last3). A bare two-label host
    * under a wildcard TLD IS a public suffix and passes through
    * whole — the [[MultiPartTlds]] bare-suffix convention. */
  val WildcardTlds: Seq[String] = Seq(
    "bd", "ck", "er", "fj", "gu", "kh", "mm", "np", "pg")

  /** EXCEPTION rules (the list's `!www.ck` form, pinned): these exact
    * domains are REGISTRABLE despite a covering wildcard rule — any
    * host equal to or under one resolves to it as the eTLD+1. Checked
    * before the wildcard branch, exactly the list's precedence. */
  val ExceptionDomains: Seq[String] = Seq("www.ck")

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

  /** Registrable domain (eTLD+1) of the URL's host: exception rules
    * first (`!www.ck` → the exception domain itself), then wildcard
    * TLDs (`*.ck` → the last THREE labels), then the last three
    * labels when the last two form a [[MultiPartTlds]] suffix, else
    * the last two; single-label and IPv4 hosts pass through; NULL for
    * non-URLs. The per-domain cap / split key a crawl pipeline needs
    * BEFORE any grouping. */
  def registrableDomain(url: Column): Column = {
    val h = host(url)
    val labels = split(h, "\\.")
    val n = size(labels)
    val last1 = element_at(labels, -1)
    val last2 = array_join(slice(labels, -2, 2), ".")
    val last3 = array_join(slice(labels, -3, 3), ".")
    when(h === "", lit(null).cast("string"))
      .otherwise(
        when(h.rlike("^[0-9.]+$"), h)
          .otherwise(
            when(n >= 2 &&
                last2.isin(ExceptionDomains.map(x => x: Any): _*), last2)
              .otherwise(
                when(last1.isin(WildcardTlds.map(x => x: Any): _*),
                  when(n >= 3, last3).otherwise(h))
                  .otherwise(
                    when(n >= 3 &&
                        last2.isin(MultiPartTlds.map(x => x: Any): _*),
                      last3)
                      .otherwise(when(n >= 2, last2).otherwise(h))))))
  }

  /** RFC 3986 §6.2.2.2 percent-encoding normalization as a
    * string-accumulator fold over '%'-split pieces: a retained
    * triplet's hex is UPPERCASED, a triplet encoding an unreserved
    * character (ALPHA / DIGIT / '-' '.' '_' '~') is DECODED, and a
    * '%' not followed by two hex digits passes through verbatim.
    * The DuckDB mirror ([[pctNormalizeSql]]) runs the identical fold
    * via `list_reduce`, so both engines emit the same bytes on every
    * input, not just well-formed ones. */
  private def pctNormalize(s: Column): Column = {
    val pieces = split(s, "%", -1)
    val rest = slice(pieces, lit(2), greatest(size(pieces) - 1, lit(0)))
    val folded = aggregate(rest, lit(""), (acc, p) => {
      val hx = substring(p, 1, 2)
      val cp = conv(hx, 16, 10).cast("int")
      val unreserved = (cp >= 48 && cp <= 57) || (cp >= 65 && cp <= 90) ||
        (cp >= 97 && cp <= 122) || cp.isin(45, 46, 95, 126)
      when(!hx.rlike("^[0-9A-Fa-f]{2}$"), concat(acc, lit("%"), p))
        .otherwise(when(unreserved,
          concat(acc, call_function("char", cp),
            substring(p, 3, Int.MaxValue)))
          .otherwise(concat(acc, lit("%"), upper(hx),
            substring(p, 3, Int.MaxValue))))
    })
    concat(element_at(pieces, 1), folded)
  }

  /** RFC 3986 §6.2.2.3 dot-segment removal over an absolute path as a
    * string-accumulator fold: '.' segments drop, '..' pops the last
    * emitted segment, a trailing '/.' or '/..' keeps its slash, and
    * empty segments ('//') are preserved verbatim. General (no bounded
    * unroll); the DuckDB mirror ([[removeDotSegmentsSql]]) is the
    * identical fold. Expects '' or a '/'-leading path. */
  private def removeDotSegments(p: Column): Column = {
    val parts = split(p, "/", -1)
    val segs = slice(parts, lit(2), greatest(size(parts) - 1, lit(0)))
    val folded = aggregate(segs, lit(""), (acc, s) =>
      when(s === ".", acc)
        .when(s === "..", regexp_replace(acc, "/[^/]*$", ""))
        .otherwise(concat(acc, lit("/"), s)))
    val res = concat(folded,
      when(p.rlike("/\\.{1,2}$"), lit("/")).otherwise(lit("")))
    when(res === "", lit("/")).otherwise(res)
  }

  /** Canonical URL: lowercased scheme and host, default port dropped
    * (:80 for http, :443 for https — others kept), trailing host dot
    * dropped AFTER the port (host()'s order — 'example.com.:443' must
    * collide with 'example.com'), fragment dropped, percent-encoding
    * normalized (unreserved decoded, retained triplets uppercased),
    * dot-segments removed (`/a/../b` → `/b`), empty path normalized
    * to '/', tracking params removed (any `utm_*` prefix plus the
    * [[TrackingParams]] names), remaining query params sorted
    * lexicographically as whole `k=v` strings. NULL for values that
    * are not scheme://-style URLs. Two crawl records of the same page
    * canonicalize to the same bytes — the URL-level exact-dedup /
    * leakage-split key. */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, schemeRe, 1))
    val auth = regexp_extract(url, authorityRe, 1)
    val afterUser = element_at(split(auth, "@"), -1)
    val h1 = lower(afterUser)
    // default port FIRST, trailing dot SECOND (dot-before-port also
    // collapses: 'example.com.:8080' → 'example.com:8080')
    val h0 = when(scheme === "http", regexp_replace(h1, ":80$", ""))
      .when(scheme === "https", regexp_replace(h1, ":443$", ""))
      .otherwise(h1)
    val h = regexp_replace(h0, "\\.(:[0-9]+)?$", "$1")
    val path0 = regexp_extract(url, pathRe, 1)
    val path = when(path0 === "", lit("/"))
      .otherwise(removeDotSegments(pctNormalize(path0)))
    val query = pctNormalize(regexp_extract(url, "\\?([^#]*)", 1))
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
    val wild = WildcardTlds.map(t => s"'$t'").mkString("[", ", ", "]")
    val exc = ExceptionDomains.map(t => s"'$t'").mkString("[", ", ", "]")
    val labels = s"string_split($h, '.')"
    val last1 = s"$labels[-1]"
    val last2 = s"array_to_string($labels[-2:], '.')"
    val last3 = s"array_to_string($labels[-3:], '.')"
    s"""CASE WHEN $h = '' THEN NULL
       | WHEN regexp_matches($h, '^[0-9.]+$$') THEN $h
       | WHEN len($labels) >= 2 AND list_contains($exc, $last2) THEN $last2
       | WHEN list_contains($wild, $last1)
       |   THEN (CASE WHEN len($labels) >= 3 THEN $last3 ELSE $h END)
       | WHEN len($labels) >= 3 AND list_contains($tlds, $last2)
       |   THEN $last3
       | WHEN len($labels) >= 2 THEN $last2
       | ELSE $h END""".stripMargin.replace("\n", "")
  }

  /** DuckDB expression mirroring [[pctNormalize]] over `x` — the
    * identical '%'-split string fold via `list_reduce` (the fold's
    * initial '' accumulator rides a `list_prepend`). */
  def pctNormalizeSql(x: String): String = {
    val parts = s"string_split($x, '%')"
    val cp = "CAST('0x' || substr(p, 1, 2) AS INTEGER)"
    s"""($parts[1] || list_reduce(list_prepend('', $parts[2:]),
       | (acc, p) -> CASE
       |  WHEN NOT regexp_matches(substr(p, 1, 2), '^[0-9A-Fa-f]{2}$$')
       |    THEN acc || '%' || p
       |  WHEN ($cp BETWEEN 48 AND 57) OR ($cp BETWEEN 65 AND 90)
       |    OR ($cp BETWEEN 97 AND 122) OR $cp IN (45, 46, 95, 126)
       |    THEN acc || chr($cp) || substr(p, 3)
       |  ELSE acc || '%' || upper(substr(p, 1, 2)) || substr(p, 3)
       |  END))""".stripMargin.replace("\n", "")
  }

  /** DuckDB expression mirroring [[removeDotSegments]] over `p` —
    * the identical '/'-split string fold via `list_reduce`. */
  def removeDotSegmentsSql(p: String): String = {
    val folded =
      s"""list_reduce(list_prepend('', string_split($p, '/')[2:]),
         | (acc, s) -> CASE WHEN s = '.' THEN acc
         |  WHEN s = '..' THEN regexp_replace(acc, '/[^/]*$$', '')
         |  ELSE acc || '/' || s END)""".stripMargin.replace("\n", "")
    val res = s"($folded || (CASE WHEN regexp_matches($p, '/\\.{1,2}$$')" +
      " THEN '/' ELSE '' END))"
    s"(CASE WHEN $res = '' THEN '/' ELSE $res END)"
  }

  /** DuckDB expression mirroring [[canonicalUrl]] over `u`. */
  def canonicalUrlSql(u: String): String = {
    val scheme = s"lower(regexp_extract($u, '$schemeRe', 1))"
    val auth = s"regexp_extract($u, '$authorityRe', 1)"
    val h1 = s"lower(string_split($auth, '@')[-1])"
    val h0 = s"""CASE WHEN $scheme = 'http'
      | THEN regexp_replace($h1, ':80$$', '')
      | WHEN $scheme = 'https' THEN regexp_replace($h1, ':443$$', '')
      | ELSE $h1 END""".stripMargin.replace("\n", "")
    val h = s"regexp_replace(($h0), '\\.(:[0-9]+)?$$', '\\1')"
    val path0 = s"regexp_extract($u, '$pathRe', 1)"
    val path = s"CASE WHEN $path0 = '' THEN '/' ELSE " +
      removeDotSegmentsSql(pctNormalizeSql(path0)) + " END"
    val query = pctNormalizeSql(s"regexp_extract($u, '\\?([^#]*)', 1)")
    val kept = s"list_filter(string_split($query, '&'), " +
      s"p -> p <> '' AND NOT starts_with(p, 'utm_') " +
      s"AND NOT regexp_matches(p, '$trackingRe'))"
    val qs = s"array_to_string(list_sort($kept), '&')"
    s"""CASE WHEN $scheme = '' OR $h = '' THEN NULL
       | ELSE $scheme || '://' || $h || ($path) ||
       |   (CASE WHEN $qs = '' THEN '' ELSE '?' || $qs END) END"""
      .stripMargin.replace("\n", "")
  }
}
