package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction over a text column — the scrub pass a training-data
  * pipeline runs before anything else touches the corpus (reference
  * scope: the payload-normalization stage; the patterns themselves are
  * the standard public email/IPv4/phone shapes).
  *
  * Engine-portability contract (the DuckDB-oracle discipline): every
  * pattern below sticks to the regex subset where Java's engine
  * (Spark) and RE2 (DuckDB) agree exactly — character classes, bounded
  * repetition, `\b` ASCII word boundaries, leftmost-first greedy
  * matching; NO backreferences (RE2 has none) or lookaround. The
  * redaction chain applies in a FIXED order (email → phone → IPv4) so
  * both engines transform identical input through identical steps.
  *
  * At 100 TB: one map-only codegen'd pass per row — three
  * `regexp_replace` + three `regexp_count`, no shuffle, no UDF; the
  * scan's column pruning carries (id, text) only. */
object Redact {

  /** user@host.tld — local part per RFC-ish practice, 2+ letter TLD. */
  val EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** +C-NNN-NNNN (the normalized tel form this pipeline emits). */
  val PHONE = "\\+\\d{1,2}-\\d{3}-\\d{4}"
  /** Dotted-quad IPv4, word-bounded so version strings ("1.2.3.4000")
    * don't half-match. Runs AFTER email redaction, so host-part dots
    * are already gone. */
  val IPV4 = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"

  /** Redacted text + per-kind match counts for `textCol`. Counts are
    * taken on the ORIGINAL text; replacements chain email → phone →
    * IPv4 (fixed order — each later pattern sees the earlier tokens,
    * which contain no digits/@ and so can never re-match). */
  def scrub(df: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      regexp_count(t, lit(EMAIL)).cast("long").as("n_emails"),
      regexp_count(t, lit(PHONE)).cast("long").as("n_phones"),
      regexp_count(t, lit(IPV4)).cast("long").as("n_ips"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EMAIL, "[EMAIL]"),
          PHONE, "[PHONE]"),
        IPV4, "[IP]").as("redacted"))
  }
}
