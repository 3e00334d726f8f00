package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines: language ID,
  * quality scoring, token counting, fingerprinting, shingling, MinHash and
  * SimHash signatures.
  *
  * Everything is a pure Column expression over `org.apache.spark.sql.
  * functions` — no UDFs — so each op stays inside whole-stage codegen and
  * is trivially mirrored by the DuckDB oracle. Hashing is md5-based
  * (available bit-identically in both engines): the low 60 bits of
  * `md5(seed ++ value)` as a non-negative Long.
  */
object Text {

  /** Whitespace-normalized, lower-cased text. */
  def normText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Whitespace tokens of the normalized text. */
  def tokens(c: Column): Column = split(normText(c), " ")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-style pre-tokenization count: alphabetic runs, digit runs, and
    * single non-alphanumeric marks — the unit a byte-pair encoder would
    * merge over (pattern kept lookahead-free so Java regex and RE2
    * agree). */
  val BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BPE_PATTERN), lit(0)))

  /** Deterministic 60-bit hash: first 15 hex digits of md5, as a Long.
    * DuckDB mirror: `CAST('0x' || substr(md5(seed||x),1,15) AS BIGINT)`. */
  def hash64(c: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(seed.toString), c)), 1, 15), 16, 10)
      .cast("long")

  /** Document fingerprint: md5 of normalized text (whole-doc content
    * hash; the unit of exact dedup). */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** Polynomial rolling-hash fingerprint over a materialized token-hash
    * array (attribute — see the HOF performance contract):
    * h = fold(h * B + tok_hash mod P). Order-sensitive (unlike a token
    * set hash) and incrementally updatable — the classic streaming
    * fingerprint. */
  def rollingFingerprint(tokHashes: Column): Column =
    aggregate(tokHashes, lit(0L),
      (acc, h) => pmod(acc * lit(1000003L) + h, lit(MH_P)))

  /** `n`-token shingles ("w1 w2 w3" strings) from a token-array column.
    * Empty array when the doc has fewer than n tokens.
    *
    * PERFORMANCE CONTRACT: inside a higher-order lambda, a free-variable
    * subexpression re-evaluates per ELEMENT (Spark HOFs are interpreted,
    * no CSE) — a `sequence`-index formulation re-tokenized the whole doc
    * per shingle (O(tokens²), ~10× the query). This builds shingles as
    * `zip_with` over shifted slices: every array argument is evaluated
    * once per ROW, the lambda touches only its bound variables. The
    * zip_with tail-padding nulls (from the shorter shifted array) are the
    * sub-n-token positions — filtered out, which also yields [] for
    * too-short docs. */
  def shinglesFromTokens(toks: Column, n: Int): Column = {
    require(n >= 1, s"shingle length must be >= 1, got $n")
    val joined = (1 until n).foldLeft(toks) { (acc, j) =>
      zip_with(acc,
        slice(toks, lit(j + 1), greatest(size(toks) - j, lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }
    if (n == 1) joined else filter(joined, _.isNotNull)
  }

  /** Convenience over raw text; call sites that feed HOF pipelines should
    * materialize `tokens` in a prior projection and use
    * [[shinglesFromTokens]]. */
  def wordShingles(c: Column, n: Int): Column =
    shinglesFromTokens(tokens(c), n)

  /** Mersenne prime modulus for the MinHash affine permutations:
    * products stay within exact Long range (28-bit base × 31-bit
    * coefficient). Signature construction lives in
    * [[graft.ops.Dedup.minhashSignatures]] (explode + aggregate shape —
    * array-lambda formulations are interpreted, not codegen'd, and
    * benchmarked ~20× slower). */
  val MH_P: Long = 2147483647L

  /** Deterministic (a, b) coefficient pairs for permutation i — fixed
    * LCG, identical constants inlined into the DuckDB oracle. */
  def minhashCoeffs(k: Int): Seq[(Long, Long)] = {
    var x = 88172645463325252L
    def next(): Long = { // xorshift64
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      (x & Long.MaxValue) % (MH_P - 1) + 1
    }
    Seq.fill(k)((next(), next()))
  }


  /** 48-bit SimHash over distinct tokens: bit i of the signature is the
    * majority vote of bit i across token hashes. 48 bits keeps the
    * per-token hash inside the md5-prefix Long in both engines. Bit
    * positions are unrolled at plan-build time (Scala-level loop) —
    * exact integer math, single codegen'd projection. */
  def simhash(c: Column, bits: Int = 48): Column =
    simhashFromHashes(transform(array_distinct(tokens(c)), t => hash64(t, 0)), bits)

  /** SimHash from a materialized token-hash array column. Feed an
    * ATTRIBUTE (hash array from a prior projection): the expression
    * references its input once per bit, so a non-trivial subtree here
    * would tokenize+digest `bits` times per row. */
  def simhashFromHashes(tokHashes: Column, bits: Int = 48): Column =
    (0 until bits).map { i =>
      val votes = aggregate(tokHashes, lit(0L),
        (a, h) => a + when(shiftright(h, i).bitwiseAND(1L) === 1L, 1L)
          .otherwise(-1L))
      when(votes > 0L, lit(1L << i)).otherwise(0L)
    }.reduce[Column](_ + _)

  // ------------------------------------------------------------- redaction

  /** Deny-list term scrub: replace whole-word occurrences of any term
    * with `repl`. The decontamination primitive — benchmark answers,
    * canary strings, or blocked vocabulary are removed before training.
    * Pure regexp_replace (codegen'd, mirrored verbatim by the oracle);
    * at scale the deny list would be broadcast into one compiled
    * alternation exactly like this. */
  /** Alternation over the deny list. Terms must be plain words: the
    * pattern is interpolated into both engines' regex dialects (Java
    * regex here, RE2 in DuckDB), and `\Q…\E` quoting only exists in
    * Java's. */
  def denyPattern(terms: Seq[String]): String = {
    require(terms.nonEmpty, "deny list must not be empty")
    require(terms.forall(_.matches("[A-Za-z0-9]+")),
      s"deny terms must be alphanumeric words, got: ${terms.mkString(",")}")
    s"\\b(${terms.mkString("|")})\\b"
  }

  def redactTerms(c: Column, terms: Seq[String], repl: String): Column =
    regexp_replace(c, denyPattern(terms), repl)

  /** Count of whole-word deny-list hits (the redaction audit column). */
  def redactTermCount(c: Column, terms: Seq[String]): Column =
    size(regexp_extract_all(c, lit(denyPattern(terms)), lit(0)))

  /** PII-shaped pattern scrubs: emails and long digit runs. Patterns kept
    * lookahead-free so Java regex and RE2 agree. */
  val EMAIL_PATTERN = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LONG_NUMBER_PATTERN = "[0-9][0-9 ()+.-]{5,}[0-9]"

  def redactPii(c: Column): Column =
    regexp_replace(regexp_replace(c, EMAIL_PATTERN, "<EMAIL>"),
      LONG_NUMBER_PATTERN, "<NUMBER>")

  /** Stopword-hit count against a fixed lexicon. */
  def stopwordHits(c: Column, lexicon: Seq[String]): Column =
    size(filter(tokens(c), t => t.isin(lexicon: _*)))

  /** Stopword hits over a MATERIALIZED token array (attribute — avoids
    * re-tokenizing when several rules share one tokenize pass). */
  def stopwordHitsFromTokens(toks: Column, lexicon: Seq[String]): Column =
    size(filter(toks, t => t.isin(lexicon: _*))).cast("long")

  /** Total characters across tokens — the numerator of mean word
    * length, kept as an exact integer so ratio rules can
    * cross-multiply instead of dividing. */
  def tokenLenSum(toks: Column): Column =
    aggregate(toks, lit(0L), (a, t) => a + length(t).cast("long"))

  /** Tokens containing at least one (lower-case) letter — the Gopher
    * "words with an alphabetic character" signal. Call on normText
    * tokens (already lower-cased). */
  def alphaWordCount(toks: Column): Column =
    size(filter(toks, t => t.rlike("[a-z]"))).cast("long")

  private val EN_STOP = Seq("the", "a", "of", "and", "to", "in", "is")

  /** The EN lexicon, shared with the Gopher-rule filter. */
  val EN_STOPWORDS: Seq[String] = EN_STOP
  private val langLexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> EN_STOP,
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "est"),
    "es" -> Seq("el", "la", "de", "y", "un", "una", "es"),
    "de" -> Seq("der", "die", "das", "und", "ein", "ist", "zu"),
  )

  /** Stopword-lexicon heuristic language ID: argmax of per-language hit
    * counts; ties break toward the alphabetically-first language; zero
    * hits everywhere → 'und'. An explicit CASE chain so the DuckDB oracle
    * can mirror it verbatim. At scale, real lexicons would be broadcast
    * and this stays a single codegen'd projection. */
  def langId(c: Column): Column = {
    val hits = langLexicons.map { case (lang, lex) => lang -> stopwordHits(c, lex) }
    val langsOrdered = hits.sortBy(_._1) // de, en, es, fr — tie → first
    langsOrdered.zipWithIndex.foldRight(lit("und")) {
      case (((lang, h), i), els) =>
        val beatsLater = langsOrdered.drop(i + 1)
          .map { case (_, h2) => h >= h2 }
          .foldLeft(h > 0)(_ && _)
        when(beatsLater, lit(lang)).otherwise(els)
    }
  }

  // ------------------------------------------------- repetition signals

  /** Fraction of n-gram positions occupied by repeats of another n-gram:
    * `1 − distinct/total` — the classic boilerplate/repetition quality
    * signal (a high duplicate-n-gram fraction marks template spam and
    * degenerate generations). 0 for docs shorter than n tokens. Map-only:
    * both sizes come from the same materialized shingle array. */
  def dupNgramFraction(toks: Column, n: Int): Column = {
    val sh = shinglesFromTokens(toks, n)
    round(when(size(sh) > 0,
      lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh))
      .otherwise(lit(0.0)), 6)
  }

  /** Occurrence count of the MOST FREQUENT n-gram in the doc (≥1 when the
    * doc has ≥ n tokens, else 0) — the "top n-gram" repetition signal.
    * One `array_sort` then a single interpreted fold tracking (previous
    * gram, current run, max run): rows stay independent (no explode +
    * per-doc re-aggregation shuffle; the signal rides whatever scan is
    * already running). */
  def maxNgramRepeat(toks: Column, n: Int): Column = {
    val sorted = array_sort(shinglesFromTokens(toks, n))
    aggregate(sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("mx")),
      (acc, g) => {
        val run = when(g === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(g.as("prev"), run.as("run"),
          greatest(acc.getField("mx"), run).as("mx"))
      },
      acc => acc.getField("mx"))
  }

  /** Fraction of non-blank lines that repeat another line verbatim —
    * the boilerplate signal for corpora with real line structure
    * (headers, nav bars, cookie banners). 0 when the doc has no
    * newlines (single-line docs are all-distinct by definition). */
  def dupLineFraction(c: Column): Column = {
    val lines = filter(split(c, "\n"), l => length(trim(l)) > 0)
    round(when(size(lines) > 0,
      lit(1.0) - size(array_distinct(lines)).cast("double") / size(lines))
      .otherwise(lit(0.0)), 6)
  }

  /** Heuristic quality features + score in [0,1]:
    * penalizes very short docs, high punctuation ratio, low alphabetic
    * ratio, and token repetition. All sub-terms exposed for testing. */
  def punctRatio(c: Column): Column =
    length(regexp_replace(c, "[^.,;:!?]", "")) / greatest(length(c), lit(1))

  def alphaRatio(c: Column): Column =
    length(regexp_replace(c, "[^a-zA-Z]", "")) / greatest(length(c), lit(1))

  def distinctTokenRatio(c: Column): Column =
    size(array_distinct(tokens(c))) / greatest(tokenCount(c), lit(1))

  def qualityScore(c: Column): Column = {
    val lenTerm = least(tokenCount(c) / lit(100.0), lit(1.0))
    round(
      lenTerm * lit(0.4)
        + (lit(1.0) - punctRatio(c)) * lit(0.2)
        + alphaRatio(c) * lit(0.2)
        + distinctTokenRatio(c) * lit(0.2),
      6)
  }
}
