package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation (north-star extension):
  * token counting, quality scoring, language ID, and document
  * fingerprinting. All are compositions of codegen'd built-ins — each
  * has a DuckDB-expressible twin for the oracle gate (double arithmetic is
  * written as single-division / identical-order expressions so both
  * engines produce bit-identical results).
  */
object TextAnalysis {

  /** Word-ish tokens: maximal [A-Za-z0-9] runs (identical semantics in
    * Java regex and DuckDB RE2 for this class). */
  val TokenPattern = "[A-Za-z0-9]+"

  def tokens(text: Column): Column =
    regexp_extract_all(text, lit(TokenPattern), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Whitespace tokenization (split on runs of whitespace). */
  def wsTokenCount(text: Column): Column =
    size(split(text, "\\s+"))

  /** BPE-ish pre-tokenization: letter runs, single digits, single
    * non-alnum marks — the shape GPT-style byte-pair encoders use as
    * their pre-split. Identical regex-class semantics in Java and RE2. */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** Tiny per-language function-word profiles for the n-gram/stopword
    * language-ID heuristic. Deliberately small + deterministic. */
  val StopEn = Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "on")
  val StopDe = Seq("der", "die", "das", "und", "ist", "ein", "zu", "den", "von", "mit")
  val StopEs = Seq("el", "la", "de", "los", "las", "y", "es", "un", "una", "en")
  val StopFr = Seq("le", "la", "les", "et", "est", "une", "des", "du", "dans", "pour")

  /** #tokens (repeats counted) contained in `stops` — a codegen'd
    * hash-set probe ([[graft.functions.TokenSetCount]]; the HOF
    * `size(filter(...))` form is CodegenFallback and knocked the whole
    * scoring projection out of whole-stage codegen). */
  def stopHits(toks: Column, stops: Seq[String]): Column =
    graft.functions.TokenSetCount.tokenSetCount(toks, stops)

  /** Heuristic language ID:
    * any CJK codepoint → zh; else argmax of per-language stopword hits
    * with fixed tie order en > de > es > fr (unknown → en).
    * SQL-expressible: greatest() + CASE, same tie order. */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val en = stopHits(toks, StopEn); val de = stopHits(toks, StopDe)
    val es = stopHits(toks, StopEs); val fr = stopHits(toks, StopFr)
    val g = greatest(en, de, es, fr)
    when(text.rlike("[\\u4e00-\\u9fff]"), "zh")
      .when(en === g, "en")
      .when(de === g, "de")
      .when(es === g, "es")
      .otherwise("fr")
  }

  /** Punctuation-ish ratio: share of characters that are not
    * alphanumeric or space. Single double division — oracle-exact. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^A-Za-z0-9 ]", "")))
      .cast("double") / length(text)

  /** Composite quality score in [0,1]:
    * 0.4·min(tokens/100, 1) + 0.3·(1 − punctRatio) + 0.3·min(5·stopRatio, 1),
    * rounded to 6 dp (absorbs last-ulp ordering differences vs the oracle).
    * The shape (length prior, punctuation penalty, stopword-density prior)
    * follows common LLM-corpus quality filters. */
  def qualityScore(text: Column): Column = {
    val toks = tokens(lower(text))
    val nTok = size(toks).cast("double")
    val stopRatio = stopHits(toks, StopEn).cast("double") / nTok
    round(
      lit(0.4) * least(nTok / 100.0, lit(1.0)) +
        lit(0.3) * (lit(1.0) - punctRatio(text)) +
        lit(0.3) * least(stopRatio * 5.0, lit(1.0)),
      6)
  }

  /** Gopher-style repetition signal: fraction of word occurrences that
    * repeat an earlier word in the document (1 − distinct/total).
    * Heavily boilerplate/spammy docs score high. Single division, exact
    * in both engines; empty docs → 0. */
  def repetitionRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    when(size(toks) === 0, lit(0.0d))
      .otherwise(lit(1.0d) -
        size(array_distinct(toks)).cast("double") / size(toks))
  }

  /** Polynomial rolling-hash fingerprint over the document's characters:
    * fold(acc = 0; acc = (acc·31 + codepoint) mod 1e9+7). Stays below
    * 2^35 so ANSI-mode long arithmetic never overflows. DuckDB twin uses
    * list_reduce over ascii(substr(...)). */
  def fingerprint(text: Column): Column =
    aggregate(
      split(text, ""),
      lit(0L),
      (acc, ch) => (acc * 31 + ascii(ch).cast("long")) % 1000000007L)

  /** PII patterns, chosen from the Java-regex ∩ RE2 common subset
    * (character classes, bounded repetition — no lookaround, no
    * backrefs) so the redaction is DuckDB-oracle-checkable. Deliberately
    * conservative shapes: a production scrubber layers more patterns
    * (and would reject out-of-range octets like 999.999.999.999 that
    * this loose IPv4 shape accepts), but the dataflow — a codegen'd
    * regexp_replace chain in the scan projection, no UDF, no shuffle —
    * is exactly this. Email classes are case-insensitive ([A-Za-z]) so
    * 'User@Example.COM' redacts; RE2 has no (?i), so explicit classes
    * keep the pattern in the Java ∩ RE2 subset. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
  val Ipv4Pattern = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Replace every email / phone / IPv4 occurrence with a typed
    * placeholder. Email first: its class covers dotted digit runs, so
    * the narrower IP pattern must only see what email left behind. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>"),
      Ipv4Pattern, "<IP>")

  /** Occurrence count of `pattern` in `text` (codegen'd). */
  def patternCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))
}
