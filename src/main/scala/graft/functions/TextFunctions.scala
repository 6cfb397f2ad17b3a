package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline surface:
  * tokenization, shingling, language-ID heuristics, quality scoring and
  * document fingerprinting. All pure Catalyst expressions (split /
  * regexp / higher-order functions) — no UDF, executor-side, codegen'd,
  * so they scale as a narrow map over 100 TB of documents.
  */
object TextFunctions {

  /** Unicode SIMPLE lowercase — the engine's case contract for all
    * document-text tokenization. Java's `toLowerCase` (what Spark's
    * `lower` delegates to off the ASCII fast path) applies FULL case
    * mapping: U+0130 'İ' → "i̇" (two codepoints) and a context-sensitive
    * final sigma 'Σ' → 'ς' at word end — the only two non-locale rules
    * where full and simple mapping disagree. Every SQL engine replaying
    * the contract (DuckDB via utf8proc, Trino, Postgres) does SIMPLE
    * 1:1 mapping, so those two codepoints are pre-translated to their
    * simple images ('i', 'σ') before `lower`; an input that already
    * contains 'ς' is untouched by both engines. Everything else
    * (including cased astral scripts like Deseret) maps identically
    * under both algorithms.
    *
    * 'I', 'J' and 'Į' are ALSO pre-translated (to their universal
    * simple images) because Java's no-arg `toLowerCase` uses the JVM
    * DEFAULT locale: on a tr/az host 'I' lowers to dotless 'ı', and on
    * an lt host I/J/Į grow a combining dot before accents — the only
    * locale-sensitive lowercase rules in Unicode, every one keyed on
    * exactly these trigger letters. Removing the triggers before
    * `lower` makes the contract host-locale-independent; on a ROOT
    * locale the translation is identical to what lower() would do. */
  def simpleLower(text: Column): Column =
    lower(translate(text, "İΣIJĮ", "iσijį"))

  /** Lowercased whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(simpleLower(text), "\\s+"), t => length(t) > 0)

  /** Word n-shingles (n consecutive tokens joined by one space).
    *
    * The token array is let-bound as a lambda variable (transform over a
    * single-element array): a lambda body that references an OUTER
    * expression re-evaluates it per element — the naive form recomputes
    * tokenization per shingle index, O(tokens²) per doc (measured 2.5×
    * the whole minhash pipeline). Guarded: fewer than n tokens → empty
    * (`sequence` would otherwise produce a descending range). */
  def wordShingles(text: Column, n: Int): Column =
    flatten(transform(array(tokens(text)), ts =>
      when(size(ts) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(ts) - (n - 1)),
          i => concat_ws(" ", slice(ts, i, lit(n)))))))

  /** Character n-grams of the lowercased text — the native O(len·n)
    * [[CharNgrams]] expression. The composed substring-per-index form
    * this replaced was O(len²) (`UTF8String.substring` scans from byte
    * 0 on every call — no codepoint index), which the hugedoc gate
    * turned from invisible into a core pinned for minutes on one
    * 240k-char doc. */
  def charNgrams(text: Column, n: Int): Column =
    CharNgrams.charNgrams(simpleLower(text), n)

  /** Estimated sub-word token count: BPE-ish segmentation by regex —
    * runs of letters, runs of digits, or single other non-space chars.
    * A cheap, deterministic stand-in for a real tokenizer's count. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Per-language stopword lists (public: the oracle-SQL generator in
    * [[graft.SparkEntry]] re-emits them verbatim). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"),
    "es" -> Seq("el", "la", "los", "las", "y", "de", "un", "una", "es", "que"))

  /** Fraction of tokens that are stopwords of language `lang` —
    * the classic cheap language-ID signal. */
  def stopwordRatio(toks: Column, lang: String): Column = {
    val sw = array(stopwords(lang).map(lit): _*)
    when(size(toks) === 0, lit(0.0d))
      .otherwise(size(filter(toks, t => array_contains(sw, t)))
        .cast("double") / size(toks))
  }

  /** Fraction of characters in the CJK unified block (zh signal). */
  def cjkRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0d))
      .otherwise(size(regexp_extract_all(text, lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))
        .cast("double") / length(text))

  /** N-gram-heuristic language ID: argmax of per-language stopword
    * ratios, CJK char ratio for zh, 'und' (undetermined) below floor. */
  def langId(text: Column): Column = {
    val ts = tokens(text)
    val scores = stopwords.keys.toSeq.sorted.map(l => (l, stopwordRatio(ts, l))) :+
      (("zh", cjkRatio(text)))
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best < 0.05, lit("und"))) {
      case (acc, (l, s)) => acc.when(s === best, lit(l))
    }.otherwise(lit("und"))
  }

  /** Quality signals: length, token stats, punctuation/digit/upper
    * ratios, English stopword ratio — composable into a filter score. */
  def qualityStruct(text: Column): Column = {
    val ts = tokens(text)
    val len = length(text)
    val nonEmpty = len > 0
    struct(
      len.cast("long").as("n_chars"),
      size(ts).cast("long").as("n_tokens"),
      when(size(ts) === 0, lit(0.0d))
        .otherwise(aggregate(ts, lit(0L), (a, t) => a + length(t))
          .cast("double") / size(ts)).as("avg_token_len"),
      when(!nonEmpty, lit(0.0d))
        .otherwise(size(regexp_extract_all(text, lit("[.,;:!?]"), lit(0)))
          .cast("double") / len).as("punct_ratio"),
      when(!nonEmpty, lit(0.0d))
        .otherwise(size(regexp_extract_all(text, lit("[0-9]"), lit(0)))
          .cast("double") / len).as("digit_ratio"),
      when(!nonEmpty, lit(0.0d))
        .otherwise(size(regexp_extract_all(text, lit("[A-Z]"), lit(0)))
          .cast("double") / len).as("upper_ratio"),
      stopwordRatio(ts, "en").as("stopword_ratio"))
  }

  /** Normalization fingerprint (OpenRefine-style): md5 of the sorted
    * distinct token set — invariant to token order and duplication;
    * the exact-near-dup key for "same content, shuffled" documents. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Rabin-Karp-style rolling hash over the token stream (order-
    * sensitive, mod 1e9+7 to stay clear of ANSI overflow). Per-token
    * hash is the cross-engine [[graft.operators.Dedup.hash60]] md5
    * prefix, so the DuckDB oracle can fold the identical chain with
    * `list_reduce`. */
  def rollingHash(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(acc * 31 +
        pmod(Hash60.hash60(t), lit(1000000007L)),
        lit(1000000007L)))
}
