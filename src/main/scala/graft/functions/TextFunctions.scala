package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline surface
  * (BASELINE.json north star): tokenization, normalization, quality
  * stats, fingerprinting, language scoring.
  *
  * All built from codegen'd `functions._` + higher-order functions — no
  * UDFs, so every expression stays inside whole-stage codegen and scales
  * linearly with the scan at 100 TB.
  */
object TextFunctions {

  /** Lowercase + collapse whitespace. (Spark regexp_replace replaces all
    * matches; the DuckDB oracle needs the explicit 'g' flag.) */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Whitespace tokenization of normalized text. */
  def tokens(text: Column): Column = split(normalize(text), " ")

  // NULL text must yield NULL, not -1: Spark's legacy size(NULL) is -1
  // (sizeOfNull), which would flow into stats as a "count" of -1 and a
  // nonsense uniq ratio of 1.0 for null documents
  def tokenCount(text: Column): Column =
    when(text.isNull, lit(null).cast("long"))
      .otherwise(size(tokens(text)).cast("long"))

  def distinctTokens(text: Column): Column = array_distinct(tokens(text))

  /** Type/token ratio — a standard corpus-quality signal. */
  def uniqTokenRatio(text: Column): Column =
    size(distinctTokens(text)).cast("double") / size(tokens(text))

  /** Order-insensitive document fingerprint: md5 over the sorted distinct
    * token set. Catches bag-of-words duplicates that exact-text hashing
    * misses (present in the synthetic corpus), at the cost of ignoring
    * word order — the MinHash path handles graded similarity. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(distinctTokens(text))))

  /** Order-SENSITIVE document fingerprint: a polynomial rolling hash
    * over the token stream, acc = (acc*31 + h(tok)) mod (2^31 - 1) —
    * unlike [[fingerprint]] it distinguishes word-order edits. Token
    * hashes are md5-derived 32-bit values, so the whole computation is
    * engine-portable and overflow-free (acc*31 + h < 2^37). */
  def rollingHash(text: Column): Column = {
    val M = 2147483647L // 2^31 - 1
    val th = transform(tokens(text),
      t => conv(substring(md5(t), 1, 8), 16, 10).cast("long"))
    aggregate(th, lit(0L), (acc, h) => (acc * 31 + h) % M)
  }

  /** "BPE-ish" subword proxy: 4-byte chunks of the normalized text.
    * A cheap, deterministic stand-in for tokenizer cost estimation. */
  def subwordCount(text: Column): Column =
    ceil(length(normalize(text)).cast("double") / 4.0).cast("long")

  /** Count of tokens that appear in a fixed vocabulary. */
  def vocabHits(text: Column, vocab: Seq[String]): Column =
    size(filter(tokens(text), t => array_contains(lit(vocab.toArray), t))).cast("long")

  /** Tiny per-language stopword lists for the language-ID heuristic.
    * Deliberately minimal: the operator shape (N vocab scores + argmax)
    * is what scales, not the word lists. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "que")
  )

  /** Quality score in [0,1]: length saturation + lexical diversity.
    * Deterministic arithmetic only, so the DuckDB oracle is exact. */
  def qualityScore(text: Column): Column =
    round(
      least(lit(1.0), tokenCount(text).cast("double") / 100.0) * 0.5 +
        uniqTokenRatio(text) * 0.5,
      4)
}
