package graft.operators

import graft.functions.gf
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data curation, all pure Column
 * compositions (fully codegen'd, no UDFs): n-gram-heuristic language ID,
 * quality scoring (length / punctuation / stopword ratios), token
 * counting (whitespace + BPE-ish subword estimate), and rolling-hash
 * document fingerprints.
 */
object TextAnalysis {

  /** Per-language marker sets for the n-gram/stopword heuristic. */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "you3", "wo3", "ta1", "men5"))

  /** Language-ID: argmax marker-hit count, ties and zero-hits → 'und'.
   * Deterministic tie-break by language code ascending. */
  def langId(text: Column): Column = {
    val toks = gf.tokenize(text)
    val scores = markers.toSeq.sortBy(_._1).map { case (lang, ws) =>
      struct(
        size(filter(toks, t => t.isin(ws.map(lit(_)): _*))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scores: _*)) // max by (hits, lang)
    when(best("hits") > 0, best("lang")).otherwise(lit("und"))
  }

  /** Composite quality score in [0,1]: rewards moderate length, low
   * punctuation density, presence of stopwords (prose-ness), and word
   * diversity. Weights are fixed constants, not learned. */
  def qualityScore(text: Column): Column = {
    val toks = gf.tokenize(text)
    val nTok = size(toks).cast("double")
    val nChars = length(text).cast("double")
    val punct = (nChars - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))) / nChars
    val stop = size(filter(toks,
      t => t.isin(markers("en").map(lit(_)): _*))).cast("double") / nTok
    val diversity = size(array_distinct(toks)).cast("double") / nTok
    val lengthScore = least(nTok / 100.0, lit(1.0))
    round(
      lit(0.3) * lengthScore + lit(0.2) * (lit(1.0) - least(punct * 5, lit(1.0))) +
        lit(0.2) * least(stop * 5, lit(1.0)) + lit(0.3) * diversity, 6)
  }

  /** Token counts: whitespace words plus a BPE-ish subword estimate
   * (pieces of ≤4 chars: ceil(len/4) per word — the standard chars/4
   * rule-of-thumb, computed exactly per word). */
  def tokenCounts(df: DataFrame, id: String, text: String): DataFrame = {
    val toks = gf.tokenize(col(text))
    df.select(col(id),
      size(toks).cast("long").as("n_words"),
      aggregate(toks, lit(0L), (acc, t) => acc + ceil(length(t) / lit(4.0)).cast("long"))
        .as("n_subword_est"),
      length(col(text)).cast("long").as("n_chars_exact"))
  }

  /** Polynomial rolling hash (wrapping mod 2^64) of the normalized text —
   * an order-sensitive fingerprint, unlike the md5 content hash. A native
   * expression because ANSI-mode `aggregate` cannot express wrapping
   * multiplication. */
  def rollingFingerprint(text: Column): Column =
    graft.functions.sketch.rolling_hash64(gf.tokenize(text))

  /** Adler-32-style rolling fingerprint over token values (the rsync/zlib
   * rolling-checksum structure, mod 65521, applied per token instead of
   * per byte): A = 1 + Σ v(tᵢ), B = n + Σ (n−i+1)·v(tᵢ), fp = B·2¹⁶ + A,
   * with v(t) = ascii(first) + 131·len(t) + 7·ascii(last). Order-sensitive
   * like [[rollingFingerprint]] and slideable in O(1) per step, but built
   * ONLY from arithmetic both Spark and ANSI SQL share — so this variant
   * is DuckDB-oracle-checkable end to end (q_rolling_fingerprint_sql),
   * value-anchoring the fingerprinting family the 64-bit wrapping form
   * can't anchor itself. Pure Column composition: codegen'd, no UDF. */
  def adlerFingerprint(text: Column): Column = {
    val toks = gf.tokenize(text)
    val n = size(toks).cast("long")
    def v(t: Column): Column =
      ascii(substring(t, 1, 1)).cast("long") + lit(131L) * length(t).cast("long") +
        lit(7L) * ascii(t.substr(length(t), lit(1))).cast("long")
    val a = (lit(1L) + aggregate(toks, lit(0L), (acc, t) => acc + v(t))) % 65521L
    val b = (n + aggregate(
      transform(toks, (t, i) => (n - i.cast("long")) * v(t)),
      lit(0L), (acc, x) => acc + x)) % 65521L
    b * 65536L + a
  }
}
