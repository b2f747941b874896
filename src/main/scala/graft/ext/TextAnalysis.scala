package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.checks.{Check, ColumnCheck}

/** Text-analysis operators for large-scale training-data pipelines
  * (beyond-reference additions, SURVEY.md §2.F note / BASELINE.json north
  * star). Everything is a pure Catalyst expression — whole-stage codegen'd,
  * no UDFs — so each operator is a single scan at any scale and can also be
  * attached to a schema as a Check.
  */
object TextAnalysis {

  /** Whitespace tokens; empty/blank text → empty array (consistent with the
    * DuckDB oracle's trim+split). */
  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish token count: word pieces + isolated punctuation, the standard
    * pre-tokenizer regex shape. */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** Character-class counts for quality scoring. */
  def alphaCount(c: Column): Column = length(regexp_replace(c, "[^a-zA-Z]", ""))
  def digitCount(c: Column): Column = length(regexp_replace(c, "[^0-9]", ""))
  def spaceCount(c: Column): Column = length(regexp_replace(c, "[^ \\t\\n]", ""))
  def punctCount(c: Column): Column =
    length(c) - alphaCount(c) - digitCount(c) - spaceCount(c)

  /** Small multilingual stopword lists for the language-ID heuristic and
    * stopword-ratio quality signal. Deterministic, alphabetical lang order. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不"))

  private def stopwordHits(toks: Column, words: Seq[String]): Column = {
    val lits = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(lits, t)))
  }

  /** Ratio of stopword tokens (English list) — classic quality signal. */
  def stopwordRatio(c: Column): Column = {
    val toks = tokens(c)
    when(size(toks) === 0, lit(0.0))
      .otherwise(stopwordHits(toks, stopwords.toMap.apply("en")).cast("double") /
        size(toks).cast("double"))
  }

  /** Language-ID heuristic: argmax of stopword hits per language;
    * ties break to the alphabetically-first language (deterministic). */
  def languageId(c: Column): Column = {
    val toks = tokens(c)
    val scores = stopwords.map { case (lang, words) => lang -> stopwordHits(toks, words) }
    val best = greatest(scores.map(_._2): _*)
    // foldRight chains when(...) in alphabetical order, so the FIRST
    // (alphabetically smallest) language reaching the max wins ties.
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best, lit(lang)).otherwise(acc)
    }
  }

  /** Document fingerprint over whitespace-normalized lowercased text.
    * md5 variant is cross-engine verifiable; xxhash64 variant is the cheap
    * 64-bit key to dedup on at scale. */
  def normalized(c: Column): Column =
    lower(regexp_replace(trim(c), "\\s+", " "))
  def fingerprintMd5(c: Column): Column = md5(normalized(c))
  def fingerprint64(c: Column): Column = xxhash64(normalized(c))

  /** Composite quality score in [0,1]: weighted mix of length, alpha ratio,
    * stopword ratio and mean token length sanity (heuristics in the spirit
    * of Gopher/C4 quality rules). */
  def qualityScore(c: Column): Column = {
    val nChars = length(c).cast("double")
    val toks = tokens(c)
    val nToks = size(toks).cast("double")
    val alphaRatio = when(nChars === 0, 0.0).otherwise(alphaCount(c) / nChars)
    val lenScore = least(nChars / lit(200.0), lit(1.0))
    val meanTokLen = when(nToks === 0, lit(0.0))
      .otherwise(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / nToks)
    val tokLenScore = when(meanTokLen.between(3.0, 10.0), 1.0).otherwise(0.5)
    round(lit(0.4) * alphaRatio + lit(0.3) * lenScore + lit(0.3) * tokLenScore, 4)
  }

  // ---- schema-attachable checks ----------------------------------------
  def minTokens(n: Int): ColumnCheck =
    ColumnCheck("min_tokens", c => tokenCount(c) >= n, Map("min" -> n))
  def maxTokens(n: Int): ColumnCheck =
    ColumnCheck("max_tokens", c => tokenCount(c) <= n, Map("max" -> n))
  def minQuality(q: Double): ColumnCheck =
    ColumnCheck("min_quality", c => qualityScore(c) >= q, Map("min" -> q))
  def languageIn(langs: Seq[String]): ColumnCheck =
    ColumnCheck("language_in", c => languageId(c).isin(langs: _*),
      Map("allowed" -> langs))
}
