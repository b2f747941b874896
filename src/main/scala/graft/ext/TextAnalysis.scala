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

  /** REAL byte-pair encoding with a merge table — see
    * [[graft.functions.BpeEncode]]. Default merges are the small built-in
    * English table; pass a trained vocabulary's merge list in production. */
  def bpeTokens(c: Column,
      merges: Seq[(String, String)] = graft.functions.BpeEncode.EnglishMerges,
      lowercase: Boolean = true): Column =
    graft.functions.BpeEncode.of(c, merges, lowercase)

  /** Feature-hashed vector of the normalized whitespace tokens — see
    * [[graft.functions.FeatureHashVector]]. Plugs raw text straight into
    * the embedding-column operators (Similarity.*TopK, Dedup.semanticDedup)
    * with no trained model. */
  def hashVector(c: Column, dim: Int = 256): Column =
    graft.functions.HashFunctions.featureHashVector(
      tokens(normalized(coalesce(c, lit("")))), dim)

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

  /** Per-character occurrence count over the normalized text — the zh
    * signal (r17 review: whitespace tokenization leaves unsegmented
    * Chinese as ONE token, so token-equality against single-character
    * stopwords NEVER matched and genuine Chinese scored 0 in every
    * stopword consumer). Each list entry is one CJK character, so
    * occurrences = length delta after removing it. */
  private def cjkHits(n: Column, chars: Seq[String]): Column =
    chars.map(ch => length(n) -
      length(regexp_replace(n, java.util.regex.Pattern.quote(ch), "")))
      .reduce(_ + _)

  /** Per-language stopword hit counts over the NORMALIZED (lowercased,
    * whitespace-collapsed) text — token equality for the space-delimited
    * languages, [[cjkHits]] for zh. Normalization matters (r17 review):
    * raw-case tokens scored an all-caps English document at 0 hits in
    * every language, failing gopher's stopword floor and mislabeling the
    * doc, and sentence-initial "The"/"Der"/"El" were systematically
    * missed. One shared derivation for languageId / stopwordRatio /
    * gopherKeep so the three signals cannot drift. */
  private def langHits(c: Column): Seq[(String, Column)] = {
    val n = normalized(c)
    val toks = tokens(n)
    stopwords.map { case (lang, words) =>
      lang -> (if (lang == "zh") cjkHits(n, words)
               else stopwordHits(toks, words))
    }
  }

  /** Ratio of stopword tokens (English list, case-insensitive) — classic
    * quality signal. */
  def stopwordRatio(c: Column): Column = {
    val toks = tokens(normalized(c))
    when(size(toks) === 0, lit(0.0))
      .otherwise(stopwordHits(toks, stopwords.toMap.apply("en")).cast("double") /
        size(toks).cast("double"))
  }

  /** Language-ID heuristic: argmax of [[langHits]] per language; ties
    * break to the alphabetically-first language (deterministic); ZERO
    * hits in every language returns "und" (r17 review: the old
    * fallthrough confidently labeled gibberish/numeric text "de" — the
    * first tie branch at 0 === 0 — making the "und" arm dead code; a
    * languageIn gate then passed arbitrary noise as German). This stays
    * the cheap heuristic — [[scriptProfile]] and the trained classifier
    * (ClassifierTrain) are the robust routing paths. */
  def languageId(c: Column): Column = {
    val scores = langHits(c)
    val best = greatest(scores.map(_._2): _*)
    when(best <= 0, lit("und")).otherwise(
      scores.foldRight(lit("und")) { case ((lang, s), acc) =>
        when(s === best, lit(lang)).otherwise(acc)
      })
  }

  /** Document fingerprint over whitespace-normalized lowercased text.
    * md5 variant is cross-engine verifiable; xxhash64 variant is the cheap
    * 64-bit key to dedup on at scale. */
  def normalized(c: Column): Column =
    lower(regexp_replace(trim(c), "\\s+", " "))
  def fingerprintMd5(c: Column): Column = md5(normalized(c))
  def fingerprint64(c: Column): Column = xxhash64(normalized(c))

  /** Full CCNet normalization (Wenzek et al. 2020): [[normalized]]
    * (trim + whitespace collapse + lowercase) then NFD accent strip +
    * digit fold ([[graft.functions.CcnetStrip]]) — the canonical
    * pre-dedup key of the CCNet pipeline ("muller 000" ≡ "Müller 123").
    * Matches DuckDB `strip_accents` + digit regexp cross-engine. */
  def ccnetNormalized(c: Column): Column =
    graft.functions.Normalize.ccnetStrip(normalized(c))

  /** 64-bit dedup key over the CCNet-normalized text. */
  def ccnetFingerprint64(c: Column): Column = xxhash64(ccnetNormalized(c))

  // -- Unicode script detection (r9) ---------------------------------------
  // The mixed-corpus triage step BEFORE language-ID: script mixing flags
  // mojibake/spam, and routing by dominant script picks the right langid /
  // tokenizer family. Pure codegen'd regexp counts over BMP ranges (BMP
  // chars are one UTF-16 unit, so Java length == code points here and the
  // counts match DuckDB's code-point semantics exactly).
  private val scriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z\\u00C0-\\u024F]",
    "cyrillic" -> "[\\u0400-\\u04FF]",
    "cjk" -> "[\\u4E00-\\u9FFF\\u3040-\\u30FF]",
    "arabic" -> "[\\u0600-\\u06FF]")

  /** Character count of one script class (see [[scriptProfile]]). */
  def scriptCount(c: Column, rangePattern: String): Column =
    (length(c) - length(regexp_replace(c, rangePattern, ""))).cast("long")

  /** (n_latin, n_cyrillic, n_cjk, n_arabic, dominant) — counts per major
    * script plus the dominant label (ties break in the listed order;
    * a document with none of the four scripts reads "none"; a NULL
    * document reads NULL — pinned EXPLICITLY on both engines so the
    * cross-engine gate can never drift on null fall-through semantics). */
  def scriptProfile(c: Column): Seq[(String, Column)] = {
    val counts = scriptRanges.map { case (n, p) => n -> scriptCount(c, p) }
    val g = greatest(counts.map(_._2): _*)
    val dominant = counts.foldRight(lit("none")) { case ((n, cnt), acc) =>
      when(g > 0 && cnt === g, lit(n)).otherwise(acc)
    }
    // foldRight: the FIRST matching name in scriptRanges order wins a tie
    counts.map { case (n, cnt) => s"n_$n" -> cnt } :+
      ("script" -> when(c.isNull, lit(null).cast("string")).otherwise(dominant))
  }

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

  // ---- repetition / structure signals (Gopher-style filter rules) -------
  // Rahimi et al.-lineage quality rules as used by Gopher/MassiveText and
  // C4: repetitious or list-like documents are low-value training data.
  // All pure Catalyst array expressions — one scan, no shuffle, no UDF.

  /** Non-blank lines of a document. */
  def lines(c: Column): Column =
    filter(split(c, "\n"), l => length(trim(l)) > 0)

  /** Fraction of non-blank lines that duplicate another line — the Gopher
    * "duplicate line fraction" rule. 0.0 for empty documents. */
  def duplicateLineFraction(c: Column): Column = {
    val ls = lines(c)
    when(size(ls) === 0, lit(0.0)).otherwise(round(
      lit(1.0) - size(array_distinct(ls)).cast("double") / size(ls).cast("double"), 4))
  }

  /** Fraction of non-blank lines starting with a bullet marker (-, *, •). */
  def bulletLineFraction(c: Column): Column = {
    val ls = lines(c)
    val bullets = Seq("-", "*", "•")
    when(size(ls) === 0, lit(0.0)).otherwise(round(
      size(filter(ls, l => bullets.map(b => trim(l).startsWith(b)).reduce(_ || _)))
        .cast("double") / size(ls).cast("double"), 4))
  }

  /** Fraction of non-blank lines ending in an ellipsis ("..." or "…"). */
  def ellipsisLineFraction(c: Column): Column = {
    val ls = lines(c)
    when(size(ls) === 0, lit(0.0)).otherwise(round(
      size(filter(ls, l => trim(l).endsWith("...") || trim(l).endsWith("…")))
        .cast("double") / size(ls).cast("double"), 4))
  }

  /** Mean whitespace-token length in characters. */
  def meanWordLength(c: Column): Column = {
    val toks = tokens(c)
    when(size(toks) === 0, lit(0.0)).otherwise(round(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"), 4))
  }

  /** Symbol-to-word ratio: occurrences of '#' and '...' per token (the
    * Gopher symbol rule). Non-overlapping left-to-right '...' counting
    * matches SQL replace() semantics on both engines. */
  def symbolWordRatio(c: Column): Column = {
    val nToks = size(tokens(c))
    val hashes = length(c) - length(translate(c, "#", ""))
    val ellipses = (length(c) - length(regexp_replace(c, "\\.\\.\\.", ""))) / 3
    when(nToks === 0, lit(0.0)).otherwise(round(
      (hashes + ellipses).cast("double") / nToks.cast("double"), 4))
  }

  /** Per-document fraction of n-gram occurrences claimed by the single most
    * frequent n-gram (Gopher "top n-gram fraction"). A DataFrame operator,
    * not a Column: the count needs a per-(doc, gram) aggregation — one
    * explode + two hash aggregations partitioned by `idCol`, partial
    * aggregation map-side, nothing to the driver. Documents shorter than n
    * tokens get 0.0. Returns (idCol, top_ngram_frac). */
  def topNgramFraction(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    require(n >= 1, "n >= 1")
    val id = col("`" + idCol.replace("`", "``") + "`")
    val toks = tokens(col("`" + textCol.replace("`", "``") + "`"))
    val grams = when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
    // explode_outer keeps gram-less documents as a null-gram row, so the
    // result covers every input id without a distinct + re-join (which
    // would cost two extra shuffles of the id space at scale).
    df.select(id.as("__id"), explode_outer(grams).as("gram"))
      .groupBy("__id", "gram").agg(count(lit(1)).as("c"))
      .groupBy("__id")
      .agg(round(coalesce(
        max(when(col("gram").isNotNull, col("c"))).cast("double") /
          sum(when(col("gram").isNotNull, col("c"))).cast("double"),
        lit(0.0)), 4).as("top_ngram_frac"))
      .select(col("__id").as(idCol), col("top_ngram_frac"))
  }

  /** Corpus-unigram language-model score per document: the mean natural-log
    * probability of the document's (normalized) tokens under the corpus's
    * own unigram distribution — the cheap CCNet-style "perplexity" quality
    * signal (docs full of rare gibberish score very negative; boilerplate
    * scores near the corpus mode).
    *
    * Two passes over the text, no driver loops:
    *   1. vocabulary: token counts (one hash-agg shuffle of 8-byte-ish
    *      tokens with map-side partials), capped to the top `vocabSize` by
    *      (count desc, token asc) — a TakeOrdered, deterministic;
    *   2. scoring: tokens left-join the BROADCAST vocabulary (out-of-vocab
    *      tokens get the 1/N floor), then one aggregation keyed by doc id.
    * The vocabulary cap is what makes the join broadcast-able at 100 TB —
    * the full distinct-token table (billions of entries on web text) never
    * reaches the scoring side. Total token count N rides a 1-row broadcast
    * cross join so the whole thing stays one lazy plan.
    *
    * Returns (idCol, n_tokens, unigram_logprob) — documents with zero
    * tokens are absent (no tokens to score). */
  def unigramLogProbs(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, vocabSize: Int = 1 << 16): org.apache.spark.sql.DataFrame = {
    require(vocabSize > 0, "vocabSize > 0")
    val id = col("`" + idCol.replace("`", "``") + "`")
    val text = col("`" + textCol.replace("`", "``") + "`")
    val toks = df.select(id.as("__id"), explode(tokens(normalized(text))).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(vocabSize)
    val total = df.agg(sum(tokenCount(normalized(text))).cast("double").as("N"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .crossJoin(broadcast(total))
      .withColumn("__lp", log(coalesce(col("cnt"), lit(1L)).cast("double") / col("N")))
      .groupBy("__id")
      .agg(count(lit(1)).as("n_tokens"), avg("__lp").as("unigram_logprob"))
      .select(col("__id").as(idCol), col("n_tokens"), col("unigram_logprob"))
  }

  /** Split documents into fixed-size token chunks — the context-window
    * chunker every training pipeline runs before packing/tokenization.
    * Chunks start every `stride` tokens (stride < chunkSize ⇒ overlapping
    * windows); if the last strided window leaves tail tokens uncovered, one
    * final window "snaps back" to end exactly at the last token (the
    * sliding-window convention, so every token appears in ≥ 1 chunk and
    * full-length chunks are preferred over a ragged tail). Documents
    * shorter than `chunkSize` yield one chunk with all their tokens;
    * documents with zero tokens yield none.
    *
    * Pure array expressions (sequence / slice / posexplode) — chunking
    * 100 TB is one scan, no shuffle, no UDF; output rows carry the chunk
    * text plus (doc, chunk_idx, start_tok, n_chunk_tokens) lineage.
    * Returns (idCol, chunk_idx, start_tok, n_chunk_tokens, chunk). */
  def chunkDocuments(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, chunkSize: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(chunkSize > 0, "chunkSize > 0")
    require(stride > 0 && stride <= chunkSize, "0 < stride <= chunkSize")
    val id = col("`" + idCol.replace("`", "``") + "`")
    // null text behaves as empty (yields no chunks) — without the coalesce
    // a null propagates size() = -1 and emits one garbage row
    val toks = tokens(coalesce(col("`" + textCol.replace("`", "``") + "`"), lit("")))
    val n = size(toks)
    val lastFull = greatest(n - (chunkSize - 1), lit(1))
    val base = sequence(lit(1), lastFull, lit(stride))
    // snap-back: the final strided window ends before the last token →
    // append the window ending exactly at token n (never duplicates a base
    // start: covered < n implies n-chunkSize+1 > the last base start)
    val starts = when(n === 0, array().cast("array<int>"))
      .otherwise(when(element_at(base, -1) + (chunkSize - 1) < n,
        concat(base, array(lastFull))).otherwise(base))
    df.select(id.as(idCol), posexplode(starts).as(Seq("chunk_idx", "start_tok")),
        toks.as("__t"))
      .select(col(idCol), col("chunk_idx"), col("start_tok"),
        slice(col("__t"), col("start_tok"), lit(chunkSize)).as("__c"))
      .select(col(idCol), col("chunk_idx"), col("start_tok"),
        size(col("__c")).as("n_chunk_tokens"),
        concat_ws(" ", col("__c")).as("chunk"))
  }

  /** Corpus vocabulary: the `k` most frequent tokens with their counts,
    * deterministic tie-break (count desc, token asc). One hash aggregation
    * with map-side partials over exploded tokens, then a TakeOrdered —
    * per-partition top-k merged on the driver, k·partitions rows moved,
    * never a global sort. The full distinct-token table (billions of
    * entries on web text) stays distributed. */
  def vocabTopK(df: org.apache.spark.sql.DataFrame, textCol: String, k: Int,
      normalize: Boolean = true): org.apache.spark.sql.DataFrame = {
    require(k > 0, "k > 0")
    val text = col("`" + textCol.replace("`", "``") + "`")
    df.select(explode(tokens(if (normalize) normalized(text) else text)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(k)
  }

  /** TF-IDF keyword extraction: the `k` highest-weighted tokens per
    * document, weight = (cnt/n_doc_tokens) · (ln((N+1)/(df+1)) + 1) — the
    * smoothed-idf form (no division by zero, never negative), tokens on
    * the whitespace-normalized lowercased form shared by the other text
    * operators. Scores are REPORTED AND RANKED at 6-decimal precision:
    * ranking on the rounded score (ties → token asc) keeps the top-k cut
    * reproducible across engines whose `ln` differs in the last ulp.
    *
    * Scale shape: one (doc, token) count aggregation; document frequency
    * re-aggregates THAT frame (never re-reads the corpus); doc lengths are
    * a window sum over the per-doc partitions of the same frame (distinct
    * tokens per doc — bounded by doc length, no skew); N is one count
    * action. The per-doc top-k is the map-side k-heap aggregate
    * ([[graft.functions.TopKByScore]]) — k rows per doc cross the final
    * shuffle, never a global sort. The distinct-token df table (billions
    * of entries on web text) stays distributed end to end.
    *
    * Output: (idCol, rank, token, score), rank 1-based; documents with no
    * tokens (blank/null) are absent. `minDf` drops tokens appearing in
    * fewer documents (noise/typos) BEFORE scoring. */
  def tfidfTopK(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int, minDf: Long = 1L): org.apache.spark.sql.DataFrame = {
    require(k > 0, "k > 0")
    require(minDf >= 1L, "minDf >= 1")
    val id = col("`" + idCol.replace("`", "``") + "`")
    val text = col("`" + textCol.replace("`", "``") + "`")
    val nDocs = df.count() // bounded action: one scalar
    val tf = df.select(id.as("__id"), explode(tokens(normalized(text))).as("token"))
      .groupBy(col("__id"), col("token")).agg(count(lit(1)).as("cnt"))
    val docFreq = tf.groupBy(col("token")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDf)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__id"))
    val scored = tf
      .withColumn("__n", sum(col("cnt")).over(w))
      .join(docFreq, Seq("token")) // inner: minDf-dropped tokens vanish
      .withColumn("score", round(
        (col("cnt").cast("double") / col("__n")) *
          (log((lit(nDocs) + 1.0) / (col("__df") + 1.0)) + 1.0), 6))
    scored.groupBy(col("__id"))
      .agg(graft.functions.TopKByScore.of(col("score"), col("token"), k).as("__top"))
      .select(col("__id").as(idCol), posexplode(col("__top")).as(Seq("__r", "__e")))
      .select(id, (col("__r") + 1).cast("long").as("rank"),
        col("__e.item").as("token"), col("__e.score").as("score"))
  }

  /** Unigram language-model scoring — the model-free shape of CCNet-style
    * perplexity filtering (documents far from the corpus's own token
    * distribution score high and get filtered/bucketed): fit an add-k
    * smoothed unigram LM on the corpus itself, then score every document's
    * cross-entropy H = −(1/n)·Σ ln p(token) and perplexity e^H.
    *
    *   p(token) = (count(token) + k) / (total + k·(V+1))
    *
    * with counts from the top-`vocabSize` tokens (deterministic count
    * desc / token asc cut, like [[vocabTopK]]) and everything rarer
    * sharing the out-of-vocabulary mass (the +1 cell).
    *
    * Scale shape: the model is ONE token-count aggregation (map-side
    * partials over exploded tokens) read by two bounded actions — a
    * TakeOrdered for the vocab cut and one sum for the total — and the
    * scoring pass is one scan: explode + broadcast-hash-join against the
    * V-row vocab + per-document re-aggregation, where each document's
    * partial lives in its input partition (the explode never crosses
    * partitions before the doc-id re-group). Nothing data-sized ever
    * reaches the driver; 100 TB scoring is one shuffle-free-ish pass (the
    * doc-id re-group shuffles (id, n, Σln p) partials, 24 bytes/doc).
    *
    * Output: one row per input row — (idCol, n_tokens, cross_entropy,
    * perplexity); empty/blank documents keep n_tokens = 0 with NULL
    * entropy/perplexity (no tokens → no distribution to be far from). */
  def unigramPerplexity(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, vocabSize: Int = 10000,
      addK: Double = 0.5): org.apache.spark.sql.DataFrame = {
    require(vocabSize > 0, "vocabSize > 0")
    require(addK > 0, "addK > 0 (unsmoothed OOV would be ln 0)")
    val id = col("`" + idCol.replace("`", "``") + "`")
    val text = col("`" + textCol.replace("`", "``") + "`")
    val toks = df.select(id.as("__id"),
      explode(tokens(normalized(text))).as("token"))
    val counts = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
    // two bounded driver actions over the (distinct-token-sized) count
    // frame: the V-row vocab and the scalar total
    val vocab = counts.orderBy(col("cnt").desc, col("token")).limit(vocabSize)
    // coalesce: sum over an EMPTY count frame (all-blank/null corpus) is
    // null — every document then scores n_tokens=0 / null entropy as
    // documented, instead of an NPE here
    val total = counts.agg(coalesce(sum(col("cnt")), lit(0L))).head().getLong(0)
    val denom = total + addK * (math.min(vocabSize, Int.MaxValue).toDouble + 1.0)
    val scored = toks
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(log((coalesce(col("cnt"), lit(0L)) + addK) / denom)).as("__s"))
    // left join restores blank documents (explode dropped them)
    df.select(id.as("__id")).join(scored, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(-col("__s") / col("n_tokens"), 4).as("cross_entropy"),
        round(exp(-col("__s") / col("n_tokens")), 2).as("perplexity"))
  }

  /** Stupid-backoff bigram LM scoring — Brants et al. 2007 ("Large
    * Language Models in Machine Translation"): the score of token w_i
    * after w_{i-1} is count(w_{i-1} w_i)/count(w_{i-1}) when the bigram
    * was seen, else alpha · S_uni(w_i); the first token and the unigram
    * fallback use the add-k smoothed relative frequency
    * (c + k)/(N + k·(V+1)) (the [[unigramPerplexity]] shape, so unseen
    * tokens stay finite). Stupid backoff deliberately does NOT normalize —
    * it is a score, not a distribution — which is exactly what makes it
    * the published web-scale choice: the model is nothing but two count
    * tables.
    *
    * Scale shape: the model is two DataFrames (unigram and bigram counts)
    * that NEVER leave the cluster — no vocab cap, no driver collect (one
    * 2-scalar action for N and V). Scoring is one scan producing
    * (first-token ∪ bigram-position) rows plus three hash joins against
    * the count frames — at gate size AQE broadcasts them, at 100 TB they
    * shuffle-join on token keys, both correct. Per-doc re-aggregation
    * ships 24-byte partials.
    *
    * Output mirrors [[unigramPerplexity]]: (idCol, n_tokens,
    * cross_entropy, perplexity), blank docs n_tokens=0 with NULLs. */
  def stupidBackoff(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, alpha: Double = 0.4, addK: Double = 0.5,
      minBigramCount: Long = 1L): org.apache.spark.sql.DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha in (0,1]")
    require(addK > 0, "addK > 0 (unsmoothed OOV would be ln 0)")
    require(minBigramCount >= 1, "minBigramCount >= 1")
    val id = col("`" + idCol.replace("`", "``") + "`")
    val text = col("`" + textCol.replace("`", "``") + "`")
    // the tokenized frame feeds four plan branches (unigram counts,
    // bigram counts, first-token rows, pair rows) — persist it so the
    // regex tokenizer runs one pass, not four (measured 11.4 s → 3.3 s on
    // the 10× bench). The block stays cached behind the returned lazy
    // DataFrame and is reclaimed by LRU eviction or
    // spark.sqlContext.clearCache(); a long-lived service scoring many
    // corpora should materialize each result and clear between corpora.
    val docs = df.select(id.as("__id"), tokens(normalized(text)).as("__t"))
      .persist()
    val toks = docs.select(explode(col("__t")).as("token"))
    val uni = toks.groupBy("token").agg(count(lit(1)).as("ucnt"))
    val nv = uni.agg(coalesce(sum("ucnt"), lit(0L)), count(lit(1))).head()
    val denomU = nv.getLong(0) + addK * (nv.getLong(1) + 1.0)
    // arrays_zip over two slices, NOT transform(sequence(...)): a lambda
    // referencing __t re-evaluates the tokenize expression PER ELEMENT
    // once CollapseProject inlines it (the documented SpanHashes trap,
    // O(tokens²·regex) per doc — measured 13.9 s vs 3.5 s on the 10×
    // bench); slice is an ordinary codegen'd expression, so the worst
    // case is tokenizing twice per row, linear either way
    val nm1 = size(col("__t")) - 1
    val pairs = docs.filter(size(col("__t")) >= 2)
      .select(col("__id"), explode(arrays_zip(
        slice(col("__t"), lit(1), nm1), slice(col("__t"), lit(2), nm1))).as("p"))
      .select(col("__id"), col("p").getField("0").as("w1"),
        col("p").getField("1").as("w2"))
    // count pruning (Brants et al. §4: web-scale models drop rare
    // n-grams): bigrams below the cutoff leave the model entirely and
    // their positions take the backoff path
    val bic = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("bcnt"))
      .filter(col("bcnt") >= minBigramCount)
    val firstTok = docs.filter(size(col("__t")) >= 1)
      .select(col("__id"), lit(null).cast("string").as("w1"),
        element_at(col("__t"), 1).as("w2"))
    // fold the w1-denominator join into the MODEL (bigram-table-sized,
    // once) so serving joins the token rows twice, not three times
    val bicScored = bic
      .join(uni.select(col("token").as("w1"), col("ucnt").as("u1")), "w1")
      .select(col("w1"), col("w2"),
        log(col("bcnt").cast("double") / col("u1")).as("__bscore"))
    val uni2 = uni.select(col("token").as("w2"), col("ucnt").as("u2"))
    val uniScore = log((coalesce(col("u2"), lit(0L)) + addK) / denomU)
    val rowScore =
      when(col("w1").isNull, uniScore)
      .when(col("__bscore").isNotNull, col("__bscore"))
      // product INSIDE the ln, matching the oracle bit-for-bit (ln a + ln x
      // differs in final ulps and could flip the 4-decimal rounding)
      .otherwise(log(lit(alpha) * (coalesce(col("u2"), lit(0L)) + addK) / denomU))
    val scored = firstTok.unionByName(pairs)
      .join(bicScored, Seq("w1", "w2"), "left")
      .join(uni2, Seq("w2"), "left")
      .groupBy("__id")
      .agg(count(lit(1)).as("n_tokens"), sum(rowScore).as("__s"))
    df.select(id.as("__id")).join(scored, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(-col("__s") / col("n_tokens"), 4).as("cross_entropy"),
        round(exp(-col("__s") / col("n_tokens")), 2).as("perplexity"))
  }

  /** Interpolated Kneser–Ney bigram LM scoring (Kneser & Ney 1995; Chen &
    * Goodman 1999 §3 — the smoothing family KenLM implements, which CCNet
    * uses for its perplexity-bucketed quality filter). Where
    * [[stupidBackoff]] discounts by a constant factor only on the backoff
    * path, KN subtracts an absolute discount `d` from every seen bigram and
    * redistributes that mass over the CONTINUATION distribution — P_cont
    * ranks a word by how many distinct contexts it follows, not how often
    * it occurs ("Francisco" is frequent but only ever follows "San", so its
    * continuation probability is tiny):
    *
    *   P(w2|w1) = (c(w1,w2) − d)/c(w1·) + d·N1+(w1·)/c(w1·) · Pc(w2)
    *   Pc(w2)   = (N1+(·w2) + k) / (N1+(··) + k·(V+1))
    *
    * with N1+ counting distinct bigram TYPES in the (count-pruned) model
    * and add-k smoothing on Pc so OOV tokens stay finite. A first token
    * scores ln Pc(w2); a position whose bigram was pruned below
    * `minBigramCount` keeps only the interpolation term (the standard
    * zero-numerator form); a context absent from the model entirely backs
    * off to Pc(w2).
    *
    * Scale shape mirrors [[stupidBackoff]]: the model is three
    * bigram-table-sized DataFrames — (w1,w2) discounted parts, per-context
    * (ctx, λ), per-word continuation counts — that never leave the cluster
    * (two bounded scalar actions: vocab size V, bigram type count T).
    * Serving is one corpus scan + three model-keyed hash joins
    * (AQE-broadcast at gate size, shuffle joins at 100 TB) and a per-doc
    * re-aggregation shipping 24-byte partials.
    *
    * Output mirrors [[unigramPerplexity]]: (idCol, n_tokens,
    * cross_entropy, perplexity), blank docs n_tokens=0 with NULLs. */
  def kneserNey(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, discount: Double = 0.75, addK: Double = 0.5,
      minBigramCount: Long = 1L): org.apache.spark.sql.DataFrame = {
    require(discount > 0 && discount < 1, "discount in (0,1)")
    require(addK > 0, "addK > 0 (unsmoothed OOV would be ln 0)")
    require(minBigramCount >= 1, "minBigramCount >= 1")
    val id = col("`" + idCol.replace("`", "``") + "`")
    val text = col("`" + textCol.replace("`", "``") + "`")
    // tokenized frame feeds three plan branches (vocab count, pair rows,
    // first-token rows) — persist so the tokenizer runs once (the same
    // measured trap stupidBackoff documents); reclaimed by LRU/clearCache
    val docs = df.select(id.as("__id"), tokens(normalized(text)).as("__t"))
      .persist()
    val nm1 = size(col("__t")) - 1
    // arrays_zip over two slices, not transform(sequence(...)) — see the
    // stupidBackoff comment (lambda re-evaluates the tokenizer per element)
    val pairs = docs.filter(size(col("__t")) >= 2)
      .select(col("__id"), explode(arrays_zip(
        slice(col("__t"), lit(1), nm1), slice(col("__t"), lit(2), nm1))).as("p"))
      .select(col("__id"), col("p").getField("0").as("w1"),
        col("p").getField("1").as("w2"))
    // count pruning before N1+ statistics: pruned types vanish from the
    // model, so both the context totals and the continuation counts see
    // only surviving bigrams (how pruned KenLM models renormalize).
    // The bigram table feeds FOUR plan branches (T action, context
    // totals, continuation counts, discounted parts) — persist it so the
    // pairs shuffle (the model's dominant job) runs once, not four times;
    // the table is model-sized (bigram types), cache-trivial, and the T
    // action below materializes it eagerly
    val bic = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("bcnt"))
      .filter(col("bcnt") >= minBigramCount)
      .persist()
    // two bounded scalar actions: V (unigram vocab) and T (bigram types)
    val vocabV = docs.select(explode(col("__t")).as("token"))
      .agg(count_distinct(col("token"))).head().getLong(0)
    val typesT = bic.count()
    val denomC = typesT + addK * (vocabV + 1.0)
    // model tables, all bigram-table-sized; expression shapes are kept
    // IDENTICAL to the DuckDB oracle so the doubles agree bit-for-bit
    val ctxTab = bic.groupBy("w1")
      .agg(sum("bcnt").as("ctx"), count(lit(1)).as("nfol"))
      .select(col("w1"), col("ctx"),
        (lit(discount) * col("nfol") / col("ctx")).as("__lam"))
    val bicPart = bic.join(ctxTab.select("w1", "ctx"), "w1")
      .select(col("w1"), col("w2"),
        ((col("bcnt") - lit(discount)) / col("ctx")).as("__part"))
    val preTab = bic.groupBy("w2").agg(count(lit(1)).as("npre"))
    val firstTok = docs.filter(size(col("__t")) >= 1)
      .select(col("__id"), lit(null).cast("string").as("w1"),
        element_at(col("__t"), 1).as("w2"))
    val pcSm = (coalesce(col("npre"), lit(0L)) + lit(addK)) / lit(denomC)
    val rowScore =
      when(col("w1").isNull, log(pcSm))
      .when(col("__lam").isNotNull,
        log(coalesce(col("__part"), lit(0.0)) + col("__lam") * pcSm))
      .otherwise(log(pcSm))
    val scored = firstTok.unionByName(pairs)
      .join(bicPart, Seq("w1", "w2"), "left")
      .join(ctxTab.select("w1", "__lam"), Seq("w1"), "left")
      .join(preTab, Seq("w2"), "left")
      .groupBy("__id")
      .agg(count(lit(1)).as("n_tokens"), sum(rowScore).as("__s"))
    df.select(id.as("__id")).join(scored, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(-col("__s") / col("n_tokens"), 4).as("cross_entropy"),
        round(exp(-col("__s") / col("n_tokens")), 2).as("perplexity"))
  }

  /** Linear text classifier score — the fasttext-shaped quality/domain
    * classifier every modern corpus pipeline runs (e.g. the "educational
    * value" / "wiki-like" filters): mean of per-token weights from a
    * trained vocabulary, squashed by a sigmoid. `weights` is the trained
    * (token → weight) table; out-of-vocabulary tokens contribute 0.
    *
    * The weight table rides the plan inside a native expression holding a
    * per-executor hash table (classifier vocabs are 10⁴-10⁵ entries —
    * executor-memory-trivial; a literal-map `element_at` would be a LINEAR
    * key scan per token at that size): scoring 100 TB shuffles nothing and
    * reads each document once. Tokens are matched on the
    * whitespace-normalized lowercased form. */
  def linearClassifierScore(c: Column, weights: Map[String, Double],
      bias: Double = 0.0): Column = {
    require(weights.nonEmpty, "weights must be non-empty")
    // null text scores like an empty document (mean 0 → sigmoid(bias)),
    // matching SQL engines where the token join simply finds no rows
    val toks = tokens(normalized(coalesce(c, lit(""))))
    val n = size(toks)
    val raw = graft.functions.TokenWeightSum.of(toks, weights)
    val mean = when(n === 0, lit(0.0)).otherwise(raw / n.cast("double"))
    round(lit(1.0) / (lit(1.0) + exp(-(mean + bias))), 4)
  }

  /** Gopher/MassiveText composite keep predicate — the full document-level
    * quality filter as ONE codegen'd boolean Column (token-count window,
    * mean-word-length window, symbol ratio, duplicate/bullet/ellipsis line
    * fractions, alphabetic-word fraction, stopword floor), with the
    * published defaults as parameters. Attach with `df.filter` (one scan,
    * no shuffle) or as a schema check via `gopherQuality`. The stopword
    * floor takes the BEST hit count across the supported language lists so
    * multilingual corpora aren't filtered to English only. */
  def gopherKeep(c: Column,
      minTokens: Int = 50, maxTokens: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxDupLineFrac: Double = 0.3,
      maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3,
      minAlphaWordFrac: Double = 0.8,
      minStopwordHits: Int = 2): Column = {
    val toks = tokens(c)
    val n = size(toks)
    val alphaWordFrac = when(n === 0, lit(0.0)).otherwise(round(
      size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("double") / n.cast("double"), 4))
    val hits = greatest(langHits(c).map(_._2): _*)
    n.between(minTokens, maxTokens) &&
      meanWordLength(c).between(minMeanWordLen, maxMeanWordLen) &&
      symbolWordRatio(c) <= maxSymbolRatio &&
      duplicateLineFraction(c) <= maxDupLineFrac &&
      bulletLineFraction(c) <= maxBulletFrac &&
      ellipsisLineFraction(c) <= maxEllipsisFrac &&
      alphaWordFrac >= minAlphaWordFrac &&
      hits >= minStopwordHits
  }

  /** C4-style line cleaning: keep only lines that end in a terminal
    * punctuation mark and carry at least `minLineWords` whitespace tokens
    * (the C4 "terminal punctuation" + short-line rules), re-joined with
    * newlines. Pure array expression — cleaning 100 TB is one scan. */
  def c4CleanLines(c: Column, minLineWords: Int = 3): Column = {
    val terminal = Seq(".", "!", "?", "\"")
    array_join(
      filter(split(c, "\n"), l =>
        terminal.map(p => trim(l).endsWith(p)).reduce(_ || _) &&
          size(split(trim(l), "\\s+")) >= minLineWords),
      "\n")
  }

  // ---- PII detection / redaction ----------------------------------------
  // Training corpora are routinely scrubbed of personally identifiable
  // information before use. Patterns are deliberately RE2-compatible (no
  // backreferences/lookaround) so the same regex runs identically in Spark,
  // DuckDB and most scrubbing tools; all detection/redaction is
  // regexp_extract_all / regexp_replace — codegen'd, one scan at any scale.

  /** PII kinds in REDACTION ORDER (earlier patterns are replaced first;
    * the patterns are mutually non-overlapping on digit shape: ssn is
    * 3-2-4, phone 3-3-4, ipv4 ≤3-per-octet with a trailing word boundary). */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4"  -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "ssn"   -> "\\b\\d{3}-\\d{2}-\\d{4}\\b",
    "phone" -> "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b")

  /** Occurrences of one PII kind. */
  def piiCount(c: Column, kind: String): Column = {
    val pat = piiPatterns.toMap.getOrElse(kind,
      sys.error(s"unknown PII kind '$kind' (known: ${piiPatterns.map(_._1).mkString(",")})"))
    size(regexp_extract_all(c, lit(pat), lit(0)))
  }

  /** Total PII occurrences across all kinds. */
  def piiTotal(c: Column): Column =
    piiPatterns.map { case (k, _) => piiCount(c, k) }.reduce(_ + _)

  /** Replace every PII occurrence with `<KIND>` tokens, applied in
    * `piiPatterns` order. */
  def redactPii(c: Column): Column =
    piiPatterns.foldLeft(c) { case (acc, (kind, pat)) =>
      regexp_replace(acc, pat, s"<${kind.toUpperCase}>")
    }

  // ---- schema-attachable checks ----------------------------------------
  /** No PII of any kind — attachable scrub gate for a text column. */
  def noPii(): ColumnCheck =
    ColumnCheck("no_pii", c => piiTotal(c) === 0, Map.empty)

  def gopherQuality(minTokens: Int = 50, maxTokens: Int = 100000): ColumnCheck =
    ColumnCheck("gopher_quality",
      c => gopherKeep(c, minTokens = minTokens, maxTokens = maxTokens),
      Map("min_tokens" -> minTokens, "max_tokens" -> maxTokens))
  def minTokens(n: Int): ColumnCheck =
    ColumnCheck("min_tokens", c => tokenCount(c) >= n, Map("min" -> n))
  def maxTokens(n: Int): ColumnCheck =
    ColumnCheck("max_tokens", c => tokenCount(c) <= n, Map("max" -> n))
  def minQuality(q: Double): ColumnCheck =
    ColumnCheck("min_quality", c => qualityScore(c) >= q, Map("min" -> q))
  def languageIn(langs: Seq[String]): ColumnCheck =
    ColumnCheck("language_in", c => languageId(c).isin(langs: _*),
      Map("allowed" -> langs))
  def maxDuplicateLineFraction(x: Double): ColumnCheck =
    ColumnCheck("max_duplicate_line_fraction",
      c => duplicateLineFraction(c) <= x, Map("max" -> x))
  def maxSymbolWordRatio(x: Double): ColumnCheck =
    ColumnCheck("max_symbol_word_ratio",
      c => symbolWordRatio(c) <= x, Map("max" -> x))
  def meanWordLengthBetween(lo: Double, hi: Double): ColumnCheck =
    ColumnCheck("mean_word_length_between",
      c => meanWordLength(c).between(lo, hi), Map("min" -> lo, "max" -> hi))
}
