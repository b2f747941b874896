package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE merge-table TRAINING (Sennrich et al. 2016) — learn the
  * vocabulary itself from the corpus, not just apply one
  * ([[graft.functions.BpeEncode]] is the inference side).
  *
  * Scale shape — the classic trick that makes BPE training corpus-size-
  * independent: the corpus collapses to a (word, count) frequency table in
  * ONE scan + one vocabulary-sized shuffle (web-scale corpora have ~1e7-1e8
  * distinct words vs 1e12+ running words), and every merge iteration is a
  * single Spark job over that persisted table: re-encode each word with
  * the merges learned so far (the per-row merge loop), explode adjacent
  * symbol pairs weighted by word count, and take the global argmax with a
  * deterministic tie-break (count desc, pair asc) via TakeOrdered — one
  * aggregation with map-side partials, 1 row to the driver per iteration.
  * Driver work is O(numMerges) tiny results; the corpus is read exactly
  * once no matter how many merges are learned.
  */
object BpeTrain {

  /** Separator for pair keys: chr(1) never occurs inside a symbol (symbols
    * are substrings of `\w+` words or single punctuation chars). */
  private val Sep = "\u0001"

  /** Learn `numMerges` merges. `maxVocab` caps the frequency table (by
    * count desc, word asc) so a pathological corpus can't blow the
    * training table; merges are then learned over the most frequent words,
    * which is where all the pair mass sits anyway. */
  def learnMerges(df: DataFrame, textCol: String, numMerges: Int,
      lowercase: Boolean = true, maxVocab: Int = 1 << 20): Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges >= 0")
    val raw = col("`" + textCol.replace("`", "``") + "`")
    val text = if (lowercase) lower(coalesce(raw, lit(""))) else coalesce(raw, lit(""))
    val words = df
      .select(explode(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(maxVocab)
      .persist()
    try {
      var merges = Vector.empty[(String, String)]
      var exhausted = false
      while (merges.size < numMerges && !exhausted) {
        // symbols of each word under the merges learned so far (the text is
        // already lowercased/pre-tokenized, so encode verbatim)
        val syms = graft.functions.BpeEncode.of(col("w"), merges, lowercase = false)
        val pairs = when(size(syms) < 2, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), size(syms) - 1),
            i => concat(element_at(syms, i), lit(Sep), element_at(syms, i + 1))))
        val top = words
          .select(col("cnt"), explode(pairs).as("p"))
          .groupBy("p").agg(sum(col("cnt")).as("c"))
          .orderBy(col("c").desc, col("p")).limit(1)
          .collect()
        if (top.isEmpty) exhausted = true
        else {
          val parts = top.head.getString(0).split(Sep, 2)
          merges = merges :+ (parts(0) -> parts(1))
        }
      }
      merges
    } finally words.unpersist()
  }
}
