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
        // pairs aggregate as struct<l,r> — no separator encoding, so a
        // symbol containing ANY char (control chars included) stays exact;
        // struct ordering gives the same (count desc, pair asc) tie-break
        // the string key gave (r6 ADVICE: a U+0001 pre-token corrupted the
        // split and burned the remaining merge budget on a no-op merge)
        val pairs = when(size(syms) < 2, array().cast("array<struct<l:string,r:string>>"))
          .otherwise(transform(sequence(lit(1), size(syms) - 1),
            i => struct(element_at(syms, i).as("l"), element_at(syms, i + 1).as("r"))))
        val top = words
          .select(col("cnt"), explode(pairs).as("p"))
          .groupBy("p").agg(sum(col("cnt")).as("c"))
          .orderBy(col("c").desc, col("p")).limit(1)
          .collect()
        if (top.isEmpty) exhausted = true
        else {
          val p = top.head.getStruct(0)
          merges = merges :+ (p.getString(0) -> p.getString(1))
        }
      }
      merges
    } finally words.unpersist()
  }
}
