package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE merge-table TRAINING (Sennrich et al. 2016) — learn the
  * vocabulary itself from the corpus, not just apply one
  * ([[graft.functions.BpeEncode]] is the inference side).
  *
  * Scale shape — the classic split every production BPE trainer uses
  * (SentencePiece, fastBPE, HuggingFace tokenizers): the corpus collapses
  * to a (word, count) frequency table in ONE distributed scan + one
  * vocabulary-sized shuffle (web-scale corpora have ~1e7-1e8 distinct words
  * vs 1e12+ running words; `maxVocab` caps the table), and the merge loop
  * then runs DRIVER-LOCALLY over that bounded table with incremental
  * pair-count maintenance — O(affected words) per merge via a pair→words
  * index and a lazy max-heap for the argmax, ZERO Spark jobs per merge.
  * Training 32k or 64k merges costs the same one corpus read as 8 merges;
  * the r7 shape (one Spark job PER merge — tens of thousands of sequential
  * driver round-trips at a real vocab size) is gone (r7 verdict #2; kept
  * below as [[learnMergesJobPerMerge]], the reference oracle the
  * equivalence spec checks the local loop against).
  *
  * Exactness: the local loop re-encodes affected words from characters
  * with the same lowest-rank loop [[graft.functions.BpeEncode]] uses, so
  * the learned merges are IDENTICAL to the job-per-merge formulation
  * (asserted in ExtSpec; the `text_bpe_train` golden pin is unchanged).
  * Ties break (count desc, pair asc) with pairs compared by codepoint —
  * the same order the struct<l,r> UTF8String sort gave.
  *
  * Memory: O(vocab) driver-side — the capped table itself (symbols are
  * interned, so a 1M-word table is tens of MB), the same boundedness
  * contract as [[LocalKMeans]] quantizer training.
  */
object BpeTrain {

  /** codepoint-order string compare (= UTF-8 byte order) — matches the
    * UTF8String binary ordering the distributed struct<l,r> sort used;
    * Java's String.compareTo (UTF-16 code-unit order) differs for
    * supplementary-plane codepoints. */
  private def cpCompare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  private def pairCompare(a: (String, String), b: (String, String)): Int = {
    val c = cpCompare(a._1, b._1)
    if (c != 0) c else cpCompare(a._2, b._2)
  }

  /** The (word, count) frequency table: ONE corpus scan + one
    * vocabulary-sized shuffle, capped at `maxVocab` (count desc, word asc). */
  private def wordCounts(df: DataFrame, textCol: String, lowercase: Boolean,
      maxVocab: Int): DataFrame = {
    val raw = col("`" + textCol.replace("`", "``") + "`")
    val text = if (lowercase) lower(coalesce(raw, lit(""))) else coalesce(raw, lit(""))
    df.select(explode(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(maxVocab)
  }

  /** Learn `numMerges` merges. `maxVocab` caps the frequency table (by
    * count desc, word asc) so a pathological corpus can't blow the
    * training table; merges are then learned over the most frequent words,
    * which is where all the pair mass sits anyway. */
  def learnMerges(df: DataFrame, textCol: String, numMerges: Int,
      lowercase: Boolean = true, maxVocab: Int = 1 << 20): Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges >= 0")
    // the ONLY distributed work: the capped frequency table (TakeOrdered —
    // one job); everything below is driver-local over ≤ maxVocab rows
    val table = wordCounts(df, textCol, lowercase, maxVocab).collect()
    learnMergesLocal(table.map(r => (r.getString(0), r.getLong(1))), numMerges)
  }

  /** Exact local merge loop over the collected (word, count) table. */
  private def learnMergesLocal(table: Array[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    val intern = new java.util.HashMap[String, String]()
    def it(s: String): String = {
      val got = intern.putIfAbsent(s, s)
      if (got == null) s else got
    }

    val n = table.length
    val cnts = table.map(_._2)
    // rank map shared by every re-encode; grows one entry per learned merge
    val rank = new java.util.HashMap[(String, String), Integer]()
    // current encoding of each word under the merges learned so far —
    // exactly BpeEncode's lowest-rank(-then-leftmost) loop
    def encodeFromChars(word: String): Array[String] = {
      var parts = new java.util.ArrayList[String](word.length)
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        val w = Character.charCount(cp)
        parts.add(it(word.substring(i, i + w)))
        i += w
      }
      while (parts.size > 1) {
        var bestRank = Int.MaxValue
        var bestAt = -1
        var j = 0
        while (j < parts.size - 1) {
          val r = rank.get((parts.get(j), parts.get(j + 1)))
          if (r != null && r < bestRank) { bestRank = r; bestAt = j }
          j += 1
        }
        if (bestAt < 0) return parts.toArray(new Array[String](parts.size))
        val merged = new java.util.ArrayList[String](parts.size - 1)
        j = 0
        while (j < parts.size) {
          if (j == bestAt) { merged.add(it(parts.get(j) + parts.get(j + 1))); j += 2 }
          else { merged.add(parts.get(j)); j += 1 }
        }
        parts = merged
      }
      parts.toArray(new Array[String](parts.size))
    }

    val syms = new Array[Array[String]](n)
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    // lazy max-heap: (count, pair) pushed on every count change; stale
    // entries (count != current) discard on pop — the standard trick that
    // keeps per-merge cost O(affected · log) instead of a full table scan
    val heapOrd = new java.util.Comparator[(Long, (String, String))] {
      def compare(x: (Long, (String, String)), y: (Long, (String, String))): Int = {
        val c = java.lang.Long.compare(y._1, x._1) // count desc
        if (c != 0) c else pairCompare(x._2, y._2) // pair asc
      }
    }
    val heap = new java.util.PriorityQueue[(Long, (String, String))](64, heapOrd)

    def addWord(w: Int): Unit = {
      val s = syms(w); val c = cnts(w)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val nc = pairCount.getOrElse(p, 0L) + c
        pairCount(p) = nc
        pairWords.getOrElseUpdate(p, mutable.Set.empty) += w
        heap.add((nc, p))
        j += 1
      }
    }
    def removeWord(w: Int): Unit = {
      val s = syms(w); val c = cnts(w)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val nc = pairCount(p) - c
        if (nc <= 0L) { pairCount.remove(p); pairWords.remove(p) }
        else {
          pairCount(p) = nc
          heap.add((nc, p))
          pairWords(p) -= w
        }
        j += 1
      }
    }

    var w = 0
    while (w < n) { syms(w) = encodeFromChars(table(w)._1); addWord(w); w += 1 }

    var merges = Vector.empty[(String, String)]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      // pop to the first non-stale entry = exact (count desc, pair asc) argmax
      var top: (Long, (String, String)) = null
      while (top == null && !heap.isEmpty) {
        val cand = heap.poll()
        if (pairCount.get(cand._2).contains(cand._1)) top = cand
      }
      if (top == null) exhausted = true
      else {
        val p = top._2
        merges = merges :+ p
        rank.put(p, Int.box(merges.size - 1))
        // only words currently containing the adjacent pair can change;
        // re-encode them from characters with the grown rank table — the
        // exact BpeEncode fixpoint, including rank-order subtleties
        val affected = pairWords.get(p).map(_.toArray).getOrElse(Array.empty)
        java.util.Arrays.sort(affected)
        affected.foreach { w0 =>
          removeWord(w0)
          syms(w0) = encodeFromChars(table(w0)._1)
          addWord(w0)
        }
        // the merged pair itself must be gone from the live counts
        pairCount.remove(p).foreach(_ => pairWords.remove(p))
      }
    }
    merges
  }

  /** r7 reference formulation — one Spark job per merge (re-encode the
    * frequency table under merges-so-far, explode pairs, TakeOrdered(1)).
    * Correct but a driver round-trip bottleneck at real vocab sizes
    * (32k-64k merges); kept ONLY as the oracle the ExtSpec equivalence
    * test pins [[learnMerges]]'s local loop against. */
  private[graft] def learnMergesJobPerMerge(df: DataFrame, textCol: String,
      numMerges: Int, lowercase: Boolean = true,
      maxVocab: Int = 1 << 20): Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges >= 0")
    val words = wordCounts(df, textCol, lowercase, maxVocab).persist()
    try {
      var merges = Vector.empty[(String, String)]
      var exhausted = false
      while (merges.size < numMerges && !exhausted) {
        val syms = graft.functions.BpeEncode.of(col("w"), merges, lowercase = false)
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
