package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (beyond-reference
  * additions). Every variant is built from the same scale template:
  *
  *   signature (narrow, codegen'd per-row expressions)
  *     → candidate generation (ONE shuffle: explode band/bucket keys +
  *        self-join on the bucket key — never an O(n²) cross join)
  *     → exact verification (computed only on candidate pairs).
  *
  * At 100 TB the bucket join is the only wide operation, and its key-space
  * (band hash) is uniform by construction, so it partitions evenly.
  */
object Dedup {

  private def q(n: String): Column = col("`" + n.replace("`", "``") + "`")

  /** Exact duplicate statistics on a key set: one hash-aggregate pass.
    * Returns a 1-row DataFrame (n_total, n_distinct, n_dup_rows). */
  def exactStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val key = if (cols.size == 1) q(cols.head)
              else xxhash64(cols.map(q): _*)
    df.groupBy(key.as("k")).agg(count(lit(1)).as("c"))
      .agg(
        coalesce(sum(col("c")), lit(0L)).as("n_total"),
        count(lit(1)).as("n_distinct"),
        coalesce(sum(when(col("c") > 1, col("c") - 1)), lit(0L)).as("n_dup_rows"))
  }

  /** Exact dedup: keep one row per key (hash-groupBy semantics of
    * dropDuplicates — map-side partial aggregation, one shuffle). */
  def dropExact(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  /** Word k-shingles of a text column, distinct. */
  def shingles(text: Column, k: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    val sh = when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
      .otherwise(array(concat_ws(" ", toks)))
    array_distinct(sh)
  }

  /** MinHash signature: numHashes permutations approximated by seeded
    * xxhash64; sig[i] = min over shingles of hash_i(shingle). Pure
    * expression — computed in the scan, no UDF, no shuffle. */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingleCol, s => xxhash64(s, i))))

  /** LSH band keys from a signature: bands × rowsPerBand = numHashes;
    * near-dup pairs agree on at least one full band whp. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        xxhash64(concat_ws(",",
          transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
            x => x.cast("string"))), b).as("bucket")))

  /** MinHash+LSH near-duplicate pairs.
    * shingle → minhash → band → bucket self-join → exact-Jaccard verify.
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")
    val base = df.select(q(idCol).as("id"),
        shingles(q(textCol), shingleK).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    val banded = base
      .select(col("id"), col("sh"),
        explode(bandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("id"), col("sh"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    val a = banded.as("a"); val b = banded.as("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
    candidates
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash of a text column: per-token hash bits vote ±1, sign of
    * each bit-sum becomes the bit. Pure expressions (aggregate/zip_with). */
  def simhash64(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    val votes = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          i => when(call_function("shiftright", xxhash64(t), i).bitwiseAND(1) === 1, 1).otherwise(-1)),
        (x, y) => x + y))
    aggregate(sequence(lit(0), lit(63)), lit(0L),
      (acc, i) => acc +
        when(element_at(votes, i + 1) > 0, call_function("shiftleft", lit(1L), i)).otherwise(0L))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming (< 4):
    * 4 × 16-bit chunk bucketing guarantees candidates share a chunk
    * (pigeonhole), then exact bit_count verify. */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk bucketing covers hamming <= 3")
    val base = df.select(q(idCol).as("id"), simhash64(q(textCol)).as("sh"))
    val chunked = base.select(col("id"), col("sh"),
        explode(transform(sequence(lit(0), lit(3)),
          j => struct(j.as("cid"),
            call_function("shiftright", col("sh"), j * 16).bitwiseAND(0xFFFFL).as("ck")))).as("c"))
      .select(col("id"), col("sh"), col("c.cid").as("cid"), col("c.ck").as("ck"))
    val a = chunked.as("a"); val b = chunked.as("b")
    a.join(b, col("a.cid") === col("b.cid") && col("a.ck") === col("b.ck") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** N-gram Jaccard similarity pairs via an inverted index (scale path):
    * explode shingles → drop shingles with document frequency > maxDf
    * (stop-shingles dominate the join otherwise) → join on shingle →
    * candidate pairs → exact Jaccard on full shingle sets.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      threshold: Double = 0.5,
      maxDf: Long = 1000L): DataFrame = {
    val base = df.select(q(idCol).as("id"), shingles(q(textCol), shingleK).as("sh"))
    val inverted = base.select(col("id"), explode(col("sh")).as("s"))
    val filtered = inverted.join(
      inverted.groupBy("s").agg(count(lit(1)).as("df_count"))
        .filter(col("df_count") <= maxDf && col("df_count") > 1),
      "s")
    val cand = filtered.as("a").join(filtered.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .join(base.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Embedding near-duplicate pairs: cosine >= threshold.
    * Baseline: block-nested cross join (only for bounded corpora).
    * Scale path: random-hyperplane LSH bucketing (Similarity.lshBuckets)
    * then exact cosine verify within buckets.
    */
  def embeddingCosinePairs(
      df: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double = 0.95,
      useLsh: Boolean = true,
      lshBits: Int = 12): DataFrame = {
    val base = df.select(q(idCol).as("id"), q(embCol).as("v"))
    val pairs =
      if (useLsh) {
        val sigd = base.withColumn("sig",
          Similarity.hyperplaneSignature(col("v"), lshBits))
        sigd.as("a").join(sigd.as("b"),
            col("a.sig") === col("b.sig") && col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
            col("a.v").as("va"), col("b.v").as("vb"))
      } else {
        base.as("a").crossJoin(base.as("b"))
          .filter(col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
            col("a.v").as("va"), col("b.v").as("vb"))
      }
    pairs
      .withColumn("cosine", round(Similarity.cosine(col("va"), col("vb")), 4))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
