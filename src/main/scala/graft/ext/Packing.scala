package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed token-budget "packs" (the
  * context-window filling step that turns a cleaned corpus into training
  * sequences — documents are concatenated until the next one would
  * overflow `maxTokens`, then a new pack starts; documents are never
  * split).
  *
  * Globally-greedy packing is inherently sequential, so the corpus is
  * first sharded into `numBuckets` deterministic buckets by an md5 key
  * hash (same engine-portable hash as [[Sampling.hashBucket]]); packing is
  * then greedy IN ID ORDER WITHIN EACH BUCKET. Each bucket's outcome
  * depends only on (bucket membership, id order, token counts) — never on
  * partitioning, task count, or retries — so the assignment is fully
  * reproducible and re-derivable in any engine, while the buckets
  * parallelize across the cluster. Waste vs a true global greedy pass is
  * at most one partial pack per bucket — negligible for
  * numBuckets ≪ corpus/maxTokens.
  *
  * This is the one operator family where an imperative per-partition scan
  * is the honest tool (running-sum-with-reset has no relational form):
  * rows are hash-partitioned by bucket and sorted (bucket, id) within
  * partitions, then a single O(1)-state pass assigns packs. Only
  * (bucket, id, n_tokens) — 20 bytes/row — moves through the one shuffle;
  * callers join the returned assignment back to the corpus by id.
  */
object Packing {

  /** Greedy packing of (idCol, tokensCol) rows into per-bucket packs.
    * Requires an integral id (castable to long). Returns
    * (idCol, bucket, pack, pack_pos, pack_offset):
    * `pack` numbers packs within a bucket, `pack_pos` the document's
    * position within its pack, `pack_offset` its starting token offset.
    * A document longer than `maxTokens` gets a pack of its own. */
  def packGreedy(df: DataFrame, idCol: String, tokensCol: String,
      maxTokens: Long, numBuckets: Int = 1024, seed: Long = 42L): DataFrame = {
    require(maxTokens > 0, "maxTokens > 0")
    require(numBuckets > 0, "numBuckets > 0")
    val spark = df.sparkSession
    import spark.implicits._
    def q(n: String) = col("`" + n.replace("`", "``") + "`")
    // fail FAST on a null id/token count (r17 review: a null reaching
    // the non-nullable tuple encoder below dies mid-stage with an opaque
    // executor NPE far from the contract violation; under ANSI a
    // malformed cast is already loud, this covers the null leg) —
    // raise_error rides the same codegen'd projection, no extra pass
    def notNull(c: Column, what: String): Column =
      when(c.isNull, raise_error(concat(
        lit(s"packGreedy: $what is null for id="),
        coalesce(q(idCol).cast("string"), lit("<null>"))))).otherwise(c)
    val keyed = df.select(
        Sampling.hashBucketInt(q(idCol), numBuckets, seed).as("bucket"),
        notNull(q(idCol).cast("long"), s"$idCol (or not castable to long)")
          .as("id"),
        notNull(q(tokensCol).cast("long"), tokensCol).as("ntok"))
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "id")
    keyed.as[(Int, Long, Long)].mapPartitions { it =>
      // hash partitioning puts every row of a bucket in one partition and
      // the sort makes the scan order (bucket, id): O(1) state suffices
      var curBucket = Int.MinValue
      var pack = -1L
      var acc = 0L
      var pos = -1
      it.map { case (b, id, n) =>
        if (b != curBucket) { curBucket = b; pack = -1L }
        // `acc > maxTokens - n` (not `acc + n > maxTokens`): no overflow
        // when n alone exceeds the budget
        if (pack < 0 || acc > maxTokens - n) { pack += 1; acc = 0L; pos = -1 }
        pos += 1
        val offset = acc
        acc += n
        (id, b, pack, pos, offset)
      }
    }.toDF("id", "bucket", "pack", "pack_pos", "pack_offset")
      .withColumnRenamed("id", idCol)
  }

  /** Concat-and-chunk packing (GPT-pretraining style): conceptually, every
    * document's tokens are CONCATENATED in id order into one corpus-wide
    * stream, and the stream is cut into fixed `seqLen`-token training
    * sequences — documents MAY straddle a cut (unlike [[packGreedy]],
    * which never splits a document and wastes the pack tails).
    *
    * Returns one row per (document × overlapped sequence):
    * (idCol, seq_id, doc_start, doc_end, seq_start) — the document's
    * token range [doc_start, doc_end) lands in sequence `seq_id` at
    * position `seq_start`. Concatenating a document's spans in seq_id
    * order reconstructs it exactly; every sequence except the final one
    * is exactly `seqLen` tokens. Zero-token documents produce no rows.
    * Ids must be unique (they define the global order).
    *
    * The only global state is each document's exclusive prefix sum of
    * token counts, computed scale-correctly in TWO passes instead of a
    * single-partition window: (1) bucket ids monotonically by
    * approx-quantile range boundaries and aggregate one token sum per
    * bucket (≤ `numBuckets` rows to the driver); (2) per-bucket window
    * cumsum + the driver-side exclusive bucket offsets as a literal map.
    * Bucket boundaries affect PARALLELISM ONLY — offsets are exact for
    * any monotone bucketing, so approxQuantile's error bound and
    * run-to-run sampling variance never touch the result. Per-row state
    * through the one shuffle is 16 bytes (id, ntok); the span explosion
    * emits ceil(ntok/seqLen)+1 rows max per document.
    *
    * `tokensCol` is evaluated in both the bucket-sum pass and the final
    * pass — if it is expensive (a tokenizer over raw text), persist the
    * slim (id, tokens) projection before calling. */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
      seqLen: Long, numBuckets: Int = 256): DataFrame = {
    require(seqLen > 0, "seqLen > 0")
    require(numBuckets > 0, "numBuckets > 0")
    def q(n: String) = col("`" + n.replace("`", "``") + "`")
    val base = df
      .select(q(idCol).cast("long").as("id"),
        q(tokensCol).cast("long").as("ntok"))
      .filter(col("ntok") > 0)
    // monotone bucketing: #boundaries strictly below id. relativeError
    // 0.01 only skews bucket sizes, never offsets.
    val bounds = base.stat
      .approxQuantile("id", (1 until numBuckets).map(_.toDouble / numBuckets).toArray, 0.01)
      .distinct.sorted
    val bucket: Column =
      if (bounds.isEmpty) lit(0)
      else aggregate(typedLit(bounds.toSeq), lit(0),
        (acc, b) => acc + when(col("id") > b, 1).otherwise(0))
    val withB = base.withColumn("bucket", bucket)
    val perBucket = withB.groupBy("bucket").agg(sum("ntok").as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val exclusive = perBucket.map(_._1)
      .zip(perBucket.map(_._2).scanLeft(0L)(_ + _)).toMap
    // ROWS frame, not the orderBy default RANGE (r17 review): under a
    // violated id-uniqueness contract, RANGE gives every tied id the
    // cumulative sum INCLUDING all tie rows — overlapping spans and
    // uncovered stream tokens, silently. ROWS keeps each row's prefix
    // sum distinct, so duplicate ids still produce a VALID disjoint
    // packing (their order among themselves is arbitrary); with unique
    // ids — the documented contract — the two frames are identical.
    val w = Window.partitionBy("bucket").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val off = (if (exclusive.isEmpty) lit(0L)
               else element_at(typedLit(exclusive), col("bucket"))) +
      sum("ntok").over(w) - col("ntok")
    withB.withColumn("off", off)
      // integer DIV, not floor(double /): exact at any corpus token count
      .withColumn("seq_id",
        explode(sequence(expr(s"off DIV $seqLen"),
          expr(s"(off + ntok - 1) DIV $seqLen"))))
      .select(col("id").as(idCol),
        col("seq_id").cast("long").as("seq_id"),
        greatest(col("seq_id") * seqLen - col("off"), lit(0L)).as("doc_start"),
        least(col("ntok"), (col("seq_id") + 1) * seqLen - col("off")).as("doc_end"),
        greatest(col("off") - col("seq_id") * seqLen, lit(0L)).as("seq_start"))
  }
}
