package graft.ext

import org.apache.spark.sql.DataFrame
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
    val keyed = df.select(
        Sampling.hashBucketInt(q(idCol), numBuckets, seed).as("bucket"),
        q(idCol).cast("long").as("id"),
        q(tokensCol).cast("long").as("ntok"))
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
}
