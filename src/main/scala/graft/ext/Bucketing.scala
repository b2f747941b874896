package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed (pre-shuffled) table layout + co-located joins — the Spark
  * answer to "this join's shuffle is the bottleneck and we run it every
  * day". A table written `bucketBy(n, keys)` is hash-partitioned into a
  * fixed number of files per partition AT WRITE TIME; a later equi-join
  * of two tables bucketed on the same keys with the same bucket count
  * satisfies both sides' required distribution straight off the scan, so
  * the sort-merge join plans with ZERO Exchange nodes — the 100 TB fact
  * tables are shuffled once at ingest and never again, however many
  * join/groupBy consumers run afterwards. `sortBy` on the same keys
  * additionally pre-sorts each bucket file so the join's Sort nodes read
  * for free.
  *
  * This is a deployment-layout operator like [[graft.ext.ZOrder]] (which
  * optimizes SKIPPING; bucketing optimizes SHUFFLE REUSE): pay one range
  * of cost at write, amortize over every downstream query. Bucket
  * metadata lives in the session catalog, so readers must come through
  * `spark.table(name)` — a bare `spark.read.parquet(path)` sees the same
  * rows but loses the distribution guarantee.
  *
  * Scale notes: pick `numBuckets` so one bucket of the LARGEST bucketed
  * table fits an executor's memory comfortably (buckets are the minimum
  * read parallelism per partition); both join sides must agree on it.
  * The co-located plan holds under AQE (AQE never inserts an exchange
  * that isn't required) and composes with groupBy on the bucket keys —
  * the aggregation also runs exchange-free.
  */
object Bucketing {

  private def q(n: String): Column = col("`" + n.replace("`", "``") + "`")

  /** Write `df` as an external bucketed parquet table `name` at `path`,
    * hash-bucketed into `numBuckets` by `bucketCols` (and bucket-sorted
    * by them, so downstream sort-merge joins skip their Sort too).
    * Replaces any previous registration of `name`.
    *
    * The pre-write `repartition(numBuckets, bucketCols)` uses the SAME
    * Murmur3 hash as the bucket assignment, so every bucket lands in
    * exactly ONE file — the precondition for Spark to trust the
    * per-bucket sort order. Sort-order trust itself sits behind
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` (off by
    * default since 3.0 because MULTI-file buckets would be read as
    * falsely-sorted); with the flag on and this writer's single-file
    * buckets, the co-located join is a pure zip-merge with NO Sort
    * nodes at all (spec-asserted). Without the flag the Exchange still
    * vanishes — the scale-dominant win — and each side re-sorts its
    * partitions locally. */
  def writeBucketed(df: DataFrame, name: String, path: String,
      bucketCols: Seq[String], numBuckets: Int): Unit = {
    require(bucketCols.nonEmpty, "writeBucketed: at least one bucket column")
    require(numBuckets > 0, s"writeBucketed: numBuckets must be > 0, got $numBuckets")
    val spark = df.sparkSession
    // backtick-escape the identifier (r17 review: a raw interpolation let
    // a name containing a backtick produce malformed/injectable SQL while
    // saveAsTable below would have accepted the same name)
    spark.sql(s"DROP TABLE IF EXISTS `${name.replace("`", "``")}`")
    df.repartition(numBuckets, bucketCols.map(q): _*)
      .write
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .mode("overwrite")
      .saveAsTable(name)
  }

  /** Equi-join two bucketed catalog tables on `keys`, forcing the
    * co-located sort-merge path (broadcast is suppressed for the join so
    * the gate proves the BUCKETED property, not a small-side fallback).
    * Callers at real scale can drop the suppression — a broadcastable
    * side is cheaper still. */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKeys: Seq[String], rightKeys: Seq[String],
      joinType: String = "inner"): DataFrame = {
    require(leftKeys.nonEmpty, "colocatedJoin: at least one key column")
    require(leftKeys.size == rightKeys.size,
      "colocatedJoin: leftKeys and rightKeys must pair up")
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    // backtick-quoted resolution (r17 review: l(lk) treats a dotted key
    // name as nested-field access and fails UNRESOLVED_COLUMN on a column
    // writeBucketed happily bucketed on)
    def qn(n: String) = "`" + n.replace("`", "``") + "`"
    val cond = leftKeys.zip(rightKeys)
      .map { case (lk, rk) => l(qn(lk)) === r(qn(rk)) }.reduce(_ && _)
    // hint-level suppression (scoped to THIS join, not session config):
    // merge-hint both sides so the planner picks sort-merge over
    // broadcast even when one side is tiny
    l.hint("merge").join(r.hint("merge"), cond, joinType)
  }

  /** Number of shuffle Exchange nodes in the physical plan (0 for a
    * fully co-located join/aggregation). String-level scan of the
    * executed plan — AQE wraps the plan but prints its exchanges. */
  def shuffleExchangeCount(df: DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).size

  /** True iff the plan contains no shuffle Exchange of any kind. */
  def isShuffleFree(df: DataFrame): Boolean = {
    val p = df.queryExecution.executedPlan.toString
    !p.contains("Exchange hashpartitioning") &&
      !p.contains("Exchange rangepartitioning") &&
      !p.contains("Exchange RoundRobinPartitioning") &&
      !p.contains("Exchange SinglePartition")
  }
}
