package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, key-based sampling and split assignment for training-data
  * pipelines (beyond-reference additions, SURVEY.md §2.F north star).
  *
  * `df.sample()` draws per-partition random bits: the selected set changes
  * with partition count, task retries, and engine version — unacceptable
  * when the sample defines a training set that must be reproducible and
  * auditable years later. Every operator here instead derives its decision
  * from a HASH OF THE ROW'S KEY, so membership is:
  *   - deterministic in (key, seed) — independent of partitioning, ordering,
  *     cluster size, retries, or AQE re-planning;
  *   - consistent across engines (md5 is universal — the same predicate
  *     re-evaluates identically in any SQL engine, so downstream systems can
  *     verify or re-derive the sample);
  *   - stable under incremental appends — a row's verdict never changes as
  *     the corpus grows, enabling exactly-once sample maintenance on a
  *     growing 100 TB corpus.
  *
  * Everything is a pure codegen'd expression over one scan: no shuffle, no
  * UDF, no state.
  */
object Sampling {

  private def q(n: String): Column = col("`" + n.replace("`", "``") + "`")

  /** Deterministic uniform double in [0,1) from (key, seed): the first 8
    * hex chars of md5 over "keyseed" as a 32-bit integer, scaled.
    * 32 bits gives fraction resolution of 2.3e-10 — far below any sampling
    * noise that matters. */
  def hashBucket(key: Column, seed: Long): Column =
    conv(substring(md5(concat_ws("", key.cast("string"), lit(seed.toString))),
      1, 8), 16, 10).cast("long").cast("double") / 4294967296.0

  /** Keep each row with probability `fraction`, decided by the key hash. */
  def sampleByKey(df: DataFrame, keyCol: String, fraction: Double,
      seed: Long = 42L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction in [0,1], got $fraction")
    df.filter(hashBucket(q(keyCol), seed) < fraction)
  }

  /** Stratified sampling with per-stratum fractions (the deterministic
    * counterpart of `df.stat.sampleBy`): rows in stratum s survive with
    * probability fractions(s), others with `defaultFraction`. One scan,
    * no shuffle — rebalancing a 100 TB corpus by language/source is a
    * filter, not an aggregation. */
  def stratifiedSampleByKey(df: DataFrame, keyCol: String, strataCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      seed: Long = 42L): DataFrame = {
    (fractions.values.toSeq :+ defaultFraction).foreach(f =>
      require(f >= 0 && f <= 1, s"fractions in [0,1], got $f"))
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (s, f)) =>
      when(q(strataCol) === lit(s), lit(f)).otherwise(acc)
    }
    df.filter(hashBucket(q(keyCol), seed) < frac)
  }

  /** Assign each row to one of `splits` (name, weight) by key hash —
    * train/validation/test partitioning that is reproducible, engine-
    * portable, and append-stable (a document keeps its split forever, so a
    * later crawl snapshot can never leak test documents into train).
    * Weights are normalized; assignment thresholds are the cumulative
    * weight prefix sums. Adds `splitCol` (default "split"). */
  def assignSplits(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)], seed: Long = 42L,
      splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "at least one split")
    splits.foreach { case (n, w) => require(w > 0, s"split '$n' weight > 0, got $w") }
    val total = splits.map(_._2).sum
    val b = hashBucket(q(keyCol), seed)
    val cum = splits.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
    // the last branch is the unconditional fallback so b == 1-ulp edge
    // cases (and float-sum drift) can never produce a null split
    val assigned = splits.init.zip(cum.init).foldRight(lit(splits.last._1)) {
      case (((name, _), hi), acc) => when(b < hi, lit(name)).otherwise(acc)
    }
    df.withColumn(splitCol, assigned)
  }
}
