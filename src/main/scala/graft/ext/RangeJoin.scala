package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable point-in-interval (range) join via bucketization — the
  * standard re-expression of `p.x BETWEEN i.lo AND i.hi` as an EQUI-join:
  * Spark's own planner turns a bare inequality join into a broadcast
  * nested loop (or a full cartesian per key), O(|points|·|intervals|) —
  * unpayable at 100 TB. Here every interval replicates to the ⌈len/bin⌉+1
  * buckets it overlaps, every point maps to exactly ONE bucket, and the
  * join runs as an ordinary hash equi-join on (equi-keys, bucket) followed
  * by the exact containment filter. Because a point owns a single bucket,
  * no output dedup is needed.
  *
  * Cost: shuffle of |points| + Σ⌈len/bin⌉ interval replicas; pick
  * `binWidth` near the TYPICAL interval length so replication stays O(1)
  * per interval (the attribution-window / IP-range / session-overlap
  * cases all have near-constant lengths). `maxBinsPerInterval` guards the
  * degenerate whole-axis interval — replication is refused, not silently
  * exploded.
  *
  * Used with time columns: convert to epoch micros first (`unix_micros`);
  * the operator is unit-agnostic over longs. */
object RangeJoin {

  private def q(n: String): Column = col("`" + n.replace("`", "``") + "`")

  /** Inner join: one output row per (point, interval) pair with equal
    * equi-keys and `lo <= x <= hi` (inclusive both ends). `equiKeys` maps
    * point-side name → interval-side name; output carries the point
    * columns plus the interval columns (interval-side equi-keys dropped —
    * they equal the point side's). Null x / lo / hi never match. */
  def pointInInterval(points: DataFrame, xCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      equiKeys: Seq[(String, String)], binWidth: Long,
      maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, "binWidth > 0")
    require(maxBinsPerInterval >= 1, "maxBinsPerInterval >= 1")
    val x = q(xCol).cast("long")
    val lo = q(loCol).cast("long")
    val hi = q(hiCol).cast("long")
    // floorDiv semantics for negative axes: pmod-corrected INTEGER `div`
    // — the double-valued `/` operator would round the numerator to an
    // IEEE double first and mis-bucket axes past 2^53 (epoch nanos,
    // 64-bit ids), silently dropping true matches
    def bucket(c: Column): Column =
      call_function("div", c - pmod(c, lit(binWidth)), lit(binWidth))
    val pB = points.filter(x.isNotNull).withColumn("__bucket", bucket(x))
    val nBins = bucket(hi) - bucket(lo) + 1
    // refuse silent explosion: a degenerate interval spanning the axis
    // would replicate without bound. The guard projection is computed
    // BELOW the explode (the sequence() argument reads the already-
    // checked row), so raise_error fires per interval row before any
    // bucket array is materialized — an interval of 1e9 buckets would
    // otherwise allocate its whole array (or overflow sequence's length
    // limit) before the refusal could run; RangeJoinSpec pins this with a
    // 1e12-bin interval that must fail fast, not OOM.
    val iGuarded = intervals
      .filter(lo.isNotNull && hi.isNotNull && lo <= hi)
      .withColumn("__nbins",
        when(nBins > maxBinsPerInterval,
          raise_error(concat(lit(s"pointInInterval: interval spans more than " +
            s"$maxBinsPerInterval bins of width $binWidth — widen binWidth " +
            s"or pre-split the interval (interval bins: "),
            nBins.cast("string"), lit(")"))))
          .otherwise(nBins))
      .filter(col("__nbins") >= 1)
      .withColumn("__bucket",
        explode(sequence(bucket(lo), bucket(lo) + col("__nbins") - 1)))
    val joinCond = equiKeys.map { case (pk, ik) =>
      pB(pk) === iGuarded(ik) }.foldLeft(
        pB("__bucket") === iGuarded("__bucket"))(_ && _) &&
      pB(xCol).cast("long").between(
        iGuarded(loCol).cast("long"), iGuarded(hiCol).cast("long"))
    val dropCols = iGuarded("__bucket") +: iGuarded("__nbins") +:
      equiKeys.map { case (_, ik) => iGuarded(ik) }
    dropCols.foldLeft(
        pB.join(iGuarded, joinCond, "inner"))((df, c) => df.drop(c))
      .drop("__bucket", "__nbins")
  }

  /** Interval×interval OVERLAP join — `aLo <= bHi AND bLo <= aHi`
    * (inclusive), the session-overlap / concurrent-spans / IP-block-
    * intersection case [[pointInInterval]] cannot express. Same
    * bucketization: BOTH sides replicate to their ⌈len/bin⌉+1 buckets and
    * the join runs as a hash equi-join on (equi-keys, bucket) + the exact
    * overlap filter. An overlapping pair shares up to min(nbinsA, nbinsB)
    * buckets, so the pair is emitted ONLY from its CANONICAL bucket — the
    * bucket of `greatest(aLo, bLo)`, the later start, which both sides'
    * replica ranges provably contain whenever the intervals overlap —
    * making the output exactly-once with no dedup pass (the dedup a
    * groupBy over all pair replicas would otherwise pay).
    *
    * Cost: shuffle of both sides' replicas; the same `binWidth` guidance
    * and `maxBinsPerInterval` degenerate-interval refusal as
    * [[pointInInterval]] apply to BOTH sides. Output: every left column
    * plus every right column except the right equi-keys (equal to the
    * left side's by the join). Left/right non-key column names must not
    * collide. */
  def intervalOverlap(left: DataFrame, leftLo: String, leftHi: String,
      right: DataFrame, rightLo: String, rightHi: String,
      equiKeys: Seq[(String, String)], binWidth: Long,
      maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, "binWidth > 0")
    require(maxBinsPerInterval >= 1, "maxBinsPerInterval >= 1")
    def bucket(c: Column): Column =
      call_function("div", c - pmod(c, lit(binWidth)), lit(binWidth))
    def replicate(df: DataFrame, loCol: String, hiCol: String,
        side: String): DataFrame = {
      val lo = q(loCol).cast("long")
      val hi = q(hiCol).cast("long")
      val nBins = bucket(hi) - bucket(lo) + 1
      df.filter(lo.isNotNull && hi.isNotNull && lo <= hi)
        .withColumn(s"__nbins_$side",
          when(nBins > maxBinsPerInterval,
            raise_error(concat(lit(s"intervalOverlap: interval spans more " +
              s"than $maxBinsPerInterval bins of width $binWidth — widen " +
              s"binWidth or pre-split (interval bins: "),
              nBins.cast("string"), lit(")"))))
            .otherwise(nBins))
        .filter(col(s"__nbins_$side") >= 1)
        .withColumn("__bucket",
          explode(sequence(bucket(lo), bucket(lo) + col(s"__nbins_$side") - 1)))
    }
    val lB = replicate(left, leftLo, leftHi, "l")
    val rB = replicate(right, rightLo, rightHi, "r")
    val aLo = lB(leftLo).cast("long"); val aHi = lB(leftHi).cast("long")
    val bLo = rB(rightLo).cast("long"); val bHi = rB(rightHi).cast("long")
    val joinCond = equiKeys.map { case (lk, rk) => lB(lk) === rB(rk) }
      .foldLeft(lB("__bucket") === rB("__bucket"))(_ && _) &&
      aLo <= bHi && bLo <= aHi &&
      // canonical-bucket condition: exactly-once emission
      lB("__bucket") === bucket(greatest(aLo, bLo))
    val dropCols = rB("__bucket") +: rB(s"__nbins_r") +:
      equiKeys.map { case (_, rk) => rB(rk) }
    dropCols.foldLeft(
        lB.join(rB, joinCond, "inner"))((df, c) => df.drop(c))
      .drop("__bucket", "__nbins_l", "__nbins_r")
  }
}
