package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable range joins via bucketization — the standard re-expression of
  * interval predicates as EQUI-joins: Spark's own planner turns a bare
  * inequality join into a broadcast nested loop (or a full cartesian per
  * key), O(|left|·|right|) — unpayable at 100 TB. Two forms:
  *
  *  - [[pointInInterval]]: `p.x BETWEEN i.lo AND i.hi` — intervals
  *    replicate to their ⌈len/bin⌉+1 buckets, points own exactly ONE
  *    bucket, so the equi-join needs no output dedup;
  *  - [[intervalOverlap]]: `aLo <= bHi AND bLo <= aHi` — BOTH sides
  *    replicate, and a pair is emitted only from its CANONICAL bucket
  *    (the bucket of the later start), restoring exactly-once.
  *
  * Cost: shuffle of the replicas; pick `binWidth` near the TYPICAL
  * interval length so replication stays O(1) per interval (the
  * attribution-window / IP-range / session-overlap cases all have
  * near-constant lengths). `maxBinsPerInterval` guards the degenerate
  * whole-axis interval — replication is refused LOUDLY, never silently
  * exploded (and never silently dropped: a bin count that overflows Long
  * also raises).
  *
  * Used with time columns: convert to epoch micros first (`unix_micros`);
  * the operators are unit-agnostic over longs. */
object RangeJoin {

  private def q(n: String): Column = col("`" + n.replace("`", "``") + "`")

  /** Reserved-name guard (r17 review: withColumn silently OVERWRITES, so
    * a caller column named __bucket/__nbins_* was destroyed in the output
    * — AsOfJoin requires its reserved names; these joins now do too). */
  private def requireFreeNames(what: String, dfs: DataFrame*): Unit =
    dfs.foreach(df => df.columns.foreach(c =>
      require(c != "__bucket" && !c.startsWith("__nbins_"),
        s"$what reserves the internal column names __bucket/__nbins_* — " +
          s"rename input column '$c'")))

  /** floorDiv semantics for negative axes: pmod-corrected INTEGER `div` —
    * the double-valued `/` operator would round the numerator to an IEEE
    * double first and mis-bucket axes past 2^53 (epoch nanos, 64-bit
    * ids), silently dropping true matches. */
  private def bucket(c: Column, binWidth: Long): Column =
    call_function("div", c - pmod(c, lit(binWidth)), lit(binWidth))

  /** Shared replication: one row per bucket the [lo, hi] interval
    * overlaps, bucket in `__bucket`, bin count in `__nbins_<tag>`.
    *
    * The guard projection is computed BELOW the explode (the sequence()
    * argument reads the already-checked row), so raise_error fires per
    * interval row before any bucket array is materialized — an interval
    * of 1e9 buckets would otherwise allocate its whole array (or overflow
    * sequence's length limit) before the refusal could run; RangeJoinSpec
    * pins this with a 1e12-bin interval that must fail fast, not OOM.
    * `nBins < 1` (possible only via Long overflow of the subtraction at
    * extreme axis spans ÷ tiny binWidth, since lo <= hi is pre-filtered)
    * ALSO raises — the overflow must not silently drop the interval. */
  private def replicate(df: DataFrame, loCol: String, hiCol: String,
      binWidth: Long, maxBinsPerInterval: Int, tag: String,
      opName: String): DataFrame = {
    val lo = q(loCol).cast("long")
    val hi = q(hiCol).cast("long")
    val nBins = bucket(hi, binWidth) - bucket(lo, binWidth) + 1
    df.filter(lo.isNotNull && hi.isNotNull && lo <= hi)
      .withColumn(s"__nbins_$tag",
        when(nBins > maxBinsPerInterval || nBins < 1,
          raise_error(concat(lit(s"$opName: interval spans more than " +
            s"$maxBinsPerInterval bins of width $binWidth — widen binWidth " +
            s"or pre-split the interval (interval bins: "),
            nBins.cast("string"), lit(")"))))
          .otherwise(nBins))
      .withColumn("__bucket",
        explode(sequence(bucket(lo, binWidth),
          bucket(lo, binWidth) + col(s"__nbins_$tag") - 1)))
  }

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
    requireFreeNames("pointInInterval", points, intervals)
    val x = q(xCol).cast("long")
    val pB = points.filter(x.isNotNull)
      .withColumn("__bucket", bucket(x, binWidth))
    val iGuarded = replicate(intervals, loCol, hiCol, binWidth,
      maxBinsPerInterval, "i", "pointInInterval")
    val joinCond = equiKeys.map { case (pk, ik) =>
      pB(pk) === iGuarded(ik) }.foldLeft(
        pB("__bucket") === iGuarded("__bucket"))(_ && _) &&
      pB(xCol).cast("long").between(
        iGuarded(loCol).cast("long"), iGuarded(hiCol).cast("long"))
    val dropCols = iGuarded("__bucket") +: iGuarded("__nbins_i") +:
      equiKeys.map { case (_, ik) => iGuarded(ik) }
    dropCols.foldLeft(
        pB.join(iGuarded, joinCond, "inner"))((df, c) => df.drop(c))
      .drop("__bucket", "__nbins_i")
  }

  /** Interval×interval OVERLAP join — `aLo <= bHi AND bLo <= aHi`
    * (inclusive), the session-overlap / concurrent-spans / IP-block-
    * intersection case [[pointInInterval]] cannot express. Both sides
    * replicate ([[replicate]]) and the join runs as a hash equi-join on
    * (equi-keys, bucket) + the exact overlap filter. An overlapping pair
    * shares up to min(nbinsA, nbinsB) buckets, so the pair is emitted
    * ONLY from its CANONICAL bucket — the bucket of `greatest(aLo, bLo)`,
    * the later start, which both sides' replica ranges provably contain
    * whenever the intervals overlap — making the output exactly-once with
    * no dedup pass. Output: every left column plus every right column
    * except the right equi-keys; left/right non-key column names must not
    * collide. */
  def intervalOverlap(left: DataFrame, leftLo: String, leftHi: String,
      right: DataFrame, rightLo: String, rightHi: String,
      equiKeys: Seq[(String, String)], binWidth: Long,
      maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, "binWidth > 0")
    require(maxBinsPerInterval >= 1, "maxBinsPerInterval >= 1")
    requireFreeNames("intervalOverlap", left, right)
    val lB = replicate(left, leftLo, leftHi, binWidth,
      maxBinsPerInterval, "l", "intervalOverlap")
    val rB = replicate(right, rightLo, rightHi, binWidth,
      maxBinsPerInterval, "r", "intervalOverlap")
    val aLo = lB(leftLo).cast("long"); val aHi = lB(leftHi).cast("long")
    val bLo = rB(rightLo).cast("long"); val bHi = rB(rightHi).cast("long")
    val joinCond = equiKeys.map { case (lk, rk) => lB(lk) === rB(rk) }
      .foldLeft(lB("__bucket") === rB("__bucket"))(_ && _) &&
      aLo <= bHi && bLo <= aHi &&
      // canonical-bucket condition: exactly-once emission
      lB("__bucket") === bucket(greatest(aLo, bLo), binWidth)
    val dropCols = rB("__bucket") +: rB("__nbins_r") +:
      equiKeys.map { case (_, rk) => rB(rk) }
    dropCols.foldLeft(
        lB.join(rB, joinCond, "inner"))((df, c) => df.drop(c))
      .drop("__bucket", "__nbins_l", "__nbins_r")
  }
}
