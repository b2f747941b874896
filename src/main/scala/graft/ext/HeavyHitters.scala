package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.MisraGriesSketch

/** Exact frequency-threshold mining ("heavy hitters") without ever
  * shuffling the full key space — the standard two-pass sketch pipeline:
  *
  *  1. ONE aggregation job computes a [[graft.functions.MisraGriesSketch]]
  *     candidate summary AND the total item count N. Misra–Gries
  *     guarantees every item with frequency > N/(capacity+1) is a
  *     candidate, so with capacity ≥ 1/phi the candidate set provably
  *     contains ALL true phi-heavy hitters (plus bounded false
  *     positives).
  *  2. A second exact pass counts ONLY rows matching the ≤ capacity
  *     candidates (a broadcast hash-set semi-filter pushed to the scan)
  *     and applies the exact `count ≥ phi·N` cut.
  *
  * The result is EXACT — identical to `groupBy(col).count().filter(...)`
  * — but the distinct-key set never materializes: state per task is
  * O(capacity), the first shuffle moves O(tasks·capacity) entries and the
  * second only the candidates' partial counts. On web-scale text the full
  * vocabulary (billions of tail tokens) would dominate the naive plan's
  * shuffle; here the tail never leaves the map side.
  *
  * Reference analogue: pandera has no sketch machinery; this generalizes
  * the `value_counts`-style checks (`checks/Check.scala` unique_values_eq)
  * to corpus scale.
  */
object HeavyHitters {

  private def q(n: String): Column = col("`" + n.replace("`", "``") + "`")

  /** Items of `column` with exact frequency ≥ phi·N (N = non-null count),
    * as (item, cnt) sorted (cnt desc, item asc). `capacity` defaults to
    * ceil(2/phi) — twice the guarantee bound, halving sketch error and
    * false-positive recount work. The candidate collect is bounded by
    * capacity (≤ a few thousand entries), never by data size. */
  def frequentItems(df: DataFrame, column: String, phi: Double,
      capacity: Int = 0): DataFrame = {
    require(phi > 0.0 && phi <= 1.0, "phi must be in (0, 1]")
    val cap = if (capacity > 0) capacity
      else math.max(math.ceil(2.0 / phi).toInt, 16)
    // MG keeps items with freq > N/(cap+1); an item AT the phi·N threshold
    // must also survive, so the inequality is strict: cap+1 > 1/phi
    require(cap.toDouble + 1.0 > 1.0 / phi,
      s"capacity $cap too small for phi=$phi: heavy hitters could be missed")

    // pass 1: sketch + N in one job
    val first = df.agg(
      MisraGriesSketch.of(q(column), cap).as("cand"),
      count(q(column)).as("n")).head()
    val n = first.getLong(1)
    if (n == 0L) {
      // empty input: zero-row frame with the output schema
      return df.select(q(column).as(column)).limit(0)
        .withColumn("cnt", lit(0L))
    }
    val candidates = first.getSeq[org.apache.spark.sql.Row](0).map(_.get(0))

    // pass 2: exact recount of candidates only; isin broadcasts the
    // bounded candidate list into the scan filter
    df.filter(q(column).isin(candidates: _*))
      .groupBy(q(column)).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= lit(phi) * lit(n))
      .orderBy(col("cnt").desc, q(column))
  }

  /** Exact heavy hitters per EVENT-TIME window — "trending items per
    * hour/day", the crawl-monitoring form of [[frequentItemsByGroup]]
    * (which it composes directly: the tumbling window start IS the
    * group). Same two jobs at any window count: one windowed
    * Misra–Gries + per-window N aggregation, then the broadcast-pruned
    * exact recount cut at `phi · N_window`. Output:
    * (window_start "yyyy-MM-dd HH:mm:ss", item column, cnt, n_group),
    * sorted (window asc, cnt desc, item asc). The streaming counterpart
    * with bounded estimates (no recount pass exists mid-stream) is
    * [[graft.streaming.StreamingValidation.windowedHeavyHitters]]. */
  def frequentItemsByWindow(df: DataFrame, tsCol: String, column: String,
      phi: Double, windowDur: String = "1 hour",
      capacity: Int = 0): DataFrame = {
    require(!df.columns.contains("__wstart") && !df.columns.contains("window_start"),
      "frequentItemsByWindow: __wstart/window_start are reserved column names")
    val ets = graft.functions.EventTime.eventTime(df, tsCol)
    val withW = df.withColumn("__wstart",
      date_format(window(ets, windowDur).getField("start"),
        "yyyy-MM-dd HH:mm:ss"))
    frequentItemsByGroup(withW, "__wstart", column, phi, capacity)
      .withColumnRenamed("__wstart", "window_start")
  }

  /** Per-group exact heavy hitters — [[frequentItems]] with an independent
    * phi threshold inside every `groupCol` partition (per-language /
    * per-domain frequency mining). Same two passes, nothing per-group on
    * the driver:
    *
    *  1. ONE aggregation computes every group's Misra–Gries candidates AND
    *     its item count N_g (the sketch is an ordinary aggregate, so
    *     `groupBy(group)` composes with it directly; map-side partials
    *     stay O(capacity) per group).
    *  2. The exploded (group, item) candidate frame — ≤ groups·capacity
    *     rows — BROADCASTS into an inner join that prunes the corpus to
    *     candidate rows, which recount exactly and cut at `phi · N_g`
    *     (N_g rides the broadcast, no extra join).
    *
    * The candidate frame must fit a broadcast (groups·capacity entries —
    * fine for the thousands-of-groups regime this targets; the corpus
    * itself is never collected anywhere and only candidate rows cross the
    * recount shuffle). Groups whose N_g = 0 (all-null items) emit
    * nothing. Output: (groupCol, item-column, cnt, n_group) sorted
    * (group asc, cnt desc, item asc). */
  def frequentItemsByGroup(df: DataFrame, groupCol: String, column: String,
      phi: Double, capacity: Int = 0): DataFrame = {
    require(phi > 0.0 && phi <= 1.0, "phi must be in (0, 1]")
    val cap = if (capacity > 0) capacity
      else math.max(math.ceil(2.0 / phi).toInt, 16)
    require(cap.toDouble + 1.0 > 1.0 / phi,
      s"capacity $cap too small for phi=$phi: heavy hitters could be missed")
    // internal names collide silently otherwise (r17 review — the sibling
    // frequentItemsByWindow already guards its __wstart)
    Seq("__cand", "__n", "__e", "__g", "__i").foreach(r =>
      require(!df.columns.contains(r),
        s"frequentItemsByGroup reserves the internal column name '$r'"))

    // pass 1: every group's sketch + N_g in one job; stays a DataFrame
    val cand = df.groupBy(q(groupCol))
      .agg(MisraGriesSketch.of(q(column), cap).as("__cand"),
        count(q(column)).as("__n"))
      .select(q(groupCol).as("__g"), explode(col("__cand")).as("__e"),
        col("__n"))
      .select(col("__g"), col("__e.item").as("__i"), col("__n"))

    // pass 2: candidate-pruned exact recount; the ≤ groups·capacity
    // candidate frame broadcasts, so corpus rows never shuffle unless
    // they match a candidate. NULL-SAFE on the group key (r17 review:
    // the using-columns inner join dropped the null group entirely —
    // pass 1 sketched it, pass 2's equi-join never matched it, and its
    // heavy hitters silently vanished; null is a legitimate group).
    // Items stay non-null-safe: count(column) skips nulls, so a null
    // item is never a candidate.
    df.join(broadcast(cand),
        q(groupCol) <=> col("__g") && q(column) === col("__i"))
      .groupBy(q(groupCol), q(column))
      .agg(count(lit(1)).as("cnt"), first(col("__n")).as("n_group"))
      .filter(col("cnt") >= lit(phi) * col("n_group"))
      .orderBy(q(groupCol), col("cnt").desc, q(column))
  }

  /** Sketch-only variant: the Misra–Gries candidates with their
    * (undercounted, within N/(capacity+1)) estimates — one job, no second
    * pass. For monitoring/triage where exactness doesn't matter. */
  def frequentItemsApprox(df: DataFrame, column: String,
      capacity: Int): DataFrame = {
    df.agg(MisraGriesSketch.of(q(column), capacity).as("cand"))
      .select(explode(col("cand")).as("e"))
      .select(col("e.item").as(column), col("e.est").as("est"))
  }
}
