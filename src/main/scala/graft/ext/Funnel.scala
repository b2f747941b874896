package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis — "how many users signed up, then viewed,
  * then purchased, in that order?" A user completes step k when an event
  * of step k's type exists at-or-after their completion time of step k−1
  * (the earliest such event becomes the completion time, the standard
  * earliest-completion semantics).
  *
  * Plan shape: one keyed aggregation per step — step k filters the event
  * scan to its type, joins the (user, t_{k-1}) frame from the previous
  * step (user-count-sized, broadcastable; at 100 TB a hash join on the
  * user key), and takes min(ts ≥ t_{k-1}) per user. k small and fixed, so
  * the whole funnel is k passes over the (type-filtered, column-pruned)
  * events scan — no per-user event collection, no unbounded state, no
  * window sort over the full event log. */
object Funnel {

  private def q(n: String): Column = col("`" + n.replace("`", "``") + "`")

  /** Returns one row per step: (step [1-based], step_name, n_users =
    * users who completed steps 1..k in order). Null timestamps and null
    * users never participate.
    *
    * Memory note: the single-action fusion pins all k step frames in
    * cache until the union action finishes — peak footprint ≈ k ·
    * |distinct users| rows of (user, ts). Funnels are short (k ≤ ~10) and
    * the frames are two thin columns, so this trades a few user-count
    * frames for k-1 fewer Spark actions; a pathologically long funnel on
    * a memory-starved cluster can fall back to per-step evaluation by
    * calling funnel() per prefix. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel: at least one step")
    require(steps.distinct.size == steps.size, "funnel: steps must be distinct")
    val base = events
      .filter(q(userCol).isNotNull && q(tsCol).isNotNull &&
        q(typeCol).isin(steps: _*))
      .select(q(userCol).as("__u"), q(typeCol).as("__t"), q(tsCol).as("__ts"))
    val spark = events.sparkSession
    import spark.implicits._
    // each step's (user, completion-ts) frame is persisted so step k+1
    // reads it from cache instead of replaying steps 1..k — k scans of the
    // events data total, and the cached frames are user-count-sized.
    // r9 fusion: the frames are built LAZILY and all k step counts ride
    // ONE union-aggregate action (the caches materialize in dependency
    // order inside that action) — previously each step paid its own
    // count() action plus persist churn.
    var prev: DataFrame = null
    val frames = steps.map { step =>
      val stepEvents = base.filter(col("__t") === step)
      val next =
        (if (prev == null)
          stepEvents.groupBy("__u").agg(min("__ts").as("__prev"))
        else
          stepEvents.join(prev, "__u")
            .filter(col("__ts") >= col("__prev"))
            .groupBy("__u").agg(min("__ts").as("__prev"))).persist()
      prev = next
      next
    }
    val unioned = frames.zipWithIndex.map { case (f, i) =>
      f.agg(count(lit(1)).cast("long").as("n_users"))
        .select(lit(i + 1).as("step"), lit(steps(i)).as("step_name"),
          col("n_users"))
    }.reduce(_.unionByName(_))
    try {
      val rows = unioned.collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
      rows.toDF("step", "step_name", "n_users")
    } finally frames.foreach(_.unpersist(blocking = false))
  }
}
