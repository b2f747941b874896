package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event sessionization — the gap-timeout grouping every behavioral /
  * clickstream pipeline runs before building per-session training
  * examples.
  *
  * Spark-first shape: `session_window` (native Catalyst session
  * aggregation) rather than the lag/running-sum window-function idiom —
  * one shuffle keyed by user, sessions merge inside the aggregation
  * (works identically under Structured Streaming with a watermark, where
  * the window-function formulation is unusable). A session extends while
  * consecutive events arrive at most `gap` apart (touching windows merge;
  * a split needs a strictly larger silence); its end is last_event + gap
  * (the session_window contract).
  *
  * `tsCol` resolves through [[graft.functions.EventTime]] (epoch-nanos
  * long, TIMESTAMP, or TIMESTAMP_NTZ all accepted). Bounds are emitted as
  * epoch micros so results are timezone-independent and engine-portable.
  */
object Sessions {

  private def q(n: String): Column = col("`" + n.replace("`", "``") + "`")

  /** Per-session aggregate: (userCol, session_start_us, session_end_us,
    * n_events, total_value·10³-rounded). Pass `watermark` when `events` is
    * a stream — session_window state then closes (and emits) once the
    * watermark passes a session's end, bounding state to open sessions. */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, gap: String = "30 minutes",
      watermark: Option[String] = None): DataFrame = {
    require(!events.columns.contains("__ets"),
      "sessionize reserves the __ets column name (r18 hunt: the streaming " +
        "dedup siblings refuse it — r17 review — but a caller column by " +
        "that name was still silently destroyed here)")
    val withTs = events
      .withColumn("__ets", graft.functions.EventTime.eventTime(events, tsCol))
    watermark.fold(withTs)(w => withTs.withWatermark("__ets", w))
      .groupBy(q(userCol), session_window(col("__ets"), gap))
      .agg(count(lit(1)).as("n_events"),
        round(sum(q(valueCol)), 3).as("total_value"))
      .select(q(userCol),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"), col("total_value"))
  }
}
