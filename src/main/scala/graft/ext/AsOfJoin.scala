package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal nearest-predecessor) join — pandas `merge_asof` /
  * DuckDB `ASOF JOIN` semantics: for every left row, the single right row
  * with the same keys and the greatest right timestamp ≤ the left
  * timestamp (backward; inclusive), or the least right timestamp ≥ it
  * (forward). The feature-store / event-enrichment workhorse: "attach the
  * most recent profile snapshot / model score / exchange rate known at
  * event time".
  *
  * Spark-first plan: the classic union-window formulation, NOT a range
  * join —
  *
  *   1. tag right rows 0 and left rows 1, union on (keys, ts, tag,
  *      right-payload-as-struct);
  *   2. one window over (keys) ordered by (ts, tag):
  *      `last(payload, ignoreNulls)` with an unbounded-preceding frame
  *      carries the latest right payload forward onto each left row
  *      (right sorts before left at equal ts, which is exactly the
  *      inclusive `>=`);
  *   3. keep the left rows, unpack the payload, apply the optional
  *      tolerance.
  *
  * Cost: ONE shuffle of |left|+|right| rows on the join keys plus an
  * in-partition sort — linear state, no per-row range scan, no
  * key×key(time-overlap) pair explosion, skew bounded by the biggest
  * single key's row count (same bound any keyed join has). An
  * inequality-join formulation would be O(|left|·|right|) per key;
  * Spark's own broadcast-range strategies cap out far below 100 TB.
  * The running-frame `last(..., ignoreNulls)` window is evaluated
  * incrementally (running frame), not re-scanned per row.
  *
  * Determinism: ties inside the RIGHT side on (keys, ts) are resolved by
  * the union sort's tie-break, which is not a total order — DuckDB leaves
  * the same case undefined. Callers with duplicate right timestamps per
  * key pass `tieBreak` (r9): the right side pre-aggregates to ONE row per
  * (keys, ts) — the row with the LARGEST tieBreak tuple — making the
  * result total-order deterministic at the cost of one extra right-side
  * aggregation (which shuffles on the same keys the join already
  * shuffles on, so AQE typically plans it into the same exchange). */
object AsOfJoin {

  private def q(n: String): Column = col("`" + n.replace("`", "``") + "`")

  /** @param direction  "backward" (right.ts <= left.ts, the default and
    *                   the DuckDB/pandas default) or "forward"
    *                   (right.ts >= left.ts)
    * @param tolerance  max |left.ts − right.ts|: epoch MICROS for
    *                   timestamp columns, the column's own units for
    *                   numeric ones; matches farther away resolve to null
    * @param rightPrefix prefix for the attached right columns (the right
    *                   ts lands as `<prefix><rightTs>`)
    * @param tieBreak   right columns resolving duplicate (keys, ts) right
    *                   rows: the row with the LARGEST tieBreak tuple wins
    *                   (supply a column that totally orders each
    *                   duplicate group — e.g. a sequence number — for a
    *                   fully deterministic result). Empty = legacy
    *                   undefined-on-ties behavior, zero extra cost.
    * Output: every left row/column, plus each right value column (and the
    * right ts) prefixed — null when no right row qualifies (left join). */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightValues: Seq[String],
      direction: String = "backward", tolerance: Option[Long] = None,
      rightPrefix: String = "asof_", tieBreak: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "asOfJoin: at least one key column")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got '$direction'")
    require(rightValues.nonEmpty, "asOfJoin: no right value columns to attach")
    // tieBreak: collapse duplicate (keys, ts) right rows to the max-by
    // winner BEFORE the union — the window then sees at most one right
    // row per (keys, ts), so the running `last` is total-order defined
    val right0 =
      if (tieBreak.isEmpty) right
      else right
        .groupBy((keys.map(q) :+ q(rightTs).as(rightTs)): _*)
        .agg(max_by(struct(rightValues.map(c => q(c).as(c)): _*),
          struct(tieBreak.map(q): _*)).as("__tb"))
        .select((keys.map(q) :+ q(rightTs)) ++
          rightValues.map(c => col(s"__tb.`${c.replace("`", "``")}`").as(c)): _*)
    val leftCols = left.columns.toSeq
    require(!leftCols.contains("__ts") && !leftCols.contains("__tag"),
      "asOfJoin: left may not contain reserved __ts/__tag columns")
    val payload = struct(
      (q(rightTs).as("__rts") +: rightValues.map(c => q(c).as(c))): _*)
    // equi-join semantics: a NULL key never equals anything, so null-key
    // right rows can match no left row — drop them up front (the window's
    // partitionBy would otherwise group the NULL keys together and hand
    // null-key left rows a neighbor no real join would produce)
    val rTagged = right0
      .filter(q(rightTs).isNotNull &&
        keys.map(q(_).isNotNull).reduce(_ && _))
      .select(keys.map(q) ++ Seq(q(rightTs).as("__ts"), lit(0).as("__tag"),
        payload.as("__payload")): _*)
    val lTagged = left.select(
      keys.map(q) ++ Seq(q(leftTs).as("__ts"), lit(1).as("__tag")) ++
        leftCols.filterNot(keys.contains).map(c =>
          q(c).as(s"__l_$c")): _*)
    // forward = backward on the reversed time axis: flip the sort and let
    // the same running `last` pick the nearest following right row
    val ord =
      if (direction == "backward") Seq(col("__ts").asc, col("__tag").asc)
      else Seq(col("__ts").desc, col("__tag").asc)
    val w = Window.partitionBy(keys.map(q): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedCol = last(col("__payload"), ignoreNulls = true).over(w)
    // allowMissingColumns fills the left-only __l_* columns with nulls on
    // the right rows — no per-column scaffolding needed
    val withMatch = lTagged.unionByName(rTagged, allowMissingColumns = true)
      .withColumn("__match", matchedCol)
      .filter(col("__tag") === 1)
    // tolerance compares in the ts column's native fine granularity:
    // epoch MICROS for timestamp columns (a bare cast("long") would be
    // whole seconds), the raw value for numeric columns
    def tsAsLong(c: org.apache.spark.sql.Column,
        dt: org.apache.spark.sql.types.DataType) = dt match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(c)
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(c.cast("timestamp"))
      case _ => c.cast("long")
    }
    val gap = abs(
      tsAsLong(col("__ts"), left.schema(leftTs).dataType) -
      tsAsLong(col("__match.__rts"), right.schema(rightTs).dataType))
    val inTol = tolerance.map(t => gap <= t).getOrElse(lit(true))
    // null left ts never matches (it sorts to one end of the window frame,
    // which would otherwise hand it a bogus neighbor in forward mode);
    // null left KEYS never match either (equi-join semantics — null-key
    // right rows are already filtered, but a null-key LEFT row would
    // otherwise read the null-key partition's frame)
    val keysNotNull = keys.map(q(_).isNotNull).reduce(_ && _)
    val matched = when(keysNotNull && col("__ts").isNotNull &&
      col("__match").isNotNull && inTol, col("__match"))
    withMatch.select(
      keys.map(q) ++
        Seq(col("__ts").as(leftTs)) ++
        leftCols.filterNot(c => keys.contains(c) || c == leftTs).map(c =>
          col(s"__l_$c").as(c)) ++
        Seq(matched.getField("__rts").as(s"$rightPrefix$rightTs")) ++
        rightValues.map(c => matched.getField(c).as(s"$rightPrefix$c")): _*)
  }

  /** Streaming as-of enrichment against a STATIC right side: every
    * micro-batch of the left stream is [[asOfJoin]]ed to the fixed
    * dimension (profile snapshots, rate tables, model scores) — each
    * row's match is a pure function of (row, right), so the union across
    * ANY micro-batch split equals the batch join. The right side should
    * be cached by the caller when it is expensive; the per-batch cost is
    * one (batch + right) key shuffle. */
  def enrichWriter(stream: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightValues: Seq[String],
      direction: String = "backward", tolerance: Option[Long] = None,
      rightPrefix: String = "asof_")(
      sink: (DataFrame, Long) => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      sink(asOfJoin(batch, right, keys, leftTs, rightTs, rightValues,
        direction, tolerance, rightPrefix), id)
    }

  /** Batch ≡ streaming proof harness for [[enrichWriter]]: replay a
    * static left table as file-source micro-batches, enrich each against
    * the static right, return the union the sink received — gated equal
    * to the batch [[asOfJoin]] on the same oracle. */
  def enrichReplay(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightValues: Seq[String],
      numFiles: Int = 6, outputRoot: String = ""): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val spark = left.sparkSession
    // replay hygiene via the shared helpers (r18 hunt: this harness
    // predated the r17 cleanup — it leaked the table copy + checkpoint
    // + output per invocation and never stopped a failed query)
    val dir = graft.streaming.StreamingValidation
      .replayRoot("graft_asof_replay_", outputRoot)
    val (inDir, outDir) = (s"$dir/in", s"$dir/out")
    left.repartition(numFiles).write.parquet(inDir)
    val stream = spark.readStream.schema(left.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    graft.streaming.StreamingValidation.runReplayOn(dir, outputRoot,
        inDir, s"$dir/ck")(
      enrichWriter(stream, right, keys, leftTs, rightTs,
          rightValues) { (enriched, _) =>
        enriched.write.mode("append").parquet(outDir)
      }.option("checkpointLocation", s"$dir/ck")
        .trigger(Trigger.AvailableNow()).start())
    spark.read.parquet(outDir)
  }
}
