package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row
import graft.errors.ValidationResult
import graft.schema.DataFrameSchema

/** Structured Streaming validation — an extension beyond the reference
  * (which is batch-only; SURVEY.md §1.3 note). The batch engine is reused
  * per micro-batch via foreachBatch: schema checks compile once, each batch
  * pays exactly the fused single-pass cost, and `drop_invalid_rows`
  * becomes a streaming quarantine filter.
  */
object StreamingValidation {

  /** Replay-harness temp hygiene (r17 review: the four replay harnesses
    * leaked a full table copy + checkpoint per invocation — on a
    * long-lived host, repeated Verify/Bench runs fill the tmpdir). The
    * input/checkpoint dirs delete as soon as the query terminates (the
    * stream is done with them); the OUTPUT dirs must outlive the call —
    * the returned frame lazily re-reads them on every action — so they
    * register for deletion at JVM exit instead. */
  private def deleteRecursively(path: String): Unit =
    graft.ext.StoreFiles.deleteLocalDirRec(java.nio.file.Paths.get(path))

  private val exitDirs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private lazy val exitHookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      exitDirs.forEach(d =>
        try deleteRecursively(d) catch { case _: Exception => () })))

  /** Eagerly drop the stream's consumed dirs; the rest of `root` (the
    * parquet the returned frame reads) goes at JVM exit — unless the
    * caller OWNS the root (passed an `outputRoot`), in which case they
    * delete it on their own schedule. */
  private[graft] def retireReplayDirs(root: String, callerOwned: Boolean,
      consumed: String*): Unit = {
    consumed.foreach(d =>
      try deleteRecursively(d) catch { case _: Exception => () })
    if (!callerOwned) {
      exitHookInstalled
      exitDirs.add(root): Unit
    }
  }

  /** Working root for a replay invocation. Empty `outputRoot` (the
    * default) → a managed temp dir, deleted at JVM exit. Non-empty → a
    * fresh dir UNDER `outputRoot`, owned by the caller (r17 advice: a
    * long-lived session invoking the replay harnesses repeatedly
    * accumulates one table copy per invocation until exit — an owned root
    * lets the caller delete each invocation's output as soon as the
    * returned frame has been consumed; materialize it first, the frame
    * lazily re-reads the dir on every action). */
  private[graft] def replayRoot(prefix: String, outputRoot: String): String =
    if (outputRoot.isEmpty)
      java.nio.file.Files.createTempDirectory(prefix).toString
    else {
      val p = java.nio.file.Paths.get(outputRoot)
      java.nio.file.Files.createDirectories(p)
      java.nio.file.Files.createTempDirectory(p, prefix).toString
    }

  /** Reserved-name guard shared by every __ets-stamping transform (r18
    * fifth-pass review: the guard added to dedupStream/nearDedupStream/
    * sessionize had not reached the five windowed monitors, which
    * silently destroyed a caller column named __ets). */
  private[graft] def requireNoEts(df: DataFrame, fn: String): Unit =
    require(!df.columns.contains("__ets"),
      s"$fn reserves the __ets column name (a caller column by that " +
        "name would be silently destroyed)")

  /** Shared replay skeleton (r18 fifth-pass review: the hygiene
    * boilerplate was copy-pasted across seven harnesses and two missed
    * pieces of it). Launches the query (by-name, so a failing `start()`
    * still cleans up), awaits it, and GUARANTEES in one place: a
    * still-active query is stopped before any delete (stop()'s own
    * failure is swallowed — it can neither mask the original error nor
    * skip cleanup), the consumed dirs retire eagerly, and the root
    * outlives the call for the returned frame (JVM-exit hook, or
    * caller-owned via `outputRoot`). */
  private[graft] def runReplayOn(dir: String, outputRoot: String,
      consumed: String*)(
      startQuery: => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    var query: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      query = startQuery
      query.awaitTermination()
    } finally {
      try if (query != null && query.isActive) query.stop()
      catch { case _: Exception => () }
      retireReplayDirs(dir, outputRoot.nonEmpty, consumed: _*)
    }
  }

  /** Wrap a streaming DataFrame into a validated foreachBatch writer.
    * `onBatch` receives (validatedData, batchId, result) — route clean rows
    * to the sink and the error report to monitoring from there. */
  def validatedWriter(
      stream: DataFrame,
      schema: DataFrameSchema)(
      onBatch: (DataFrame, Long, ValidationResult) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val res = schema.validate(batch)
      onBatch(res.data, id, res)
    }

  /** Split each micro-batch into (valid, invalid) using the schema's
    * conjoined row-level pass predicate, calling the two sinks separately —
    * the classic quarantine pattern. Each side is ONE codegen'd filter over
    * the persisted batch: no aggregation, no shuffle, no re-validation (the
    * earlier `batch.exceptAll(valid)` formulation was an aggregation-based
    * set difference that shuffled the full micro-batch twice per batch). */
  def quarantineWriter(
      stream: DataFrame,
      schema: DataFrameSchema)(
      validSink: (DataFrame, Long) => Unit)(
      invalidSink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      batch.persist()
      try {
        val (valid, invalid) = graft.backend.Validator.splitByRowChecks(schema, batch)
        validSink(valid, id)
        invalidSink(invalid, id)
      } finally batch.unpersist()
    }

  /** Streaming exact dedup on a key set: watermark on event time and let
    * Spark's stateful dropDuplicatesWithinWatermark bound the dedup state —
    * the state store holds one entry per key seen inside the watermark
    * horizon, so memory is O(arrival rate × watermark), not O(stream
    * history). The RAW key columns are the state key by default, so the
    * dedup is exact. `fingerprintKeys = true` opts very wide keys into an
    * 8-byte xxhash64 state entry instead — smaller state at the cost of a
    * 2^-64-per-pair collision chance silently dropping a distinct event
    * (probabilistic, not exact — only opt in when the key tuple is large).
    * The fingerprint hashes the key columns PLUS their null flags (r17
    * review: Spark's xxhash64 skips null children — the running hash is
    * unchanged — so (123, null) and (null, 123) would otherwise collide
    * with probability 1, a systematic class far above the documented
    * random bound; the null-free flag vector restores the positions).
    *
    * STATE-COMPATIBILITY NOTE (r17 advice): that null-flag fix changed
    * the fingerprint formula, so a `fingerprintKeys = true` query resumed
    * from a checkpoint written BEFORE the fix will never match its
    * pre-upgrade state entries — already-seen keys are silently
    * re-admitted once across the upgrade boundary. Restart such streams
    * with a fresh checkpoint, or accept up to one watermark window of
    * possible duplicates after the upgrade. (Raw-key mode is unaffected.)
    * `tsCol` resolves through [[graft.functions.EventTime]] (epoch-nanos
    * long, TIMESTAMP, or TIMESTAMP_NTZ). */
  def dedupStream(
      stream: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      watermark: String,
      fingerprintKeys: Boolean = false): DataFrame = {
    require(!stream.columns.contains("__ets") &&
      !stream.columns.contains("__dk"),
      "dedupStream reserves the __ets/__dk column names (r17 review: a " +
        "caller column by that name would be silently destroyed)")
    val withTs = stream
      .withColumn("__ets", graft.functions.EventTime.eventTime(stream, tsCol))
      .withWatermark("__ets", watermark)
    if (fingerprintKeys) {
      withTs
        .withColumn("__dk", xxhash64(
          (keyCols.map(col) ++ keyCols.map(c => col(c).isNull)): _*))
        .dropDuplicatesWithinWatermark("__dk")
        .drop("__dk", "__ets")
    } else {
      withTs.dropDuplicatesWithinWatermark(keyCols).drop("__ets")
    }
  }

  /** Streaming incremental-ingest scrub against a STATIC corpus: every
    * micro-batch drops rows whose normalized text the corpus already holds
    * before reaching the sink — the continuous form of
    * [[graft.ext.Dedup.dropExistingExactBloom]]. The corpus Bloom filter
    * is built ONCE here (one corpus scan, no shuffle) and reused by every
    * batch; per batch only bloom-positive candidates broadcast-verify
    * against the corpus fingerprints, so batch cost is O(batch) + one
    * corpus scan pruned to a broadcast semi join — the corpus is never
    * shuffled, at any batch rate. Compose with [[dedupStream]] upstream to
    * also dedup WITHIN the stream across batches. */
  def incrementalScrubWriter(
      stream: DataFrame,
      corpus: DataFrame,
      textCol: String,
      corpusTextCol: String = "",
      expectedItems: Long = 0L,
      fpp: Double = 0.01)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val ctc = if (corpusTextCol.isEmpty) textCol else corpusTextCol
    val bloom = graft.ext.Dedup.corpusFingerprintBloom(corpus, ctc, expectedItems, fpp)
    // broadcast ONCE — a per-batch broadcast would re-ship the (potentially
    // multi-GB) filter to every executor on every micro-batch
    val bc = corpus.sparkSession.sparkContext.broadcast(bloom)
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      sink(graft.ext.Dedup.dropExistingWithBloom(batch, corpus, textCol, ctc, bc), id)
    }
  }

  /** Streaming NEAR-duplicate dedup: key the watermark-bounded state on
    * the document's 64-bit SimHash. Token-vote hashing makes the sketch
    * order-independent and whitespace-insensitive, so reshuffled or
    * re-wrapped copies of a document collapse to the same 8-byte state
    * entry and are dropped inside the watermark horizon. Hamming > 0
    * matching (small edits) needs the batch pair pipeline
    * (ext.Dedup.simhashPairs) — this is the streaming-compatible
    * approximation: O(arrival rate × watermark) state, 8 bytes per
    * distinct sketch, no shuffle beyond the stateful operator's own. */
  def nearDedupStream(
      stream: DataFrame,
      textCol: String,
      tsCol: String,
      watermark: String): DataFrame = {
    require(!stream.columns.contains("__ets") &&
      !stream.columns.contains("__sh"),
      "nearDedupStream reserves the __ets/__sh column names (r17 review: " +
        "a caller column by that name would be silently destroyed)")
    stream
      .withColumn("__ets", graft.functions.EventTime.eventTime(stream, tsCol))
      .withWatermark("__ets", watermark)
      .withColumn("__sh", graft.ext.Dedup.simhash64(col(textCol)))
      .dropDuplicatesWithinWatermark("__sh")
      .drop("__sh", "__ets")
  }

  /** Batch ≡ streaming proof harness for [[graft.ext.Sessions.sessionize]]:
    * replay a STATIC events table as a file-source micro-batch stream (one
    * input file per trigger), sessionize under a watermark in APPEND mode —
    * sessions reach the sink only when the watermark passes their end,
    * exactly the production streaming semantics — and return everything the
    * sink received. Used by the `events_sessions_stream` correctness gate,
    * whose oracle is the same DuckDB SQL as the batch `events_sessions`
    * gate: the emitted union must equal the batch result bit-for-bit.
    *
    * Determinism under arbitrary file/batch order: the watermark delay is
    * sized to the full event-time span + 2·gap, so no real event is ever
    * late no matter which micro-batch carries it. Two far-future sentinel
    * events (`user_id = -1`, written as the last two input files — the
    * second exists because a batch's watermark advance takes effect in the
    * NEXT batch) push the watermark past every real session's end so every
    * real session closes and emits; the sentinel's own still-open session
    * is excluded from the result. Everything stays distributed — the replay
    * round-trips through parquet (temp input files, streaming parquet sink),
    * no driver-side row handling. */
  def sessionizeReplay(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, gap: String = "30 minutes",
      outputRoot: String = ""): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val spark = events.sparkSession
    import spark.implicits._
    val dir = replayRoot("graft_replay_", outputRoot)
    val (inDir, outDir, ckDir) = (s"$dir/in", s"$dir/out", s"$dir/ck")

    // normalize event time to TimestampType up front so the replayed
    // parquet, the sentinels, and the span math share one representation
    // regardless of the source column's physical shape
    val src = events.select(
      graft.functions.EventTime.eventTime(events, tsCol).as("ts"),
      col(userCol).as("user_id"), col(valueCol).as("value"))
    val gapUs = spark.range(1)
      .select(expr(s"unix_micros(timestamp_micros(0) + interval '$gap')"))
      .head().getLong(0)
    val mm = src.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    require(!mm.isNullAt(0), "sessionizeReplay: events table is empty")
    val (minUs, maxUs) = (mm.getLong(0), mm.getLong(1))
    val delayUs = (maxUs - minUs) + 2L * gapUs
    val sentinelUs = maxUs + delayUs + 10L * gapUs

    // real events across 8 files → 8+ micro-batches splitting users/sessions
    src.repartition(8).write.parquet(inDir)
    // sentinel files must be LAST in the file source's (modification-time,
    // path) processing order — stamp them into the future. The sentinel
    // frame is CAST to src's column types (r17 review: a hardcoded
    // BIGINT/DOUBLE sentinel breaks the parquet reader mid-stream when
    // the source's user/value columns have any other type), and the
    // future-stamp must be verified (a filesystem where setLastModified
    // no-ops would let a sentinel process early and advance the
    // watermark past every real event — silent truncation).
    val userT = src.schema("user_id").dataType
    val valueT = src.schema("value").dataType
    Seq(sentinelUs, sentinelUs + 200L * gapUs)
      .zipWithIndex.foreach { case (us, i) =>
        val sDir = s"$dir/sentinel$i"
        Seq((us, -1L, 0.0)).toDF("us", "user_id", "value")
          .select(timestamp_micros(col("us")).as("ts"),
            col("user_id").cast(userT).as("user_id"),
            col("value").cast(valueT).as("value"))
          .coalesce(1).write.parquet(sDir)
        new java.io.File(sDir).listFiles().filter(_.getName.endsWith(".parquet"))
          .foreach { f =>
            val dst = new java.io.File(inDir, s"zz_sentinel$i.parquet")
            java.nio.file.Files.move(f.toPath, dst.toPath)
            require(dst.setLastModified(
              System.currentTimeMillis() + (i + 1) * 3600000L),
              s"sessionizeReplay: future-stamping sentinel $i failed — " +
                "the file source's mtime order would not put it last")
          }
      }

    val stream = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val sessions = graft.ext.Sessions.sessionize(stream, "user_id", "ts",
      "value", gap, watermark = Some(s"$delayUs microseconds"))
    runReplayOn(dir, outputRoot, inDir, ckDir)(
      sessions.writeStream.outputMode("append")
        .option("checkpointLocation", ckDir)
        .trigger(Trigger.AvailableNow()).format("parquet").start(outDir))
    val out = spark.read.parquet(outDir)
      .filter(col("user_id") =!= lit(-1L).cast(userT))
    require(out.limit(1).count() == 1L,
      "sessionizeReplay: no sessions emitted — sentinel watermark advance failed")
    out
  }

  /** Batch ≡ streaming proof harness for [[quarantineWriter]]: replay a
    * STATIC table as a file-source micro-batch stream, quarantine-split
    * every batch with the schema's conjoined row predicate, and return the
    * union both sinks received, tagged `side` ∈ {valid, quarantined}.
    * Row-level validation is batch-size-independent (each row's verdict is
    * a pure function of the row), so the union across ANY micro-batch
    * split equals the batch split — that equality against the batch-SQL
    * oracle is the `stream_quarantine` correctness gate. Everything stays
    * distributed: parquet replay in, per-batch codegen'd filters, parquet
    * sinks out; no driver-side row handling. */
  def quarantineReplay(df: DataFrame, schema: DataFrameSchema,
      numFiles: Int = 6, outputRoot: String = ""): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val spark = df.sparkSession
    val dir = replayRoot("graft_quar_", outputRoot)
    val (inDir, vDir, qDir) = (s"$dir/in", s"$dir/valid", s"$dir/quar")
    df.repartition(numFiles).write.parquet(inDir)
    val stream = spark.readStream.schema(df.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    runReplayOn(dir, outputRoot, inDir, s"$dir/ck")(
      quarantineWriter(stream, schema) {
        (valid, _) => valid.write.mode("append").parquet(vDir)
      } {
        (invalid, _) => invalid.write.mode("append").parquet(qDir)
      }.option("checkpointLocation", s"$dir/ck")
        .trigger(Trigger.AvailableNow()).start())
    spark.read.parquet(vDir).withColumn("side", lit("valid"))
      .unionByName(spark.read.parquet(qDir).withColumn("side", lit("quarantined")))
  }

  /** Batch ≡ streaming proof harness for [[dedupStream]]: replay a STATIC
    * events table as micro-batches, exact-dedup on `keyCols` with the
    * watermark delay sized to the full event-time span — the state never
    * expires and no event is ever late regardless of which micro-batch
    * carries it, so exactly the FIRST arrival per distinct key emits. The
    * returned frame projects the key columns only (which arrival wins is
    * replay-order-dependent; the key set is not), so the result equals
    * `SELECT DISTINCT keyCols` — the `stream_dedup` gate's oracle. */
  def dedupReplay(events: DataFrame, keyCols: Seq[String], tsCol: String,
      numFiles: Int = 6, outputRoot: String = ""): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val spark = events.sparkSession
    val dir = replayRoot("graft_dedup_", outputRoot)
    val (inDir, outDir) = (s"$dir/in", s"$dir/out")
    val us = graft.functions.EventTime.eventMicros(events, tsCol)
    val mm = events.agg(min(us), max(us)).head()
    require(!mm.isNullAt(0), "dedupReplay: events table is empty")
    val delayUs = (mm.getLong(1) - mm.getLong(0)) + 1000000L
    events.repartition(numFiles).write.parquet(inDir)
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val deduped = dedupStream(stream, keyCols, tsCol, s"$delayUs microseconds")
      .select(keyCols.map(col): _*)
    runReplayOn(dir, outputRoot, inDir, s"$dir/ck")(
      deduped.writeStream.outputMode("append")
        .option("checkpointLocation", s"$dir/ck")
        .trigger(Trigger.AvailableNow()).format("parquet").start(outDir))
    spark.read.parquet(outDir)
  }

  /** Batch ≡ streaming proof harness for [[incrementalScrubWriter]]:
    * replay a STATIC "incoming crawl batch" as micro-batches, scrub each
    * against the static corpus's Bloom+fingerprint filter, and return the
    * union the sink received. Each row's keep/drop verdict is a pure
    * function of (row, static corpus) — the Bloom filter is built once
    * before the stream starts and bloom-positive rows are verified against
    * the exact corpus fingerprints — so the union across ANY micro-batch
    * split equals the batch [[graft.ext.Dedup.dropExistingExactBloom]]
    * anti-join, which is what the `stream_scrub` gate asserts against the
    * same DuckDB oracle as the batch `dedup_incremental_bloom` gate. */
  def scrubReplay(incoming: DataFrame, corpus: DataFrame, textCol: String,
      corpusTextCol: String = "", numFiles: Int = 6,
      outputRoot: String = ""): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val spark = incoming.sparkSession
    val dir = replayRoot("graft_scrub_", outputRoot)
    val (inDir, outDir) = (s"$dir/in", s"$dir/out")
    incoming.repartition(numFiles).write.parquet(inDir)
    val stream = spark.readStream.schema(incoming.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    runReplayOn(dir, outputRoot, inDir, s"$dir/ck")(
      incrementalScrubWriter(stream, corpus, textCol, corpusTextCol) {
        (kept, _) => kept.write.mode("append").parquet(outDir)
      }.option("checkpointLocation", s"$dir/ck")
        .trigger(Trigger.AvailableNow()).start())
    spark.read.parquet(outDir)
  }

  /** Streaming drift monitoring: PSI of a value column per EVENT-TIME
    * window against a fixed reference profile (from
    * [[graft.ext.Drift.referenceNumericProfile]]) — the continuous
    * counterpart of the batch `Drift.psi` monitor, same eps-floor/6-dp
    * math, one output row per (window, bin) plus the per-window psi_total
    * in every row. Runs identically on a batch DataFrame (the correctness
    * oracle) and a streaming one (add a watermark, append or complete
    * mode).
    *
    * Streaming-safe by construction: the ONLY stateful operator is a
    * single `groupBy(window)` whose aggregate carries the `bins` counters
    * as separate cells (conditional sums), so state is one short row per
    * open window, bounded by the watermark; the fractions, PSI
    * contributions, and the per-window total are pure row-local
    * expressions over those cells (an `aggregate` over the cell array —
    * NO second stateful aggregation, no window function), and the
    * reference profile rides as literals. At 100 TB/day the plan is: scan
    * → map-side partial counts → one shuffle keyed by time window →
    * codegen'd arithmetic. */
  def windowedPsi(events: DataFrame, tsCol: String, valueCol: String,
      refEdges: Seq[Double], refFracs: Seq[Double],
      windowDur: String = "1 hour", watermark: Option[String] = None,
      eps: Double = 1e-6): DataFrame = {
    val bins = refEdges.length + 1
    require(refFracs.length == bins, "refFracs must have one entry per bin (edges + 1)")
    requireNoEts(events, "windowedPsi")
    val withTs = events.withColumn("__ets",
      graft.functions.EventTime.eventTime(events, tsCol))
    val wm = watermark.fold(withTs)(w => withTs.withWatermark("__ets", w))
    val bin = refEdges.foldLeft(lit(0))((acc, e) =>
      acc + when(col(valueCol) > e, 1).otherwise(0))
    val counts = (0 until bins).map(i =>
      sum(when(bin === i, 1L).otherwise(0L)).as(s"__n$i"))
    val agged = wm.filter(col(valueCol).isNotNull)
      .groupBy(window(col("__ets"), windowDur))
      .agg(counts.head, counts.tail: _*)
    val total = (0 until bins).map(i => col(s"__n$i")).reduce(_ + _)
    val cells = array((0 until bins).map { i =>
      val rf = greatest(lit(refFracs(i)), lit(eps))
      val cf = greatest(col(s"__n$i").cast("double") / total.cast("double"), lit(eps))
      struct(lit(i).as("bin"),
        round(rf, 6).as("ref_frac"),
        round(cf, 6).as("cur_frac"),
        round((cf - rf) * log(cf / rf), 6).as("psi_contrib"))
    }: _*)
    agged
      .withColumn("__cells", cells)
      .withColumn("psi_total", round(aggregate(col("__cells"), lit(0.0),
        (a, c) => a + c.getField("psi_contrib")), 6))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        explode(col("__cells")).as("c"), col("psi_total"))
      .select(col("window_start"), col("c.bin").as("bin"),
        col("c.ref_frac").as("ref_frac"), col("c.cur_frac").as("cur_frac"),
        col("c.psi_contrib").as("psi_contrib"), col("psi_total"))
  }

  /** Streaming CATEGORICAL drift: PSI of a category column per event-time
    * window against a fixed reference profile
    * ([[graft.ext.Drift.referenceCategoricalProfile]]) — the continuous
    * counterpart of the batch [[graft.ext.Drift.psiCategorical]] monitor
    * and the categorical sibling of [[windowedPsi]] (r7 verdict #6:
    * language/domain mix shift is THE drift a crawl pipeline watches).
    * Cells are the reference's top-K categories plus `__other__` (all
    * overflow and never-seen categories — mass appearing there IS the
    * signal); nulls map to `__null__`, a real cell iff it is in the
    * reference top-K, otherwise `__other__`.
    *
    * Same streaming-safe shape as [[windowedPsi]]: the ONLY stateful
    * operator is one `groupBy(window)` carrying a conditional-sum counter
    * per cell (state = one short row per open window, bounded by the
    * watermark); fractions / PSI contributions / the per-window total are
    * pure row-local expressions, and the reference profile rides as
    * literals. Identical plan in batch mode (the correctness oracle) and
    * streaming mode (StreamingSpec replays it). */
  def windowedPsiCategorical(events: DataFrame, tsCol: String, column: String,
      refCells: Seq[String], refFracs: Seq[Double],
      windowDur: String = "1 hour", watermark: Option[String] = None,
      eps: Double = 1e-6): DataFrame = {
    require(refCells.nonEmpty, "refCells must be non-empty")
    require(refCells.distinct.size == refCells.size, "refCells must be distinct")
    require(!refCells.contains("__other__"),
      "__other__ is the reserved overflow cell — not a reference category")
    require(refFracs.length == refCells.length + 1,
      "refFracs must carry one entry per reference cell plus the __other__ mass")
    val cells = refCells :+ "__other__"
    requireNoEts(events, "windowedPsiCategorical")
    val withTs = events.withColumn("__ets",
      graft.functions.EventTime.eventTime(events, tsCol))
    val wm = watermark.fold(withTs)(w => withTs.withWatermark("__ets", w))
    val cat = coalesce(col("`" + column.replace("`", "``") + "`").cast("string"),
      lit("__null__"))
    val cellCol = when(cat.isin(refCells: _*), cat).otherwise(lit("__other__"))
    val counts = cells.indices.map(i =>
      sum(when(cellCol === cells(i), 1L).otherwise(0L)).as(s"__n$i"))
    val agged = wm
      .groupBy(window(col("__ets"), windowDur))
      .agg(counts.head, counts.tail: _*)
    val total = cells.indices.map(i => col(s"__n$i")).reduce(_ + _)
    val cellStructs = array(cells.indices.map { i =>
      val rf = greatest(lit(refFracs(i)), lit(eps))
      val cf = greatest(col(s"__n$i").cast("double") / total.cast("double"), lit(eps))
      struct(lit(cells(i)).as("cell"),
        round(rf, 6).as("ref_frac"),
        round(cf, 6).as("cur_frac"),
        round((cf - rf) * log(cf / rf), 6).as("psi_contrib"))
    }: _*)
    agged
      .withColumn("__cells", cellStructs)
      .withColumn("psi_total", round(aggregate(col("__cells"), lit(0.0),
        (a, c) => a + c.getField("psi_contrib")), 6))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        explode(col("__cells")).as("c"), col("psi_total"))
      .select(col("window_start"), col("c.cell").as("cell"),
        col("c.ref_frac").as("ref_frac"), col("c.cur_frac").as("cur_frac"),
        col("c.psi_contrib").as("psi_contrib"), col("psi_total"))
  }

  /** Streaming Wasserstein-1 drift (r12, verdict #6): W1 of a value column
    * per EVENT-TIME window against a fixed reference profile
    * ([[graft.ext.Drift.referenceNumericProfile]]) — the continuous
    * counterpart of the batch [[graft.ext.Drift.wasserstein1]] monitor,
    * completing the drift trio (PSI = per-bin log-ratio divergence, KS =
    * max CDF gap, W1 = CDF gap integrated over the value axis, read in the
    * column's own units). Same left-endpoint grid integral as the batch
    * form: W1 ≈ Σ_b |refCum_b − curCum_b| · (e_{b+1} − e_b), mass beyond
    * the reference's outer quantiles ignored (raise `bins` for finer
    * resolution).
    *
    * Same streaming-safe shape as [[windowedPsi]]: the ONLY stateful
    * operator is one `groupBy(window)` carrying the bin counters as
    * conditional sums (state = one short row per open window, bounded by
    * the watermark); the cumulative fractions, gaps, and the per-window
    * integral are pure row-local expressions over those counters — the
    * cross-bin cumsum is unrolled over the bounded `bins` cells, never a
    * window function — and the reference cums/edge widths ride as
    * literals. Identical plan in batch mode (the correctness oracle) and
    * streaming mode (StreamingSpec replays it). */
  def windowedWasserstein1(events: DataFrame, tsCol: String, valueCol: String,
      refEdges: Seq[Double], refFracs: Seq[Double],
      windowDur: String = "1 hour", watermark: Option[String] = None): DataFrame = {
    val bins = refEdges.length + 1
    require(bins >= 3, s"bins >= 3, got $bins")
    require(refFracs.length == bins,
      "refFracs must have one entry per bin (edges + 1)")
    requireNoEts(events, "windowedWasserstein1")
    val withTs = events.withColumn("__ets",
      graft.functions.EventTime.eventTime(events, tsCol))
    val wm = watermark.fold(withTs)(w => withTs.withWatermark("__ets", w))
    val bin = refEdges.foldLeft(lit(0))((acc, e) =>
      acc + when(col(valueCol) > e, 1).otherwise(0))
    val counts = (0 until bins).map(i =>
      sum(when(bin === i, 1L).otherwise(0L)).as(s"__n$i"))
    val agged = wm.filter(col(valueCol).isNotNull)
      .groupBy(window(col("__ets"), windowDur))
      .agg(counts.head, counts.tail: _*)
    val total = (0 until bins).map(i => col(s"__n$i")).reduce(_ + _)
    val refCum = refFracs.scanLeft(0.0)(_ + _).tail // inclusive, driver-side
    // with bin b counting values in (e_{b-1}, e_b], cum at bin b is F(e_b),
    // integrated left-endpoint over [e_b, e_{b+1}] (width e_{b+1} − e_b) —
    // the batch wasserstein1's convention, zero width for the two
    // right-edge bins
    val widths = (0 until bins).map(b =>
      if (b <= bins - 3) refEdges(b + 1) - refEdges(b) else 0.0)
    val cells = array((0 until bins).map { b =>
      val curCum = (0 to b).map(i => col(s"__n$i")).reduce(_ + _)
        .cast("double") / total.cast("double")
      // the integral sums RAW gap·width (the batch wasserstein1's
      // convention — rounding per bin before summing would drift the
      // statistic on large-unit columns); gap/contrib round for DISPLAY
      val gapRaw = abs(lit(refCum(b)) - curCum)
      struct(lit(b).as("bin"),
        round(lit(refCum(b)), 6).as("ref_cum"),
        round(curCum, 6).as("cur_cum"),
        round(gapRaw, 6).as("gap"),
        round(lit(widths(b)), 6).as("width"),
        round(gapRaw * lit(widths(b)), 6).as("w1_contrib"),
        (gapRaw * lit(widths(b))).as("__craw"))
    }: _*)
    agged
      .withColumn("__cells", cells)
      .withColumn("w1_stat", round(aggregate(col("__cells"), lit(0.0),
        (a, c) => a + c.getField("__craw")), 4))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        explode(col("__cells")).as("c"), col("w1_stat"))
      .select(col("window_start"), col("c.bin").as("bin"),
        col("c.ref_cum").as("ref_cum"), col("c.cur_cum").as("cur_cum"),
        col("c.gap").as("gap"), col("c.width").as("width"),
        col("c.w1_contrib").as("w1_contrib"), col("w1_stat"))
  }

  /** Streaming heavy hitters per event-time window — the trending-items
    * monitor ([[graft.ext.HeavyHitters.frequentItemsByWindow]]'s
    * streaming sibling). One stateful windowed aggregation carries a
    * Misra–Gries sketch (O(capacity) state per open window, bounded by
    * the watermark) plus the window's item count; candidates emit with
    * their MG bounds when the window closes.
    *
    * Mid-stream there is NO second exact-recount pass, so the output is
    * a bounded SANDWICH rather than an exact set (spec-asserted against
    * the batch-exact form):
    *   - rows with `guaranteed = true` (est_min >= phi·N) are certainly
    *     heavy hitters (MG estimates are lower bounds);
    *   - every true heavy hitter appears among the emitted rows (an item
    *     with count >= phi·N has est >= phi·N − N/(cap+1), and the emit
    *     cut keeps everything with est + N/(cap+1) >= phi·N).
    * Sketch merge order varies with micro-batch splits, so `est_min`/
    * `est_max` are run-dependent within those bounds — which is why the
    * exact gate rides the batch form and this one is property-gated. */
  def windowedHeavyHitters(events: DataFrame, tsCol: String, column: String,
      phi: Double, windowDur: String = "1 hour",
      watermark: Option[String] = None, capacity: Int = 0): DataFrame = {
    require(phi > 0.0 && phi <= 1.0, "phi must be in (0, 1]")
    val cap = if (capacity > 0) capacity
      else math.max(math.ceil(2.0 / phi).toInt, 16)
    require(cap.toDouble + 1.0 > 1.0 / phi,
      s"capacity $cap too small for phi=$phi: heavy hitters could be missed")
    requireNoEts(events, "windowedHeavyHitters")
    val withTs = events.withColumn("__ets",
      graft.functions.EventTime.eventTime(events, tsCol))
    val wm = watermark.fold(withTs)(w => withTs.withWatermark("__ets", w))
    val agged = wm.filter(col(column).isNotNull)
      .groupBy(window(col("__ets"), windowDur))
      .agg(graft.functions.MisraGriesSketch.of(col(column), cap).as("__cand"),
        count(col(column)).as("__n"))
    val err = col("n_window").cast("double") / (cap + 1.0)
    agged
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        explode(col("__cand")).as("c"), col("__n").as("n_window"))
      .filter(col("c.est") + err >= lit(phi) * col("n_window"))
      .select(col("window_start"), col("c.item").as(column),
        col("c.est").as("est_min"),
        round(col("c.est") + err, 3).as("est_max"),
        col("n_window"),
        (col("c.est").cast("double") >= lit(phi) * col("n_window")).as("guaranteed"))
  }

  /** Event-time hourly rollup used by SparkEntry's events_hourly in batch
    * mode; in streaming mode add a watermark and run it incrementally. */
  def hourlyRollup(events: DataFrame, tsCol: String, watermark: Option[String]): DataFrame = {
    requireNoEts(events, "hourlyRollup")
    val withTs = events.withColumn("__ets",
      graft.functions.EventTime.eventTime(events, tsCol))
    val wm = watermark.fold(withTs)(w => withTs.withWatermark("__ets", w))
    wm.groupBy(window(col("__ets"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 3).as("total_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("total_value"))
  }
}
