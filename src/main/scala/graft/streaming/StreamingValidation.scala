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
    * `tsCol` is an epoch-nanos LONG column (the events table shape under
    * nanosAsLong, same convention as hourlyRollup). */
  def dedupStream(
      stream: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      watermark: String,
      fingerprintKeys: Boolean = false): DataFrame = {
    val withTs = stream
      .withColumn("__ets", timestamp_micros(call_function("div", col(tsCol), lit(1000L))))
      .withWatermark("__ets", watermark)
    if (fingerprintKeys) {
      withTs
        .withColumn("__dk", xxhash64(keyCols.map(col): _*))
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
      watermark: String): DataFrame =
    stream
      .withColumn("__ets", timestamp_micros(call_function("div", col(tsCol), lit(1000L))))
      .withWatermark("__ets", watermark)
      .withColumn("__sh", graft.ext.Dedup.simhash64(col(textCol)))
      .dropDuplicatesWithinWatermark("__sh")
      .drop("__sh", "__ets")

  /** Event-time hourly rollup used by SparkEntry's events_hourly in batch
    * mode; in streaming mode add a watermark and run it incrementally. */
  def hourlyRollup(events: DataFrame, tsCol: String, watermark: Option[String]): DataFrame = {
    val withTs = events.withColumn("__ets",
      timestamp_micros(call_function("div", col(tsCol), lit(1000L))))
    val wm = watermark.fold(withTs)(w => withTs.withWatermark("__ets", w))
    wm.groupBy(window(col("__ets"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 3).as("total_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("total_value"))
  }
}
