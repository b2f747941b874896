package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.errors.ValidationResult
import graft.schema.DataFrameSchema

/** Validated source/sink wrappers — the Spark-native re-expression of the
  * reference's `from_format` / `to_format` model config
  * (api/pyspark/model_config.py:43-64, typing/formats.py:7-34): instead of
  * converting an in-memory container between serialization formats, the
  * engine validates at the IO boundary where a Spark pipeline actually
  * crosses formats.
  *
  * Scale notes: `read` always passes the schema's StructType to the reader,
  * so csv/json skip their whole-file inference scan and parquet scans gain
  * column pruning against the declared columns; validation itself is the
  * fused single pass. `write` validates BEFORE the write so a failing batch
  * never lands in the sink (quarantine semantics come from
  * dropInvalidRows on the schema).
  */
object ValidatedIO {

  /** Validate-on-read: load `path` as `format` with the schema's explicit
    * StructType and validate. Formats with a text representation (csv/json)
    * get malformed-row tolerance from PERMISSIVE mode so bad rows surface
    * as validation errors (nulls) instead of read-time exceptions. */
  def read(
      spark: SparkSession,
      schema: DataFrameSchema,
      path: String,
      format: String = "parquet",
      options: Map[String, String] = Map.empty): ValidationResult = {
    val reader = spark.read.format(format).options(options)
    val withSchema = format match {
      case "csv" | "json" =>
        reader.schema(org.apache.spark.sql.types.StructType(
            schema.toStructType.map(_.copy(nullable = true))))
          .option("mode", "PERMISSIVE")
      case _ => reader // parquet/orc carry their own schema; dtype checks validate it
    }
    schema.validate(withSchema.load(path))
  }

  /** Quarantining read for text formats (csv/json): malformed records —
    * lines the parser cannot map onto the schema at all — are captured via
    * Spark's corrupt-record column and returned RAW as the second frame
    * (for a reject-file sink / triage), never silently nulled into the
    * data; well-formed rows flow into the fused validation. This is the
    * read-side counterpart of the quarantine sink: nothing is dropped on
    * the floor at either boundary.
    *
    * The parsed batch is persisted once: Spark refuses plans that
    * reference ONLY the corrupt-record column of a text scan (the parser
    * would need a second pushdown schema), and the cache also makes the
    * good/bad split one scan instead of two. The block stays cached behind
    * the two returned lazy frames and is reclaimed by LRU eviction or
    * `spark.sqlContext.clearCache()` (the stupidBackoff convention); a
    * long-lived service materializes both sides and clears between
    * batches. */
  def readQuarantined(
      spark: SparkSession,
      schema: DataFrameSchema,
      path: String,
      format: String,
      options: Map[String, String] = Map.empty): (ValidationResult, DataFrame) = {
    require(format == "csv" || format == "json",
      s"readQuarantined is for text formats (csv/json), got '$format'")
    val corrupt = "__corrupt_record"
    val st = org.apache.spark.sql.types.StructType(
      schema.toStructType.map(_.copy(nullable = true)) :+
        org.apache.spark.sql.types.StructField(corrupt,
          org.apache.spark.sql.types.StringType, nullable = true))
    val raw = spark.read.format(format).options(options)
      .schema(st)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .load(path)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bad = raw.filter(org.apache.spark.sql.functions.col(corrupt).isNotNull)
      .select(org.apache.spark.sql.functions.col(corrupt).as("raw_record"))
    val good = raw.filter(org.apache.spark.sql.functions.col(corrupt).isNull)
      .drop(corrupt)
    (schema.validate(good), bad)
  }

  /** Validate-then-write: run the fused validation, and write the validated
    * data (post drop_invalid_rows / coercion / defaults) only when it
    * passed — or, when the schema drops invalid rows, when every remaining
    * non-warning error is a row-level DATA failure that the dropping cures
    * (a quarantining sink). SCHEMA-category failures (missing column, wrong
    * dtype, …) always withhold the write: row-dropping cannot cure a
    * structural mismatch, so letting it through would land malformed data
    * in the sink. Returns the validation result either way.
    *
    * When the cache knob (GraftConfig.cacheDataFrame) is on, the source is
    * persisted across the validate + write pair so the sink write replays
    * from cache instead of re-scanning (or recomputing) the source — at
    * 100 TB the second scan is the dominant cost of this operator. With the
    * knob off, callers pay validate + write as two scans (document/persist
    * upstream if the source is expensive). */
  def write(
      schema: DataFrameSchema,
      df: DataFrame,
      path: String,
      format: String = "parquet",
      mode: String = "error",
      partitionBy: Seq[String] = Nil,
      options: Map[String, String] = Map.empty): ValidationResult = {
    val doCache = graft.errors.GraftConfig.cacheDataFrame
    if (doCache) df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val res = schema.validate(df)
      val rowLevelOnly = res.errors.filterNot(_.isWarning)
        .forall(_.category == graft.errors.ErrorCategory.DATA)
      if (res.passed || (schema.dropInvalidRows && rowLevelOnly)) {
        val w = res.data.write.format(format).mode(mode).options(options)
        (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
      }
      res
    } finally {
      if (doCache && !graft.errors.GraftConfig.keepCachedDataFrame) df.unpersist()
    }
  }
}
