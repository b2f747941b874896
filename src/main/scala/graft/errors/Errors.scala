package graft.errors

import org.apache.spark.sql.DataFrame

/** Error taxonomy mirroring the reference's SchemaErrorReason
  * (reference: pandera/errors.py:139-162). Index-related reasons are
  * inapplicable on Spark (no row index) and intentionally absent.
  */
object SchemaErrorReason extends Enumeration {
  type SchemaErrorReason = Value
  val INVALID_TYPE, DATATYPE_COERCION, COLUMN_NOT_IN_DATAFRAME,
      COLUMN_NOT_IN_SCHEMA, COLUMN_NOT_ORDERED, DUPLICATE_COLUMN_LABELS,
      SERIES_CONTAINS_NULLS, SERIES_CONTAINS_DUPLICATES, DUPLICATES,
      WRONG_DATATYPE, DATAFRAME_CHECK, CHECK_ERROR, SCHEMA_COMPONENT_CHECK,
      ADD_MISSING_COLUMN_NO_DEFAULT, INVALID_COLUMN_NAME,
      // check applied to a column whose dtype it cannot accept — the
      // Spark-side rendering of @register_input_datatypes rejection
      // (reference: backends/pyspark/decorators.py:42-105)
      INVALID_CHECK_INPUT_TYPE = Value
}
import SchemaErrorReason._

/** Category of a validation step, used by validation-depth pruning
  * (reference: pandera/api/base/error_handler.py:21-39).
  */
object ErrorCategory extends Enumeration {
  type ErrorCategory = Value
  val SCHEMA, DATA = Value
}

/** One validation failure with a bounded sample of failing values.
  * (reference: pandera/errors.py:79 SchemaError)
  */
final case class SchemaError(
    schemaContext: String, // "DataFrameSchema" | "Column" | "Check"
    column: Option[String],
    check: String,
    reason: SchemaErrorReason,
    category: ErrorCategory.ErrorCategory,
    failureCount: Long,
    failureCases: Seq[String],
    message: String,
    isWarning: Boolean = false)

final class SchemaErrorException(val errors: Seq[SchemaError])
    extends RuntimeException(
      s"Schema validation failed with ${errors.size} error(s):\n" +
        errors.map(e => s"  - ${e.message}").mkString("\n"))

/** Outcome of `DataFrameSchema.validate`. The pyspark reference never
  * raises; it attaches an error report to the df
  * (pandera/accessors/pyspark_sql_accessor.py:19-53). We return the report
  * alongside the (possibly coerced/filtered) data.
  */
final case class ValidationResult(data: DataFrame, errors: Seq[SchemaError]) {
  def passed: Boolean = errors.forall(_.isWarning)
  def hardErrors: Seq[SchemaError] = errors.filterNot(_.isWarning)
  def warnings: Seq[SchemaError] = errors.filter(_.isWarning)

  /** Raise like the pandas backend's lazy path
    * (pandera/backends/pandas/container.py:129-148). */
  def orThrow: DataFrame =
    if (passed) data else throw new SchemaErrorException(hardErrors)

  /** Nested error report, same shape as the pyspark backend's summary
    * (pandera/backends/pyspark/container.py:146-151):
    * {SCHEMA|DATA -> {reason -> [cases]}}. */
  def report: Map[String, Map[String, Seq[SchemaError]]] =
    errors.groupBy(_.category.toString).map { case (cat, es) =>
      cat -> es.groupBy(_.reason.toString)
    }

  def reportJson: String = {
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val cats = report.toSeq.sortBy(_._1).map { case (cat, byReason) =>
      val rs = byReason.toSeq.sortBy(_._1).map { case (reason, es) =>
        val items = es.map { e =>
          s"""{"column":${e.column.map(c => "\"" + esc(c) + "\"").getOrElse("null")},""" +
            s""""check":"${esc(e.check)}","failure_count":${e.failureCount},""" +
            s""""failure_cases":[${e.failureCases.map(f => "\"" + esc(f) + "\"").mkString(",")}],""" +
            s""""message":"${esc(e.message)}","warning":${e.isWarning}}"""
        }
        s""""$reason":[${items.mkString(",")}]"""
      }
      s""""$cat":{${rs.mkString(",")}}"""
    }
    s"{${cats.mkString(",")}}"
  }
}

/** Validation depth knob (reference: pandera/config.py:12-17) plus the
  * enable/cache env knobs (config.py:79-110). Env names keep the
  * reference's spelling with a GRAFT_ fallback.
  */
object GraftConfig {
  sealed trait Depth
  case object SchemaOnly extends Depth
  case object DataOnly extends Depth
  case object SchemaAndData extends Depth

  private def env(k: String): Option[String] =
    sys.env.get("GRAFT_" + k).orElse(sys.env.get("PANDERA_" + k))

  def validationEnabled: Boolean =
    !env("VALIDATION_ENABLED").exists(v => v.equalsIgnoreCase("false") || v == "0")

  def validationDepth: Depth = env("VALIDATION_DEPTH") match {
    case Some(v) if v.equalsIgnoreCase("SCHEMA_ONLY") => SchemaOnly
    case Some(v) if v.equalsIgnoreCase("DATA_ONLY")   => DataOnly
    case _                                            => SchemaAndData
  }

  // programmatic overrides (primarily for tests — env vars cannot change
  // after JVM start); None falls through to the env knobs
  @volatile private[graft] var cacheOverride: Option[Boolean] = None
  @volatile private[graft] var keepCachedOverride: Option[Boolean] = None

  def cacheDataFrame: Boolean = cacheOverride.getOrElse(
    env("CACHE_DATAFRAME").exists(v => v.equalsIgnoreCase("true") || v == "1"))
  def keepCachedDataFrame: Boolean = keepCachedOverride.getOrElse(
    env("KEEP_CACHED_DATAFRAME").exists(v => v.equalsIgnoreCase("true") || v == "1"))
}
