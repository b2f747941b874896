package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical event-time resolution. The events table's `ts` column has
  * shipped in two physical shapes: parquet timestamp[us] (read natively as
  * TIMESTAMP or TIMESTAMP_NTZ depending on isAdjustedToUTC) and parquet
  * timestamp[ns] under `spark.sql.legacy.parquet.nanosAsLong` (an
  * epoch-nanos BIGINT). Every time-based operator resolves the column
  * through here so all shapes converge on one TimestampType column —
  * interpreted in the session timezone, which this project pins to UTC
  * (build.sbt / Verify / Bench / SparkSpec), matching the DuckDB oracle's
  * naive-as-UTC `epoch_ns(ts)` reading. */
object EventTime {

  /** `df(tsCol)` as a TimestampType (µs) column. LongType input is an
    * epoch-NANOS long: integer `div`, not `/` — the SQL slash promotes the
    * long to double (53-bit mantissa < 2^60-scale nanos → ±µs drift). */
  def eventTime(df: DataFrame, tsCol: String): Column = {
    // Case-insensitive field lookup to match Spark's default column
    // resolution — df.schema(name) alone is exact-match and would reject
    // "TS" for a column named "ts" that col() happily resolves (r7 ADVICE).
    val field = df.schema.fields.find(_.name == tsCol)
      .orElse(df.schema.fields.find(_.name.equalsIgnoreCase(tsCol)))
      .getOrElse(throw new IllegalArgumentException(
        s"eventTime: no column named '$tsCol' in [${df.columns.mkString(", ")}]"))
    // build the expression over the RESOLVED field's name (not the caller's
    // spelling): under spark.sql.caseSensitive=true, col("TS") would fail
    // to analyze — or resolve a DIFFERENT column than the one whose dtype
    // drove the dispatch below
    val c = col("`" + field.name.replace("`", "``") + "`")
    field.dataType match {
      case LongType => timestamp_micros(call_function("div", c, lit(1000L)))
      case TimestampType => c
      case TimestampNTZType => c.cast(TimestampType) // exact under UTC session tz
      case DateType => c.cast(TimestampType)
      case other => throw new IllegalArgumentException(
        s"eventTime: column '$tsCol' has unsupported type ${other.sql} " +
          "(expected epoch-nanos BIGINT, TIMESTAMP, TIMESTAMP_NTZ, or DATE)")
    }
  }

  /** Same instant as an epoch-MICROS long column — for span arithmetic
    * (watermark sizing, sentinel placement) that must stay integral. */
  def eventMicros(df: DataFrame, tsCol: String): Column =
    unix_micros(eventTime(df, tsCol))
}
