package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.types._
import graft.checks.Check
import graft.errors.ValidationResult

/** Pre-validation transformation applied before checks
  * (reference: pandera/api/parsers.py:9-64; lifecycle position
  * backends/pandas/container.py:81). Column-level parsers rewrite the
  * column; df-level parsers rewrite the whole frame.
  */
final case class Parser(name: String, transform: Column => Column)
final case class DataFrameParser(name: String, transform: DataFrame => DataFrame)

/** Strictness of extra-column handling
  * (reference: strict / strict="filter", backends/pandas/container.py:549). */
sealed trait Strict
object Strict {
  case object NotStrict extends Strict // extras pass through
  case object Error extends Strict     // extras are an error
  case object Filter extends Strict    // extras silently dropped
}

/** Duplicate-reporting mode for uniqueness checks
  * (reference: report_duplicates ∈ {all, exclude_first, exclude_last},
  * pandera/backends/pandas/container.py:867-921). Spark rows have no stable
  * order, so exclude_first/exclude_last count n-1 duplicates per key
  * (order-insensitive — documented deviation, SURVEY.md §7 hard part (b)).
  */
sealed trait ReportDuplicates
object ReportDuplicates {
  case object All extends ReportDuplicates
  case object ExcludeFirst extends ReportDuplicates
  case object ExcludeLast extends ReportDuplicates
}

/** Column contract: dtype + checks + flags.
  * Reference: pandera/api/pandas/components.py:18-111 and the pyspark
  * concretion pandera/backends/pyspark/components.py.
  */
final case class ColumnSchema(
    dtype: Option[DataType] = None,
    checks: Seq[Check] = Nil,
    parsers: Seq[Parser] = Nil,
    nullable: Boolean = true,
    unique: Boolean = false,
    coerce: Boolean = false,
    required: Boolean = true,
    regex: Boolean = false, // name is a regex matched against df.columns
    default: Option[Any] = None,
    title: Option[String] = None,
    description: Option[String] = None,
    metadata: Map[String, String] = Map.empty) {
  def withChecks(cs: Check*): ColumnSchema = copy(checks = checks ++ cs)
}

object ColumnSchema {
  def of(dt: DataType, cs: Check*): ColumnSchema =
    ColumnSchema(dtype = Some(dt), checks = cs)

  /** Unsigned integer columns — Spark has no unsigned physical types, so
    * (SURVEY §1.3) each widens to the next signed type plus a ge(0) check
    * (pandera's UInt8/16/32/64, engines/pandas_engine.py:422-451). */
  def uint8(cs: Check*): ColumnSchema =
    ColumnSchema(dtype = Some(ShortType), checks = Check.ge(0) +: cs)
  def uint16(cs: Check*): ColumnSchema =
    ColumnSchema(dtype = Some(IntegerType), checks = Check.ge(0) +: cs)
  def uint32(cs: Check*): ColumnSchema =
    ColumnSchema(dtype = Some(LongType), checks = Check.ge(0L) +: cs)
  /** uint64 has no wider signed host; LongType + ge(0) covers [0, 2^63). */
  def uint64(cs: Check*): ColumnSchema =
    ColumnSchema(dtype = Some(LongType), checks = Check.ge(0L) +: cs)
}

/** Declarative table contract.
  * Reference: pandera/api/dataframe/container.py:44-180 (ctor params
  * :45-64) and the pyspark concretion pandera/api/pyspark/container.py:36.
  * Columns keep declaration order (needed for `ordered`).
  */
final case class DataFrameSchema(
    columns: Seq[(String, ColumnSchema)],
    checks: Seq[Check] = Nil,
    parsers: Seq[DataFrameParser] = Nil,
    unique: Seq[String] = Nil, // table-level joint uniqueness
    coerce: Boolean = false,
    strict: Strict = Strict.NotStrict,
    ordered: Boolean = false,
    uniqueColumnNames: Boolean = false,
    addMissingColumns: Boolean = false,
    dropInvalidRows: Boolean = false,
    reportDuplicates: ReportDuplicates = ReportDuplicates.All,
    name: Option[String] = None,
    title: Option[String] = None,
    description: Option[String] = None,
    metadata: Map[String, String] = Map.empty) {

  def columnNames: Seq[String] = columns.map(_._1)
  def column(n: String): Option[ColumnSchema] = columns.find(_._1 == n).map(_._2)

  /** Column- and schema-level metadata in one structure, wrapped under the
    * schema's name like the reference (get_metadata,
    * api/dataframe/container.py:265-276 returns {name: {columns…,
    * dataframe…}}; an unnamed schema keys on null there, here on ""). */
  def getMetadata: Map[String, Map[String, Any]] = Map(
    name.getOrElse("") -> Map(
      "columns" -> columns.map { case (n, c) => n -> c.metadata }.toMap,
      "dataframe" -> metadata))

  /** Validate `df` (lazy/accumulating, like the pyspark reference which
    * never raises: backends/pyspark/container.py). */
  def validate(df: DataFrame): ValidationResult =
    graft.backend.Validator.validate(this, df)
  def apply(df: DataFrame): ValidationResult = validate(df)

  /** Validate a `fraction` sample (reference: backends/pyspark/base.py:55-69). */
  def validateSample(df: DataFrame, fraction: Double, seed: Long = 42L): ValidationResult =
    graft.backend.Validator.validate(this, df, sample = Some((fraction, seed)))

  // ---- schema ⇄ Spark schema (reference: to_structtype
  // pandera/api/pyspark/container.py:163-177, to_ddl :179-190) ----
  def toStructType: StructType = StructType(columns.map { case (n, c) =>
    StructField(n, c.dtype.getOrElse(StringType), c.nullable)
  })
  def toDdl: String = toStructType.toDDL

  // ---- §2.E schema-transform operators (pure metadata; reference:
  // pandera/api/dataframe/container.py:452-1134, index ones N/A) ----
  def addColumns(cols: (String, ColumnSchema)*): DataFrameSchema = {
    val dup = cols.map(_._1).intersect(columnNames)
    require(dup.isEmpty, s"columns already exist: ${dup.mkString(",")}")
    copy(columns = columns ++ cols)
  }
  def removeColumns(names: String*): DataFrameSchema = {
    val missing = names.diff(columnNames)
    require(missing.isEmpty, s"columns not in schema: ${missing.mkString(",")}")
    copy(columns = columns.filterNot(c => names.contains(c._1)))
  }
  def updateColumn(n: String)(f: ColumnSchema => ColumnSchema): DataFrameSchema = {
    require(columnNames.contains(n), s"column not in schema: $n")
    copy(columns = columns.map { case (cn, cs) => if (cn == n) (cn, f(cs)) else (cn, cs) })
  }
  def updateColumns(names: Seq[String])(f: ColumnSchema => ColumnSchema): DataFrameSchema =
    names.foldLeft(this)((s, n) => s.updateColumn(n)(f))
  def renameColumns(mapping: Map[String, String]): DataFrameSchema = {
    val missing = mapping.keySet.diff(columnNames.toSet)
    require(missing.isEmpty, s"columns not in schema: ${missing.mkString(",")}")
    copy(columns = columns.map { case (n, c) => (mapping.getOrElse(n, n), c) })
  }
  def selectColumns(names: String*): DataFrameSchema = {
    val missing = names.diff(columnNames)
    require(missing.isEmpty, s"columns not in schema: ${missing.mkString(",")}")
    copy(columns = names.map(n => n -> column(n).get))
  }
  def getDtypes: Map[String, DataType] =
    columns.collect { case (n, c) if c.dtype.isDefined => n -> c.dtype.get }.toMap
  def coerceDtype(on: Boolean = true): DataFrameSchema = copy(coerce = on)

  /** Schema-wide uniform dtype — the reference's DataFrameSchema.dtype
    * setter (api/pyspark/container.py:54-57) and model Config.dtype
    * ("overrides the data types specified in any of the fields",
    * api/pyspark/model_config.py:19-21): stamps every column's dtype. */
  def withDtype(dt: DataType): DataFrameSchema =
    copy(columns = columns.map { case (n, c) => n -> c.copy(dtype = Some(dt)) })
  def setChecks(cs: Check*): DataFrameSchema = copy(checks = cs)

  /** Resolve regex-named columns against actual df columns
    * (reference: get_regex_columns, backends/pyspark/components.py:76-102).
    * Returns (resolvedName -> (declaredName, schema)) preserving order.
    */
  def resolveColumns(dfColumns: Seq[String]): Seq[(String, (String, ColumnSchema))] =
    columns.flatMap { case (n, c) =>
      if (!c.regex) Seq(n -> (n, c))
      else {
        val p = n.r
        dfColumns.filter(dc => p.pattern.matcher(dc).matches()).map(dc => dc -> (n, c))
      }
    }
}

/** One schema-evolution finding from [[SchemaDiff.report]]. */
final case class SchemaChange(column: String, change: String,
    from: String, to: String)

/** Schema-evolution diff — the compatibility report a pipeline consults
  * before swapping contract versions: which columns appeared, vanished,
  * changed dtype/nullability, or changed their check set. Pure metadata
  * (zero Spark jobs); emitted as a DataFrame so it gates and stores like
  * any other result. */
object SchemaDiff {
  def changes(from: DataFrameSchema, to: DataFrameSchema): Seq[SchemaChange] = {
    def dt(c: ColumnSchema) = c.dtype.map(_.simpleString).getOrElse("any")
    def checks(c: ColumnSchema) =
      c.checks.map(_.name).sorted.mkString(",") match { case "" => "none"; case s => s }
    val fromCols = from.columns.toMap
    val toCols = to.columns.toMap
    val removed = from.columns.collect { case (n, c) if !toCols.contains(n) =>
      SchemaChange(n, "removed", dt(c), "") }
    val added = to.columns.collect { case (n, c) if !fromCols.contains(n) =>
      SchemaChange(n, "added", "", dt(c)) }
    val common = from.columns.collect { case (n, a) if toCols.contains(n) =>
      val b = toCols(n)
      Seq(
        if (dt(a) != dt(b)) Some(SchemaChange(n, "dtype_changed", dt(a), dt(b))) else None,
        if (a.nullable != b.nullable)
          Some(SchemaChange(n, "nullable_changed", a.nullable.toString, b.nullable.toString))
        else None,
        if (checks(a) != checks(b))
          Some(SchemaChange(n, "checks_changed", checks(a), checks(b))) else None
      ).flatten
    }.flatten
    val table =
      (if (from.unique != to.unique)
        Seq(SchemaChange("", "unique_key_changed",
          from.unique.mkString("+"), to.unique.mkString("+"))) else Nil) ++
      (if (from.strict != to.strict)
        Seq(SchemaChange("", "strict_changed",
          from.strict.toString, to.strict.toString)) else Nil)
    (removed ++ added ++ common ++ table)
      .sortBy(c => (c.column, c.change))
  }

  def report(spark: org.apache.spark.sql.SparkSession,
      from: DataFrameSchema, to: DataFrameSchema): DataFrame = {
    import spark.implicits._
    changes(from, to).toDF("column", "change", "from_value", "to_value")
  }
}

object DataFrameSchema {
  def apply(cols: (String, ColumnSchema)*): DataFrameSchema =
    new DataFrameSchema(columns = cols)

  /** Build a permissive schema straight from a Spark StructType. */
  def fromStructType(st: StructType): DataFrameSchema =
    new DataFrameSchema(st.fields.toSeq.map(f =>
      f.name -> ColumnSchema(dtype = Some(f.dataType), nullable = f.nullable)))
}

/** Single-column standalone schema
  * (reference: SeriesSchema, pandera/api/pandas/array.py:101). */
final case class SeriesSchema(columnName: String, schema: ColumnSchema) {
  def validate(df: DataFrame): ValidationResult =
    DataFrameSchema(columnName -> schema).validate(df)
}

/** Implicit enrichment standing in for the reference's `df.pandera`
  * accessor (pandera/accessors/pyspark_sql_accessor.py:19-53). */
object implicits {
  implicit final class RichDataFrame(private val df: DataFrame) extends AnyVal {
    def validateWith(schema: DataFrameSchema): ValidationResult = schema.validate(df)
  }
}
