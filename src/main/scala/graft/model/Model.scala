package graft.model

import scala.reflect.runtime.universe.TypeTag
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import graft.checks.Check
import graft.errors.{SchemaError, ValidationResult}
import graft.schema.{ColumnSchema, DataFrameParser, DataFrameSchema, Parser}

/** Class-based schema definition — the Scala counterpart of the reference's
  * DataFrameModel (pandera/api/dataframe/model.py:256): the typed carrier is
  * a case class + `Dataset[T]`, the schema is derived from the encoder at
  * compile time (no runtime annotation walking), and per-field constraints
  * attach through a builder, replacing `Field(...)`/`@check` methods
  * (model_components.py:114-157). Parser hooks mirror
  * `@parser`/`@dataframe_parser` (api/dataframe/model.py:397,413); `alias`
  * and `regexField` mirror Field(alias=...)/Field(regex=...)
  * (model_components.py:114-157).
  */
object DataFrameModel {

  /** Derive a permissive schema from a case class via its Spark Encoder
    * (dtype + nullability per field, declaration order preserved). */
  def derive[T <: Product: TypeTag]: DataFrameSchema =
    DataFrameSchema.fromStructType(Encoders.product[T].schema)

  /** Derive + attach field constraints fluently:
    * {{{
    * case class Item(id: Long, price: Double)
    * val schema = DataFrameModel.of[Item]
    *   .field("id", Check.ge(0L)).unique("id")
    *   .field("price", Check.gt(0.0))
    *   .parser("price", "clip")(c => least(c, lit(100.0)))
    *   .schema
    * }}}
    */
  def of[T <: Product: TypeTag]: TypedSchema[T] =
    TypedSchema[T](derive[T])(Encoders.product[T])
}

final case class TypedSchema[T](schema: DataFrameSchema)(
    implicit enc: Encoder[T]) {
  def field(name: String, checks: Check*): TypedSchema[T] =
    copy(schema = schema.updateColumn(name)(_.withChecks(checks: _*)))
  def unique(name: String): TypedSchema[T] =
    copy(schema = schema.updateColumn(name)(_.copy(unique = true)))
  def notNullable(name: String): TypedSchema[T] =
    copy(schema = schema.updateColumn(name)(_.copy(nullable = false)))
  def coerce(name: String): TypedSchema[T] =
    copy(schema = schema.updateColumn(name)(_.copy(coerce = true)))
  def tableChecks(checks: Check*): TypedSchema[T] =
    copy(schema = schema.copy(checks = schema.checks ++ checks))
  def tableUnique(cols: String*): TypedSchema[T] =
    copy(schema = schema.copy(unique = cols))

  /** Schema-wide options in one call — the counterpart of the reference
    * model's `class Config` (api/pyspark/model_config.py:12-66: name,
    * coerce, strict, ordered, unique, unique_column_names, dtype,
    * metadata). Unspecified options are left unchanged. */
  def config(
      name: Option[String] = None,
      coerce: Option[Boolean] = None,
      strict: Option[graft.schema.Strict] = None,
      ordered: Option[Boolean] = None,
      uniqueColumnNames: Option[Boolean] = None,
      unique: Option[Seq[String]] = None,
      dtype: Option[org.apache.spark.sql.types.DataType] = None,
      metadata: Option[Map[String, String]] = None): TypedSchema[T] = {
    var s = schema
    name.foreach(v => s = s.copy(name = Some(v)))
    coerce.foreach(v => s = s.copy(coerce = v))
    strict.foreach(v => s = s.copy(strict = v))
    ordered.foreach(v => s = s.copy(ordered = v))
    uniqueColumnNames.foreach(v => s = s.copy(uniqueColumnNames = v))
    unique.foreach(v => s = s.copy(unique = v))
    dtype.foreach(v => s = s.withDtype(v))
    metadata.foreach(v => s = s.copy(metadata = v))
    copy(schema = s)
  }

  /** Column-level pre-validation transform — the reference's `@parser`
    * (api/dataframe/model.py:397): rewrites the field before checks run. */
  def parser(field: String, name: String)(fn: Column => Column): TypedSchema[T] =
    copy(schema = schema.updateColumn(field)(cs =>
      cs.copy(parsers = cs.parsers :+ Parser(name, fn))))

  /** DataFrame-level pre-validation transform — the reference's
    * `@dataframe_parser` (api/dataframe/model.py:413). */
  def dataframeParser(name: String)(fn: DataFrame => DataFrame): TypedSchema[T] =
    copy(schema = schema.copy(parsers = schema.parsers :+ DataFrameParser(name, fn)))

  /** Validate field `field` under the dataframe column name `columnName` —
    * the reference's Field(alias=...). The carrier for aliased schemas is a
    * DataFrame (the case-class field names no longer match); use
    * [[validateDf]]. */
  def alias(field: String, columnName: String): TypedSchema[T] =
    copy(schema = schema.renameColumns(Map(field -> columnName)))

  /** Add a regex-name column constraint beyond the typed fields — the
    * reference's Field(regex=True) on an annotated pattern attribute. */
  def regexField(pattern: String, checks: Check*): TypedSchema[T] =
    copy(schema = schema.addColumns(
      pattern -> ColumnSchema(checks = checks, regex = true)))

  /** Validate a typed Dataset; the PARSED/validated data comes back typed
    * (requires field names unchanged — with `alias`/`regexField` use
    * [[validateDf]]). */
  def validate(ds: Dataset[T]): TypedValidationResult[T] = {
    val res = schema.validate(ds.toDF())
    TypedValidationResult(res.data.as[T](enc), res.errors)
  }

  /** Validate an untyped DataFrame against the derived schema (the path
    * for alias / regexField, where names diverge from the case class). */
  def validateDf(df: DataFrame): ValidationResult = schema.validate(df)
}

final case class TypedValidationResult[T](data: Dataset[T], errors: Seq[SchemaError]) {
  def passed: Boolean = errors.forall(_.isWarning)
  def orThrow: Dataset[T] =
    if (passed) data else throw new graft.errors.SchemaErrorException(errors.filterNot(_.isWarning))
}

/** Function-boundary validation combinators — the Scala counterpart of the
  * reference's @check_input/@check_output/@check_io/@check_types decorators
  * (pandera/decorators.py:153-650). Wrap a function so its inputs/outputs
  * are validated (throwing on hard errors, like the pandas backend).
  */
object Decorators {

  def checkInput[R](schema: DataFrameSchema)(f: DataFrame => R): DataFrame => R =
    df => f(schema.validate(df).orThrow)

  def checkOutput[A](schema: DataFrameSchema)(f: A => DataFrame): A => DataFrame =
    a => schema.validate(f(a)).orThrow

  def checkIo(in: DataFrameSchema, out: DataFrameSchema)(
      f: DataFrame => DataFrame): DataFrame => DataFrame =
    df => out.validate(f(in.validate(df).orThrow)).orThrow

  /** check_types analog: the annotation IS the case class. */
  def checkTypes[T <: Product: TypeTag, R](extra: TypedSchema[T] => TypedSchema[T] = identity[TypedSchema[T]] _)(
      f: Dataset[T] => R): Dataset[T] => R =
    ds => f(extra(DataFrameModel.of[T]).validate(ds).orThrow)
}
