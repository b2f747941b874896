package graft.model

import scala.reflect.runtime.universe.TypeTag
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import graft.checks.Check
import graft.errors.{SchemaError, ValidationResult}
import graft.schema.{ColumnSchema, DataFrameSchema}

/** Class-based schema definition — the Scala counterpart of the reference's
  * DataFrameModel (pandera/api/dataframe/model.py:256): the typed carrier is
  * a case class + `Dataset[T]`, the schema is derived from the encoder at
  * compile time (no runtime annotation walking), and per-field constraints
  * attach through a builder, replacing `Field(...)`/`@check` methods
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
    *   .schema
    * }}}
    */
  def of[T <: Product: TypeTag]: TypedSchema[T] = TypedSchema[T](derive[T])
}

final case class TypedSchema[T](schema: DataFrameSchema) {
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

  /** Validate a typed Dataset; the data comes back AS the same type. */
  def validate(ds: Dataset[T]): TypedValidationResult[T] = {
    val res = schema.validate(ds.toDF())
    TypedValidationResult(ds, res.errors)
  }
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
