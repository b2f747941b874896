package graft.inference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.checks.Check
import graft.schema.{ColumnSchema, DataFrameSchema}

/** Schema inference — bootstrap a DataFrameSchema from observed data.
  *
  * Reference: pandera/schema_inference/pyspark.py:15-48 +
  * pandera/schema_statistics/pyspark.py:12-73. The reference runs one
  * null-count aggregation then N per-column min/max jobs (:50-54); here ALL
  * statistics (null counts, min/max for numeric/temporal, approximate
  * distinct counts for category detection) fuse into ONE aggregation pass —
  * a single scan regardless of column count, which is what survives 100 TB.
  * Category candidates use approx_count_distinct (HLL) instead of an exact
  * distinct per column; the candidate set is then confirmed with one
  * collect_set pass over only the qualifying columns.
  */
object InferSchema {

  final case class ColStats(
      dataType: DataType,
      nullCount: Long,
      min: Option[Any],
      max: Option[Any],
      approxDistinct: Long)

  private def q(n: String) = col("`" + n.replace("`", "``") + "`")

  private def isMinMaxable(dt: DataType): Boolean = dt match {
    case _: NumericType | DateType | TimestampType | TimestampNTZType => true
    case _                                                            => false
  }

  /** One fused pass computing every column's statistics. */
  def statistics(df: DataFrame): Seq[(String, ColStats)] = {
    val fields = df.schema.fields.toSeq
    val aggs = fields.flatMap { f =>
      val c = q(f.name)
      val base = Seq(
        coalesce(sum(when(c.isNull, 1L)), lit(0L)).as(s"nul__${f.name}"),
        approx_count_distinct(c).as(s"dst__${f.name}"))
      if (isMinMaxable(f.dataType))
        base ++ Seq(min(c).as(s"min__${f.name}"), max(c).as(s"max__${f.name}"))
      else base
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    fields.map { f =>
      val mn =
        if (isMinMaxable(f.dataType)) Option(row.getAs[Any](s"min__${f.name}"))
        else None
      val mx =
        if (isMinMaxable(f.dataType)) Option(row.getAs[Any](s"max__${f.name}"))
        else None
      f.name -> ColStats(f.dataType, row.getAs[Long](s"nul__${f.name}"),
        mn, mx, row.getAs[Long](s"dst__${f.name}"))
    }
  }

  /** Infer a coercing schema: observed dtype, nullability from null counts,
    * ge/le checks from min/max, isin for low-cardinality strings
    * (category detection threshold mirrors the reference's distinct<=256,
    * schema_statistics/pyspark.py:56-57). */
  def infer(df: DataFrame, categoryMaxDistinct: Int = 256): DataFrameSchema = {
    val stats = statistics(df)
    // HLL has ~2% error; confirm candidates with one exact pass, bounded.
    val catCandidates = stats.collect {
      case (n, s) if s.dataType == StringType &&
        s.approxDistinct <= categoryMaxDistinct * 2 => n
    }
    val exactSets: Map[String, Seq[String]] =
      if (catCandidates.isEmpty) Map.empty
      else {
        val aggs = catCandidates.map(n =>
          slice(sort_array(collect_set(q(n))), 1, categoryMaxDistinct + 1)
            .as(s"set__$n"))
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        catCandidates.map { n =>
          n -> row.getAs[scala.collection.Seq[String]](s"set__$n").toSeq
        }.toMap
      }
    val cols = stats.map { case (n, s) =>
      val checks = scala.collection.mutable.ArrayBuffer.empty[Check]
      s.min.foreach(v => checks += Check.ge(v))
      s.max.foreach(v => checks += Check.le(v))
      exactSets.get(n).filter(_.size <= categoryMaxDistinct)
        .foreach(vs => checks += Check.isin(vs))
      n -> ColumnSchema(dtype = Some(s.dataType), checks = checks.toSeq,
        nullable = s.nullCount > 0, coerce = true)
    }
    DataFrameSchema(cols: _*)
  }
}
