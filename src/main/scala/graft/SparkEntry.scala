package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.checks.{Check, ColumnCheck}
import graft.errors.ValidationResult
import graft.hypothesis.Hypothesis
import graft.inference.InferSchema
import graft.schema._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry exercises the graft validation engine (or an extension
  * operator) end-to-end on the driver's parquet tables and emits a
  * DataFrame whose values a DuckDB oracle (oracleSql) reproduces.
  * All row-producing queries ORDER BY a deterministic key on both sides.
  */
/** Typed carrier for the model_dsl query (DataFrameModel derivation). */
case class LineitemQty(l_orderkey: Option[Long], l_linenumber: Option[Int],
                       l_quantity: Option[Double])

/** Typed carrier for the model_typed query: mixed primitive (non-nullable
  * by construction) and Option (nullable) fields — the encoder-derived
  * nullability is part of the gate's pinned output. */
case class OrderRow(o_orderkey: Long, o_custkey: Option[Long],
                    o_totalprice: Option[Double], o_orderstatus: String)

object SparkEntry {

  import GateSupport._


  /** Flagship: full lineitem contract at sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val li = t(spark, "/root/testdata/sf0.001", "lineitem")
    val schema = DataFrameSchema(
      "l_orderkey" -> ColumnSchema(Some(LongType), Seq(Check.ge(1L)), nullable = false),
      "l_linenumber" -> ColumnSchema(Some(IntegerType), Seq(Check.ge(1)), nullable = false),
      "l_quantity" -> ColumnSchema(Some(DoubleType), Seq(Check.inRange(1.0, 50.0))),
      "l_extendedprice" -> ColumnSchema(Some(DoubleType), Seq(Check.gt(0.0))),
      "l_discount" -> ColumnSchema(Some(DoubleType), Seq(Check.inRange(0.0, 0.2))),
      "l_tax" -> ColumnSchema(Some(DoubleType), Seq(Check.ge(0.0))),
      "l_returnflag" -> ColumnSchema(Some(StringType), Seq(Check.isin(Seq("A", "N", "R")))),
      "l_linestatus" -> ColumnSchema(Some(StringType), Seq(Check.isin(Seq("F", "O")))))
      .copy(unique = Seq("l_orderkey", "l_linenumber"))
    schema.validate(li).data
  }

  /** Concatenate the module maps, refusing duplicate gate names (r17
    * advice: plain ++ would silently right-bias a name accidentally
    * defined in two modules — the earlier gate body would vanish from the
    * registry with every oracle still green). */
  private def disjoint[V](parts: (String, Map[String, V])*): Map[String, V] = {
    val dups = parts.flatMap { case (m, kv) => kv.keys.map(_ -> m) }
      .groupBy(_._1).filter(_._2.size > 1)
    require(dups.isEmpty,
      "duplicate gate name(s) across registry modules: " +
        dups.toSeq.sortBy(_._1).map { case (k, ms) =>
          s"$k (${ms.map(_._2).mkString(", ")})" }.mkString("; "))
    parts.iterator.map(_._2).reduce(_ ++ _)
  }

  /** The full gate registry, split by family (r16-verdict #6) — the
    * combination is the same map the driver has always seen. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    disjoint(
      "GatesChecks" -> GatesChecks.queries,
      "GatesCore" -> GatesCore.queries,
      "GatesHyp" -> GatesHyp.queries,
      "GatesDedup" -> GatesDedup.queries,
      "GatesSim" -> GatesSim.queries,
      "GatesText" -> GatesText.queries,
      "GatesData" -> GatesData.queries,
      "GatesPipeline" -> GatesPipeline.queries)

  lazy val oracleSql: Map[String, String] =
    disjoint(
      "GatesChecks" -> GatesChecks.oracleSql,
      "GatesCore" -> GatesCore.oracleSql,
      "GatesHyp" -> GatesHyp.oracleSql,
      "GatesDedup" -> GatesDedup.oracleSql,
      "GatesSim" -> GatesSim.oracleSql,
      "GatesText" -> GatesText.oracleSql,
      "GatesData" -> GatesData.oracleSql,
      "GatesPipeline" -> GatesPipeline.oracleSql)
}
