package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Maintenance utility: dump formatted physical plans of the hot operators
  * so shuffle/broadcast/pushdown shape can be reviewed after changes.
  * Usage: runMain graft.tools.PlanAudit <sfDir> */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

    println("==== minhashPairs (guarded) ====")
    graft.ext.Dedup.minhashPairs(docs, "doc_id", "text", 3, 64, 16, 0.8)
      .explain("formatted")

    println("==== splitByRowChecks valid side ====")
    val schema = graft.schema.DataFrameSchema(
      "l_orderkey" -> graft.schema.ColumnSchema(None, Seq(graft.checks.Check.ge(1L)), nullable = false),
      "l_quantity" -> graft.schema.ColumnSchema(None, Seq(graft.checks.Check.inRange(1.0, 50.0))))
    val (valid, invalid) = graft.backend.Validator.splitByRowChecks(schema, li.select("l_orderkey", "l_quantity"))
    valid.explain("formatted")
    println("==== splitByRowChecks invalid side ====")
    invalid.explain("formatted")
    spark.stop()
  }
}
