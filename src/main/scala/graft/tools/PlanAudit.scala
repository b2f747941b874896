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

    println("==== capPerGroup ====")
    graft.ext.Sampling.capPerGroup(docs, "doc_id", "lang", 40, seed = 7)
      .explain("formatted")

    println("==== dropExistingExactBloom ====")
    val inc = docs.select(col("doc_id") + 1000000, col("text"))
    graft.ext.Dedup.dropExistingExactBloom(inc, docs, "doc_id", "text")
      .explain("formatted")

    println("==== chunkDocuments ====")
    graft.ext.TextAnalysis.chunkDocuments(docs, "doc_id", "text", 32, 24)
      .explain("formatted")

    println("==== sessionize ====")
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    graft.ext.Sessions.sessionize(events, "user_id", "ts", "value")
      .explain("formatted")

    println("==== pqTopK ====")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    graft.ext.Similarity.pqTopK(emb, "vec_id", "embedding", qs, "qid", "qv", 5)
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
