package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Bench

/** Dump `.explain("formatted")` for the bench sections the r19
  * optimization round touches — the judge-checkable plan evidence
  * (plans/r19/<section>_<tag>.txt). Usage:
  *   runMain graft.tools.PlanDump <outDir> <tag> [sfDir]
  * Sections whose timed body is a multi-job loop (clusterPairs,
  * classifier_train) or a store write have no single dumpable plan; the
  * ones here are the single-DataFrame pipelines. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.lift(0).getOrElse("plans/r19")
    val tag = args.lift(1).getOrElse("before")
    val sfDir = args.lift(2).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))

    // inputs exactly as the suite reads them (r19: replicate10 spreads
    // the 10x corpus itself; customer spreads — see Bench — li/docs not)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val docs10 = Bench.replicate10(docs)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cust = Bench.spreadInput(
      spark.read.parquet(s"$sfDir/customer.parquet"), "c_custkey")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

    def dump(name: String, df: => DataFrame): Unit = {
      val plan = try df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      catch { case e: Exception => s"PLAN FAILED: $e" }
      Files.write(Paths.get(s"$outDir/${name}_$tag.txt"),
        plan.getBytes("UTF-8"))
      println(s"dumped $name ($tag): ${plan.length} chars")
    }

    dump("dedup_minhash_10x",
      graft.ext.Dedup.minhashPairs(docs10, "doc_id", "text", 3, 64, 16, 0.8))
    dump("dedup_span_rewrite_10x",
      graft.ext.Dedup.cutDuplicatedSpans(docs10, "doc_id", "text", k = 8)
        .agg(sum(col("tokens_removed"))))
    dump("heavy_hitters_10x", {
      val toks = graft.ext.TextAnalysis.tokens(
        graft.ext.TextAnalysis.normalized(col("text")))
      graft.ext.HeavyHitters.frequentItems(
        docs10.select(explode(
          graft.functions.HashFunctions.tokenNgrams(toks, 2)).as("bigram")),
        "bigram", phi = 0.0015)
    })
    dump("text_bm25_10x", {
      val q = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select(col("doc_id").as("query_id"), concat_ws(" ",
          slice(graft.ext.TextAnalysis.tokens(col("text")), 1, 3)).as("qtext"))
      graft.ext.Retrieval.bm25TopK(docs10, "doc_id", "text", q,
        "query_id", "qtext", k = 10)
    })
    dump("text_kneser_ney_10x",
      graft.ext.TextAnalysis.kneserNey(docs10, "doc_id", "text",
        minBigramCount = 2).agg(sum("n_tokens")))
    dump("text_backoff_10x",
      graft.ext.TextAnalysis.stupidBackoff(docs10, "doc_id", "text",
        minBigramCount = 2).agg(sum("n_tokens")))
    dump("er_fuzzy_dedup",
      graft.ext.EntityResolution.fuzzyDedup(cust, "c_custkey", "c_name",
        col("c_nationkey"), threshold = 0.97))
    dump("dedup_bloom_inc_10x",
      graft.ext.Dedup.dropExistingExactBloom(docs, docs10, "doc_id", "text"))
    dump("pack_sequences_10x", {
      val withTok = docs10.select(col("doc_id"),
        graft.ext.TextAnalysis.tokenCount(col("text")).as("ntok"))
      graft.ext.Packing.packSequences(withTok, "doc_id", "ntok", seqLen = 2048)
    })
    dump("validate_full", Bench.lineitemSchema.validate(li).data)
    spark.stop()
  }
}
