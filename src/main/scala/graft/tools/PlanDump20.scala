package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Bench

/** Dump `.explain("formatted")` for the bench sections the r20
  * optimization round touches (plans/r20/<section>_<tag>.txt) — the
  * sibling of the r19 [[PlanDump]]. Store APPENDS and the clusterPairs
  * loop have no single dumpable plan (multi-job bodies); their evidence
  * is [[R20Probe]]'s jobs-per-append / per-table file counts. The
  * dumpable ones here:
  *   - sim_topk_pq / sim_ivfpq_serve (the serve DataFrames)
  *   - dedup_store_scrub_10x (the store serve against a freshly built
  *     store — its scan arms show the store's file layout)
  * Usage: runMain graft.tools.PlanDump20 <outDir> <tag> [sfDir]
  */
object PlanDump20 {
  def main(args: Array[String]): Unit = {
    val outDir = args.lift(0).getOrElse("plans/r20")
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

    def dump(name: String, df: => DataFrame): Unit = {
      val plan = try df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      catch { case e: Exception => s"PLAN FAILED: $e" }
      Files.write(Paths.get(s"$outDir/${name}_$tag.txt"),
        plan.getBytes("UTF-8"))
      println(s"dumped $name ($tag): ${plan.length} chars")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))

    dump("sim_topk_pq",
      graft.ext.Similarity.pqTopK(emb, "vec_id", "embedding",
        queries, "qid", "qv", 5))
    val annIdx = graft.ext.Similarity.trainIvfPq(emb, "vec_id", "embedding",
      nCentroids = 64, m = 8, ksub = 16)
    val annCodes = graft.ext.Similarity.encode(emb, "vec_id", "embedding",
      annIdx).persist()
    annCodes.count(): Unit
    dump("sim_ivfpq_serve",
      graft.ext.Similarity.ivfPqTopKIndexed(annCodes, emb, "vec_id",
        "embedding", queries, "qid", "qv", annIdx, k = 5, nProbe = 8))
    annCodes.unpersist(): Unit

    // store serve plan against a freshly built 10× store (the scan arms
    // over shingles/rows/bucket_counts make the store's file layout the
    // plan's input — the r20 write-width change shows up as the number of
    // files behind these scans, recorded by R20Probe's file counts)
    val docs10 = Bench.replicate10(docs)
    val mhs = java.nio.file.Files.createTempDirectory("graft-plan-mhs").toString
    graft.ext.Dedup.buildMinHashStore(docs10, "doc_id", "text", mhs)
    dump("dedup_store_scrub_10x",
      graft.ext.Dedup.dropExistingNearDupStore(docs, "doc_id", "text", mhs))
    graft.ext.StoreFiles.deleteLocalDirRec(java.nio.file.Paths.get(mhs))
    spark.stop()
  }
}
