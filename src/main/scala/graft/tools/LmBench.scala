package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated LM-section benchmark — the same `text_backoff_10x` /
  * `text_kneser_ney_10x` measurements `graft.Bench` takes mid-suite, run
  * in a FRESH JVM with nothing before them. The r8 verdict flagged a 2×
  * in-suite-vs-isolated spread on the KN section; Bench's per-section
  * `gc_ms` telemetry (r9) already rules GC in or out, and this tool pins
  * the isolated side of the comparison on the same machine, same code,
  * same input plan (`Bench.replicate10`). Prints one JSON line. */
object LmBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // file-listing warmup, as the suite's prologue does
    // JIT/codegen warmup on the 1× corpus — the suite has run ~35
    // sections by the time the LM sections start, so steady-state JIT is
    // part of the like-for-like comparison
    graft.ext.TextAnalysis.stupidBackoff(docs, "doc_id", "text",
      minBigramCount = 2).agg(sum("n_tokens")).head()
    graft.ext.TextAnalysis.kneserNey(docs, "doc_id", "text",
      minBigramCount = 2).agg(sum("n_tokens")).head()
    spark.sqlContext.clearCache()
    val docs10 = graft.Bench.replicate10(docs)
    def time(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val tb = time(graft.ext.TextAnalysis.stupidBackoff(docs10, "doc_id",
      "text", minBigramCount = 2).agg(sum("n_tokens")).head())
    spark.sqlContext.clearCache()
    val tk = time(graft.ext.TextAnalysis.kneserNey(docs10, "doc_id",
      "text", minBigramCount = 2).agg(sum("n_tokens")).head())
    println(f"""{"metric":"lm_isolated","backoff_10x_sec":$tb%.2f,"kneser_ney_10x_sec":$tk%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
