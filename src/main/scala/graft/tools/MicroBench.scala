package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Maintenance utility: stage-by-stage timing of the minhash dedup plan on
  * SPARK_GRAFT_SF_DIR — used to attribute wall-clock between signature
  * scan, banding, guard, self-join and verify when tuning the pipeline. */
object MicroBench {
  private def time(label: String, n: Int = 3)(f: => Long): Unit = {
    f // warmup
    val ts = (1 to n).map { _ =>
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    println(f"[micro] $label%-28s ${ts.map(_._1).min}%8.3f s  (rows=${ts.head._2})")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()

    import graft.ext.{Dedup, TextAnalysis}
    val base = docs.select(col("doc_id").as("id"),
        Dedup.shingles(col("text"), 3).as("sh"))
      .withColumn("sig", Dedup.minhashSignature(col("sh"), 64))

    time("tokens only") {
      docs.select(TextAnalysis.tokens(col("text")).as("t")).select(size(col("t"))).agg(sum("size(t)")).head(); docs.count()
    }
    time("shingles scan") {
      docs.select(Dedup.shingles(col("text"), 3).as("sh")).select(size(col("sh")).as("n")).agg(sum("n")).head().getLong(0)
    }
    time("sig scan") {
      base.select(size(col("sig")).as("n")).agg(sum("n")).head().getLong(0)
    }
    val rowsPerBand = 4
    val allBanded = base
      .select(col("id"), explode(Dedup.bandKeys(col("sig"), 16, rowsPerBand)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    time("banded scan") { allBanded.count() }
    time("bucket agg (collect ids)") {
      allBanded.groupBy("band", "bucket")
        .agg(graft.functions.BoundedCollectItems.of(col("id"), 10001).as("ids"))
        .filter(size(col("ids")).between(2, 10000)).count()
    }
    time("pairs full (bucketed)") {
      Dedup.minhashPairs(docs, "doc_id", "text", 3, 64, 16, 0.8).count()
    }
    time("ngram pairs full") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, 100000L).count()
    }
    // candidates only — apples-to-apples with the selfjoin(old) stage below
    time("ngram cand (bucketed)") {
      val base = docs.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
      val inverted = base.select(col("id"), explode(col("sh")).as("s"))
        .select(xxhash64(col("s")).as("s"), col("id"))
      Dedup.bucketedPairs(inverted, Seq("s"), "id", 100000L).count()
    }
    // pre-round-4 inverted-index formulation (df-count + re-join +
    // self-join) for comparison against the bucket-collect path above
    time("ngram pairs selfjoin(old)") {
      val base = docs.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
      val inverted = base.select(col("id"), explode(col("sh")).as("s"))
        .select(col("id"), xxhash64(col("s")).as("s"))
      val filtered = inverted.join(
        inverted.groupBy("s").agg(count(lit(1)).as("df_count"))
          .filter(col("df_count") <= 100000L && col("df_count") > 1), "s")
      filtered.as("a").join(filtered.as("b"),
          col("a.s") === col("b.s") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .dropDuplicates("id_a", "id_b").count()
    }
    spark.stop()
  }
}
