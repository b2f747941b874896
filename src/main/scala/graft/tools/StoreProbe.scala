package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off A/B probe for the r12 verdict's two bench movers (r13 #4):
  *
  *  - `stats_sketch_build` 0.55 → 0.79 s: the sketch store adopted the
  *    manifest-generation protocol in r12. Decompose one append into its
  *    pieces — the sketch aggregation + generation parquet write (the
  *    pre-protocol r11 cost), the post-write `wrote` verification
  *    (recursive file listing + a READ-BACK Spark job for row presence),
  *    and the manifest read/replace — alternating A/B runs to cancel
  *    machine drift, so the adoption tax is attributed to a named piece.
  *
  *  - `dedup_store_compact` 3.64 → 4.51 s: `compactMinHashStore` and
  *    everything it calls are byte-identical between r11 and r12 (git
  *    diff is empty), so the hypothesis is run-to-run variance of an
  *    IO-bound rewrite, not a code regression. Measured by repeating the
  *    exact bench sequence (build 10× store + 8 fragmenting appends,
  *    then compact) on fresh stores and reporting the spread.
  *
  * Findings land in BASELINE.md (round-13 section). Not part of the
  * driver contract. */
object StoreProbe {

  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }

  private def med(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.length / 2)
  }

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

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
    import graft.ext.{Dedup, SketchStore, StoreFiles}

    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    ev.count(): Unit

    def sketch(h: Int): DataFrame = SketchStore.distinctSketch(
      ev.filter(col("event_id") % 2 === h), Seq("event_type"), "user_id")

    // --- A: sketch append decomposition, alternating rounds ------------
    val full = collection.mutable.ArrayBuffer.empty[Double]   // bench shape
    val bare = collection.mutable.ArrayBuffer.empty[Double]   // r11 shape: agg + gen write only
    val verif = collection.mutable.ArrayBuffer.empty[Double]  // listing + read-back row check
    val mani = collection.mutable.ArrayBuffer.empty[Double]   // manifest read + atomic replace
    for (r <- 1 to 6) {
      val dA = tmp(s"graft-probe-skA$r")
      full += time(Seq(0, 1).foreach(h =>
        SketchStore.append(sketch(h), dA, s"batch_$h")))._1
      val dB = tmp(s"graft-probe-skB$r")
      bare += time(Seq(0, 1).foreach(h =>
        sketch(h).withColumn("batch", lit(s"batch_$h"))
          .write.mode("overwrite").parquet(s"$dB/rows/g$h")))._1
      verif += time(Seq(0, 1).foreach { h =>
        val g = s"$dB/rows/g$h"
        require(StoreFiles.dataFileCountRecursive(spark, g) > 0 &&
          !spark.read.parquet(g).isEmpty, "probe gen empty")
      })._1
      mani += time(Seq(0, 1).foreach { h =>
        val p = s"$dB/manifest_probe.json"
        if (StoreFiles.fs(spark, p).exists(new org.apache.hadoop.fs.Path(p)))
          StoreFiles.readUtf8(spark, p): Unit
        StoreFiles.writeUtf8Atomic(spark, p,
          s"""{"format":"probe","gens":["g0","g$h"],"marks":{},"cooling":{}}""")
      })._1
      println(f"round $r: full=${full.last}%.3f bare=${bare.last}%.3f " +
        f"verify=${verif.last}%.3f manifest=${mani.last}%.3f")
    }
    println(f"sketch_append_full_med=${med(full.toSeq)}%.3f " +
      f"bare_med=${med(bare.toSeq)}%.3f verify_med=${med(verif.toSeq)}%.3f " +
      f"manifest_med=${med(mani.toSeq)}%.3f " +
      f"adoption_tax_med=${med(full.toSeq) - med(bare.toSeq)}%.3f")

    // --- B: minhash compact spread over fresh identical stores ---------
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    docs.count(): Unit
    val docs10 = graft.Bench.replicate10(docs)
    val compacts = collection.mutable.ArrayBuffer.empty[Double]
    for (r <- 1 to 4) {
      val d = tmp(s"graft-probe-mhs$r")
      Dedup.buildMinHashStore(docs10, "doc_id", "text", d)
      for (i <- 0 until 8) {
        val b = docs.select(
          (col("doc_id") + lit(20000000L + i * 1000000L)).as("doc_id"),
          concat(col("text"), lit(s" r9 crawl batch $i")).as("text"))
        Dedup.appendToMinHashStore(b, "doc_id", "text", d)
      }
      compacts += time(Dedup.compactMinHashStore(spark, d))._1
      println(f"compact run $r: ${compacts.last}%.3f s")
    }
    println(f"compact_min=${compacts.min}%.3f compact_max=${compacts.max}%.3f " +
      f"compact_med=${med(compacts.toSeq)}%.3f spread=${compacts.max - compacts.min}%.3f")
    spark.stop()
  }
}
