package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Bench

/** Attribution probe for bench outliers (r17 verdict #1): repeats ONE
  * section body with the full r17 telemetry per iteration — wall, CPU
  * canary, IO canary, loadavg, and the section's TaskMetrics delta
  * (shuffle read/write bytes, spill bytes, executor CPU vs run time) —
  * so a slow reading is mechanically classifiable:
  *
  *  - plan/code regression: shuffle or spill BYTES move (the plan did
  *    more work), executor CPU tracks wall;
  *  - host CPU contention: bytes flat, CPU canary inflated;
  *  - host DISK contention (the r16 `dedup_minhash_10x` blind spot —
  *    25/40 s readings against an 8.2 s floor with FLAT CPU canary and
  *    loadavg): bytes flat, CPU canary flat, IO canary inflated,
  *    executor run time inflated vs executor CPU time.
  *
  * Usage: runMain graft.tools.BenchProbe [sfDir] [iters] [section]
  * Sections: minhash10x (default — the r16 outlier), cluster10x.
  * Prints one JSON line per iteration; nothing is written to
  * BENCH_LOCAL.json (this tool must not touch the floor protocol).
  * For the planted-contention experiment, run once in a quiet window and
  * once beside a disk hog (e.g. a dd conv=fsync loop on the same
  * filesystem) and compare the lines. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val section = args.lift(2).getOrElse("minhash10x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = new Bench.SectionMetrics
    spark.sparkContext.addSparkListener(metrics)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val docs10 = Bench.replicate10(docs)
    def body(): Long = section match {
      case "minhash10x" =>
        graft.ext.Dedup.minhashPairs(docs10, "doc_id", "text",
          3, 64, 16, 0.8).count()
      case "cluster10x" =>
        val pairs = graft.ext.Dedup.minhashPairs(docs10, "doc_id", "text",
          3, 64, 16, 0.8)
        graft.ext.Dedup.clusterPairs(pairs).count()
      case "simbrute" =>
        // the suite's sim_topk_brute body verbatim (r19 drift chase)
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        graft.ext.Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          queries, "qid", "qv", 5).count()
      case "simbrute_nofilter" =>
        // A/B arm: the same plan minus the r18 NaN rank guard
        // (rankTopK's isnan filter) — attributes the sim_topk_brute
        // floor drift to the guard or to the host
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        val c = emb.select(col("vec_id").as("corpus_id"),
          col("embedding").as("cv"))
        val qs = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        val scored = c.crossJoin(broadcast(qs)).withColumn("cosine",
          round(graft.ext.Similarity.cosine(col("cv"), col("qv")), 4))
        scored.select("query_id", "corpus_id", "cosine")
          .groupBy("query_id")
          .agg(graft.functions.TopKByScore.of(col("cosine"),
            col("corpus_id"), 5).as("tk"))
          .select(col("query_id"), posexplode(col("tk"))).count()
      case other => sys.error(s"unknown section '$other' " +
        "(minhash10x | cluster10x | simbrute | simbrute_nofilter)")
    }
    // JIT/codegen warmup on a tiny slice, exactly as the suite does
    graft.ext.Dedup.minhashPairs(docs.limit(200), "doc_id", "text",
      3, 64, 16, 0.8).count(): Unit
    if (section.startsWith("simbrute")) {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(100)
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      graft.ext.Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queries, "qid", "qv", 5).count(): Unit
    }
    Bench.canaryMs(); Bench.canaryMs(): Unit
    Bench.ioCanaryMs(); Bench.ioCanaryMs(): Unit

    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

    val cpus0 = scala.collection.mutable.ArrayBuffer.empty[Double]
    val ios0 = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to iters).foreach { i =>
      val cpu = Bench.canaryMs()
      val io = Bench.ioCanaryMs()
      // the suite's reader (shared so the probe's number is always
      // calibrated identically to BENCH_LOCAL.json's)
      val load = Bench.loadavg()
      metrics.quiesce()
      val m0 = metrics.snap()
      val t0 = System.nanoTime()
      val n = body()
      val wall = (System.nanoTime() - t0) / 1e9
      metrics.quiesce()
      val d = metrics.snap() - m0
      // free clusterPairs' checkpoint blocks between iterations
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      println(s"""{"iter":$i,"section":"$section","wall_s":${num(wall)},""" +
        s""""rows":$n,"cpu_canary_ms":${num(cpu)},""" +
        s""""io_canary_ms":${num(io)},"loadavg":${num(load)},""" +
        s""""task_metrics":${d.json}}""")
      cpus0 += cpu; ios0 += io
    }
    // r18 (verdict #2 done-check): per-iteration suspect legs against the
    // rolling BENCH_LOCAL floors — a planted-contention A/B (quiet run vs
    // a dd-conv=fsync hog beside it) shows the contended iterations
    // flagged with the leg that fired, using the EXACT predicate the
    // suite's artifact suspicion uses (Bench.suspectLegs)
    val ioFloor = Bench.publicIoFloor()
    def median(vs: Seq[Double]): Double = {
      val x = vs.sorted; if (x.isEmpty) 0.0 else x(x.size / 2)
    }
    val (cm, im) = (median(cpus0.toSeq), median(ios0.toSeq))
    val legs = cpus0.toSeq.zip(ios0.toSeq).zipWithIndex.map {
      case ((c, i0), ix) =>
        s""""${ix + 1}":${Bench.suspectLegs(c, cm, i0, im, ioFloor)
          .map("\"" + _ + "\"").mkString("[", ",", "]")}""" }
    println(s"""{"suspect_legs":${legs.mkString("{", ",", "}")},""" +
      s""""cpu_median_ms":${num(cm)},"io_median_ms":${num(im)},""" +
      s""""io_floor_ms":${ioFloor.map(num).getOrElse("null")}}""")
    spark.stop()
  }
}
