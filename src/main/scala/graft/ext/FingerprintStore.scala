package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Persisted EXACT-duplicate membership store — the exact-dedup sibling of
  * the MinHash store and the missing half of
  * [[Dedup.corpusFingerprintBloom]]'s "persist with writeTo between runs"
  * contract. The corpus reduces ONCE to
  *
  *   - `fps/`       parquet of distinct 64-bit normalized-text
  *                  fingerprints (the exact membership set — 8 bytes/doc,
  *                  ~0.1% of corpus text bytes),
  *   - `bloom.bin`  a Bloom filter over those fingerprints
  *                  (`BloomFilter.writeTo`), the cheap prefilter,
  *   - `meta.json`  the filter's (expectedItems, fpp) so appended
  *                  increments build BIT-COMPATIBLE filters for
  *                  `mergeInPlace`.
  *
  * Every later crawl batch scrubs against the store without reading any
  * corpus text: the loaded filter drops almost everything new executor-
  * side, the few candidate fingerprints join the stored fps parquet for
  * EXACT confirmation (Bloom false positives cannot drop a fresh doc),
  * and the confirmed set anti-joins the batch. Append-only growth:
  * increments add fps files and OR into the filter — nothing rewrites
  * except the (MB-sized) filter binary. */
object FingerprintStore {

  private def fp(textCol: String) =
    TextAnalysis.fingerprint64(col("`" + textCol.replace("`", "``") + "`"))

  private def metaPath(path: String) = s"$path/meta.json"
  private def bloomPath(path: String) = s"$path/bloom.bin"
  private def fpsPath(path: String) = s"$path/fps"

  /** Build the store from a corpus: one scan to distinct fingerprints
    * (written as parquet), one driver-side filter build over that bounded
    * frame. `expectedItems` sizes the filter for FUTURE growth — size it
    * for the corpus you expect after appends (default: 4× the current
    * distinct count). */
  def build(corpus: DataFrame, textCol: String, path: String,
      expectedItems: Long = 0L, fpp: Double = 0.01): Unit = {
    val fps = corpus.select(fp(textCol).as("fp")).distinct()
    fps.write.mode("errorifexists").parquet(fpsPath(path))
    val spark = corpus.sparkSession
    val stored = spark.read.parquet(fpsPath(path))
    val n = stored.count()
    val items = if (expectedItems > 0) expectedItems else math.max(4L * n, 1024L)
    val bloom = stored.stat.bloomFilter("fp", items, fpp)
    writeBloom(bloom, path)
    val meta = s"""{"format": "graft-fingerprint-store", "version": 1, """ +
      s""""expected_items": $items, "fpp": $fpp}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(metaPath(path)),
      meta.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Append a batch: its NEW distinct fingerprints land as additional fps
    * files, and a bit-compatible increment filter ORs into the stored one. */
  def append(batch: DataFrame, textCol: String, path: String): Unit = {
    val spark = batch.sparkSession
    val (items, fpp) = readMeta(path)
    val stored = spark.read.parquet(fpsPath(path))
    val fresh = batch.select(fp(textCol).as("fp")).distinct()
      .join(stored, Seq("fp"), "left_anti")
      .persist()
    try {
      if (!fresh.isEmpty) {
        // increment-only filter with the META's (items, fpp) — identical
        // bit geometry, so mergeInPlace is a bitwise OR. Cost:
        // O(increment) + the filter bits, NOT a rescan of the whole fps
        // table per crawl. This is why `build` sizes expectedItems for
        // future growth: past that capacity the fpp degrades (more
        // candidates confirm against the fps parquet — correctness never
        // depends on the filter), and a re-`build` re-sizes it.
        // Built BEFORE the parquet append: writing to fps/ refreshes
        // Spark's caches for that path, which would re-plan the anti-join
        // against the just-appended files and evaluate `fresh` as empty.
        val inc = fresh.stat.bloomFilter("fp", items, fpp)
        // bloom FIRST, fps second: a crash in between leaves a SUPERSET
        // filter (extra candidates confirm against fps and are kept —
        // correct). The reverse order would leave fps rows the filter
        // misses, and a bloom miss short-circuits the exact confirm, so
        // those duplicates would silently re-enter on every future crawl.
        val merged = loadBloom(path).mergeInPlace(inc)
        writeBloom(merged, path)
        fresh.write.mode("append").parquet(fpsPath(path))
      }
    } finally fresh.unpersist()
  }

  /** Scrub a batch against the store: drop every row whose normalized
    * text the store has seen. Corpus text is never read — the filter
    * prefilters executor-side, candidates confirm EXACTLY against the
    * stored fingerprints (batch-bounded broadcast both ways). */
  def scrub(incoming: DataFrame, textCol: String, path: String): DataFrame = {
    val spark = incoming.sparkSession
    val bloom = loadBloom(path)
    val bc = spark.sparkContext.broadcast(bloom)
    val fpIn = fp(textCol)
    // native codegen'd probe (r9): the prefilter sits on the full-width
    // ingest scan, so a ScalaUDF here would break whole-stage codegen on
    // exactly the scan it exists to keep cheap
    val maybe = incoming
      .filter(graft.functions.BloomMightContain(bc, fpIn))
      .select(fpIn.as("fp")).distinct()
    // qualified column, not a bare col("fp"): an incoming frame with its
    // own `fp` column would otherwise make the condition ambiguous
    val confirmed = spark.read.parquet(fpsPath(path))
      .join(broadcast(maybe), Seq("fp"), "left_semi").distinct()
    incoming.join(broadcast(confirmed), fpIn === confirmed("fp"), "left_anti")
  }

  /** Streaming form of [[scrub]]: every micro-batch of an ingest stream
    * is scrubbed against the PERSISTED store before reaching the sink —
    * the filter binary loads and broadcasts ONCE when the writer is
    * built; each batch pays only its own prefilter plus a candidate-
    * bounded confirm join against the fps parquet. The store is the only
    * corpus artifact the streaming job ever opens. */
  def scrubWriter(stream: DataFrame, textCol: String, path: String)(
      sink: (DataFrame, Long) => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val spark = stream.sparkSession
    val bc = spark.sparkContext.broadcast(loadBloom(path))
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val fpIn = fp(textCol)
      val maybe = batch
        .filter(graft.functions.BloomMightContain(bc, fpIn))
        .select(fpIn.as("fp")).distinct()
      val confirmed = spark.read.parquet(fpsPath(path))
        .join(broadcast(maybe), Seq("fp"), "left_semi").distinct()
      sink(batch.join(broadcast(confirmed), fpIn === confirmed("fp"),
        "left_anti"), id)
    }
  }

  /** Batch ≡ streaming proof harness for [[scrubWriter]] (the store
    * sibling of StreamingValidation.scrubReplay): replay a static batch
    * as file-source micro-batches, scrub each against the store, return
    * the union the sink received. Each row's verdict is a pure function
    * of (row, store), so the union across ANY micro-batch split equals
    * the batch [[scrub]] — gated against the same oracle. */
  def scrubReplay(incoming: DataFrame, textCol: String, path: String,
      numFiles: Int = 6): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val spark = incoming.sparkSession
    val dir = java.nio.file.Files.createTempDirectory("graft_fpstore_replay_").toString
    val (inDir, outDir) = (s"$dir/in", s"$dir/out")
    incoming.repartition(numFiles).write.parquet(inDir)
    val stream = spark.readStream.schema(incoming.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val query = scrubWriter(stream, textCol, path) { (kept, _) =>
      kept.write.mode("append").parquet(outDir)
    }.option("checkpointLocation", s"$dir/ck")
      .trigger(Trigger.AvailableNow()).start()
    query.awaitTermination()
    spark.read.parquet(outDir)
  }

  /** Compact the store after N appends: rewrite the accumulated fps files
    * into `targetFiles` size-targeted ones (default ~128 MB each) and
    * rebuild the Bloom filter from the compacted set — membership is
    * UNCHANGED (compaction gate asserts scrub hash-identity), only the
    * file count collapses. Optional `expectedItems`/`fpp` re-size the
    * filter geometry (the escape from a saturating filter after growth
    * past `build`'s sizing); 0 keeps the meta's geometry.
    *
    * Crash windows, in order: before the fps swap → store untouched;
    * after the swap, before the bloom write → OLD filter over the SAME
    * membership (superset-or-equal bits — extra candidates confirm
    * against fps, correct); after the bloom write, before the meta write
    * (re-size only) → filter geometry differs from meta, so the next
    * append's `mergeInPlace` fails LOUDLY (incompatible merge) rather
    * than corrupting — re-run compact to heal. */
  def compact(spark: SparkSession, path: String, targetFiles: Int = 0,
      expectedItems: Long = 0L, fpp: Double = 0.0): Unit = {
    StoreFiles.healDir(spark, fpsPath(path)) // complete a crashed prior swap
    val (metaItems, metaFpp) = readMeta(path)
    val nItems = if (expectedItems > 0) expectedItems else metaItems
    val nFpp = if (fpp > 0) fpp else metaFpp
    val nf = if (targetFiles > 0) targetFiles
      else StoreFiles.targetFileCount(StoreFiles.dataBytes(spark, fpsPath(path)))
    val tmp = fpsPath(path) + ".compacting"
    // distinct is a no-op by the append contract (anti-joined before
    // write) — kept as cheap insurance so a crashed half-append can
    // never make compaction amplify duplicates. repartition, not
    // coalesce: coalesce would fold distinct's reduce side to nf tasks
    spark.read.parquet(fpsPath(path)).distinct()
      .repartition(nf).write.mode("overwrite").parquet(tmp)
    val bloom = spark.read.parquet(tmp).stat.bloomFilter("fp", nItems, nFpp)
    StoreFiles.swapDir(spark, tmp, fpsPath(path))
    writeBloom(bloom, path)
    if (nItems != metaItems || nFpp != metaFpp) {
      val meta = s"""{"format": "graft-fingerprint-store", "version": 1, """ +
        s""""expected_items": $nItems, "fpp": $nFpp}"""
      java.nio.file.Files.write(java.nio.file.Paths.get(metaPath(path)),
        meta.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  def loadBloom(path: String): BloomFilter = {
    val in = java.nio.file.Files.newInputStream(
      java.nio.file.Paths.get(bloomPath(path)))
    try BloomFilter.readFrom(in) finally in.close()
  }

  private def writeBloom(bloom: BloomFilter, path: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    val out = java.nio.file.Files.newOutputStream(
      java.nio.file.Paths.get(bloomPath(path)))
    try bloom.writeTo(out) finally out.close()
  }

  private def readMeta(path: String): (Long, Double) = {
    val s = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(metaPath(path))),
      java.nio.charset.StandardCharsets.UTF_8)
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readValue(s, classOf[java.util.Map[String, Any]])
    require(String.valueOf(root.get("format")) == "graft-fingerprint-store",
      s"not a fingerprint store at $path")
    (root.get("expected_items").asInstanceOf[Number].longValue(),
      root.get("fpp").asInstanceOf[Number].doubleValue())
  }
}
