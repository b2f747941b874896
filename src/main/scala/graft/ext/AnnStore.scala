package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned, migratable deployment wrapper around a persisted ANN index —
  * the LIFECYCLE half of the train-once/encode-once story ([[AnnIndex]] +
  * [[Similarity.encodeAndWritePartitioned]] cover the build; this covers
  * what a team operating the store against a LIVE corpus needs next):
  *
  *   - '''recall monitoring''': build-time recall asserts say nothing
  *     about a store six months of corpus drift later — the quantizers
  *     were trained on the OLD distribution, so appended batches land in
  *     ill-fitting cells and serve recall decays silently.
  *     [[recallProbe]] measures recall@k of the PERSISTED store against
  *     brute force on a bounded query sample — cheap enough to run per
  *     crawl batch, and the trigger for…
  *   - '''migration''': [[migrate]] re-encodes the corpus against a newly
  *     trained index into a NEW version directory alongside the live one,
  *     then flips an atomic `current.json` pointer. Serves read whichever
  *     version the pointer names — a reader mid-migration sees the old
  *     store in full, never a mix; a crash before the flip leaves the old
  *     version live and the half-written one invisible (re-run to heal).
  *
  * Layout under `path`:
  * {{{
  *   current.json   {"format":"graft-ann-store","current":N}
  *   v1/index.json  quantizers (AnnIndex JSON)
  *   v1/codes/      cell-partitioned parquet codes
  *   v2/...         next version, created by migrate()
  * }}}
  *
  * The pointer flip is `Files.move(..., ATOMIC_MOVE)` of a sibling temp
  * file — atomic on POSIX and HDFS-style stores; object stores fall back
  * to copy-then-replace of a KB-sized file, the narrowest practical
  * window. */
object AnnStore {

  private def currentPath(path: String) = s"$path/current.json"
  private def indexPath(path: String, v: Int) = s"$path/v$v/index.json"
  private def codesPath(path: String, v: Int) = s"$path/v$v/codes"

  /** The live version number named by the pointer. All metadata IO rides
    * the Hadoop FS (r9 review fix) so the store works on local disk,
    * HDFS and object-store connectors alike — the codes already did. */
  def currentVersion(spark: SparkSession, path: String): Int = {
    val s = StoreFiles.readUtf8(spark, currentPath(path))
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readValue(s, classOf[java.util.Map[String, Any]])
    require(String.valueOf(root.get("format")) == "graft-ann-store",
      s"not an ANN store at $path")
    root.get("current").asInstanceOf[Number].intValue()
  }

  private def writePointer(spark: SparkSession, path: String, v: Int): Unit =
    StoreFiles.writeUtf8Atomic(spark, currentPath(path),
      s"""{"format":"graft-ann-store","current":$v}""")

  private def writeVersion(corpus: DataFrame, idCol: String, embCol: String,
      index: AnnIndex, path: String, v: Int): Unit = {
    StoreFiles.writeUtf8Atomic(corpus.sparkSession, indexPath(path, v),
      index.toJson)
    Similarity.encodeAndWritePartitioned(corpus, idCol, embCol, index,
      codesPath(path, v))
  }

  /** Create the store at version 1: quantizers + cell-partitioned codes +
    * pointer. The pointer is written LAST — a crash mid-create leaves no
    * pointer, i.e. no store. */
  def create(corpus: DataFrame, idCol: String, embCol: String,
      index: AnnIndex, path: String): Unit = {
    writeVersion(corpus, idCol, embCol, index, path, 1)
    writePointer(corpus.sparkSession, path, 1)
  }

  def loadIndex(spark: SparkSession, path: String): AnnIndex =
    AnnIndex.fromJson(StoreFiles.readUtf8(spark,
      indexPath(path, currentVersion(spark, path))))

  def codes(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(codesPath(path, currentVersion(spark, path)))

  /** Encode a new batch against the CURRENT (frozen) index and append its
    * codes — the steady-state ingest path. History is never re-encoded;
    * if the batch's distribution has drifted off the trained quantizers,
    * [[recallProbe]] is how that shows up. */
  def append(batch: DataFrame, idCol: String, embCol: String,
      path: String): Unit = {
    val spark = batch.sparkSession
    val v = currentVersion(spark, path)
    val index = AnnIndex.fromJson(StoreFiles.readUtf8(spark, indexPath(path, v)))
    Similarity.encodeAndWritePartitioned(batch, idCol, embCol, index,
      codesPath(path, v), mode = "append")
  }

  /** Serve a query batch from the current version (partition-pruned —
    * only probed cells' files are read). `corpus` supplies raw vectors
    * for the exact re-rank, exactly as the underlying `*TopKIndexed`. */
  def serve(path: String, corpus: DataFrame, corpusId: String,
      corpusEmb: String, queries: DataFrame, queryId: String,
      queryEmb: String, k: Int, nProbe: Int = 8,
      refineFactor: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    val index = loadIndex(spark, path)
    val enc = codes(spark, path)
    index.kind match {
      case "ivf" => Similarity.ivfTopKIndexed(enc, queries, queryId,
        queryEmb, index, k, nProbe, pruneCells = true)
      case "ivfpq" => Similarity.ivfPqTopKIndexed(enc, corpus, corpusId,
        corpusEmb, queries, queryId, queryEmb, index, k, nProbe,
        refineFactor, pruneCells = true)
      case other => sys.error(s"AnnStore.serve: unsupported kind '$other'")
    }
  }

  /** Recall@k of the PERSISTED store against exact brute force, measured
    * on a bounded query sample: |ANN ∩ exact| / |exact| over the sample's
    * top-k sets. Cost: one partition-pruned serve + one corpus scan for
    * the brute-force side — run it per crawl batch on a few hundred
    * sampled queries and alert when it dips below the build-time floor;
    * that dip is the re-train → [[migrate]] trigger. */
  def recallProbe(path: String, corpus: DataFrame, corpusId: String,
      corpusEmb: String, sampleQueries: DataFrame, queryId: String,
      queryEmb: String, k: Int, nProbe: Int = 8,
      refineFactor: Int = 4): Double = {
    val ann = serve(path, corpus, corpusId, corpusEmb, sampleQueries,
        queryId, queryEmb, k, nProbe, refineFactor)
      .select("query_id", "corpus_id")
    val exact = Similarity.bruteForceTopK(corpus, corpusId, corpusEmb,
        sampleQueries, queryId, queryEmb, k)
      .select("query_id", "corpus_id")
    // both sides are ≤ |sample|·k rows; the intersection join is tiny
    val hit = exact.join(ann, Seq("query_id", "corpus_id"), "left_semi").count()
    val total = exact.count()
    if (total == 0L) 1.0 else hit.toDouble / total
  }

  /** Streaming ingest with recall monitoring ON BY DEFAULT in the
    * deployment shape (r9 verdict #8): each micro-batch encodes against
    * the frozen current index and appends its codes; every `probeEvery`-th
    * batch additionally runs [[recallProbe]] with the BATCH'S OWN vectors
    * as the query sample — exactly the rows that drift first, so quantizer
    * decay surfaces from the ingest path itself instead of waiting for a
    * separately scheduled audit. `corpus` is evaluated lazily at probe
    * time (the brute-force side needs raw vectors — point it at the raw
    * embedding table so it sees everything ingested so far); `onRecall`
    * receives (batchId, recall@k) — alert/migrate when it dips below the
    * build-time floor.
    *
    * Idempotence: a `_batches/b<id>` marker skips an already-applied
    * batch on foreachBatch's at-least-once replays. The marker lands
    * after the code append, so a crash exactly in between would replay
    * the batch with duplicated codes — detectable as codes-count vs
    * ingested-count disagreement; distinct-by-id compaction repairs it.
    * (The BM25 store closes this window fully with manifest-governed
    * generations; the codes store keeps the simpler marker because its
    * serve is read-repairable. Single-writer contract as everywhere.) */
  def appendWriter(stream: DataFrame, idCol: String, embCol: String,
      path: String, streamTag: String, probeEvery: Int = 0,
      probeQueries: Int = 64,
      probeK: Int = 10, nProbe: Int = 8, refineFactor: Int = 4,
      corpus: () => DataFrame = null,
      onRecall: (Long, Double) => Unit = (_, _) => ()):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(probeEvery == 0 || corpus != null,
      "recall probing needs the raw-vector corpus (corpus = () => df)")
    // markers are namespaced per logical stream (tag 1:1 with the
    // checkpoint location): batch ids restart at 0 for a fresh
    // checkpoint, so an un-namespaced marker would silently drop a
    // SECOND stream's early batches (the BM25 store's tag lesson)
    require(streamTag.matches("[A-Za-z0-9_\\-.]+"), s"bad tag '$streamTag'")
    stream.writeStream.foreachBatch {
      (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val marker = s"$path/_batches/$streamTag-b$id"
        val f = StoreFiles.fs(spark, marker)
        if (!f.exists(new org.apache.hadoop.fs.Path(marker))) {
          append(batch, idCol, embCol, path)
          StoreFiles.writeUtf8Atomic(spark, marker, "done")
        }
        // the probe runs OUTSIDE the marker guard: it is read-only, so a
        // restart that re-delivers an already-appended batch still takes
        // its scheduled recall measurement instead of silently skipping
        // the cycles adjacent to every crash
        if (probeEvery > 0 && (id + 1) % probeEvery == 0) {
          val sample = batch.limit(probeQueries)
          onRecall(id, recallProbe(path, corpus(), idCol, embCol,
            sample, idCol, embCol, probeK, nProbe, refineFactor))
        }
    }
  }

  /** Compact the current version's code store: every [[append]] adds its
    * own files INSIDE each cell partition, so after N crawl batches a
    * probed cell reads N small files — the same object-store listing cost
    * the other stores' compact() addresses. One shuffle on `cell` lands
    * each cell's rows in a single task → one file per cell directory; the
    * swap is rename-based and the serve (which reads whatever the cell
    * directories hold) is hash-identical before and after. */
  def compactCodes(spark: SparkSession, path: String): Unit = {
    val v = currentVersion(spark, path)
    val dir = codesPath(path, v)
    StoreFiles.healDir(spark, dir) // complete a crashed prior swap
    val tmp = dir + ".compacting"
    import org.apache.spark.sql.functions.col
    spark.read.parquet(dir)
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(tmp)
    StoreFiles.swapDir(spark, tmp, dir)
  }

  /** Delete all non-current version directories — run once migrated
    * readers have drained. The pointer is never touched. */
  def dropOldVersions(spark: SparkSession, path: String): Unit = {
    val cur = currentVersion(spark, path)
    val f = StoreFiles.fs(spark, path)
    val base = new org.apache.hadoop.fs.Path(path)
    f.listStatus(base).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.length > 1 && n.startsWith("v") &&
          n.drop(1).forall(_.isDigit) && n.drop(1).toInt != cur)
        f.delete(st.getPath, true)
    }
  }

  /** Re-encode the corpus against a NEWLY trained index as version
    * current+1, then atomically flip the pointer. The old version's files
    * stay on disk for readers that already resolved the pointer (delete
    * them out-of-band once drained). Serving from the migrated store is
    * byte-equivalent to a fresh [[create]] with the same index — the gate
    * asserts hash-identity against the one-shot golden pin. */
  def migrate(corpus: DataFrame, idCol: String, embCol: String,
      newIndex: AnnIndex, path: String): Int = {
    val spark = corpus.sparkSession
    val next = currentVersion(spark, path) + 1
    writeVersion(corpus, idCol, embCol, newIndex, path, next)
    writePointer(spark, path, next)
    next
  }
}
