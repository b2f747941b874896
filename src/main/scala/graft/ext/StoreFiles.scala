package graft.ext

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Filesystem plumbing shared by the three persisted stores'
  * `compact()` operations ([[FingerprintStore]], the MinHash store in
  * [[Dedup]], [[SketchStore]]).
  *
  * Why compaction exists at all: every store is append-only by contract —
  * each crawl batch ADDS parquet files and never rewrites history. After
  * hundreds of appends a serve reads hundreds of small files, and on an
  * object store the LIST + per-file GET overhead dominates the actual
  * bytes — the classic small-files deployment killer. `compact()` rewrites
  * the accumulated files into size-targeted ones (and collapses
  * re-aggregable rows, e.g. bucket-count deltas) WITHOUT changing the
  * served results — every compaction gate asserts hash-identity against
  * the uncompacted store.
  *
  * All paths go through the Hadoop FileSystem API, so the same code runs
  * on local disk, HDFS, or s3a/gcs connectors. Directory swaps are
  * rename-based: atomic on HDFS/local, copy-backed on object stores —
  * each store's compact() orders its swaps so every crash window leaves a
  * correct (at worst partially-compacted or superset-filter) store. */
object StoreFiles {

  def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Run INDEPENDENT Spark actions concurrently and wait for all of them
    * (guide §2.6: actions are only sequential because the driver calls
    * them sequentially — overlapping lets one job's tasks back-fill the
    * scheduling/commit tail of another). Used by the store append paths,
    * whose per-batch cost is dominated by 3-5 sequential small jobs'
    * fixed scheduling + commit latency, not executor work (r19 verdict
    * #1b; jobs-per-append evidence in tools/R20Probe). Runs the caller's
    * thread directly for 0/1 tasks. Failure semantics match the
    * sequential form: the first failure propagates after every submitted
    * task has finished (a mode=append batch that fails mid-write leaves
    * the same partial-files window either way). */
  def runConcurrently(tasks: Seq[() => Unit]): Unit = {
    if (tasks.size <= 1) { tasks.foreach(_()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
    try {
      val futs = tasks.map(t => pool.submit(new java.util.concurrent.Callable[Unit] {
        override def call(): Unit = t()
      }))
      var firstFailure: Option[Throwable] = None
      futs.foreach { fu =>
        try fu.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (firstFailure.isEmpty)
              firstFailure = Some(Option(e.getCause).getOrElse(e))
        }
      }
      firstFailure.foreach(throw _)
    } finally pool.shutdown()
  }

  /** Recursive LOCAL-path delete (java.nio — harness/temp hygiene, not
    * store data; store-side deletes go through the Hadoop FS above). One
    * shared copy (r18 review: Bench, StreamingValidation, Similarity and
    * a spec each grew an identical walk-and-delete). Missing path is a
    * no-op. */
  def deleteLocalDirRec(path: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(path)) {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(path)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p): Unit)
      finally walk.close()
    }

  /** Visible data files under `dir` (non-recursive; skips _SUCCESS/.crc
    * style hidden entries) — the quantity compaction collapses. */
  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) 0
    else f.listStatus(p).count { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** Recursive walk over the VISIBLE data files under `p` — hidden
    * entries (_ / . prefixes) are skipped at EVERY level, directories
    * included, exactly as Spark's own file index does (r15: the earlier
    * flat `listFiles(recursive)` filtered only the leaf file name, so
    * files inside a hidden staging dir — a crashed writer's `_temporary`,
    * a tombstone commit's `.stage-*` — were counted as live data). */
  private def walkVisible(f: FileSystem, p: Path)(
      action: org.apache.hadoop.fs.FileStatus => Unit): Unit =
    f.listStatus(p).foreach { st =>
      val n = st.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) {
        if (st.isDirectory) walkVisible(f, st.getPath)(action)
        else action(st)
      }
    }

  /** Recursive variant of [[dataFileCount]] — for partitioned layouts
    * (e.g. cell=N subdirectories) where the files live one level down. */
  def dataFileCountRecursive(spark: SparkSession, dir: String): Int = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) return 0
    var n = 0
    walkVisible(f, p)(_ => n += 1)
    n
  }

  /** Row count of a just-written parquet generation from the file FOOTERS
    * (r13, verdict #4): the store commit protocol must refuse to publish
    * an empty generation (an empty batch still writes a schema-only part
    * file), and the former `spark.read.parquet(gen).isEmpty` re-read cost
    * a whole extra Spark job per append — listing + schema inference +
    * task launch, measured by tools/StoreProbe as the dominant piece of
    * the r12 manifest-adoption tax on `stats_sketch_build` (~0.15 s per
    * append). Each parquet footer already carries its exact row count;
    * summing them reads a few KB per file with zero jobs and zero
    * listener races. Returns -1 only if no visible parquet files exist.
    * One traversal implementation for both footer readers (r15):
    * delegates to [[parquetRowsAndNulls]] with a column name no schema
    * can contain, so the visible-file rules can never drift apart. */
  def parquetRowsWritten(spark: SparkSession, genDir: String): Long =
    parquetRowsAndNulls(spark, genDir, "")._1

  /** Footer-summed rows over a manifest's COMMITTED tombstone
    * generations, refusing loudly when a listed generation is missing on
    * disk (a damaged store must never satisfy a cap or an
    * erasure-deadline policy with a silent 0). ONE implementation for
    * every caller — the tombstone-cap check here, and the
    * erasure-deadline faces of the store cadences (r17 third-pass
    * review: three inline copies of this loop had started to drift).
    * The footer sum can double-count an id retracted in two batches —
    * an upper bound on distinct ids, which only triggers a deadline
    * policy EARLIER (cadence-grade accuracy). */
  def committedTombstoneRows(spark: SparkSession, tombsRoot: String,
      gens: Seq[String], what: String): Long =
    gens.map { g =>
      val r = parquetRowsWritten(spark, s"$tombsRoot/$g")
      require(r >= 0L, s"$what: committed tombstone generation '$g' " +
        s"under $tombsRoot is missing on disk — refusing to evaluate " +
        "the policy against a damaged store")
      r
    }.sum

  /** [[parquetRowsWritten]] plus the NULL COUNT of one column, both from
    * the parquet footers (r15, verdict #4): the takedown paths must refuse
    * null ids, and the former `filter(isNull).isEmpty` pre-check cost one
    * extra Spark job per call — the footers' column-chunk statistics
    * already carry the null count. Returns (rows, nulls); rows -1 when no
    * visible parquet files exist; nulls -1 when any chunk lacks the
    * statistic (the caller falls back to an explicit check — Spark-written
    * parquet always has it, so the fallback never fires in practice). */
  def parquetRowsAndNulls(spark: SparkSession, genDir: String,
      colName: String): (Long, Long) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val f = fs(spark, genDir)
    val p = new Path(genDir)
    if (!f.exists(p)) return (-1L, -1L)
    var rows = 0L
    var nulls = 0L
    var sawFile = false
    var statsKnown = true
    walkVisible(f, p) { st =>
      sawFile = true
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(st.getPath, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        rows += r.getRecordCount
        import scala.jdk.CollectionConverters._
        r.getFooter.getBlocks.asScala.foreach { block =>
          block.getColumns.asScala
            .filter(_.getPath.toDotString == colName)
            .foreach { cc =>
              val s: org.apache.parquet.column.statistics.Statistics[_] =
                cc.getStatistics
              if (s == null || !s.isNumNullsSet) statsKnown = false
              else nulls += s.getNumNulls
            }
        }
      } finally r.close()
    }
    if (!sawFile) (-1L, -1L)
    else (rows, if (statsKnown) nulls else -1L)
  }

  /** Shared tombstone/retraction commit for the persisted stores' takedown
    * paths — r14 shipped four copies of this distinct → null-check → cap →
    * publish shape (AnnStore.delete, Retrieval.deleteDocs,
    * FingerprintStore.retract, Dedup.retractFromMinHashStore); this is the
    * one implementation (r15, verdict #5). Mechanics:
    *
    *   1. the ids (already projected to ONE column named `idName`) are
    *      distinct'd and written as ONE generation dir under `tombsRoot`
    *      (overwrite reclaims a crashed attempt's orphan at the same name);
    *   2. row count AND null count come from the parquet FOOTERS in one
    *      pass — zero read-back Spark jobs; a null id refuses loudly
    *      (it would be inert in every serve's non-null-safe anti-join yet
    *      count toward the cap and the returned n — a caller asserting
    *      n > 0 would see a false success);
    *   3. the broadcast-small cap (`capConfKey`, default 10M) is enforced
    *      against the LIVE committed rows (plus `extraLiveRows` — a store
    *      whose live tombstone mass is not generation-shaped, e.g. the
    *      MinHash store's pre-r15 flat files, passes it explicitly; r15
    *      review: those rows are read by every serve, so they must count
    *      toward the broadcast-small contract); each committed generation
    *      is asserted present on disk before counting — a lost generation
    *      refuses loudly instead of silently skewing the cap (r14 ADVICE);
    *   4. the batch is written to a HIDDEN staging dir and renamed to its
    *      generation name only after every check passes (r15 review: for
    *      a manifest-less store — the MinHash tombs/ side, where readers
    *      list the directory — the write IS the publish, so a crash
    *      between a direct write and a failed check's cleanup would have
    *      committed a violating batch forever; manifest stores get the
    *      same flip for uniformity, their visibility still waits for the
    *      manifest). Stale `.stage-*` orphans from crashed attempts are
    *      swept first (single-writer contract);
    *   5. `publish(Some(gen))` hands the caller the generation to commit
    *      in its own manifest flip; `publish(None)` signals an empty batch
    *      (nothing written — the caller may still advance a stream mark).
    *
    * Returns the rows written (0 = nothing committed). The caller handles
    * stream redelivery BEFORE calling (it owns the manifest/marks). */
  def commitTombstones(ids: org.apache.spark.sql.DataFrame, idName: String,
      tombsRoot: String, committedGens: Seq[String],
      streamGen: Option[String], capConfKey: String, what: String,
      compactHint: String, extraLiveRows: Long = 0L)(
      publish: Option[String] => Unit): Long = {
    val spark = ids.sparkSession
    val gen = streamGen.getOrElse(
      nextGenName(spark, Seq(tombsRoot), committedGens))
    val dir = s"$tombsRoot/$gen"
    val stage = s"$tombsRoot/.stage-$gen"
    val f = fs(spark, tombsRoot)
    val rootP = new Path(tombsRoot)
    if (f.exists(rootP)) f.listStatus(rootP).foreach { st =>
      if (st.isDirectory && st.getPath.getName.startsWith(".stage-"))
        f.delete(st.getPath, true)
    }
    // repartition(1), NOT coalesce(1): coalesce would collapse the
    // distinct's reduce side into that single task (the trap
    // compactMinHashStore documents); the extra shuffle moves only the
    // distinct OUTPUT — cap-bounded, so one write task is fine (r16)
    ids.distinct().repartition(1).write.mode("overwrite").parquet(stage)
    val (n, nulls) = parquetRowsAndNulls(spark, stage, idName)
    def dropStage(): Unit = { f.delete(new Path(stage), true); () }
    if (n <= 0L) {
      dropStage()
      publish(None)
      0L
    } else {
      val hasNull =
        if (nulls >= 0L) nulls > 0L
        // footer statistic unavailable (non-Spark writer) — one explicit
        // fallback job on the KB-scale tombstone file
        else !ids.sparkSession.read.parquet(stage)
          .filter(org.apache.spark.sql.functions.col(idName).isNull).isEmpty
      if (hasNull) {
        dropStage()
        sys.error(s"$what: null id in the tombstone batch — a null masks " +
          "nothing (serves anti-join with non-null-safe equality) but " +
          "would count toward the cap and the returned n; filter it out")
      }
      val live = extraLiveRows +
        committedTombstoneRows(spark, tombsRoot, committedGens, what)
      val cap = spark.conf.getOption(capConfKey).map(_.toLong)
        .getOrElse(10000000L)
      if (live + n > cap) {
        dropStage()
        sys.error(s"$what: $live live + $n new tombstone rows exceed " +
          s"$capConfKey=$cap — run $compactHint to retire the live " +
          "tombstones first (or raise the cap)")
      }
      // visibility flip: only a fully-checked batch ever appears at a
      // visible name; a same-named leftover is a crashed attempt's orphan
      // (never manifest-listed, or the caller would have no-opped the
      // redelivery before calling) — reclaim it
      f.delete(new Path(dir), true)
      require(f.rename(new Path(stage), new Path(dir)),
        s"$what: rename $stage -> $dir failed")
      publish(Some(gen))
      n
    }
  }

  /** One codec for the pre-manifest stores' small marks files
    * (`{"format":"…","marks":{tag:long}}`; r16 review — the MinHash
    * store's and the pipeline staging dir's hand-rolled copies could
    * drift). Absent file = no marks. The format tag is asserted so a
    * foreign JSON file refuses loudly instead of parsing as empty. */
  def readLongMarks(spark: SparkSession, path: String,
      format: String): Map[String, Long] = {
    if (!fs(spark, path).exists(new Path(path))) Map.empty
    else {
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readValue(
        readUtf8(spark, path), classOf[java.util.Map[String, Any]])
      require(String.valueOf(root.get("format")) == format,
        s"not a $format file: $path")
      jsonLongMap(root.get("marks"))
    }
  }

  def writeLongMarks(spark: SparkSession, path: String, format: String,
      marks: Map[String, Long]): Unit =
    writeUtf8Atomic(spark, path,
      s"""{"format":"$format","marks":{${jsonLongObj(marks)}}}""")

  /** Publish a generation directory exactly once (r16 — the one
    * stage→rename implementation for the pre-manifest publish shape,
    * shared by the MinHash streamed append's per-table generations and
    * the pipeline staging step): if `genDir` is already VISIBLE, a prior
    * attempt completed it — the rename is the publish, so a visible dir
    * is complete by construction — and this is a no-op (returns false);
    * otherwise `write` runs against the hidden stage path (its
    * mode("overwrite") semantics reclaim a crashed attempt's orphan) and
    * the rename flips it visible. Single-writer contract. */
  def publishDirOnce(spark: SparkSession, stagePath: String,
      genDir: String)(write: String => Unit): Boolean = {
    val f = fs(spark, genDir)
    val gen = new Path(genDir)
    if (f.exists(gen)) false
    else {
      write(stagePath)
      require(f.rename(new Path(stagePath), gen),
        s"publishDirOnce: rename $stagePath -> $genDir failed")
      true
    }
  }

  /** Total visible data bytes under `dir` (non-recursive). */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) 0L
    else f.listStatus(p).collect {
      case st if st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith(".") => st.getLen
    }.sum
  }

  /** Recursive variant of [[dataBytes]] — for partitioned layouts where
    * the data files live under partition subdirectories. Shares
    * [[walkVisible]] with the row/footer counters (r16 advice), so bytes
    * inside hidden staging dirs (`_temporary`, `.stage-*`) never count as
    * live data and the two "visible data" definitions cannot drift. */
  def dataBytesRecursive(spark: SparkSession, dir: String): Long = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) return 0L
    var n = 0L
    walkVisible(f, p)(st => n += st.getLen)
    n
  }

  /** File count targeting ~`targetBytes` per file (default 128 MB — one
    * comfortable task/scan unit). Never 0. */
  def targetFileCount(bytes: Long, targetBytes: Long = 128L * 1024 * 1024): Int =
    math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt

  /** Read a small UTF-8 metadata file through the Hadoop FS — works for
    * local paths, HDFS and object-store connectors alike. */
  def readUtf8(spark: SparkSession, path: String): String = {
    val in = fs(spark, path).open(new Path(path))
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Atomically replace a small UTF-8 metadata file: write a hidden
    * sibling temp, then FileContext rename with OVERWRITE — atomic on
    * local and HDFS-style filesystems; object-store connectors implement
    * it as copy+delete of a KB-sized object (the narrowest practical
    * window). */
  def writeUtf8Atomic(spark: SparkSession, path: String, content: String): Unit =
    writeBytesAtomic(spark, path)(
      _.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  /** The bytes-level atomic replace under [[writeUtf8Atomic]] — shared so
    * binary artifacts (the fingerprint store's Bloom filter) get the same
    * tmp + FileContext rename(OVERWRITE) mechanics instead of their own
    * drift-prone copy. */
  def writeBytesAtomic(spark: SparkSession, path: String)(
      write: java.io.OutputStream => Unit): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dst = new Path(path)
    val f = dst.getFileSystem(conf)
    if (dst.getParent != null) f.mkdirs(dst.getParent)
    val tmp = new Path(dst.getParent, "." + dst.getName + ".tmp")
    val out = f.create(tmp, true)
    try write(out)
    finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, conf)
      .rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Shared legacy-adoption move loop (fingerprint + sketch stores): move
    * every visible flat FILE under `srcDir` into `dstDir`, resume-aware —
    * a same-named destination at the same length is a completed copy from
    * a crashed prior attempt (its source remnant is dropped); a differing
    * length is a partial copy cleared before the rename retries. `skip`
    * excludes names that must stay (e.g. a manifest). */
  def adoptFlatFilesInto(f: FileSystem, srcDir: Path, dstDir: Path,
      skip: String => Boolean): Unit = {
    f.mkdirs(dstDir)
    f.listStatus(srcDir).foreach { st =>
      val nm = st.getPath.getName
      if (st.isFile && !nm.startsWith(".") && !skip(nm)) {
        val dst = new Path(dstDir, nm)
        if (f.exists(dst)) {
          if (f.getFileStatus(dst).getLen == st.getLen) {
            f.delete(st.getPath, false): Unit
          } else {
            f.delete(dst, false)
            require(f.rename(st.getPath, dst), s"adopt: rename $nm failed")
          }
        } else require(f.rename(st.getPath, dst), s"adopt: rename $nm failed")
      }
    }
  }

  /** Heal a directory left mid-swap by a crashed [[swapDir]]: if `live`
    * is missing but `live.old` exists, the crash hit the window between
    * the two renames — restore the old (pre-compaction, still correct)
    * data. Every store's `compact()` calls this FIRST, so "re-run compact
    * to heal" genuinely works; idempotent no-op otherwise. */
  def healDir(spark: SparkSession, liveDir: String): Unit = {
    val f = fs(spark, liveDir)
    val live = new Path(liveDir)
    val old = new Path(liveDir + ".old")
    if (!f.exists(live) && f.exists(old))
      require(f.rename(old, live), s"heal: rename $old -> $live failed")
  }

  /** Replace `liveDir` with `tmpDir` via rename: live → live.old,
    * tmp → live, delete live.old. Crash windows: before the first rename
    * the store is untouched; between the renames there is NO live dir —
    * serves fail loudly (never silently wrong) and the next `compact()`'s
    * [[healDir]] restores the old data; after the second rename the
    * compacted data is live. A FAILED (false-returning) second rename
    * rolls back in-line. */
  def swapDir(spark: SparkSession, tmpDir: String, liveDir: String): Unit = {
    val f = fs(spark, liveDir)
    val live = new Path(liveDir)
    val tmp = new Path(tmpDir)
    val old = new Path(liveDir + ".old")
    if (f.exists(old)) f.delete(old, true)
    require(f.rename(live, old), s"compact: rename $live -> $old failed")
    // if the second rename FAILS (returns false, e.g. permissions/races —
    // distinct from a process crash), roll the old dir back so the store
    // never sits without a live directory because of a reported error
    if (!f.rename(tmp, live)) {
      f.rename(old, live)
      sys.error(s"compact: rename $tmp -> $live failed (rolled back)")
    }
    f.delete(old, true)
  }

  /** The generational stores' shared GC step (BM25 index, ANN codes):
    * given the pre-compaction manifest's `cooling` ledger (gen →
    * superseded-at epoch ms), the generations this compaction supersedes,
    * and the new generation, returns the cooling map to publish and the
    * keep-set for [[sweepGenerations]]. Entries younger than `graceMs`
    * survive ANY number of back-to-back compactions — the age gate, not
    * the compaction count, drives the sweep. */
  def coolingStep(cooling: Map[String, Long], superseded: Set[String],
      newGen: String, graceMs: Long, now: Long):
      (Map[String, Long], Set[String]) = {
    val stillCooling = cooling.filter { case (_, t) => now - t < graceMs }
    val sup = (superseded - newGen).map(_ -> now).toMap
    (stillCooling ++ sup, sup.keySet ++ stillCooling.keySet + newGen)
  }

  /** The generational stores' EMPTIED-state retire step, shared by the
    * BM25 and ANN compactions (r15 review: it existed as two lockstep
    * copies, and the leak it fixes — an emptied store's cooled data
    * generations surviving forever — had to be patched twice). A store
    * emptied by a full-tombstone compaction has no data to rewrite, but
    * it can still hold live tombstones from later deletes (retiring them
    * IS the physical step — else a tombstone-deadline policy reports it
    * forever "due") and grace copies still cooling from the emptying
    * compaction (both data and tombstone sides). Steps both cooling
    * ledgers, hands the caller the maps to publish in ITS manifest
    * format, then sweeps. No-op when there is nothing to retire. */
  def retireEmptiedStore(spark: SparkSession, graceConfKey: String,
      cooling: Map[String, Long], tombs: Seq[String],
      tombCooling: Map[String, Long], dataRoots: Seq[String],
      tombsRoot: String)(
      publish: (Map[String, Long], Map[String, Long]) => Unit): Unit = {
    if (tombs.isEmpty && tombCooling.isEmpty && cooling.isEmpty) return
    val graceMs = spark.conf.getOption(graceConfKey).map(_.toLong)
      .getOrElse(15L * 60 * 1000)
    val now = System.currentTimeMillis()
    val (cool2, keep) = coolingStep(cooling, Set.empty, "", graceMs, now)
    val (tombCool2, keepT) = coolingStep(tombCooling, tombs.toSet, "",
      graceMs, now)
    publish(cool2, tombCool2)
    dataRoots.foreach(r => sweepGenerations(spark, r, keep - ""))
    sweepGenerations(spark, tombsRoot, keepT - "")
  }

  /** Delete every generation directory under `root` that is not in
    * `keep`: crash orphans (never listed in any manifest — invisible to
    * every reader) and cooled-out grace copies. Non-directories and
    * hidden entries are left alone. */
  def sweepGenerations(spark: SparkSession, root: String,
      keep: Set[String]): Unit = {
    val f = fs(spark, root)
    val p = new Path(root)
    if (f.exists(p)) f.listStatus(p).foreach { st =>
      val nm = st.getPath.getName
      if (st.isDirectory && !keep.contains(nm) && !nm.startsWith("."))
        f.delete(st.getPath, true)
    }
  }

  /** Next numeric generation name for a generational store: strictly
    * above both the committed gens AND anything on disk under the given
    * roots — a crashed append's orphan dir must never be adopted by a
    * later writer. */
  def nextGenName(spark: SparkSession, roots: Seq[String],
      committed: Seq[String]): String = {
    val onDisk = roots.flatMap { root =>
      val f = fs(spark, root)
      val p = new Path(root)
      if (!f.exists(p)) Nil
      else f.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
    }
    val nums = (onDisk ++ committed)
      .collect { case s if s.matches("g\\d+") => s.drop(1).toLong }
    "g" + (if (nums.isEmpty) 0L else nums.max + 1L)
  }

  /** JSON fragments for the generational stores' hand-built manifests —
    * one encoding for both the BM25 index and the ANN codes manifest, so
    * ledger-format changes cannot drift between them. */
  def jsonStrArr(xs: Seq[String]): String =
    xs.map("\"" + _ + "\"").mkString(",")

  def jsonLongObj(xs: Map[String, Long]): String =
    xs.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString(",")

  /** Parse a jackson-decoded JSON object of longs; null-tolerant (absent
    * key in an older manifest = empty). */
  def jsonLongMap(v: Any): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    if (v == null) Map.empty
    else v.asInstanceOf[java.util.Map[String, Any]].asScala
      .map { case (k, x) => k -> x.asInstanceOf[Number].longValue() }.toMap
  }

  /** Stream-tag contract shared by the generational stores: tags name
    * `<tag>-b<id>` generation dirs, so they must not collide with the
    * `g<N>` auto-generation namespace and must not start with a dot or
    * underscore (hidden to both Spark and the GC sweep — a dot-leading
    * tag's dirs would leak forever). */
  def requireStreamTag(tag: String): Unit =
    require(tag.matches("[A-Za-z0-9][A-Za-z0-9_\\-.]*") && !tag.matches("g\\d+"),
      s"bad stream tag '$tag' (must start with a letter/digit, then " +
        "letters/digits/dot/dash/underscore; the g<N> auto-generation " +
        "namespace is reserved)")

  /** Driver-side collect for a side that is broadcast-small BY CONTRACT
    * (a serve's query tokens, an ANN probe table): the contract is
    * enforced, not conventional — the plan is `limit(cap + 1)`-bounded so
    * the driver never materializes more than cap+1 rows, and crossing the
    * cap fails LOUDLY with the knob to turn instead of OOMing the driver.
    * `confKey` (e.g. `graft.bm25.maxQueryTokens`) overrides `default` via
    * `spark.conf.set`. */
  def collectBounded(df: org.apache.spark.sql.DataFrame, what: String,
      confKey: String, default: Int): Array[org.apache.spark.sql.Row] = {
    val cap = df.sparkSession.conf.getOption(confKey)
      .map(_.toInt).getOrElse(default)
    require(cap >= 1, s"$confKey must be >= 1, got $cap")
    val rows = df.limit(cap + 1).collect()
    require(rows.length <= cap,
      s"$what exceeds $cap rows — this side must stay broadcast-small " +
        s"(driver-collected); split the batch or raise spark.conf " +
        s"'$confKey' deliberately")
    rows
  }
}
