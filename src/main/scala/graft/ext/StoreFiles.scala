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

  /** Recursive variant of [[dataFileCount]] — for partitioned layouts
    * (e.g. cell=N subdirectories) where the files live one level down. */
  def dataFileCountRecursive(spark: SparkSession, dir: String): Int = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) return 0
    val it = f.listFiles(p, true)
    var n = 0
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && !name.startsWith("_") && !name.startsWith(".")) n += 1
    }
    n
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
    * the data files live under partition subdirectories. */
  def dataBytesRecursive(spark: SparkSession, dir: String): Long = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) return 0L
    val it = f.listFiles(p, true)
    var n = 0L
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && !name.startsWith("_") && !name.startsWith(".")) n += st.getLen
    }
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
  def writeUtf8Atomic(spark: SparkSession, path: String, content: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dst = new Path(path)
    val f = dst.getFileSystem(conf)
    if (dst.getParent != null) f.mkdirs(dst.getParent)
    val tmp = new Path(dst.getParent, "." + dst.getName + ".tmp")
    val out = f.create(tmp, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, conf)
      .rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
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
}
