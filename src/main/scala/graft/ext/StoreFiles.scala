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

  /** File count targeting ~`targetBytes` per file (default 128 MB — one
    * comfortable task/scan unit). Never 0. */
  def targetFileCount(bytes: Long, targetBytes: Long = 128L * 1024 * 1024): Int =
    math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt

  /** Replace `liveDir` with `tmpDir` via rename: live → live.old,
    * tmp → live, delete live.old. The caller sequences this so a crash at
    * any point leaves a servable store (old data until the second rename;
    * compacted data after). */
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
