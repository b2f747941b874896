package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-store composition plumbing for the nightly crawl pipeline (r16,
  * r15-verdict #1).
  *
  * Each persisted store is individually exactly-once under `(streamTag,
  * batchId)` marks — but the COMPOSITION (scrub → fingerprint/MinHash
  * appends → BM25/ANN appends → ledger increment) is NOT naively
  * idempotent, because the batch's store-bound frame is DERIVED from the
  * stores themselves: the survivors are "valid rows that pass the
  * fingerprint scrub and the near-dup scrub". Re-running a crashed batch
  * recomputes that derivation against stores that may already hold the
  * batch's own first-attempt appends — the re-scrub then drops EVERYTHING
  * (every text now matches the store), the remaining appends commit an
  * empty frame under their marks, and the run "succeeds" having silently
  * diverged from the uninterrupted result. The per-store marks cannot see
  * this: each store did exactly one commit for the batch; it is the INPUT
  * that changed between attempts.
  *
  * The fix is the classic write-ahead staging step: derive the survivors
  * ONCE, publish them durably under the batch's identity BEFORE any store
  * append, and have every append (and any resume) read the staged frame
  * instead of re-deriving it. Ordering:
  *
  *   1. [[stageBatch]](tag, id){ scrub pipeline }  — compute-or-readback
  *   2. per-store appendBatch(tag, id), any order  — each exactly-once
  *   3. ledger validateIncrementBatch(tag, id)     — the batch's verdict
  *   4. [[retireStaged]](tag, id)                  — optional cleanup
  *
  * Crash windows: before the stage flip nothing is anywhere (recompute is
  * against untouched stores); after the flip every resume reads the same
  * staged bytes, so each store's append is presented the identical frame
  * and its own mark makes it exactly-once; after the ledger commit the
  * whole re-run is a chain of no-ops. PipelineResumeSpec kills the
  * composition at every inter-store boundary and asserts convergence to
  * the uninterrupted run's state.
  *
  * At 100 TB the staged frame is batch-sized (one night's survivors), not
  * corpus-sized, and it writes once and is read by ~5 appends — strictly
  * cheaper than re-running the scrub derivation (two store serves) per
  * resume, and the only correct option besides it. */
object Pipeline {

  private def genDir(dir: String, streamTag: String, batchId: Long) =
    s"$dir/$streamTag-b$batchId"

  /** Compute-or-readback for a batch's staged frame: if the batch's
    * generation dir is already visible under `dir`, read it back (a prior
    * attempt staged it — its derivation must NOT re-run); otherwise run
    * `compute`, publish via hidden stage → rename, and read back. The
    * returned frame is always the PERSISTED bytes, so every attempt and
    * every downstream consumer sees one identical frame. Single-writer
    * per (dir, tag) — the family contract. */
  def stageBatch(spark: SparkSession, dir: String, streamTag: String,
      batchId: Long)(compute: => DataFrame): DataFrame = {
    StoreFiles.requireStreamTag(streamTag)
    require(batchId >= 0, s"batchId >= 0, got $batchId")
    val f = StoreFiles.fs(spark, dir)
    val gen = new org.apache.hadoop.fs.Path(genDir(dir, streamTag, batchId))
    if (!f.exists(gen)) {
      val stage = s"$dir/.stage-$streamTag-b$batchId"
      compute.write.mode("overwrite").parquet(stage)
      require(f.rename(new org.apache.hadoop.fs.Path(stage), gen),
        s"stageBatch: rename $stage -> $gen failed")
    }
    spark.read.parquet(gen.toString)
  }

  /** Drop a staged batch after its last consumer committed (the ledger
    * increment) — resume no longer needs it. Safe at any point AFTER
    * every store's mark covers the batch: a crash between the final
    * commit and this delete just re-runs the no-op chain and retires
    * again. Idempotent. */
  def retireStaged(spark: SparkSession, dir: String, streamTag: String,
      batchId: Long): Unit = {
    StoreFiles.fs(spark, dir).delete(
      new org.apache.hadoop.fs.Path(genDir(dir, streamTag, batchId)),
      true): Unit
  }
}
