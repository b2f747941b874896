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

  /** Per-tag retire marks for the staging dir — the guard that makes a
    * post-retirement redelivery REFUSE instead of silently restaging a
    * wrong disposition (r16 review: after [[retireStaged]], a redelivered
    * batch would find no generation dir and recompute its derivation
    * against stores that already absorbed the batch — the stores
    * themselves stay correct, their appends no-op at their marks, but the
    * recomputed frame becomes the batch's durable disposition of record,
    * all-dup/empty). ONE FILE PER TAG (`marks-<tag>.json`): the staging
    * contract is single-writer per (dir, TAG) — the generation dirs are
    * tag-disjoint, so two tags sharing a dir is legitimate, and a shared
    * marks file's read-modify-write would let one tag's retire clobber
    * the other's (r16 second-pass review: the lost mark silently
    * re-opens the restaging hole the guard exists to close). Absent file
    * = nothing retired. Shared codec: [[StoreFiles.readLongMarks]]. */
  private def marksFile(dir: String, streamTag: String) =
    s"$dir/marks-$streamTag.json"

  private def retireMark(spark: SparkSession, dir: String,
      streamTag: String): Option[Long] = {
    // a shared marks.json is the r16-interim layout this per-tag split
    // replaced (its read-modify-write lost marks across tags) — refuse
    // loudly rather than silently ignoring its marks, which would
    // re-open the restaging hole for dirs written under it
    require(!StoreFiles.fs(spark, dir).exists(
      new org.apache.hadoop.fs.Path(s"$dir/marks.json")),
      s"staging dir $dir holds a legacy shared marks.json — split its " +
        "entries into per-tag marks-<tag>.json files (same " +
        "graft-staged-marks format, one tag each) before staging")
    StoreFiles.readLongMarks(spark, marksFile(dir, streamTag),
      "graft-staged-marks").get(streamTag)
  }

  /** The tag's retire high-water mark, or None when nothing is retired —
    * the caller-side predicate for short-circuiting post-retirement
    * redeliveries (the loud exit in [[stageBatch]] tells the caller to
    * short-circuit; this is the durable "was it retired?" answer a
    * foreachBatch writer asks at batch start, since a redelivery after a
    * restart cannot rely on in-memory bookkeeping). r17 — the streamed
    * lifecycle spec drives it end-to-end. */
  def retiredThrough(spark: SparkSession, dir: String,
      streamTag: String): Option[Long] = {
    StoreFiles.requireStreamTag(streamTag)
    retireMark(spark, dir, streamTag)
  }

  /** Compute-or-readback for a batch's staged frame: if the batch's
    * generation dir is already visible under `dir`, read it back (a prior
    * attempt staged it — its derivation must NOT re-run); otherwise run
    * `compute`, publish via the shared stage → rename flip, and read
    * back. The returned frame is always the PERSISTED bytes, so every
    * attempt and every downstream consumer sees one identical frame.
    * A batch at or below the tag's RETIRE mark refuses loudly: its
    * staged bytes are gone, so a recompute could only produce a
    * different (post-append) derivation — the caller must short-circuit
    * such redeliveries instead (see [[retireStaged]]). Single-writer
    * per (dir, tag) — the family contract. */
  def stageBatch(spark: SparkSession, dir: String, streamTag: String,
      batchId: Long)(compute: => DataFrame): DataFrame = {
    StoreFiles.requireStreamTag(streamTag)
    require(batchId >= 0, s"batchId >= 0, got $batchId")
    require(!retireMark(spark, dir, streamTag).exists(batchId <= _),
      s"stageBatch: batch ($streamTag, $batchId) was already RETIRED — " +
        "its staged bytes are gone and a recompute would derive against " +
        "stores that already absorbed the batch; short-circuit the " +
        "redelivery (every store committed it) instead of restaging")
    StoreFiles.publishDirOnce(spark, s"$dir/.stage-$streamTag-b$batchId",
      genDir(dir, streamTag, batchId))(
      stage => compute.write.mode("overwrite").parquet(stage)): Unit
    spark.read.parquet(genDir(dir, streamTag, batchId))
  }

  /** Drop a staged batch once no redelivery can arrive for it — i.e.
    * after the stream checkpoint (or equivalent source acknowledgement)
    * that covers the batch has committed, NOT merely after the stores'
    * appends: between the last append and the checkpoint commit the
    * source may still redeliver, and the resume needs the staged bytes
    * (r16 review — the earlier "safe after every store's mark" wording
    * was wrong for the disposition artifact itself; in a foreachBatch
    * the natural call site is the START of batch N+1, retiring N).
    * Advances the tag's retire mark FIRST (atomic replace), then deletes
    * the bytes — so a crash between the two leaves a refused, not a
    * recomputable, batch. Idempotent; a late call for an already-marked
    * batch only re-deletes. */
  def retireStaged(spark: SparkSession, dir: String, streamTag: String,
      batchId: Long): Unit = {
    StoreFiles.requireStreamTag(streamTag)
    require(batchId >= 0, s"batchId >= 0, got $batchId")
    if (!retireMark(spark, dir, streamTag).exists(batchId <= _))
      StoreFiles.writeLongMarks(spark, marksFile(dir, streamTag),
        "graft-staged-marks", Map(streamTag -> batchId))
    StoreFiles.fs(spark, dir).delete(
      new org.apache.hadoop.fs.Path(genDir(dir, streamTag, batchId)),
      true): Unit
  }
}
