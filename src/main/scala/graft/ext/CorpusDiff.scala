package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level diff between two snapshots of the same table — the corpus
  * counterpart of [[graft.schema.Schemas.diff]] (which compares the
  * *shape*; this compares the *rows*). The everyday question it answers in
  * a training-data pipeline: between crawl N and crawl N+1, which documents
  * were added, which disappeared, and which changed content?
  *
  * Scale shape: each side is reduced to `(id, xxhash64(compare columns))`
  * BEFORE the join — the payload (document text, embeddings) never enters
  * the shuffle — then ONE full-outer hash join on the id produces the
  * status. At 100 TB that is the minimal possible plan: two projected
  * scans + one co-partitioned join on a key both sides can be bucketed by.
  * No collect, no window, no skew risk beyond the id distribution itself
  * (ids are unique per side, so bucket sizes are 1-2).
  *
  * Reference behavior baseline: pandera has no row-diff (its scope stops at
  * schema checks); the semantics here follow the common snapshot-diff
  * contract (added / removed / changed / unchanged keyed by id).
  */
object CorpusDiff {

  private def q(n: String): Column = col("`" + n.replace("`", "``") + "`")

  /** Per-row status report: one row per id present in either snapshot, with
    * `status` in {added, removed, changed, unchanged}. `compareCols`
    * defaults to every non-id column the two snapshots SHARE (columns only
    * one side has would otherwise mark every row changed); pass an explicit
    * list to diff on a subset (e.g. just `text`, ignoring mutable metadata).
    *
    * Duplicate-id inputs are rejected up front by a count check? No — that
    * would cost an extra action per call. Instead ids are assumed unique
    * per snapshot (the corpus contract everywhere else in this library,
    * e.g. dedup representatives); duplicate ids produce one output row per
    * matched pair, which the `summary` counts faithfully.
    */
  def diff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      idCol: String,
      compareCols: Seq[String] = Nil): DataFrame = {
    val cols =
      if (compareCols.nonEmpty) compareCols
      else oldSnap.columns.toSeq.filter(c =>
        c != idCol && newSnap.columns.contains(c))
    require(cols.nonEmpty, s"corpus diff: no comparable columns besides '$idCol'")
    // hash the compare columns on each side; the join carries 16 bytes/row.
    // Each column is prefixed with its null flag: xxhash64 SKIPS null
    // fields (the running hash passes through unchanged), so without the
    // flags a value migrating between columns — old (null, "x") vs new
    // ("x", null) — would hash identically and a changed row would report
    // "unchanged". The flag cell is never null, so column positions stay
    // anchored in the hash input.
    def keyed(df: DataFrame, h: String): DataFrame =
      df.select(q(idCol).as("id"),
        xxhash64(cols.flatMap(c => Seq(q(c).isNull, q(c))): _*).as(h))
    keyed(oldSnap, "__h_old").join(keyed(newSnap, "__h_new"), Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        when(col("__h_old").isNull, lit("added"))
          .when(col("__h_new").isNull, lit("removed"))
          .when(col("__h_old") === col("__h_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Aggregate of [[diff]]: one row per status with its count — the
    * dashboard number. One extra aggregation over the (id, status) frame;
    * statuses absent from the diff are absent from the summary (a diff of
    * identical snapshots is one `unchanged` row, not four). */
  def summary(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      idCol: String,
      compareCols: Seq[String] = Nil): DataFrame =
    diff(oldSnap, newSnap, idCol, compareCols)
      .groupBy("status").agg(count(lit(1)).as("n"))
}
