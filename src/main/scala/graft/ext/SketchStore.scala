package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental distinct-count statistics via mergeable HLL sketches —
  * Spark's built-in Apache DataSketches HLL functions (`hll_sketch_agg` /
  * `hll_union_agg` / `hll_sketch_estimate`, all codegen'd aggregates), so
  * the implementation is pure built-ins and the novelty is the STORE
  * protocol: each ingest batch reduces to one tiny (labels…, sketch)
  * parquet row, appended to a store directory; any later question
  * ("distinct users per event type across all crawls so far") is answered
  * by unioning the stored sketches — register-wise max, associative,
  * commutative and idempotent, reading bytes proportional to
  * #batches · 2^lgK, never the corpus. While every sketch is still in the
  * DataSketches coupon (sparse) phase the union estimate is EXACTLY the
  * single-pass estimate (and exactly the true cardinality); past that
  * phase a merged sketch drops the HIP estimator, so union and one-shot
  * estimates agree only to the configured error class (~1.04/√2^lgK) —
  * both properties asserted in SketchStoreSpec, the sparse-phase equality
  * additionally in-gate.
  *
  * This is the distinct-count sibling of [[DriftProfile]] (fractions) and
  * the MinHash store (membership): the 100 TB pattern is always the same —
  * reduce each increment once, persist the bounded summary, serve every
  * later question from the store. */
object SketchStore {

  private def q(n: String): org.apache.spark.sql.Column =
    col("`" + n.replace("`", "``") + "`")

  /** Per-key distinct sketches over `valueCol`: one row per key group —
    * (keys…, n_rows, sketch). `lgK` trades size (2^lgK bytes-ish) for
    * accuracy (~1.04/√2^lgK relative stderr); DataSketches HLL is exact
    * while the group's cardinality stays in the coupon phase. */
  def distinctSketch(df: DataFrame, keyCols: Seq[String], valueCol: String,
      lgK: Int = 14): DataFrame = {
    require(lgK >= 4 && lgK <= 21, "lgK in [4,21] (DataSketches bounds)")
    val grouped =
      if (keyCols.isEmpty) df.groupBy()
      else df.groupBy(keyCols.map(q): _*)
    grouped.agg(
      count(q(valueCol)).as("n_rows"),
      hll_sketch_agg(q(valueCol), lit(lgK)).as("sketch"))
  }

  /** Append one batch's sketch rows to the store directory, stamped with a
    * batch label. Pure parquet append — each batch adds files, never
    * rewrites (same append-only contract as the MinHash store). */
  def append(sketches: DataFrame, path: String, batchLabel: String): Unit =
    sketches.withColumn("batch", lit(batchLabel))
      .write.mode("append").parquet(path)

  /** Compact the store: the per-batch (keys…, n_rows, sketch) rows merge
    * into ONE row per key group — n_rows summed, sketches unioned
    * (register-wise max: associative, commutative, idempotent, so the
    * merged sketch serves every later union exactly as the originals
    * did — same error class, gate-asserted equal estimates). The `batch`
    * lineage column collapses to the literal `"__compacted"`; subsequent
    * appends keep stacking on top and can be compacted again.
    *
    * Key columns are discovered from the store schema (everything except
    * n_rows/sketch/batch). The rewrite lands in a sibling temp dir and
    * swaps in whole — a crash before the swap leaves the store untouched. */
  def compact(spark: SparkSession, path: String): Unit = {
    StoreFiles.healDir(spark, path) // complete a crashed prior swap
    val store = spark.read.parquet(path)
    val special = Set("n_rows", "sketch", "batch")
    val keyCols = store.columns.filterNot(special.contains).toSeq
    require(store.columns.contains("sketch") && store.columns.contains("n_rows"),
      s"not a sketch store at $path")
    val grouped =
      if (keyCols.isEmpty) store.groupBy()
      else store.groupBy(keyCols.map(q): _*)
    val merged = grouped.agg(
        sum("n_rows").as("n_rows"),
        hll_union_agg(col("sketch"), lit(true)).as("sketch"))
      .withColumn("batch", lit("__compacted"))
      // original column order, so compacted and appended files stay
      // schema-aligned
      .select(store.columns.map(c => col("`" + c.replace("`", "``") + "`")): _*)
    val tmp = path.stripSuffix("/") + "__compact_tmp"
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    StoreFiles.swapDir(spark, tmp, path)
  }

  /** Merged per-key estimates from everything in the store: (keys…,
    * n_rows summed, n_distinct estimated via the unioned sketch). Reads
    * only sketch rows — the corpora they summarize are not touched. */
  def estimate(spark: SparkSession, path: String,
      keyCols: Seq[String]): DataFrame = {
    val store = spark.read.parquet(path)
    val grouped =
      if (keyCols.isEmpty) store.groupBy()
      else store.groupBy(keyCols.map(q): _*)
    // allowDifferentLgConfigK=true: batches appended at different lgK
    // settings union by downgrading to the smallest lgK present (that
    // batch's error class bounds the merged estimate) instead of failing
    // the whole serve — the store itself never validates lgK on append
    grouped.agg(
      sum("n_rows").as("n_rows"),
      hll_sketch_estimate(hll_union_agg(col("sketch"), lit(true)))
        .as("n_distinct"))
  }
}
