package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage: blocked fuzzy matching on string
  * keys (Fellegi & Sunter 1969's block-then-compare shape, the standard
  * large-scale formulation — Christen, "Data Matching", 2012). A full
  * cross product is never materialized: candidates come from an equi-join
  * on a cheap blocking key, the expensive string similarity
  * ([[graft.functions.JaroWinkler]], codegen'd native expression) runs
  * only inside blocks, and a pair-count guard drops degenerate blocks
  * before they explode — the ER sibling of Dedup's capped LSH buckets.
  *
  * Scale shape: two aggregations over block keys (block-count-sized, tiny)
  * + one equi-join that shuffles on the block key. Skewed blocking keys
  * are bounded by `maxBlockPairs`; at 100 TB you block on something with
  * bounded selectivity (sorted-neighborhood keys, phonetic codes, n-gram
  * prefixes) and the guard enforces it. */
object EntityResolution {

  private def q(n: String): Column = col("`" + n.replace("`", "``") + "`")

  /** Jaro–Winkler similarity column (semantics pinned to DuckDB's
    * `jaro_winkler_similarity` — see [[graft.functions.JaroWinkler]]). */
  def jaroWinkler(a: Column, b: Column): Column =
    graft.functions.JaroWinkler(a, b)

  /** Standard cheap blocker: lowercased first `n` chars of the trimmed
    * value (engine-portable; mirror as lower(substr(trim(x),1,n)) in SQL). */
  def prefixBlock(c: Column, n: Int): Column =
    lower(substring(trim(c), 1, n))

  /** Blocked fuzzy join: candidate pairs agree on `leftBlock`/`rightBlock`,
    * are scored with Jaro–Winkler on `leftText`/`rightText`, and survive at
    * `similarity >= threshold`. Returns (left_id, right_id,
    * similarity[rounded to 6dp]). Blocks whose cross product would exceed
    * `maxBlockPairs` are dropped whole (standard blocking practice: an
    * over-popular key — empty names, one giant city — carries no linkage
    * signal and only quadratic cost); the guard costs two block-key
    * aggregations, never a pass over the pair space. Null block keys never
    * match (equi-join semantics). */
  def fuzzyJoin(left: DataFrame, leftId: String, leftText: String,
      right: DataFrame, rightId: String, rightText: String,
      leftBlock: Column, rightBlock: Column, threshold: Double,
      maxBlockPairs: Long = 1000000L): DataFrame =
    fuzzyJoinImpl(left, leftId, leftText, right, rightId, rightText,
      leftBlock, rightBlock, threshold, maxBlockPairs, pairPre = None)

  private def fuzzyJoinImpl(left: DataFrame, leftId: String, leftText: String,
      right: DataFrame, rightId: String, rightText: String,
      leftBlock: Column, rightBlock: Column, threshold: Double,
      maxBlockPairs: Long, pairPre: Option[Column]): DataFrame = {
    require(threshold >= 0.0 && threshold <= 1.0, "threshold in [0,1]")
    require(maxBlockPairs >= 1, "maxBlockPairs >= 1")
    val l = left.select(q(leftId).as("left_id"), q(leftText).as("__lt"),
      leftBlock.as("__blk"))
    val r = right.select(q(rightId).as("right_id"), q(rightText).as("__rt"),
      rightBlock.as("__blk"))
    val lc = l.groupBy("__blk").agg(count(lit(1)).as("__ln"))
    val rc = r.groupBy("__blk").agg(count(lit(1)).as("__rn"))
    // blocks small enough to compare; block-count-sized, broadcast below.
    // Division form of ln·rn <= max (equivalent for positive integers):
    // the product would overflow Long exactly for the giant degenerate
    // blocks this guard exists to refuse
    val ok = lc.join(rc, "__blk")
      .filter(col("__ln") <=
        call_function("div", lit(maxBlockPairs), greatest(col("__rn"), lit(1L))))
      .select("__blk")
    val pairs = l.join(broadcast(ok), "__blk").join(r, "__blk")
    // the CHEAP pair predicate (fuzzyDedup's id_a < id_b) filters BEFORE
    // the similarity projection, so Catalyst's filter merge puts it FIRST
    // in the join condition and the codegen'd Jaro-Winkler never runs on
    // pairs it rejects — for the self-join that is half the pair space
    // (r19 optimization, guide §1.2 "don't compute things you throw
    // away": the former post-hoc filter left the plan evaluating
    // `jw >= t AND id_a < id_b` in that order)
    pairPre.fold(pairs)(pairs.filter)
      .select(col("left_id"), col("right_id"),
        round(jaroWinkler(col("__lt"), col("__rt")), 6).as("similarity"))
      .filter(col("similarity") >= threshold)
  }

  /** Self-join variant: near-matches within one table, `id_a < id_b`. */
  def fuzzyDedup(df: DataFrame, idCol: String, textCol: String,
      block: Column, threshold: Double,
      maxBlockPairs: Long = 1000000L): DataFrame =
    fuzzyJoinImpl(df, idCol, textCol, df, idCol, textCol, block, block,
        threshold, maxBlockPairs,
        pairPre = Some(col("left_id") < col("right_id")))
      .select(col("left_id").as("id_a"), col("right_id").as("id_b"),
        col("similarity"))
}
