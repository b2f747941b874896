package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.IntegerType

/** SQL registration of graft's native expressions, so every operator is
  * reachable from `spark.sql(...)` as well as the Column API:
  *
  *   spark.sql("SELECT graft_minhash_sig(graft_word_shingles(tokens, 3), 64) ...")
  *
  * Use either `spark.sql.extensions=graft.functions.GraftSparkExtensions`
  * at session build time, or `GraftFunctions.registerAll(spark)` on a live
  * session (idempotent).
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  import GraftSparkExtensions._

  override def apply(ext: SparkSessionExtensions): Unit =
    registrations.foreach { case (name, (info, builder)) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftSparkExtensions {

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an integer literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftSparkExtensions].getName, null, name, usage, "")

  /** name -> (info, builder); shared by the extensions hook and
    * registerAll. */
  val registrations: Map[String, (ExpressionInfo, Seq[Expression] => Expression)] = Map(
    "graft_word_shingles" -> (
      info("graft_word_shingles", "_FUNC_(tokens, k) - distinct space-joined word k-shingles"),
      (args: Seq[Expression]) =>
        WordShingles(args(0), intArg(args(1), "graft_word_shingles", 2))),
    "graft_minhash_sig" -> (
      info("graft_minhash_sig", "_FUNC_(shingles, numHashes) - MinHash signature array"),
      (args: Seq[Expression]) =>
        MinHashSig(args(0), intArg(args(1), "graft_minhash_sig", 2))),
    "graft_simhash64" -> (
      info("graft_simhash64", "_FUNC_(tokens) - 64-bit SimHash of a token array"),
      (args: Seq[Expression]) => SimHash64(args(0))),
    "graft_hyperplane_sig" -> (
      info("graft_hyperplane_sig", "_FUNC_(vector, bits) - random-hyperplane LSH signature"),
      (args: Seq[Expression]) =>
        HyperplaneSig(args(0), intArg(args(1), "graft_hyperplane_sig", 2))),
    "graft_cosine_sim" -> (
      info("graft_cosine_sim", "_FUNC_(a, b) - cosine similarity of two float/double arrays"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))),
    "graft_jaro_winkler" -> (
      info("graft_jaro_winkler", "_FUNC_(a, b) - Jaro-Winkler similarity (DuckDB-compatible semantics)"),
      (args: Seq[Expression]) => JaroWinkler(args(0), args(1))),
    "graft_feature_hash_vector" -> (
      info("graft_feature_hash_vector", "_FUNC_(tokens, dim) - signed hashed-count float vector"),
      (args: Seq[Expression]) =>
        FeatureHashVector(args(0), intArg(args(1), "graft_feature_hash_vector", 2))),
    "graft_bpe_encode" -> (
      info("graft_bpe_encode", "_FUNC_(text) - BPE tokens (built-in English merge table, lowercased)"),
      (args: Seq[Expression]) =>
        BpeEncode(args(0), BpeEncode.EnglishMerges, lowercase = true)),
    "graft_bounded_collect" -> (
      info("graft_bounded_collect", "_FUNC_(expr, limit) - collect at most limit non-null strings"),
      (args: Seq[Expression]) =>
        BoundedCollect(args(0), intArg(args(1), "graft_bounded_collect", 2))
          .toAggregateExpression()),
    "graft_token_ngrams" -> (
      info("graft_token_ngrams", "_FUNC_(tokens, n) - ordered n-grams with repeats, space-joined"),
      (args: Seq[Expression]) =>
        TokenNgrams(args(0), intArg(args(1), "graft_token_ngrams", 2))),
    "graft_misra_gries" -> (
      info("graft_misra_gries", "_FUNC_(item, capacity) - Misra-Gries frequent-item candidates"),
      (args: Seq[Expression]) =>
        MisraGriesSketch(args(0), intArg(args(1), "graft_misra_gries", 2))
          .toAggregateExpression()),
    "graft_ccnet_strip" -> (
      info("graft_ccnet_strip", "_FUNC_(text) - NFD accent strip + digit fold (CCNet normalization)"),
      (args: Seq[Expression]) => CcnetStrip(args(0))))
}

object GraftFunctions {
  /** Register all graft SQL functions on a live session (idempotent). */
  def registerAll(spark: SparkSession): Unit =
    GraftSparkExtensions.registrations.foreach { case (name, (inf, builder)) =>
      Bridge.registerFunction(spark, FunctionIdentifier(name), inf, builder)
    }
}
