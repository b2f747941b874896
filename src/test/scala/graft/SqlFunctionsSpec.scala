package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, TextAnalysis}
import graft.functions.GraftFunctions

/** The native expressions must be reachable from SQL text, with results
  * identical to the Column API. */
class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.registerAll(spark)

  test("SQL and Column API agree for shingles/minhash/simhash/cosine") {
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "spark catalyst tungsten codegen"),
      (2L, "one two")
    ).toDF("doc_id", "text").createOrReplaceTempView("sql_docs")

    val viaSql = spark.sql(
      """SELECT doc_id,
        |  graft_word_shingles(split(trim(text), '\\s+'), 3) AS sh,
        |  graft_simhash64(split(trim(text), '\\s+')) AS sim
        |FROM sql_docs""".stripMargin)
      .select(col("doc_id"),
        element_at(graft.functions.HashFunctions.minhashSignature(col("sh"), 16), 1).as("m0"),
        col("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val viaApi = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "spark catalyst tungsten codegen"),
      (2L, "one two")
    ).toDF("doc_id", "text")
      .select(col("doc_id"),
        element_at(graft.functions.HashFunctions.minhashSignature(
          Dedup.shingles(col("text"), 3), 16), 1).as("m0"),
        Dedup.simhash64(col("text")).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(viaSql == viaApi)
  }

  test("SQL minhash_sig, cosine_sim and bounded_collect evaluate") {
    val sig = spark.sql(
      "SELECT graft_minhash_sig(array('a b c', 'b c d'), 8) AS s")
      .head().getSeq[Long](0)
    assert(sig.size == 8)

    val cos = spark.sql(
      "SELECT graft_cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)

    spark.range(0, 100).createOrReplaceTempView("sql_range")
    val collected = spark.sql(
      "SELECT graft_bounded_collect(CAST(id AS STRING), 5) AS c FROM sql_range")
      .head().getSeq[String](0)
    assert(collected.size == 5)

    // BPE from SQL text == Column API with the default merges
    val viaSql = spark.sql("SELECT graft_bpe_encode('The thinking era') AS t")
      .head().getSeq[String](0)
    val viaApi = Seq("The thinking era").toDF("text")
      .select(TextAnalysis.bpeTokens(col("text"))).head().getSeq[String](0)
    assert(viaSql == viaApi && viaSql.nonEmpty)

    // feature-hash vector from SQL == Column API on the same tokens
    val hvSql = spark.sql(
      "SELECT graft_feature_hash_vector(array('a', 'a', 'b'), 32) AS v")
      .head().getSeq[Float](0)
    val hvApi = Seq(Tuple1(Seq("a", "a", "b"))).toDF("toks")
      .select(graft.functions.HashFunctions.featureHashVector(col("toks"), 32))
      .head().getSeq[Float](0)
    assert(hvSql == hvApi && hvSql.map(x => x * x).sum == 5.0f)
  }

  test("SQL token_ngrams and misra_gries agree with the Column API") {
    val ngSql = spark.sql(
      "SELECT graft_token_ngrams(array('a', 'b', 'a', 'b'), 2) AS g")
      .head().getSeq[String](0)
    assert(ngSql == Seq("a b", "b a", "a b"))

    spark.range(0, 300).createOrReplaceTempView("sql_mg")
    // id % 3 → three items with count 100 each; capacity 8 keeps them all
    val cand = spark.sql(
      "SELECT graft_misra_gries(CAST(id % 3 AS STRING), 8) AS c FROM sql_mg")
      .select(explode(col("c")).as("e"))
      .select(col("e.item"), col("e.est"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(cand == Map("0" -> 100L, "1" -> 100L, "2" -> 100L))
  }

  test("sorted_pairs dedupes equal ids: no self-pairs, no repeated pairs") {
    val rows = Seq(Tuple1(Array(3L, 1L, 3L, 2L, 1L, 1L)), Tuple1(Array(7L, 7L)))
      .toDF("ids")
      .select(graft.functions.SortedPairs.of(col("ids")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // [3,1,3,2,1,1] compacts to [1,2,3]; [7,7] compacts to a single id → no pairs
    assert(rows.toSet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(rows.length == 3, "duplicate values must not repeat pairs")
    assert(rows.forall { case (a, b) => a < b }, "strictly ordered, no self-pairs")
  }
}
