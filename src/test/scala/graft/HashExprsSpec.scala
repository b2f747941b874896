package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Similarity, TextAnalysis}
import graft.functions.{BoundedCollect, HashFunctions}

/** The native Catalyst expressions must be drop-in equivalents of the
  * (slow, interpreted) higher-order-function formulations they replaced —
  * these specs pin that equivalence, plus BoundedCollect's memory cap.
  */
class HashExprsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "one two"),            // shorter than k=3 → single joined shingle
    (3L, ""),                   // empty → one empty shingle
    (4L, "a b a b a b a b"),    // repeating → duplicate shingles collapse
    (5L, "spark catalyst tungsten codegen whole stage pipelines")
  ).toDF("doc_id", "text")

  test("WordShingles matches the HOF formulation on edge cases") {
    val toks = TextAnalysis.tokens(col("text"))
    val hof = array_distinct(
      when(size(toks) >= 3,
        transform(sequence(lit(0), size(toks) - 3),
          i => concat_ws(" ", slice(toks, i + 1, lit(3)))))
        .otherwise(array(concat_ws(" ", toks))))
    val rows = docs.select(
      Dedup.shingles(col("text"), 3).as("fast"), hof.as("ref")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString)
    }
  }

  test("MinHashSig: shape, determinism, and similarity ordering") {
    val sigs = docs.select(col("doc_id"),
      HashFunctions.minhashSignature(Dedup.shingles(col("text"), 3), 64).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs.values.forall(_.size == 64))
    assert(sigs(0L) == sigs(1L)) // identical docs → identical signatures
    // unrelated docs should agree on (essentially) no positions
    val agree05 = sigs(0L).zip(sigs(5L)).count { case (a, b) => a == b }
    assert(agree05 <= 3, s"unrelated docs agree on $agree05/64 positions")
    // second evaluation is bit-identical (deterministic, partition-safe)
    val again = docs.select(col("doc_id"),
      HashFunctions.minhashSignature(Dedup.shingles(col("text"), 3), 64).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(again == sigs)
  }

  test("SimHash64 matches the HOF formulation bit-for-bit") {
    val toks = TextAnalysis.tokens(col("text"))
    val votes = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          i => when(call_function("shiftright", xxhash64(t), i).bitwiseAND(1) === 1, 1).otherwise(-1)),
        (x, y) => x + y))
    val hof = aggregate(sequence(lit(0), lit(63)), lit(0L),
      (acc, i) => acc +
        when(element_at(votes, i + 1) > 0, call_function("shiftleft", lit(1L), i)).otherwise(0L))
    val rows = docs.select(
      HashFunctions.simhash64(toks).as("fast"), hof.as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("HyperplaneSig matches the HOF formulation bit-for-bit") {
    def planeComponent(bit: org.apache.spark.sql.Column, dim: org.apache.spark.sql.Column) =
      (pmod(xxhash64(bit, dim), lit(2000001L)).cast("double") - 1000000.0) / 1000000.0
    def hofSig(v: org.apache.spark.sql.Column, bits: Int) =
      aggregate(
        sequence(lit(0), lit(bits - 1)),
        lit(0L),
        (acc, bit) => acc + when(
          aggregate(zip_with(v, sequence(lit(0), size(v) - 1),
            (x, d) => x * planeComponent(bit, d)), lit(0.0), (s, x) => s + x) > 0,
          call_function("shiftleft", lit(1L), bit)).otherwise(0L))
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    val rows = emb.select(
      Similarity.hyperplaneSignature(col("embedding"), 16).as("fast"),
      hofSig(col("embedding"), 16).as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("BoundedCollect caps the sample, skips nulls, merges across partitions") {
    val df = spark.range(0, 10000, 1, 8) // 8 partitions
      .select(when(col("id") % 2 === 0, concat(lit("v"), col("id"))).as("v"))
    val got = df.agg(BoundedCollect.of(col("v"), 10).as("s"))
      .head().getSeq[String](0)
    assert(got.size == 10)
    assert(got.forall(_.startsWith("v")))
    // fewer matches than the cap → all of them, no nulls
    val few = df.filter(col("v") === "v42")
      .agg(BoundedCollect.of(col("v"), 10).as("s")).head().getSeq[String](0)
    assert(few == Seq("v42"))
    // empty input → empty array, not null
    val none = df.filter(lit(false))
      .agg(BoundedCollect.of(col("v"), 10).as("s")).head().getSeq[String](0)
    assert(none.isEmpty)
  }
}
