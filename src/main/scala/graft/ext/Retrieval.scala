package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Okapi BM25 ranked retrieval (Robertson & Walker 1994; the Lucene/
  * Elasticsearch default scorer) — the lexical-search complement of the
  * embedding ANN stack: query-keyed corpus filtering ("find the documents
  * about X"), labeled-seed expansion, and the retrieval half of
  * dedup-by-query pipelines all run this before any embedding model
  * exists.
  *
  *   score(d, q) = Σ_{t ∈ q}  idf(t) · tf(t,d)·(k1+1) /
  *                            (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
  *   idf(t)     = ln( (N − df(t) + 0.5) / (df(t) + 0.5) + 1 )   (Lucene form)
  *
  * Spark-first shape at 100 TB:
  *   - ONE corpus scan builds the postings (doc, token, tf) and doc
  *     lengths; the df table is a token-keyed aggregation of the postings
  *     (model-sized: vocabulary rows);
  *   - the query batch tokenizes to (query, token) — queries are the
  *     small side and BROADCAST into the postings join, so the corpus
  *     never shuffles by query;
  *   - idf needs only df rows for QUERY tokens (vocabulary pruned by the
  *     broadcast semi-join before the driver-free merge);
  *   - per-(query, doc) partial scores aggregate map-side and the
  *     per-query top-k rides the bounded k-heap
  *     ([[graft.functions.TopKByScore]]) — the shuffle carries
  *     ≤ k·partitions rows per query, never a full score list.
  *
  * Tokens are whitespace tokens of the trimmed text (the corpus-wide
  * convention of the LM/dedup family — [[TextAnalysis.tokens]]), matched
  * case-sensitively; rounding at 4 decimals makes the score an exact
  * cross-engine pin. Ties rank by doc id ascending. */
object Retrieval {

  private def q(n: String): Column = col("`" + n.replace("`", "``") + "`")

  /** Per-query BM25 top-k: (query_id, doc id column name, rank, score).
    * `k1`/`b` are the standard free parameters (1.2 / 0.75 defaults). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryId: String, queryText: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, "k >= 1")
    val postings = docs
      .select(q(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(q(textCol))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).cast("double").as("tf"))
    val dlen = docs.select(q(idCol).as("doc_id"),
      TextAnalysis.tokenCount(q(textCol)).cast("double").as("dl"))
    // N and avgdl: two scalars from one aggregation over the lengths
    val stats = dlen.agg(count(lit(1)).cast("double").as("N"),
      avg(col("dl")).as("avgdl")).head()
    val nDocs = stats.getDouble(0)
    // avgdl rounded to 6 decimals before it enters any score: avg() is
    // summation-order sensitive in its last ulps, and the score pins to a
    // cross-engine oracle that must feed the identical constant
    val avgdl = math.rint(stats.getDouble(1) * 1e6) / 1e6
    val qTokens = queries
      .select(q(queryId).as("query_id"),
        explode(TextAnalysis.tokens(q(queryText))).as("token"))
      .distinct() // a term repeated in the query scores once (Lucene form)
    val df = postings.groupBy("token")
      .agg(count(lit(1)).cast("double").as("df"))
      // vocabulary pruned to query tokens before anything joins postings
      .join(broadcast(qTokens.select("token").distinct()), Seq("token"),
        "left_semi")
    scoreAndRank(postings, dlen, qTokens, df, nDocs, avgdl, k, k1, b)
  }

  // ============ persisted BM25 postings index (round 9) ==================
  // The retrieval member of the store family (MinHash/fingerprint/ANN/
  // sketch): a 100 TB corpus reduces ONCE to
  //   postings/ (token, doc_id, tf)   — the inverted index
  //   dlen/     (doc_id, dl)          — length normalization side
  //   dfd/      (token, df)           — document-frequency DELTAS
  //                                     (appends add delta rows; serves
  //                                     sum them, the bucket_counts shape)
  //   stats.json {n_docs, sum_dl}     — avgdl derives at serve time, so
  //                                     appends just add to both counters
  // and every query batch is served from the store without touching
  // corpus text. Append-only growth + compact() like the other stores.

  private def statsPath(path: String) = s"$path/stats.json"

  private def readStats(spark: org.apache.spark.sql.SparkSession,
      path: String): (Long, Double) = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readValue(StoreFiles.readUtf8(spark, statsPath(path)),
        classOf[java.util.Map[String, Any]])
    require(String.valueOf(root.get("format")) == "graft-bm25-index",
      s"not a BM25 index at $path")
    (root.get("n_docs").asInstanceOf[Number].longValue(),
      root.get("sum_dl").asInstanceOf[Number].doubleValue())
  }

  private def writeStats(spark: org.apache.spark.sql.SparkSession,
      path: String, nDocs: Long, sumDl: Double): Unit =
    StoreFiles.writeUtf8Atomic(spark, statsPath(path),
      s"""{"format":"graft-bm25-index","n_docs":$nDocs,"sum_dl":$sumDl}""")

  private def writeSides(docs: DataFrame, idCol: String, textCol: String,
      path: String, mode: String): (Long, Double) = {
    val postings = docs
      .select(q(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(q(textCol))).as("token"))
      .groupBy("token", "doc_id").agg(count(lit(1)).cast("double").as("tf"))
      .persist()
    try {
      postings.write.mode(mode).parquet(s"$path/postings")
      postings.groupBy("token").agg(count(lit(1)).cast("double").as("df"))
        .write.mode(mode).parquet(s"$path/dfd")
    } finally postings.unpersist()
    val dlen = docs.select(q(idCol).as("doc_id"),
      TextAnalysis.tokenCount(q(textCol)).cast("double").as("dl"))
    dlen.write.mode(mode).parquet(s"$path/dlen")
    val s = dlen.agg(count(lit(1)), coalesce(sum("dl"), lit(0.0))).head()
    (s.getLong(0), s.getDouble(1))
  }

  /** Build the index from a corpus — one corpus scan (cached postings
    * feed both the postings and df writes). */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    val (n, sd) = writeSides(docs, idCol, textCol, path, "errorifexists")
    writeStats(docs.sparkSession, path, n, sd)
  }

  /** Append a crawl batch (ids must be new): pure file additions plus a
    * counter bump — nothing rewrites. The df side appends DELTA rows the
    * serve sums, so history is never re-aggregated at append time. */
  def appendToIndex(batch: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    val spark = batch.sparkSession
    val (n0, sd0) = readStats(spark, path)
    val (n, sd) = writeSides(batch, idCol, textCol, path, "append")
    writeStats(spark, path, n0 + n, sd0 + sd)
  }

  /** Compact after N appends: df deltas collapse to one summed snapshot,
    * postings/dlen rewrite into size-targeted files. Serve-identical
    * (gate-asserted); heals a crashed prior swap first. */
  def compactIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      targetFiles: Int = 0): Unit = {
    readStats(spark, path) // sentinel
    Seq("postings", "dlen", "dfd").foreach(d =>
      StoreFiles.healDir(spark, s"$path/$d"))
    def target(dir: String): Int =
      if (targetFiles > 0) targetFiles
      else StoreFiles.targetFileCount(StoreFiles.dataBytes(spark, dir))
    val dfDir = s"$path/dfd"
    spark.read.parquet(dfDir).groupBy("token")
      .agg(sum("df").as("df"))
      .repartition(target(dfDir)).write.mode("overwrite")
      .parquet(dfDir + ".compacting")
    StoreFiles.swapDir(spark, dfDir + ".compacting", dfDir)
    Seq(s"$path/postings", s"$path/dlen").foreach { dir =>
      spark.read.parquet(dir)
        .coalesce(target(dir)).write.mode("overwrite")
        .parquet(dir + ".compacting")
      StoreFiles.swapDir(spark, dir + ".compacting", dir)
    }
  }

  /** Serve a query batch from the store — hash-identical to [[bm25TopK]]
    * over the same corpus (spec/gate-asserted): the df deltas sum to the
    * same document frequencies, avgdl derives from the stored counters
    * with the same 6-dp rounding, and the scoring expressions are shared
    * verbatim. Reads: query-pruned df rows, the postings and dlen
    * parquet — never corpus text. */
  def bm25TopKFromIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, queryId: String, queryText: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, "k >= 1")
    val (nDocsL, sumDl) = readStats(spark, path)
    val nDocs = nDocsL.toDouble
    val avgdl = math.rint(sumDl / nDocs * 1e6) / 1e6
    val qTokens = queries
      .select(q(queryId).as("query_id"),
        explode(TextAnalysis.tokens(q(queryText))).as("token"))
      .distinct()
    val df = spark.read.parquet(s"$path/dfd")
      .join(broadcast(qTokens.select("token").distinct()), Seq("token"),
        "left_semi")
      .groupBy("token").agg(sum("df").as("df"))
    scoreAndRank(spark.read.parquet(s"$path/postings"),
      spark.read.parquet(s"$path/dlen"), qTokens, df, nDocs, avgdl, k, k1, b)
  }

  /** Shared scoring tail of [[bm25TopK]] and [[bm25TopKFromIndex]]. */
  private def scoreAndRank(postings: DataFrame, dlen: DataFrame,
      qTokens: DataFrame, df: DataFrame, nDocs: Double, avgdl: Double,
      k: Int, k1: Double, b: Double): DataFrame = {
    val idf = log(((lit(nDocs) - col("df") + 0.5) / (col("df") + 0.5)) + 1.0)
    val qTerm = qTokens.join(df, Seq("token")).select(
      col("query_id"), col("token"), idf.as("idf"))
    val contrib = col("idf") * col("tf") * (lit(k1) + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl)))
    postings
      .join(broadcast(qTerm), Seq("token"))
      .join(dlen, Seq("doc_id"))
      .groupBy("query_id", "doc_id")
      .agg(round(sum(contrib), 4).as("score"))
      .groupBy("query_id")
      .agg(graft.functions.TopKByScore.of(col("score"), col("doc_id"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), col("col.item").as("doc_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.score").as("score"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) — the
    * standard score-free combiner of heterogeneous rankings (BM25 +
    * embedding ANN is the hybrid-retrieval workhorse):
    *
    *   rrf(q, d) = Σ_{lists containing d}  1 / (kRrf + rank_list(d))
    *
    * Each input DataFrame carries (query_id, doc_id, rank) — the shape
    * [[bm25TopK]] and the `Similarity.*TopK*` serves emit (alias
    * corpus_id → doc_id). Fusion is rank-only, so score scales never need
    * calibrating. One union + one aggregation + the bounded per-query
    * k-heap; the inputs are already per-query top-k lists, so everything
    * is (queries·k·lists)-sized. Fused score rounds to 6 decimals (a sum
    * of ≤ `lists` exact reciprocals — cross-engine stable); ties rank by
    * doc id ascending. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: at least one ranking")
    require(k >= 1 && kRrf >= 1, "k >= 1, kRrf >= 1")
    val slim = rankings.map(_.select(col("query_id"), col("doc_id"),
      col("rank").cast("double").as("rank")))
    slim.reduce(_.unionByName(_))
      .groupBy("query_id", "doc_id")
      .agg(round(sum(lit(1.0) / (lit(kRrf.toDouble) + col("rank"))), 6).as("rrf"))
      .groupBy("query_id")
      .agg(graft.functions.TopKByScore.of(col("rrf"), col("doc_id"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), col("col.item").as("doc_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.score").as("rrf"))
  }
}
