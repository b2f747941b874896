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

  /** IVF (inverted-file) approximate top-k — the classic ANN scale path:
    * k-means centroids partition the corpus ONCE (Spark ML KMeans, seeded,
    * few iterations); each query probes its `nProbe` nearest centroids and
    * ranks only those cells by exact cosine.
    *
    * Scale shape: centroid training on a bounded sample; one corpus pass
    * for assignment; the probe join is corpus-cell × query (centroids are
    * broadcast — nCentroids × dim doubles). Cell sizes are ~|corpus|/k
    * with k-means balancing, so no O(n²) anywhere.
    */
  def ivfTopK(
      corpus: DataFrame, corpusId: String, corpusEmb: String,
      queries: DataFrame, queryId: String, queryEmb: String,
      k: Int, nCentroids: Int = 64, nProbe: Int = 4,
      trainSampleFraction: Double = 1.0, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.linalg.{Vector, Vectors}

    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val c = corpus.select(q(corpusId).as("corpus_id"), q(corpusEmb).as("cv"))
      .withColumn("fv", toVec(col("cv")))
    val train = if (trainSampleFraction >= 1.0) c
                else c.sample(withReplacement = false, trainSampleFraction, seed)
    val model = new KMeans().setK(nCentroids).setSeed(seed).setMaxIter(5)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(train)
    val assigned = model.transform(c).select("corpus_id", "cv", "cell")

    // probe: nProbe nearest centroids per query (centroids are tiny →
    // literal broadcast table; exact L2 like the assignment step)
    val centroids = model.clusterCenters.zipWithIndex.map {
      case (v: Vector, i) => (i, v.toArray.toSeq)
    }.toSeq
    val spark0 = corpus.sparkSession
    import spark0.implicits._
    val centDf = broadcast(centroids.toDF("cell", "centroid"))
    val qs = queries.select(q(queryId).as("query_id"), q(queryEmb).as("qv"))
    val l2 = aggregate(zip_with(col("qv"), col("centroid"),
      (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, x) => acc + x)
    val probeW = Window.partitionBy(col("query_id")).orderBy(col("d2").asc, col("cell").asc)
    val probes = qs.crossJoin(centDf)
      .withColumn("d2", l2)
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nProbe)
      .select("query_id", "qv", "cell")

    val cand = assigned.join(broadcast(probes), Seq("cell"))
      .withColumn("cosine", round(cosine(col("cv"), col("qv")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    cand.withColumn("rank", row_number().over(w))
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
