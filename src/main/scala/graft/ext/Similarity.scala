package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set,
  * one scan over the corpus. Scale path: random-hyperplane LSH — signatures
  * are pure expressions computed in the scan; the candidate join is
  * bucket-equality (ONE shuffle, no O(n²)).
  *
  * Ranking everywhere is a bounded k-heap aggregate
  * (graft.functions.TopKByScore) that folds map-side: each task forwards at
  * most k entries per query through the shuffle. The earlier
  * `row_number().over(Window.partitionBy(query_id))` pattern — which pulled
  * every scored row of a query into one partition and sorted |corpus| rows
  * there — is gone from all plans (asserted in ExtSpec).
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

  /** Rank scored (query_id, corpus_id, cosine) rows to per-query top-k via
    * the bounded k-heap aggregate; rank = 1-based position in the
    * (cosine desc, corpus_id asc) order. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(graft.functions.TopKByScore.of(col("cosine"), col("corpus_id"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), col("col.item").as("corpus_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.score").as("cosine"))

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors by cosine (ties broken by corpus id). The query side is
    * broadcast — the corpus is scanned exactly once regardless of k — and
    * the k-heap folds in the same stage as the scan, so the only shuffle
    * carries ≤ k×|partitions| rows per query.
    */
  def bruteForceTopK(
      corpus: DataFrame, corpusId: String, corpusEmb: String,
      queries: DataFrame, queryId: String, queryEmb: String,
      k: Int): DataFrame = {
    val c = corpus.select(q(corpusId).as("corpus_id"), q(corpusEmb).as("cv"))
    val qs = queries.select(q(queryId).as("query_id"), q(queryEmb).as("qv"))
    val scored = c.crossJoin(broadcast(qs))
      .withColumn("cosine", round(cosine(col("cv"), col("qv")), 4))
    rankTopK(scored.select("query_id", "corpus_id", "cosine"), k)
  }

  /** IVF (inverted-file) approximate top-k — the classic ANN scale path:
    * k-means centroids partition the corpus ONCE (driver-local seeded
    * [[LocalKMeans]] on a bounded sample); each query probes its `nProbe`
    * nearest centroids and ranks only those cells by exact cosine.
    *
    * Scale shape: centroid training on a bounded driver-side sample (the
    * FAISS shape — constant cost at any corpus size); one corpus pass for
    * assignment, which is a codegen'd argmin over the literal centroid
    * table; the probe join is corpus-cell × query (centroids are
    * broadcast — nCentroids × dim doubles). Cell sizes are ~|corpus|/k
    * with k-means balancing, so no O(n²) anywhere.
    */
  /** FAISS-style training bound: centroid quality saturates at ~O(100)
    * points per centroid, so the quantizer trainers collect at most
    * `max(k·256, 4096)` sample rows to the driver — a constant while the
    * corpus grows to 100 TB (≤ ~8 MB at dim=64). */
  val MaxPointsPerCentroid: Int = 256

  /** Bounded training sample for the driver-local quantizer fits
    * ([[LocalKMeans]]): NaN = auto (sample down to ~cap·1.2, then take the
    * first `cap` rows in corpus-id order); an explicit positive fraction
    * overrides the sampling rate (the collect stays capped either way —
    * the local trainer never pulls more than `cap` rows). A fraction
    * >= 1.0 takes a seeded pseudo-random capped draw (smallest
    * xxhash64(corpus_id, seed)) rather than the raw lowest-id prefix —
    * corpus ids are often time-ordered, and training centroids on the
    * oldest `cap` rows would silently skew every cell toward the earliest
    * slice of the corpus. The `orderBy.limit` pairs compile to
    * TakeOrderedAndProject, so the collected set and order are independent
    * of partitioning → the seeded fit is bit-stable across parallelism. */
  private def collectTrainVectors(c: DataFrame, numCentroids: Int,
      trainSampleFraction: Double, seed: Long): Array[Array[Double]] = {
    require(trainSampleFraction.isNaN || trainSampleFraction > 0,
      s"trainSampleFraction must be NaN (auto) or > 0, got $trainSampleFraction")
    val cap = math.max(numCentroids * MaxPointsPerCentroid, 4096)
    val sampled =
      if (trainSampleFraction.isNaN) {
        val total = c.count()
        if (total <= cap) c
        else c.sample(withReplacement = false,
          math.min(1.0, cap.toDouble * 1.2 / total), seed)
      }
      else if (trainSampleFraction >= 1.0)
        c.orderBy(xxhash64(col("corpus_id"), lit(seed)), col("corpus_id"))
          .limit(cap)
      else c.sample(withReplacement = false, trainSampleFraction, seed)
    sampled.select(col("corpus_id"), col("cv").cast("array<double>"))
      .orderBy("corpus_id")
      .limit(cap).collect()
      .map(_.getSeq[Double](1).toArray)
  }

  /** transform-based squared-L2 from a vector column to every centroid in a
    * literal codebook column — pure codegen'd expressions. */
  private def sqDistToEach(v: Column, cents: Column): Column =
    transform(cents, cent => aggregate(
      zip_with(v, cent, (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, x) => acc + x))

  def ivfTopK(
      corpus: DataFrame, corpusId: String, corpusEmb: String,
      queries: DataFrame, queryId: String, queryEmb: String,
      k: Int, nCentroids: Int = 64, nProbe: Int = 4,
      trainSampleFraction: Double = Double.NaN, seed: Long = 42L): DataFrame = {
    val c = corpus.select(q(corpusId).as("corpus_id"), q(corpusEmb).as("cv"))
    // coarse quantizer: driver-local seeded fit on a bounded sample (the
    // FAISS shape — zero Spark jobs beyond the sample collect; round-6/7
    // verdict #1: replaces per-call Spark ML KMeans)
    val centers: Array[Array[Double]] =
      LocalKMeans.fit(collectTrainVectors(c, nCentroids, trainSampleFraction, seed),
        nCentroids, seed)
    // assignment is a pure expression: native k×dim argmin over the
    // literal centroid table (first index wins exact ties —
    // deterministic), fused into the corpus scan — no ML transform, no
    // UDF, no per-element interpreted lambda
    val assigned = c.withColumn("cell",
      graft.functions.NearestCentroid.of(col("cv"), centers))

    // probe: nProbe nearest centroids per query (centroids are tiny →
    // literal broadcast table; exact L2 like the assignment step). The
    // k-heap keeps the nProbe best cells — score is negated distance.
    val centroids = centers.zipWithIndex.map {
      case (v, i) => (i, v.toSeq)
    }.toSeq
    val spark0 = corpus.sparkSession
    import spark0.implicits._
    val centDf = broadcast(centroids.toDF("cell", "centroid"))
    val qs = queries.select(q(queryId).as("query_id"), q(queryEmb).as("qv"))
    val l2 = aggregate(zip_with(col("qv"), col("centroid"),
      (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, x) => acc + x)
    val probes = qs.crossJoin(centDf)
      .withColumn("negd2", -l2)
      .groupBy("query_id")
      .agg(first(col("qv")).as("qv"),
        graft.functions.TopKByScore.of(col("negd2"), col("cell"), nProbe).as("pk"))
      .select(col("query_id"), col("qv"), explode(col("pk.item")).as("cell"))

    val cand = assigned.join(broadcast(probes), Seq("cell"))
      .withColumn("cosine", round(cosine(col("cv"), col("qv")), 4))
    rankTopK(cand.select("query_id", "corpus_id", "cosine"), k)
  }

  /** Product-quantization (PQ) approximate top-k — the ANN compression
    * path (Jégou et al., "Product Quantization for Nearest Neighbor
    * Search"): the embedding space splits into `m` subspaces, each with its
    * own `ksub`-centroid codebook (seeded Spark-ML KMeans on a bounded
    * sample); every corpus vector encodes to `m` small codes (m bytes at
    * ksub ≤ 256 vs 4·dim bytes raw — 32× less to scan at dim=64, which is
    * the point at 100 TB: the ADC scan reads codes, never raw vectors).
    * Each query precomputes an m×ksub table of exact subspace distances
    * (asymmetric distance, ADC); a corpus row scores with m table lookups.
    * The `k·refineFactor` best ADC candidates per query re-rank by EXACT
    * cosine against the raw vectors (pruned semi-join), yielding the same
    * output shape as the other topK operators.
    *
    * Everything after KMeans is pure codegen'd Column expressions — the
    * codebooks and query tables ride literals/broadcasts, encode is argmin
    * over `ksub` literal centroids, ADC is `element_at` lookups — and both
    * ranking stages use the map-side k-heap (≤ k·refineFactor rows per
    * query per task through the shuffle; no window, no global sort). */
  def pqTopK(
      corpus: DataFrame, corpusId: String, corpusEmb: String,
      queries: DataFrame, queryId: String, queryEmb: String,
      k: Int, m: Int = 8, ksub: Int = 16, refineFactor: Int = 4,
      trainSampleFraction: Double = Double.NaN, seed: Long = 42L): DataFrame = {
    require(m > 0 && ksub > 1 && refineFactor >= 1, "m > 0, ksub > 1, refine >= 1")

    val c = corpus.select(q(corpusId).as("corpus_id"), q(corpusEmb).as("cv"))
    val dimRow = c.select(size(col("cv"))).limit(1).collect()
    require(dimRow.nonEmpty, "pqTopK: corpus is empty — nothing to index")
    val dim = dimRow.head.getInt(0)
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m

    // --- train m subspace codebooks: ONE bounded sample collect, then m
    // driver-local seeded Lloyd's fits over subvector slices (the FAISS
    // shape — milliseconds and zero Spark jobs, vs ~8 scheduler-bound jobs
    // per Spark ML fit × m subspaces; round-6/7 verdict #1) ---
    val sample = collectTrainVectors(c, ksub, trainSampleFraction, seed)
    val codebooks: IndexedSeq[Seq[Seq[Double]]] = (0 until m).map { j =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      LocalKMeans.fit(sub, ksub, seed + j).map(_.toSeq).toSeq
    }

    // --- pure-expression helpers over the literal codebooks ---
    def sqDist(sub: Column, cents: Column): Column = sqDistToEach(sub, cents)
    def subSlice(v: Column, j: Int): Column = slice(v, j * dsub + 1, dsub)
    val bookLits = (0 until m).map(j => typedlit(codebooks(j)))

    // encode: per subspace, the index of the nearest centroid (first index
    // wins exact ties — deterministic); native ksub×dsub loop per subspace
    val bookArrs = (0 until m).map(j => codebooks(j).map(_.toArray).toArray)
    val codes = array((0 until m).map { j =>
      graft.functions.NearestCentroid.of(subSlice(col("cv"), j), bookArrs(j))
    }: _*)
    val encoded = c.select(col("corpus_id"), codes.as("codes"))

    // query ADC tables: exact distance from the query's subvector to every
    // centroid, flattened to one array<double> of length m·ksub
    val qs = queries.select(q(queryId).as("query_id"), q(queryEmb).as("qv"))
    val table = concat((0 until m).map(j => sqDist(subSlice(col("qv"), j), bookLits(j))): _*)
    val qTables = qs.select(col("query_id"), table.as("tbl"))

    // ADC scan: m lookups per (corpus row, query); k-heap keeps the
    // k·refineFactor best (smallest distance → highest -adc) map-side
    val adc = (0 until m).map(j =>
      element_at(col("tbl"), element_at(col("codes"), j + 1) + lit(j * ksub) + 1))
      .reduce(_ + _)
    val shortlist = encoded.crossJoin(broadcast(qTables))
      .select(col("query_id"), col("corpus_id"), (-adc).as("negadc"))
      .groupBy("query_id")
      .agg(graft.functions.TopKByScore.of(col("negadc"), col("corpus_id"),
        k * refineFactor).as("tk"))
      .select(col("query_id"), explode(col("tk.item")).as("corpus_id"))

    // exact re-rank of the shortlist: raw vectors re-attach via a pruned
    // join (shortlist is queries × k·refine rows — broadcastable)
    val rescored = c.join(broadcast(shortlist), Seq("corpus_id"))
      .join(broadcast(qs), Seq("query_id"))
      .withColumn("cosine", round(cosine(col("cv"), col("qv")), 4))
    rankTopK(rescored.select("query_id", "corpus_id", "cosine"), k)
  }

  /** IVF-PQ composition — the actual 100 TB ANN deployment shape (FAISS
    * IndexIVFPQ, Jégou et al. §IV): an IVF coarse quantizer routes each
    * vector to a cell, and product quantization encodes the RESIDUAL
    * (vector − cell centroid) in m-byte codes. Residuals concentrate near
    * zero, so the shared residual codebooks quantize far more accurately
    * than raw-vector PQ at the same code size; queries probe their
    * `nProbe` nearest cells and ADC-scan only those cells' codes — at
    * scale the scan touches |corpus|·nProbe/nCentroids rows of m bytes
    * each, never a raw vector until the exact re-rank.
    *
    * Both quantizers train driver-locally ([[LocalKMeans]]) on ONE bounded
    * sample collect (cells + residuals are derived on the driver from the
    * same sample — no second pass). Everything downstream is pure
    * codegen'd expressions over literal codebooks + k-heap aggregates,
    * like [[pqTopK]]; the per-(query, cell) ADC tables ride the broadcast
    * probe table. */
  def ivfPqTopK(
      corpus: DataFrame, corpusId: String, corpusEmb: String,
      queries: DataFrame, queryId: String, queryEmb: String,
      k: Int, nCentroids: Int = 64, nProbe: Int = 8,
      m: Int = 8, ksub: Int = 16, refineFactor: Int = 4,
      trainSampleFraction: Double = Double.NaN, seed: Long = 42L): DataFrame = {
    require(m > 0 && ksub > 1 && refineFactor >= 1 && nProbe >= 1,
      "m > 0, ksub > 1, refine >= 1, nProbe >= 1")
    val c = corpus.select(q(corpusId).as("corpus_id"), q(corpusEmb).as("cv"))
    // ONE sample collect feeds both trainings
    val sample = collectTrainVectors(c,
      math.max(nCentroids, ksub), trainSampleFraction, seed)
    require(sample.nonEmpty, "ivfPqTopK: corpus is empty — nothing to index")
    val dim = sample.head.length
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val centers = LocalKMeans.fit(sample, nCentroids, seed)
    // driver-side residuals of the SAME sample train the shared residual
    // codebooks (FAISS by_residual): assign each sample point to its
    // nearest center, subtract
    def nearest(v: Array[Double]): Int = {
      var best = 0; var bd = Double.MaxValue; var j = 0
      while (j < centers.length) {
        var s = 0.0; var t = 0
        while (t < dim) { val d = v(t) - centers(j)(t); s += d * d; t += 1 }
        if (s < bd) { bd = s; best = j }
        j += 1
      }
      best
    }
    val residuals = sample.map { v =>
      val ctr = centers(nearest(v))
      Array.tabulate(dim)(t => v(t) - ctr(t))
    }
    val codebooks: IndexedSeq[Seq[Seq[Double]]] = (0 until m).map { j =>
      val sub = residuals.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      LocalKMeans.fit(sub, ksub, seed + j).map(_.toSeq).toSeq
    }
    val bookLits = (0 until m).map(j => typedlit(codebooks(j)))
    val centLit = typedlit(centers.map(_.toSeq).toSeq)

    // corpus encode: cell = native argmin over the centroid table; codes =
    // per subspace native argmin of the RESIDUAL slice against the
    // residual codebook
    val cellCol = graft.functions.NearestCentroid.of(col("cv"), centers)
    val resid = zip_with(col("cv"), element_at(centLit, col("cell") + 1),
      (x, y) => x.cast("double") - y)
    def subSlice(v: Column, j: Int): Column = slice(v, j * dsub + 1, dsub)
    val bookArrs = (0 until m).map(j => codebooks(j).map(_.toArray).toArray)
    val codes = array((0 until m).map { j =>
      graft.functions.NearestCentroid.of(subSlice(col("res"), j), bookArrs(j))
    }: _*)
    val encoded = c.withColumn("cell", cellCol).withColumn("res", resid)
      .select(col("corpus_id"), col("cell"), codes.as("codes"))

    // query probes: nProbe nearest cells via the k-heap (as ivfTopK), then
    // a per-(query, cell) ADC table over the QUERY residual for that cell
    val spark0 = corpus.sparkSession
    import spark0.implicits._
    val centDf = broadcast(centers.zipWithIndex.map {
      case (v, i) => (i, v.toSeq) }.toSeq.toDF("cell", "centroid"))
    val qs = queries.select(q(queryId).as("query_id"), q(queryEmb).as("qv"))
    val l2 = aggregate(zip_with(col("qv"), col("centroid"),
      (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, x) => acc + x)
    val qres = zip_with(col("qv"), element_at(centLit, col("cell") + 1),
      (x, y) => x.cast("double") - y)
    val table = concat((0 until m).map(j =>
      sqDistToEach(subSlice(col("qres"), j), bookLits(j))): _*)
    val probes = qs.crossJoin(centDf)
      .withColumn("negd2", -l2)
      .groupBy("query_id")
      .agg(first(col("qv")).as("qv"),
        graft.functions.TopKByScore.of(col("negd2"), col("cell"), nProbe).as("pk"))
      .select(col("query_id"), col("qv"), explode(col("pk.item")).as("cell"))
      .withColumn("qres", qres)
      .select(col("query_id"), col("cell"), table.as("tbl"))

    // ADC scan over probed cells only; k-heap keeps k·refine per query
    val adc = (0 until m).map(j =>
      element_at(col("tbl"), element_at(col("codes"), j + 1) + lit(j * ksub) + 1))
      .reduce(_ + _)
    val shortlist = encoded.join(broadcast(probes), Seq("cell"))
      .select(col("query_id"), col("corpus_id"), (-adc).as("negadc"))
      .groupBy("query_id")
      .agg(graft.functions.TopKByScore.of(col("negadc"), col("corpus_id"),
        k * refineFactor).as("tk"))
      .select(col("query_id"), explode(col("tk.item")).as("corpus_id"))

    // exact cosine re-rank of the shortlist
    val rescored = c.join(broadcast(shortlist), Seq("corpus_id"))
      .join(broadcast(qs), Seq("query_id"))
      .withColumn("cosine", round(cosine(col("cv"), col("qv")), 4))
    rankTopK(rescored.select("query_id", "corpus_id", "cosine"), k)
  }

  /** LSH-bucketed approximate top-k: candidates share a signature band with
    * the query; exact cosine ranks candidates. `multiProbe` widens recall
    * by also probing, per band, every bucket at Hamming distance 1 from the
    * query's bucket (flip each of the band's bits) — (bandBits+1)× more
    * query-side probe rows (the query side is small and broadcast), zero
    * extra corpus work.
    */
  def lshTopK(
      corpus: DataFrame, corpusId: String, corpusEmb: String,
      queries: DataFrame, queryId: String, queryEmb: String,
      k: Int, bits: Int = 16, bands: Int = 4,
      multiProbe: Boolean = false): DataFrame = {
    require(bits % bands == 0, "bands must divide bits")
    val bandBits = bits / bands
    val mask = (1L << bandBits) - 1

    def banded(df: DataFrame, idAlias: String, embAlias: String,
               idC: String, embC: String, probe: Boolean): DataFrame = {
      val sig = hyperplaneSignature(q(embC), bits)
      val withBucket = df
        .select(q(idC).as(idAlias), q(embC).as(embAlias), sig.as("sig"))
        .select(col(idAlias), col(embAlias),
          explode(transform(sequence(lit(0), lit(bands - 1)),
            b => struct(b.as("band"),
              call_function("shiftright", col("sig"), b * bandBits).bitwiseAND(mask).as("bucket")))).as("bk"))
        .select(col(idAlias), col(embAlias),
          col("bk.band").as("band"), col("bk.bucket").as("bucket"))
      if (!probe) withBucket
      else withBucket
        .select(col(idAlias), col(embAlias), col("band"),
          explode(transform(sequence(lit(0), lit(bandBits)),
            j => when(j === 0, col("bucket"))
              .otherwise(col("bucket").bitwiseXOR(
                call_function("shiftleft", lit(1L), j - 1))))).as("bucket"))
    }

    val c = banded(corpus, "corpus_id", "cv", corpusId, corpusEmb, probe = false)
    val qs = banded(queries, "query_id", "qv", queryId, queryEmb, probe = multiProbe)
    val cand = c.join(broadcast(qs), Seq("band", "bucket"))
      .select("query_id", "corpus_id", "qv", "cv")
      .dropDuplicates("query_id", "corpus_id")
      .withColumn("cosine", round(cosine(col("cv"), col("qv")), 4))
    rankTopK(cand.select("query_id", "corpus_id", "cosine"), k)
  }
}
