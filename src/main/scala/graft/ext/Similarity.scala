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
  * The quantizer families (IVF / PQ / IVF-PQ) split into three stages so
  * the expensive parts run ONCE (the FAISS deployment shape, r7 verdict #1):
  * `trainIvf`/`trainPq`/`trainIvfPq` → [[AnnIndex]] (bounded sample collect
  * + driver-local fits, save/load as JSON); [[encode]] → a codes DataFrame
  * (ONE corpus scan — materialize to parquet once); `*TopKIndexed` → query
  * batches served against the stored codes. The one-shot `ivfTopK`/`pqTopK`
  * /`ivfPqTopK` compose the three stages, so the one-shot and persisted
  * paths are hash-identical by construction (gate: sim_topk_ivfpq_persisted).
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
    // a NaN score would rank FIRST for every query (Double.compare places
    // NaN above all reals in the k-heap), so one poisoned corpus
    // embedding would take rank 1 everywhere and evict a true neighbor —
    // skip such rows (r18 review; CosineSim already defines zero-norm as
    // 0.0, so NaN can only arrive from NaN vector components upstream)
    scored.filter(!isnan(col("cosine"))).groupBy("query_id")
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

  /** Maximal-Marginal-Relevance diversified top-k (Carbonell & Goldstein
    * 1998): retrieve `k · oversample` nearest candidates, then greedily
    * re-rank them so each pick maximizes
    * `lambda·cos(q,c) − (1−lambda)·max_{s∈selected} cos(c,s)` — the
    * retrieval-diversity step RAG pipelines run after ANN. lambda = 1
    * reproduces the plain top-k; lower lambda trades relevance for
    * spread (dedups near-identical passages in the result list).
    *
    * Scale shape: candidate generation is the (already scale-shaped)
    * [[bruteForceTopK]] — swap in any `*TopKIndexed` serve for the 100 TB
    * path; the greedy loop runs EXECUTOR-side once per query over its
    * ≤ k·oversample candidates (a bounded `collect_list` per query — the
    * one place a Scala closure beats an expression, since it executes
    * per QUERY, not per corpus row; same escape-hatch rationale as
    * element_wise checks). Deterministic at any partitioning: candidates
    * sort (cosine desc, id asc) before selection and ties keep the
    * first-seen (highest-relevance, smallest-id) candidate. */
  def mmrTopK(corpus: DataFrame, corpusId: String, corpusEmb: String,
      queries: DataFrame, queryId: String, queryEmb: String,
      k: Int, lambda: Double = 0.7, oversample: Int = 4): DataFrame = {
    require(k >= 1, s"k >= 1, got $k")
    require(oversample >= 1, s"oversample >= 1, got $oversample")
    val cand = bruteForceTopK(corpus, corpusId, corpusEmb,
      queries, queryId, queryEmb, k * oversample)
    // broadcast the bounded candidate list into the corpus re-fetch (r18
    // review: a post-aggregation frame has no size stats, so the planner
    // could shuffle the full-width corpus embeddings — the sibling
    // pqTopKIndexed re-fetch already broadcasts its shortlist)
    val withVec = corpus
      .select(q(corpusId).as("corpus_id"), q(corpusEmb).as("__cv"))
      .join(broadcast(cand), Seq("corpus_id"))
    mmrRerank(withVec, k, lambda)
  }

  /** The re-rank half of [[mmrTopK]]: `candidates` must carry
    * (query_id, corpus_id, cosine, __cv vector); emits
    * (query_id, corpus_id, rank, mmr_score rounded to 4). */
  def mmrRerank(candidates: DataFrame, k: Int, lambda: Double): DataFrame = {
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1], got $lambda")
    // the UDF selects INDICES into the plan-sorted candidate array, so it
    // never touches the id — ids keep their original dtype (r18 review:
    // the former cast('long')/getSeq[Float] form NPE'd on string ids and
    // ClassCastException'd on array<double> embeddings, both supported
    // everywhere else in this file); vectors arrive cast to array<double>
    val selectMmr = udf { (rel: Seq[Double], vecs: Seq[Seq[Double]]) =>
      val arr = vecs.map(_.toArray).toArray
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length && i < b.length) {
          dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
        }
        if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na) / math.sqrt(nb)
      }
      val n = arr.length
      // maxSimTo(i) = max cosine from candidate i to anything selected so
      // far — initialized to -inf, NOT 0 (r18 review: the 0 floor clamped
      // a negative max-cosine penalty, so anti-correlated candidates were
      // under-rewarded and the pick order deviated from the documented
      // objective); it is only read once out.nonEmpty, by which time the
      // post-pick loop has set a real value for every candidate
      val maxSimTo = Array.fill(n)(Double.NegativeInfinity)
      val used = Array.fill(n)(false)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double)]
      var exhausted = false
      while (!exhausted && out.length < math.min(k, n)) {
        var best = -1; var bestObj = Double.NegativeInfinity
        var i = 0
        while (i < n) {
          if (!used(i)) {
            val penalty = if (out.isEmpty) 0.0 else maxSimTo(i)
            val obj = lambda * rel(i) - (1.0 - lambda) * penalty
            // strict >, NaN-excluded: ties keep the earliest candidate
            // in the (cosine desc, id asc) order — deterministic. A NaN
            // objective (a poisoned embedding's NaN cosine) never
            // compares greater, so without the guard the loop could end
            // a round with best = -1 and crash on used(-1) once only
            // poisoned candidates remain (r17 review) — those rows are
            // skipped and the result is simply shorter than k.
            if (!obj.isNaN && obj > bestObj) { bestObj = obj; best = i }
          }
          i += 1
        }
        if (best < 0) exhausted = true
        else {
          used(best) = true
          out += ((best, out.length + 1, math.rint(bestObj * 1e4) / 1e4))
          var j = 0
          while (j < n) {
            if (!used(j)) {
              val s = cos(arr(j), arr(best))
              if (s > maxSimTo(j)) maxSimTo(j) = s
            }
            j += 1
          }
        }
      }
      out.toSeq
    }
    // sort IN THE PLAN (sort_array over a struct whose leading fields are
    // (-cosine, id) gives the deterministic (cosine desc, id asc) order
    // at any partitioning), then select by index and read the id back out
    // of the sorted array — the id never enters the UDF
    candidates
      .groupBy("query_id")
      .agg(sort_array(collect_list(struct(
        (-col("cosine").cast("double")).as("negc"),
        col("corpus_id").as("id"),
        col("__cv").cast("array<double>").as("v")))).as("cands"))
      .select(col("query_id"), col("cands"),
        explode(selectMmr(
          transform(col("cands"), c => -c.getField("negc")),
          col("cands.v"))).as("s"))
      .select(col("query_id"),
        element_at(col("cands"), col("s._1") + 1).getField("id").as("corpus_id"),
        col("s._2").as("rank"), col("s._3").as("mmr_score"))
  }

  /** FAISS-style training bound: centroid quality saturates at ~O(100)
    * points per centroid, so the quantizer trainers collect at most
    * `max(k·256, 4096)` sample rows to the driver — a constant while the
    * corpus grows to 100 TB (≤ ~8 MB at dim=64). */
  val MaxPointsPerCentroid: Int = 256

  /** Corpus-sized IVF cell count (r12, verdict #2): the largest power of
    * two at or below √N, clamped to [4, 65536] — the FAISS √N guidance
    * snapped to powers of two so nearby corpus sizes train identical
    * quantizers (500 → 16, 2 000 → 32, 50 000 → 128, 10⁹ → 16 384).
    * Static cell counts are exactly the trap the in-store recall probe
    * exists to catch: cells sized for one corpus density over- or
    * under-quantize at 10× — pass `nCentroids = 0` to the trainers to
    * derive the count from the corpus instead of freezing it.
    * `m` (PQ subspaces) stays caller-chosen: it is a code-size/accuracy
    * trade bound by `dim % m == 0`, not a corpus-density one — pick m so
    * dsub = dim/m lands in 4–16 (dim=64 → m=8 is the middle of that
    * band; doubling m doubles code bytes for ~½ the per-subspace
    * distortion). */
  def autoNCentroids(n: Long): Int = {
    val target = math.sqrt(math.max(n, 1L).toDouble)
    val clamped = math.min(math.max(target, 4.0), 65536.0)
    Integer.highestOneBit(clamped.toInt)
  }

  /** Resolve an `nCentroids` argument: positive = explicit, 0 = derive
    * from the corpus via [[autoNCentroids]] (one count job). */
  private def resolveNCentroids(c: DataFrame, nCentroids: Int): Int = {
    require(nCentroids >= 0, s"nCentroids must be >= 0 (0 = auto), got $nCentroids")
    if (nCentroids > 0) nCentroids else autoNCentroids(c.count())
  }

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
    // HARD row bound (r18 review: nc·256 reaches 16.7M rows at the 65536
    // auto ceiling — an unguarded tens-of-GB collect plus an intractable
    // driver k-means). The knob raises it on fat drivers; below ~64
    // points/centroid cell quality degrades gracefully for IVF (the
    // in-store recall probe is the backstop).
    val maxRows = c.sparkSession.conf
      .getOption("graft.ann.maxTrainRows").map(_.toInt).getOrElse(1 << 20)
    val cap = math.min(
      math.max(numCentroids * MaxPointsPerCentroid, 4096), maxRows)
    require(numCentroids <= cap,
      s"nCentroids=$numCentroids exceeds the training-row budget $cap — " +
        "raise graft.ann.maxTrainRows or lower nCentroids")
    val sampled =
      if (trainSampleFraction.isNaN)
        // seeded-hash bottom-k, NOT sample(): Bernoulli sampling is
        // evaluated per-partition, so the trained centroids — and every
        // downstream pinned neighbor — would change with the corpus's
        // partitioning (r18 review); TakeOrderedAndProject is layout-
        // independent, and this also drops the extra count() the old
        // total<=cap probe paid (a full corpus scan at 100 TB)
        c.orderBy(xxhash64(col("corpus_id"), lit(seed)), col("corpus_id"))
          .limit(cap)
      else if (trainSampleFraction >= 1.0)
        c.orderBy(xxhash64(col("corpus_id"), lit(seed)), col("corpus_id"))
          .limit(cap)
      else
        // r17 review: the explicit-fraction sample can exceed the cap by
        // orders of magnitude, and the shared id-ordered collect below
        // would then keep only the LOWEST-id (oldest) rows — the exact
        // oldest-slice skew the >= 1.0 branch documents. Pre-trim to the
        // cap in seeded-hash order (set selection stays uniform); the
        // id-ordered collect below then only fixes the SEQUENCE. (The
        // NaN branch's 1.2× oversample bounds its id-trim bias to ~17%
        // of a uniform sample — left as is, its set feeds the pinned
        // recall floors.)
        c.sample(withReplacement = false, trainSampleFraction, seed)
          .orderBy(xxhash64(col("corpus_id"), lit(seed)), col("corpus_id"))
          .limit(cap)
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

  // ========================= train (quantizers) ===========================

  /** Train an IVF coarse quantizer (FAISS IndexIVFFlat shape): k-means
    * centroids fitted driver-locally ([[LocalKMeans]]) on ONE bounded
    * sample collect — constant cost at any corpus size.
    * `nCentroids = 0` derives the cell count from the corpus
    * ([[autoNCentroids]]). */
  def trainIvf(
      corpus: DataFrame, corpusId: String, corpusEmb: String,
      nCentroids: Int = 64,
      trainSampleFraction: Double = Double.NaN, seed: Long = 42L): AnnIndex = {
    val c = corpus.select(q(corpusId).as("corpus_id"), q(corpusEmb).as("cv"))
    val nc = resolveNCentroids(c, nCentroids)
    val sample = collectTrainVectors(c, nc, trainSampleFraction, seed)
    require(sample.nonEmpty, "trainIvf: corpus is empty — nothing to index")
    AnnIndex("ivf", sample.head.length, nc, 0, 0, seed,
      LocalKMeans.fit(sample, nc, seed), Array.empty)
  }

  /** Train PQ codebooks (Jégou et al.): the embedding space splits into `m`
    * subspaces, each with its own `ksub`-centroid codebook fitted
    * driver-locally on ONE bounded sample collect. */
  def trainPq(
      corpus: DataFrame, corpusId: String, corpusEmb: String,
      m: Int = 8, ksub: Int = 16,
      trainSampleFraction: Double = Double.NaN, seed: Long = 42L): AnnIndex = {
    require(m > 0 && ksub > 1, "m > 0, ksub > 1")
    val c = corpus.select(q(corpusId).as("corpus_id"), q(corpusEmb).as("cv"))
    val sample = collectTrainVectors(c, ksub, trainSampleFraction, seed)
    require(sample.nonEmpty, "trainPq: corpus is empty — nothing to index")
    val dim = sample.head.length
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val codebooks = Array.tabulate(m) { j =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      LocalKMeans.fit(sub, ksub, seed + j)
    }
    AnnIndex("pq", dim, 0, m, ksub, seed, Array.empty, codebooks)
  }

  /** Train the IVF-PQ composition (FAISS IndexIVFPQ, by_residual): coarse
    * centroids plus codebooks over the RESIDUAL (vector − assigned
    * centroid). Residuals concentrate near zero, so the shared residual
    * codebooks quantize far more accurately than raw-vector PQ at the same
    * code size. ONE bounded sample collect feeds both trainings — the
    * residuals of the same sample are derived on the driver.
    * `nCentroids = 0` derives the cell count from the corpus
    * ([[autoNCentroids]]; `m`/`ksub` stay explicit — see there). */
  def trainIvfPq(
      corpus: DataFrame, corpusId: String, corpusEmb: String,
      nCentroids: Int = 64, m: Int = 8, ksub: Int = 16,
      trainSampleFraction: Double = Double.NaN, seed: Long = 42L): AnnIndex = {
    require(m > 0 && ksub > 1, "m > 0, ksub > 1")
    val c = corpus.select(q(corpusId).as("corpus_id"), q(corpusEmb).as("cv"))
    val nc = resolveNCentroids(c, nCentroids)
    val sample = collectTrainVectors(c,
      math.max(nc, ksub), trainSampleFraction, seed)
    require(sample.nonEmpty, "trainIvfPq: corpus is empty — nothing to index")
    val dim = sample.head.length
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val centers = LocalKMeans.fit(sample, nc, seed)
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
    val codebooks = Array.tabulate(m) { j =>
      val sub = residuals.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      LocalKMeans.fit(sub, ksub, seed + j)
    }
    AnnIndex("ivfpq", dim, nc, m, ksub, seed, centers, codebooks)
  }

  // ========================= encode (one corpus scan) =====================

  /** Encode the corpus against a trained index — ONE scan, pure codegen'd
    * expressions (native argmin over the literal centroid/codebook tables),
    * no shuffle. Materialize the result to parquet once and serve every
    * query batch from it via the `*TopKIndexed` entry points.
    *
    * Output schema by kind:
    *  - `ivf`:   (corpus_id, cell int, cv)   — IVF cells store raw vectors
    *    (FAISS IndexIVFFlat: exact distance inside probed cells)
    *  - `pq`:    (corpus_id, codes array<int>)
    *  - `ivfpq`: (corpus_id, cell int, codes array<int>) — codes quantize
    *    the residual vs the assigned centroid
    */
  def encode(corpus: DataFrame, corpusId: String, corpusEmb: String,
      index: AnnIndex): DataFrame = {
    val c = corpus.select(q(corpusId).as("corpus_id"), q(corpusEmb).as("cv"))
    val dsub = index.dsub
    def subSlice(v: Column, j: Int): Column = slice(v, j * dsub + 1, dsub)
    index.kind match {
      case "ivf" =>
        c.withColumn("cell",
          graft.functions.NearestCentroid.of(col("cv"), index.centers))
          .select("corpus_id", "cell", "cv")
      case "pq" =>
        val codes = array((0 until index.m).map { j =>
          graft.functions.NearestCentroid.of(subSlice(col("cv"), j), index.codebooks(j))
        }: _*)
        c.select(col("corpus_id"), codes.as("codes"))
      case "ivfpq" =>
        val centLit = typedlit(index.centers.map(_.toSeq).toSeq)
        val cellCol = graft.functions.NearestCentroid.of(col("cv"), index.centers)
        val resid = zip_with(col("cv"), element_at(centLit, col("cell") + 1),
          (x, y) => x.cast("double") - y)
        val codes = array((0 until index.m).map { j =>
          graft.functions.NearestCentroid.of(subSlice(col("res"), j), index.codebooks(j))
        }: _*)
        c.withColumn("cell", cellCol).withColumn("res", resid)
          .select(col("corpus_id"), col("cell"), codes.as("codes"))
    }
  }

  // ================= serve (query batches vs stored codes) ================

  /** nProbe nearest cells per query (exact L2 to the broadcast centroid
    * table, k-heap ranked) carrying the query vector along. */
  private def probeCells(queries: DataFrame, centers: Array[Array[Double]],
      nProbe: Int): DataFrame = {
    val spark0 = queries.sparkSession
    import spark0.implicits._
    val centDf = broadcast(centers.zipWithIndex.map {
      case (v, i) => (i, v.toSeq) }.toSeq.toDF("cell", "centroid"))
    val l2 = aggregate(zip_with(col("qv"), col("centroid"),
      (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, x) => acc + x)
    queries.crossJoin(centDf)
      .withColumn("negd2", -l2)
      .groupBy("query_id")
      .agg(first(col("qv")).as("qv"),
        graft.functions.TopKByScore.of(col("negd2"), col("cell"), nProbe).as("pk"))
      .select(col("query_id"), col("qv"), explode(col("pk.item")).as("cell"))
  }

  /** IVF serve: probe `nProbe` cells per query, rank the probed cells'
    * rows by exact cosine. `encoded` is [[encode]]'s `ivf` output (read
    * back from parquet or fresh — identical either way). The probe join is
    * corpus-cell × broadcast query-probes; cell sizes are ~|corpus|/k. */
  def ivfTopKIndexed(
      encoded: DataFrame,
      queries: DataFrame, queryId: String, queryEmb: String,
      index: AnnIndex, k: Int, nProbe: Int = 4,
      pruneCells: Boolean = false): DataFrame = {
    require(index.kind == "ivf", s"expected an 'ivf' index, got '${index.kind}'")
    val qs = queries.select(q(queryId).as("query_id"), q(queryEmb).as("qv"))
    val probes = probeCells(qs, index.centers, nProbe)
    // same collected-probe pruning as ivfPqTopKIndexed — for the IVF store
    // it matters MORE: cells hold raw vectors, so partition pruning skips
    // whole files of full-width embeddings, not just code bytes
    val (scanSide, probeSide) = prunedScanAndProbe(encoded, probes, pruneCells)
    val cand = scanSide.join(broadcast(probeSide), Seq("cell"))
      .withColumn("cosine", round(cosine(col("cv"), col("qv")), 4))
    rankTopK(cand.select("query_id", "corpus_id", "cosine"), k)
  }

  /** The pruneCells (scanSide, probeSide) derivation shared by the IVF
    * and IVF-PQ serves (r18 review: it was copy-pasted verbatim): one
    * bounded collect of the probe table yields BOTH the pushed-down cell
    * filter (parquet partition pruning skips non-probed cells' files)
    * and the broadcast probe side, so the probe aggregation never runs
    * twice. */
  private def prunedScanAndProbe(encoded: DataFrame, probes: DataFrame,
      pruneCells: Boolean): (DataFrame, DataFrame) =
    if (!pruneCells) (encoded, probes)
    else {
      // bounded BY CONSTRUCTION at ≤ |queries|·nProbe rows, and the
      // collect enforces it (an oversized query batch fails loudly)
      val rows = StoreFiles.collectBounded(probes, "ANN probe table",
        "graft.ann.maxProbeRows", 1 << 18)
      val cellIdx = probes.schema.fieldIndex("cell")
      val cells = rows.map(r => Int.box(r.getInt(cellIdx))).distinct.toSeq
      val local = encoded.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), probes.schema)
      (encoded.filter(col("cell").isin(cells: _*)), local)
    }

  /** PQ serve: ADC scan over the stored codes (m `element_at` lookups per
    * (corpus row, query) into the query's broadcast distance table), k-heap
    * shortlist of `k·refineFactor`, exact cosine re-rank via a pruned
    * broadcast join against the raw corpus. The scan reads codes, never
    * raw vectors — the point at 100 TB. */
  def pqTopKIndexed(
      encoded: DataFrame,
      corpus: DataFrame, corpusId: String, corpusEmb: String,
      queries: DataFrame, queryId: String, queryEmb: String,
      index: AnnIndex, k: Int, refineFactor: Int = 4): DataFrame = {
    require(index.kind == "pq", s"expected a 'pq' index, got '${index.kind}'")
    require(refineFactor >= 1, "refine >= 1")
    val m = index.m; val ksub = index.ksub; val dsub = index.dsub
    val c = corpus.select(q(corpusId).as("corpus_id"), q(corpusEmb).as("cv"))
    val qs = queries.select(q(queryId).as("query_id"), q(queryEmb).as("qv"))
    def subSlice(v: Column, j: Int): Column = slice(v, j * dsub + 1, dsub)
    val bookLits = (0 until m).map(j => typedlit(index.codebooks(j).map(_.toSeq).toSeq))
    val table = concat((0 until m).map(j =>
      sqDistToEach(subSlice(col("qv"), j), bookLits(j))): _*)
    // qv RIDES the broadcast distance tables and the shortlist aggregate
    // (first() per query — query ids are unique by the serve contract,
    // the same invariant probeCells already relies on), so the exact
    // re-rank below needs no second query-side broadcast join: one fewer
    // Spark job and one fewer query-frame scan per serve call (r19
    // verdict #3 — the serve was scheduler-bound: ~0.17 s executor CPU
    // against ~1 s wall over 8 jobs; R20Probe sim).
    val qTables = qs.select(col("query_id"), col("qv"), table.as("tbl"))
    val adc = (0 until m).map(j =>
      element_at(col("tbl"), element_at(col("codes"), j + 1) + lit(j * ksub) + 1))
      .reduce(_ + _)
    val shortlist = encoded.crossJoin(broadcast(qTables))
      .select(col("query_id"), col("qv"), col("corpus_id"), (-adc).as("negadc"))
      .groupBy("query_id")
      .agg(first(col("qv")).as("qv"),
        graft.functions.TopKByScore.of(col("negadc"), col("corpus_id"),
          k * refineFactor).as("tk"))
      .select(col("query_id"), col("qv"), explode(col("tk.item")).as("corpus_id"))
    val rescored = c.join(broadcast(shortlist), Seq("corpus_id"))
      .withColumn("cosine", round(cosine(col("cv"), col("qv")), 4))
    rankTopK(rescored.select("query_id", "corpus_id", "cosine"), k)
  }

  /** IVF-PQ serve: probe `nProbe` cells, ADC-scan only those cells' codes
    * with per-(query, cell) RESIDUAL distance tables riding the broadcast
    * probe table, k-heap shortlist, exact cosine re-rank. At scale the scan
    * touches |corpus|·nProbe/nCentroids rows of m small ints each — never
    * a raw vector until the re-rank.
    *
    * `pruneCells = true` additionally collects the query batch's distinct
    * probe cells (bounded: ≤ |queries|·nProbe ints) and pre-filters the
    * codes table with `cell ISIN (...)` — when `encoded` was written
    * `partitionBy("cell")` ([[encodeAndWritePartitioned]]), parquet
    * PARTITION PRUNING then skips every non-probed cell's files entirely:
    * at deployment scale (nCentroids=4096, nProbe=16) the serve reads
    * ~0.4% of the stored bytes instead of scanning all codes. Results are
    * identical either way (the cell-equality join already discards
    * non-probed cells — the filter only moves that discard into the file
    * listing). */
  def ivfPqTopKIndexed(
      encoded: DataFrame,
      corpus: DataFrame, corpusId: String, corpusEmb: String,
      queries: DataFrame, queryId: String, queryEmb: String,
      index: AnnIndex, k: Int, nProbe: Int = 8, refineFactor: Int = 4,
      pruneCells: Boolean = false): DataFrame = {
    require(index.kind == "ivfpq", s"expected an 'ivfpq' index, got '${index.kind}'")
    require(refineFactor >= 1 && nProbe >= 1, "refine >= 1, nProbe >= 1")
    val m = index.m; val ksub = index.ksub; val dsub = index.dsub
    val c = corpus.select(q(corpusId).as("corpus_id"), q(corpusEmb).as("cv"))
    val qs = queries.select(q(queryId).as("query_id"), q(queryEmb).as("qv"))
    def subSlice(v: Column, j: Int): Column = slice(v, j * dsub + 1, dsub)
    val bookLits = (0 until m).map(j => typedlit(index.codebooks(j).map(_.toSeq).toSeq))
    val centLit = typedlit(index.centers.map(_.toSeq).toSeq)
    val qres = zip_with(col("qv"), element_at(centLit, col("cell") + 1),
      (x, y) => x.cast("double") - y)
    val table = concat((0 until m).map(j =>
      sqDistToEach(subSlice(col("qres"), j), bookLits(j))): _*)
    // qv rides the (bounded, broadcast) probe table and the shortlist
    // aggregate — the exact re-rank then needs no second query-side
    // broadcast join (see pqTopKIndexed; same serve-job-count rationale)
    val probes = probeCells(qs, index.centers, nProbe)
      .withColumn("qres", qres)
      .select(col("query_id"), col("qv"), col("cell"), table.as("tbl"))
    val adc = (0 until m).map(j =>
      element_at(col("tbl"), element_at(col("codes"), j + 1) + lit(j * ksub) + 1))
      .reduce(_ + _)
    // the probe table is bounded (≤ |queries|·nProbe rows — it IS the
    // broadcast side). For the pruned serve, collect it ONCE and derive
    // BOTH the pushed-down cell filter and the broadcast side from the
    // same rows, so the probe aggregation never runs twice.
    val (scanSide, probeSide) = prunedScanAndProbe(encoded, probes, pruneCells)
    val shortlist = scanSide.join(broadcast(probeSide), Seq("cell"))
      .select(col("query_id"), col("qv"), col("corpus_id"), (-adc).as("negadc"))
      .groupBy("query_id")
      .agg(first(col("qv")).as("qv"),
        graft.functions.TopKByScore.of(col("negadc"), col("corpus_id"),
          k * refineFactor).as("tk"))
      .select(col("query_id"), col("qv"), explode(col("tk.item")).as("corpus_id"))
    val rescored = c.join(broadcast(shortlist), Seq("corpus_id"))
      .withColumn("cosine", round(cosine(col("cv"), col("qv")), 4))
    rankTopK(rescored.select("query_id", "corpus_id", "cosine"), k)
  }

  /** Encode the corpus and write the codes CELL-PARTITIONED — the storage
    * layout that makes [[ivfPqTopKIndexed]]'s `pruneCells` serve skip
    * every non-probed cell at the FILE level (parquet partition pruning).
    * One corpus scan + one cell-keyed shuffle-free write (each task writes
    * its rows into per-cell directories). */
  def encodeAndWritePartitioned(corpus: DataFrame, corpusId: String,
      corpusEmb: String, index: AnnIndex, path: String,
      mode: String = "overwrite"): Unit = {
    require(index.kind == "ivf" || index.kind == "ivfpq",
      s"cell-partitioned layout needs an IVF index, got '${index.kind}'")
    encode(corpus, corpusId, corpusEmb, index)
      .write.mode(mode)
      // static even if the session runs dynamic partition overwrite: an
      // "overwrite" of a crashed attempt's generation dir must clear ALL
      // stale partitions, or a differing replay would commit phantom rows
      .option("partitionOverwriteMode", "static")
      .partitionBy("cell").parquet(path)
  }

  /** Streaming encode — the incremental-ingest path of the persisted-index
    * deployment: new embeddings arrive continuously, each micro-batch is
    * encoded against the FROZEN index (encode is a stateless per-row
    * projection — no watermark, no state store) and appended to the
    * cell-partitioned code store; history is never retrained or
    * re-encoded, and the serve path picks new rows up on its next file
    * listing. This helper replays a static corpus as file-source
    * micro-batches through exactly that pipeline and returns the sink
    * contents read back; the gate diffs them against the one-shot batch
    * [[encode]] (must be row-identical — micro-batching a stateless
    * projection cannot change it). */
  def encodeReplay(corpus: DataFrame, corpusId: String, corpusEmb: String,
      index: AnnIndex, outputRoot: String = ""): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val spark = corpus.sparkSession
    val dir = graft.streaming.StreamingValidation
      .replayRoot("graft_enc_replay_", outputRoot)
    val src = corpus.select(q(corpusId).as("corpus_id"), q(corpusEmb).as("cv"))
    src.repartition(8).write.parquet(s"$dir/in")
    val stream = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
    val writer = encode(stream, "corpus_id", "cv", index)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/ck")
      .trigger(Trigger.AvailableNow()).format("parquet")
    // shared replay hygiene (r18 hunt + fifth pass): input/checkpoint
    // delete eagerly even when the query fails, out/ — which backs the
    // returned frame — retires at JVM exit (or under a caller-owned
    // outputRoot), and a still-active query stops before any delete
    graft.streaming.StreamingValidation.runReplayOn(dir, outputRoot,
        s"$dir/in", s"$dir/ck")(
      (if (index.kind == "pq") writer else writer.partitionBy("cell"))
        .start(s"$dir/out"))
    // partition columns come back LAST from a partitioned read — restore
    // the batch-encode column order
    val cols = index.kind match {
      case "ivf"   => Seq("corpus_id", "cell", "cv")
      case "pq"    => Seq("corpus_id", "codes")
      case _       => Seq("corpus_id", "cell", "codes")
    }
    // an EMPTY corpus writes no sink files and the parquet read would
    // fail schema inference — return the batch path's empty frame so
    // replay ≡ batch holds on the degenerate input too (r18 review)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/out")))
      encode(corpus.limit(0), corpusId, corpusEmb, index)
        .select(cols.map(col): _*)
    else spark.read.parquet(s"$dir/out").select(cols.map(col): _*)
  }

  // ===================== one-shot compositions ============================

  /** IVF (inverted-file) approximate top-k — train + encode + serve in one
    * call. Prefer the staged form (train once, [[encode]] to parquet once,
    * serve many batches) for repeated querying. */
  def ivfTopK(
      corpus: DataFrame, corpusId: String, corpusEmb: String,
      queries: DataFrame, queryId: String, queryEmb: String,
      k: Int, nCentroids: Int = 64, nProbe: Int = 4,
      trainSampleFraction: Double = Double.NaN, seed: Long = 42L): DataFrame = {
    val index = trainIvf(corpus, corpusId, corpusEmb, nCentroids,
      trainSampleFraction, seed)
    ivfTopKIndexed(encode(corpus, corpusId, corpusEmb, index),
      queries, queryId, queryEmb, index, k, nProbe)
  }

  /** Product-quantization approximate top-k — train + encode + serve in
    * one call (Jégou et al., "Product Quantization for Nearest Neighbor
    * Search"). Everything after the driver-local codebook fits is pure
    * codegen'd Column expressions and map-side k-heaps — no window, no
    * global sort. Prefer the staged form for repeated querying. */
  def pqTopK(
      corpus: DataFrame, corpusId: String, corpusEmb: String,
      queries: DataFrame, queryId: String, queryEmb: String,
      k: Int, m: Int = 8, ksub: Int = 16, refineFactor: Int = 4,
      trainSampleFraction: Double = Double.NaN, seed: Long = 42L): DataFrame = {
    val index = trainPq(corpus, corpusId, corpusEmb, m, ksub,
      trainSampleFraction, seed)
    pqTopKIndexed(encode(corpus, corpusId, corpusEmb, index),
      corpus, corpusId, corpusEmb, queries, queryId, queryEmb,
      index, k, refineFactor)
  }

  /** IVF-PQ composition — the actual 100 TB ANN deployment shape (FAISS
    * IndexIVFPQ, Jégou et al. §IV) as one call: coarse cells route, PQ
    * codes quantize residuals, queries probe nProbe cells, ADC-scan their
    * codes, exact re-rank. Prefer the staged form (train / encode /
    * [[ivfPqTopKIndexed]]) for repeated querying. */
  def ivfPqTopK(
      corpus: DataFrame, corpusId: String, corpusEmb: String,
      queries: DataFrame, queryId: String, queryEmb: String,
      k: Int, nCentroids: Int = 64, nProbe: Int = 8,
      m: Int = 8, ksub: Int = 16, refineFactor: Int = 4,
      trainSampleFraction: Double = Double.NaN, seed: Long = 42L): DataFrame = {
    val index = trainIvfPq(corpus, corpusId, corpusEmb, nCentroids, m, ksub,
      trainSampleFraction, seed)
    ivfPqTopKIndexed(encode(corpus, corpusId, corpusEmb, index),
      corpus, corpusId, corpusEmb, queries, queryId, queryEmb,
      index, k, nProbe, refineFactor)
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
    require(bands >= 1, s"lshTopK: bands >= 1, got $bands (0 divides " +
      "nothing; a negative value passes the modulo check and silently " +
      "produces garbage buckets — r18 review)")
    require(bits % bands == 0, "bands must divide bits")
    val bandBits = bits / bands
    // r17 review: bandBits == 64 makes (1L << 64) wrap to 1L (Java shifts
    // mod 64) so the mask is 0 and EVERY row lands in bucket 0 — the
    // "LSH" join silently degenerates to the full cross product
    require(bandBits < 64,
      s"lshTopK: bits/bands = $bandBits must be < 64 (a 64-bit band has " +
        "one bucket — no hashing left; use more bands)")
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
