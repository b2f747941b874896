package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means over an embedding column — the domain-clustering /
  * data-mixing workhorse (cluster the corpus, then weight, cap, inspect, or
  * dedup per cluster). Complements [[LocalKMeans]]: that fits on a BOUNDED
  * driver-side sample (the right call for ANN quantizer codebooks, where
  * centroid quality saturates at ~O(100) points/centroid); this runs
  * Lloyd's iterations over the FULL distributed corpus, for when cluster
  * masses and assignments must reflect every row (SemDeDup per-cluster
  * budgets, mixture weights).
  *
  * Scale shape: each iteration is ONE distributed job — assignment is a
  * codegen'd argmin over the literal centroid table fused into the scan
  * (no ML transform, no UDF), the update is a (k·dim)-cell aggregation
  * with map-side partials, and only k·dim cells (not data) reach the
  * driver. Total cost: `iters` scans of (id, vec); nothing data-sized is
  * ever collected or broadcast besides the centroid table itself.
  *
  * Determinism (the oracle/golden-pin contract): centroid updates
  * accumulate in FIXED-POINT — each component contributes
  * round(v·10⁶) as a long, and long addition is exact and
  * order-independent, so the fit is bit-identical under any partitioning
  * or scheduling. (A double sum would drift in the last ulp with merge
  * order and poison downstream argmin ties.) Long capacity bounds the
  * corpus at ~9·10¹² rows per cluster for unit-scale components
  * (9.2·10¹⁸ / 10⁶) — comfortably past 100 TB of embeddings; components
  * must be ≲10³ in magnitude for the same headroom.
  */
object Clustering {

  private def q(n: String): Column = col("`" + n.replace("`", "``") + "`")

  /** Seeded deterministic init: the k rows with the smallest
    * xxhash64(id, seed) — a partition-independent pseudo-random draw
    * (TakeOrderedAndProject, so the selected set and order never depend on
    * parallelism). */
  private def initCentroids(base: DataFrame, k: Int, seed: Long): Array[Array[Double]] =
    base.orderBy(xxhash64(col("id"), lit(seed)), col("id")).limit(k)
      // cast, don't getSeq[Float]: float vectors widen exactly (same init
      // as before), and array<double> embedding columns work instead of
      // throwing ClassCastException on collect
      .select(col("v").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)

  /** Native k×dim argmin per row ([[graft.functions.NearestCentroid]]) —
    * same distances, same first-index tie-break as the HOF formulation it
    * replaced, without the interpreted per-element lambda dispatch. */
  private def argminCluster(cents: Array[Array[Double]]): Column =
    graft.functions.NearestCentroid.of(col("v"), cents)

  private val Scale = 1e6

  /** Full-corpus Lloyd's fit: `iters` fixed rounds (fixed job count — no
    * convergence action; k-means improvement is monotone, extra rounds are
    * wasted work not wrong answers). Empty clusters keep their previous
    * centroid. Returns the k centroids (components quantized to the 10⁻⁶
    * fixed-point grid — the determinism contract above). */
  def kMeansFit(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 10, seed: Long = 42L): Array[Array[Double]] = {
    require(k >= 1, "k >= 1")
    require(iters >= 1, "iters >= 1")
    val base = df.select(q(idCol).as("id"), q(vecCol).as("v"))
      .filter(col("v").isNotNull)
    var cents = initCentroids(base, k, seed)
    require(cents.nonEmpty, "kMeansFit: no non-null vectors")
    for (_ <- 1 to iters) {
      // one job: argmin-assign in the scan (once per ROW — the grouping
      // key), then the per-cluster component sums as ONE fixed-point array
      // aggregate each (no explode: k·dim cells at the exchange, rows
      // never multiply)
      val cells = base
        .groupBy(argminCluster(cents).as("cl"))
        .agg(graft.functions.VectorSumFixedPoint.of(
          col("v").cast("array<double>"), Scale).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone())
      cells.foreach { r =>
        val (cl, n) = (r.getInt(0), r.getLong(2))
        val s = r.getSeq[Long](1)
        var j = 0
        while (j < s.length) {
          next(cl)(j) = math.rint(s(j).toDouble / n) / Scale
          j += 1
        }
      }
      cents = next
    }
    cents
  }

  /** Assign every row to its nearest centroid — one codegen'd scan, the
    * centroid table rides as a literal. Output: input row id + `cluster`. */
  def kMeansAssign(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame =
    df.select(q(idCol).as(idCol), q(vecCol).as("v"))
      .filter(col("v").isNotNull)
      .select(col(idCol), argminCluster(centroids).as("cluster"))

  /** Fit + assign. */
  def kMeans(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 10, seed: Long = 42L): DataFrame =
    kMeansAssign(df, idCol, vecCol, kMeansFit(df, idCol, vecCol, k, iters, seed))

  /** Cluster report — the inspection surface: one row per non-empty
    * cluster with its mass and centroid L2 norm (norm drift across
    * snapshots is a cheap domain-shift signal). */
  def kMeansSummary(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 10, seed: Long = 42L): DataFrame = {
    val cents = kMeansFit(df, idCol, vecCol, k, iters, seed)
    val norms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
    val spark0 = df.sparkSession
    import spark0.implicits._
    val normDf = norms.zipWithIndex.map { case (nm, i) => (i, nm) }.toSeq
      .toDF("cluster", "nm")
    kMeansAssign(df, idCol, vecCol, cents)
      .groupBy("cluster").agg(count(lit(1)).as("n"))
      .join(broadcast(normDf), Seq("cluster"))
      .select(col("cluster"), col("n"), round(col("nm"), 4).as("centroid_norm"))
  }

  /** SemDeDup as published (Abbas et al. 2023, arXiv:2303.09540): k-means
    * the embedding space, then find cosine near-duplicates WITHIN each
    * cluster only, keep the minimum-id representative per duplicate group.
    * The cluster IS the blocking key — candidate pairs are per-cluster,
    * so the pair stage is Σ|shard|² bounded instead of n², and
    * cross-cluster pairs are never generated (the paper's accepted recall
    * trade). Clusters larger than `maxClusterPairs` ids are SHARDED by a
    * seeded id hash into sub-blocks of ~maxClusterPairs/2 expected ids
    * (k-means clusters are ~n/k sized, so at corpus scale most clusters
    * exceed any fixed cap — dropping them, the LSH-bucket convention of
    * [[Dedup.bucketedPairs]], would silently no-op the dedup exactly where
    * most duplicates live; sharding keeps the work bounded and only
    * forfeits cross-shard pairs). Costs one tiny extra job: the k-row
    * cluster-size aggregate that decides each cluster's shard count.
    * Alternative blocking (hyperplane LSH instead of k-means) is
    * [[Dedup.semanticDedup]]; this variant buys interpretable clusters
    * and a tunable k for the same pipeline slot. */
  def semanticDedupKMeans(df: DataFrame, idCol: String, embCol: String,
      k: Int, threshold: Double = 0.95, iters: Int = 10, seed: Long = 42L,
      maxClusterPairs: Long = 10000L): DataFrame = {
    // persist: the assignment scan (full-corpus argmin over k centroids)
    // feeds FOUR consumers below — shardCounts, the sharded pair build,
    // and both sides of the vector re-attach join; without it each one
    // re-ran the scan (r17 review — the same measured trap the LM
    // scorers' persisted tokenized frame closes, 11.4 s → 3.3 s there)
    val assigned = kMeans(df, idCol, embCol, k, iters, seed)
    val withVec = assigned.join(
      df.select(q(idCol).as(idCol), q(embCol).as("__v")), Seq(idCol))
      .persist()
    // shard oversized clusters: nshards = ceil(2n/cap) puts the expected
    // shard at cap/2 ids — hash imbalance past 2× expected is negligible
    // at cap ≥ 100s, so shards stay under bucketedPairs' hard cap
    val shardCounts = assigned.groupBy("cluster")
      .agg(ceil(count(lit(1)) * 2 / maxClusterPairs)
        .cast("int").as("__nshards"))
    val sharded = withVec
      .join(broadcast(shardCounts), Seq("cluster"))
      .withColumn("__shard", when(col("__nshards") <= 1, lit(0)).otherwise(
        pmod(xxhash64(col(idCol), lit(seed)), col("__nshards")).cast("int")))
    val cand = Dedup.bucketedPairs(
      sharded.select(col("cluster"), col("__shard"), col(idCol)),
      Seq("cluster", "__shard"), idCol, maxClusterPairs)
    val vecs = withVec.select(col(idCol), col("__v"))
    val pairs = cand
      .join(vecs.select(col(idCol).as("id_a"), col("__v").as("va")), "id_a")
      .join(vecs.select(col(idCol).as("id_b"), col("__v").as("vb")), "id_b")
      .withColumn("cosine", round(Similarity.cosine(col("va"), col("vb")), 4))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
      // eager and SMALL (bucketedPairs hard-caps the pair volume): the
      // checkpoint cuts the returned frame's lineage off withVec, so the
      // persisted input frees here instead of leaking for the session
      .localCheckpoint(true)
    withVec.unpersist(): Unit
    Dedup.dropNearDuplicates(df, idCol, pairs)
  }
}
