package graft.ext

/** Deterministic driver-local k-means for ANN codebook / coarse-quantizer
  * training (the FAISS shape: quantizers train on a small bounded sample,
  * never the corpus — centroid quality saturates at ~O(100) points per
  * centroid, so the sample size is a constant while the corpus grows to
  * 100 TB). Seeded k-means++ init + Lloyd's iterations; same inputs, same
  * seed → bit-identical centroids, which keeps the driver's oracle gates
  * hash-stable.
  *
  * Replaces per-subspace Spark ML KMeans fits on sampled data: at bench
  * scale each tiny ML fit paid ~8 scheduler-bound Spark jobs (m=8 subspaces
  * → ~60 jobs dominated `sim_topk_pq`); locally the same centroids cost
  * milliseconds and zero jobs. At 100 TB nothing changes — the sample is
  * the same bounded collect either way.
  */
private[ext] object LocalKMeans {

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Fit k centroids. If the data has fewer than k points, the trailing
    * centroids duplicate the last fitted one (nearest-centroid ties resolve
    * to the first index, so duplicates are inert). */
  def fit(data: Array[Array[Double]], k: Int, seed: Long,
      maxIter: Int = 25, tol: Double = 1e-8): Array[Array[Double]] = {
    require(data.nonEmpty, "LocalKMeans.fit: empty training data")
    require(k >= 1, "k >= 1")
    val n = data.length
    val d = data(0).length
    val kk = math.min(k, n)
    val rng = new java.util.Random(seed)

    // k-means++ seeding: next center sampled proportional to D² to the
    // nearest already-chosen center
    val centers = Array.ofDim[Array[Double]](kk)
    centers(0) = data(rng.nextInt(n)).clone()
    val d2 = Array.fill(n)(Double.MaxValue)
    var c = 0
    while (c + 1 < kk) {
      var i = 0
      while (i < n) {
        val dist = sqDist(data(i), centers(c))
        if (dist < d2(i)) d2(i) = dist
        i += 1
      }
      var sum = 0.0
      i = 0
      while (i < n) { sum += d2(i); i += 1 }
      if (sum <= 0) centers(c + 1) = data(rng.nextInt(n)).clone()
      else {
        var r = rng.nextDouble() * sum
        var j = 0
        while (j < n - 1 && r > d2(j)) { r -= d2(j); j += 1 }
        centers(c + 1) = data(j).clone()
      }
      c += 1
    }

    // Lloyd's until centroid movement < tol or maxIter
    val assign = new Array[Int](n)
    var it = 0
    var moved = true
    while (it < maxIter && moved) {
      var i = 0
      while (i < n) {
        var best = 0
        var bd = Double.MaxValue
        var j = 0
        while (j < kk) {
          val dist = sqDist(data(i), centers(j))
          if (dist < bd) { bd = dist; best = j }
          j += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.fill(kk)(new Array[Double](d))
      val counts = new Array[Int](kk)
      i = 0
      while (i < n) {
        val a = assign(i)
        counts(a) += 1
        val row = data(i)
        val s = sums(a)
        var t = 0
        while (t < d) { s(t) += row(t); t += 1 }
        i += 1
      }
      moved = false
      var j = 0
      while (j < kk) {
        if (counts(j) > 0) {
          var delta = 0.0
          var t = 0
          while (t < d) {
            val nv = sums(j)(t) / counts(j)
            val df = nv - centers(j)(t)
            delta += df * df
            centers(j)(t) = nv
            t += 1
          }
          if (delta > tol) moved = true
        } // empty cluster: keep its center (deterministic)
        j += 1
      }
      it += 1
    }
    if (kk == k) centers
    else centers ++ Array.fill(k - kk)(centers(kk - 1).clone())
  }
}
