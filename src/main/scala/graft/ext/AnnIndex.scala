package graft.ext

/** Persistable ANN index state: the trained quantizers (IVF coarse
  * centroids and/or PQ codebooks) plus the parameters that fix their
  * geometry. This is the "train once, serve many" half of the FAISS
  * deployment shape (cf. faiss `write_index`/`read_index`): at 100 TB you
  * train the quantizers on one bounded sample, materialize the corpus
  * codes ONCE ([[Similarity.encode]] → parquet), and every subsequent
  * query batch runs against the stored codes — re-training and re-encoding
  * per query batch (what the one-shot `*TopK` calls do) is pure waste at
  * serving time.
  *
  * Serialization is JSON via jackson (same dependency SchemaIO's JSON side
  * uses — it ships with Spark). Doubles round-trip exactly (jackson emits
  * shortest-repr doubles and parses them back bit-identically), so a
  * saved+loaded index produces HASH-IDENTICAL query results to the
  * in-memory one — gated by `sim_topk_ivfpq_persisted`.
  *
  * Kinds: `ivf` (coarse centroids only — cells store raw vectors, FAISS
  * IndexIVFFlat), `pq` (codebooks only, IndexPQ), `ivfpq` (centroids +
  * RESIDUAL codebooks, IndexIVFPQ).
  *
  * @param kind      "ivf" | "pq" | "ivfpq"
  * @param dim       embedding dimensionality the index was trained at
  * @param nCentroids coarse-cell count (0 for "pq")
  * @param m         PQ subspace count (0 for "ivf")
  * @param ksub      per-subspace codebook size (0 for "ivf")
  * @param seed      training seed (recorded for provenance/reproducibility)
  * @param centers   nCentroids × dim coarse centroids (empty for "pq")
  * @param codebooks m × ksub × dsub codebooks; for "ivfpq" these quantize
  *                  RESIDUALS (vector − assigned centroid), FAISS by_residual
  */
case class AnnIndex(
    kind: String,
    dim: Int,
    nCentroids: Int,
    m: Int,
    ksub: Int,
    seed: Long,
    centers: Array[Array[Double]],
    codebooks: Array[Array[Array[Double]]]) {

  require(Set("ivf", "pq", "ivfpq").contains(kind), s"unknown index kind '$kind'")
  require(dim > 0, "dim > 0")
  require(m == 0 || dim % m == 0, s"m=$m must divide dim=$dim")

  /** Subvector width per PQ subspace (0 when the index has no PQ half). */
  def dsub: Int = if (m > 0) dim / m else 0

  def toJson: String = {
    val root = new java.util.LinkedHashMap[String, Any]()
    root.put("format", "graft-ann-index")
    root.put("version", 1)
    root.put("kind", kind)
    root.put("dim", dim)
    root.put("n_centroids", nCentroids)
    root.put("m", m)
    root.put("ksub", ksub)
    root.put("seed", seed)
    def vec(v: Array[Double]): java.util.List[Any] = {
      val l = new java.util.ArrayList[Any](v.length)
      v.foreach(x => l.add(x))
      l
    }
    val cs = new java.util.ArrayList[Any](centers.length)
    centers.foreach(c => cs.add(vec(c)))
    root.put("centers", cs)
    val bs = new java.util.ArrayList[Any](codebooks.length)
    codebooks.foreach { book =>
      val b = new java.util.ArrayList[Any](book.length)
      book.foreach(c => b.add(vec(c)))
      bs.add(b)
    }
    root.put("codebooks", bs)
    AnnIndex.jackson.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Write the index as a single JSON document. Driver-side metadata IO —
    * the payload is O(nCentroids·dim + m·ksub·dsub) doubles (a few MB at
    * deployment params), never corpus-sized. */
  def save(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p,
      toJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}

object AnnIndex {
  private lazy val jackson = new com.fasterxml.jackson.databind.ObjectMapper()

  def fromJson(s: String): AnnIndex = {
    val root = jackson.readValue(s, classOf[java.util.Map[String, Any]])
    def num(k: String): Long = root.get(k) match {
      case n: java.lang.Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"AnnIndex: field '$k' is not numeric: $other")
    }
    val fmt = String.valueOf(root.get("format"))
    require(fmt == "graft-ann-index", s"not an AnnIndex document (format=$fmt)")
    def vec(o: Any): Array[Double] = o match {
      case l: java.util.List[_] =>
        val a = new Array[Double](l.size())
        var i = 0
        while (i < a.length) {
          a(i) = l.get(i).asInstanceOf[java.lang.Number].doubleValue(); i += 1
        }
        a
      case other => throw new IllegalArgumentException(s"expected array, got $other")
    }
    def mat(o: Any): Array[Array[Double]] = o match {
      case l: java.util.List[_] => l.toArray.map(vec)
      case other => throw new IllegalArgumentException(s"expected matrix, got $other")
    }
    val books = root.get("codebooks") match {
      case l: java.util.List[_] => l.toArray.map(mat)
      case other => throw new IllegalArgumentException(s"expected codebooks, got $other")
    }
    AnnIndex(
      kind = String.valueOf(root.get("kind")),
      dim = num("dim").toInt,
      nCentroids = num("n_centroids").toInt,
      m = num("m").toInt,
      ksub = num("ksub").toInt,
      seed = num("seed"),
      centers = mat(root.get("centers")),
      codebooks = books)
  }

  def load(path: String): AnnIndex =
    fromJson(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}
