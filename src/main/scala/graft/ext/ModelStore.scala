package graft.ext

/** Persistence for the engine's trained TEXT-model artifacts — the
  * tokenizer/classifier half of the "train once, serve many" store family
  * ([[AnnIndex]] quantizers, [[DriftProfile]] references,
  * [[FingerprintStore]]/MinHash membership, HLL sketches). Both documents
  * are driver-side JSON via jackson: strings round-trip verbatim, doubles
  * bit-exactly (shortest-repr emit, exact parse), so a loaded artifact
  * serves IDENTICALLY to the in-memory one — asserted in-gate
  * (`model_store_roundtrip`) by re-encoding / re-scoring with the loaded
  * copy and comparing exactly. */
object ModelStore {

  private lazy val jackson = new com.fasterxml.jackson.databind.ObjectMapper()

  /** BPE merge table ([[BpeTrain.learnMerges]] output) — rank order IS the
    * merge priority, preserved as the array order. */
  def saveBpeMerges(merges: Seq[(String, String)], path: String): Unit = {
    val root = new java.util.LinkedHashMap[String, Any]()
    root.put("format", "graft-bpe-merges")
    root.put("version", 1)
    val l = new java.util.ArrayList[Any](merges.length)
    merges.foreach { case (a, b) =>
      val p = new java.util.ArrayList[Any](2)
      p.add(a); p.add(b); l.add(p)
    }
    root.put("merges", l)
    write(path, root)
  }

  def loadBpeMerges(path: String): Seq[(String, String)] = {
    val root = read(path, "graft-bpe-merges")
    root.get("merges") match {
      case l: java.util.List[_] => l.toArray.toSeq.map {
        case p: java.util.List[_] =>
          (String.valueOf(p.get(0)), String.valueOf(p.get(1)))
        case other => throw new IllegalArgumentException(
          s"merge entry is not a pair: $other")
      }
      case other => throw new IllegalArgumentException(
        s"expected merges array, got $other")
    }
  }

  /** Linear-classifier weight vector ([[ClassifierTrain.trainLogistic]]
    * output: dim feature weights + trailing bias). */
  def saveLinearWeights(weights: Array[Double], path: String): Unit = {
    val root = new java.util.LinkedHashMap[String, Any]()
    root.put("format", "graft-linear-weights")
    root.put("version", 1)
    root.put("dim", weights.length - 1)
    val l = new java.util.ArrayList[Any](weights.length)
    weights.foreach(w => l.add(w))
    root.put("weights", l)
    write(path, root)
  }

  def loadLinearWeights(path: String): Array[Double] = {
    val root = read(path, "graft-linear-weights")
    root.get("weights") match {
      case l: java.util.List[_] =>
        val a = new Array[Double](l.size())
        var i = 0
        while (i < a.length) {
          a(i) = l.get(i).asInstanceOf[java.lang.Number].doubleValue(); i += 1
        }
        a
      case other => throw new IllegalArgumentException(
        s"expected weights array, got $other")
    }
  }

  // Atomic tmp+move replace (r12): a truncate-in-place write would leave
  // a corrupt half-document if the process died mid-write over an
  // existing artifact. A single immutable KB document needs no
  // generation manifest — the atomic whole-document replace IS its
  // manifest flip (the same visibility contract the generational stores
  // get from manifest.json, collapsed to one file).
  private def write(path: String, root: java.util.Map[String, Any]): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    val tmp = (if (p.getParent != null) p.getParent else java.nio.file.Paths.get("."))
      .resolve("." + p.getFileName.toString + ".tmp")
    java.nio.file.Files.write(tmp,
      jackson.writerWithDefaultPrettyPrinter().writeValueAsString(root)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    try java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    catch {
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        java.nio.file.Files.move(tmp, p,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  private def read(path: String, format: String): java.util.Map[String, Any] = {
    val s = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8)
    val root = jackson.readValue(s, classOf[java.util.Map[String, Any]])
    val fmt = String.valueOf(root.get("format"))
    require(fmt == format, s"not a $format document (format=$fmt)")
    root
  }
}
