package graft.ext

import org.apache.spark.sql.DataFrame

/** Persistable drift-reference profile: per-column numeric quantile-bin
  * profiles (edges + reference bin fractions) and categorical top-K
  * profiles (cells + fractions incl. the `__other__` mass) as one JSON
  * document — the drift counterpart of [[AnnIndex]]'s "train once, serve
  * many" deployment shape. Profile the reference corpus ONCE (a 100 TB
  * scan), save the document (a few KB), and every subsequent crawl batch /
  * monitoring window is scored against the stored profile with
  * [[Drift.psiAgainstProfile]] / [[Drift.psiCategoricalAgainstProfile]] /
  * [[graft.streaming.StreamingValidation.windowedPsi]] — the reference is
  * never re-read.
  *
  * Serialization is jackson JSON like [[AnnIndex]]: doubles round-trip
  * exactly (shortest-repr emit, bit-identical parse), so a saved+loaded
  * profile serves HASH-IDENTICAL psi results to the in-memory one — gated
  * by `drift_psi_profile` / `drift_psi_cat_profile`. */
case class DriftProfile(
    numeric: Seq[DriftProfile.NumericColumn],
    categorical: Seq[DriftProfile.CategoricalColumn]) {

  def numericFor(column: String): DriftProfile.NumericColumn =
    numeric.find(_.column == column).getOrElse(throw new IllegalArgumentException(
      s"profile has no numeric column '$column' (has: ${numeric.map(_.column).mkString(", ")})"))

  def categoricalFor(column: String): DriftProfile.CategoricalColumn =
    categorical.find(_.column == column).getOrElse(throw new IllegalArgumentException(
      s"profile has no categorical column '$column' (has: ${categorical.map(_.column).mkString(", ")})"))

  def toJson: String = {
    val root = new java.util.LinkedHashMap[String, Any]()
    root.put("format", "graft-drift-profile")
    root.put("version", 1)
    def dlist(v: Seq[Double]): java.util.List[Any] = {
      val l = new java.util.ArrayList[Any](v.length)
      v.foreach(x => l.add(x))
      l
    }
    val nums = new java.util.ArrayList[Any](numeric.length)
    numeric.foreach { n =>
      val m = new java.util.LinkedHashMap[String, Any]()
      m.put("column", n.column)
      m.put("edges", dlist(n.edges))
      m.put("fracs", dlist(n.fracs))
      nums.add(m)
    }
    root.put("numeric", nums)
    val cats = new java.util.ArrayList[Any](categorical.length)
    categorical.foreach { c =>
      val m = new java.util.LinkedHashMap[String, Any]()
      m.put("column", c.column)
      val cl = new java.util.ArrayList[Any](c.cells.length)
      c.cells.foreach(cl.add)
      m.put("cells", cl)
      m.put("fracs", dlist(c.fracs))
      cats.add(m)
    }
    root.put("categorical", cats)
    DriftProfile.jackson.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def save(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p,
      toJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}

object DriftProfile {

  /** (edges are the bins−1 interior quantile cuts, 6-dp rounded like
    * [[Drift.psi]]; fracs has one entry per bin). */
  case class NumericColumn(column: String, edges: Seq[Double], fracs: Seq[Double]) {
    require(fracs.length == edges.length + 1,
      s"$column: ${fracs.length} fracs for ${edges.length} edges")
  }

  /** (cells are the reference top-K categories; fracs has one entry per
    * cell plus the trailing `__other__` mass). */
  case class CategoricalColumn(column: String, cells: Seq[String], fracs: Seq[Double]) {
    require(fracs.length == cells.length + 1,
      s"$column: ${fracs.length} fracs for ${cells.length} cells + __other__")
  }

  private lazy val jackson = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Profile a reference DataFrame: 2 jobs per numeric column
    * ([[Drift.referenceNumericProfile]]) + 2-3 per categorical
    * ([[Drift.referenceCategoricalProfile]]) — a ONE-TIME cost when the
    * monitor is (re)baselined, amortized over every batch served. */
  def fit(reference: DataFrame,
      numericCols: Seq[String] = Nil, bins: Int = 10,
      categoricalCols: Seq[String] = Nil, maxCategories: Int = 100,
      approximate: Boolean = false, accuracy: Int = 10000): DriftProfile = {
    require(numericCols.nonEmpty || categoricalCols.nonEmpty,
      "fit: no columns given")
    val nums = numericCols.map { c =>
      val (edges, fracs) = Drift.referenceNumericProfile(
        reference, c, bins, approximate, accuracy)
      NumericColumn(c, edges, fracs)
    }
    val cats = categoricalCols.map { c =>
      val (cells, fracs) = Drift.referenceCategoricalProfile(
        reference, c, maxCategories)
      CategoricalColumn(c, cells, fracs)
    }
    DriftProfile(nums, cats)
  }

  def fromJson(s: String): DriftProfile = {
    val root = jackson.readValue(s, classOf[java.util.Map[String, Any]])
    val fmt = String.valueOf(root.get("format"))
    require(fmt == "graft-drift-profile",
      s"not a DriftProfile document (format=$fmt)")
    def dlist(o: Any): Seq[Double] = o match {
      case l: java.util.List[_] =>
        l.toArray.toSeq.map(_.asInstanceOf[java.lang.Number].doubleValue())
      case other => throw new IllegalArgumentException(s"expected array, got $other")
    }
    def slist(o: Any): Seq[String] = o match {
      case l: java.util.List[_] => l.toArray.toSeq.map(String.valueOf)
      case other => throw new IllegalArgumentException(s"expected array, got $other")
    }
    def entries(o: Any): Seq[java.util.Map[String, Any]] = o match {
      case null => Nil
      case l: java.util.List[_] =>
        l.toArray.toSeq.map(_.asInstanceOf[java.util.Map[String, Any]])
      case other => throw new IllegalArgumentException(s"expected list, got $other")
    }
    DriftProfile(
      numeric = entries(root.get("numeric")).map(m => NumericColumn(
        String.valueOf(m.get("column")), dlist(m.get("edges")), dlist(m.get("fracs")))),
      categorical = entries(root.get("categorical")).map(m => CategoricalColumn(
        String.valueOf(m.get("column")), slist(m.get("cells")), dlist(m.get("fracs")))))
  }

  def load(path: String): DriftProfile =
    fromJson(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}
