package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between a REFERENCE dataset (e.g. the
  * training snapshot a model was fit on) and a CURRENT dataset (today's
  * data) — the monitoring counterpart of schema validation: the schema can
  * hold while the distribution quietly walks away.
  *
  * Population Stability Index over reference-quantile bins — the standard
  * industry drift score (PSI < 0.1 stable, 0.1-0.25 moderate, > 0.25
  * drifted):
  *
  *   PSI = Σ_bins (cur% − ref%) · ln(cur% / ref%)
  *
  * Scale shape: bin edges are ONE aggregation on the reference (exact
  * interpolated percentiles by default — identical to SQL `quantile_cont`,
  * so the whole computation re-derives in any engine; `approximate = true`
  * switches to the `percentile_approx` sketch for 100 TB inputs), then
  * each side is ONE codegen'd aggregation binning rows against the edge
  * literals — two scans total, a `bins`-row join, nothing else. Empty bins
  * are floored at `eps` so the logarithm is defined (the standard PSI
  * smoothing).
  */
object Drift {

  private def q(n: String): Column = col("`" + n.replace("`", "``") + "`")

  /** Shared PSI tail: eps-floor the fractions, per-cell contribution,
    * 6-dp display rounding, and the total (a Window over the cell frame,
    * which is bins/categories-sized — never data-sized). */
  private def finalizePsi(joined: DataFrame, keyCol: String, eps: Double): DataFrame =
    joined
      .withColumn("ref_frac", greatest(coalesce(col("ref_frac"), lit(0.0)), lit(eps)))
      .withColumn("cur_frac", greatest(coalesce(col("cur_frac"), lit(0.0)), lit(eps)))
      .withColumn("psi_contrib", round(
        (col("cur_frac") - col("ref_frac")) * log(col("cur_frac") / col("ref_frac")), 6))
      .withColumn("ref_frac", round(col("ref_frac"), 6))
      .withColumn("cur_frac", round(col("cur_frac"), 6))
      .withColumn("psi_total", round(
        sum(col("psi_contrib")).over(org.apache.spark.sql.expressions.Window.partitionBy()), 6))
      .select(keyCol, "ref_frac", "cur_frac", "psi_contrib", "psi_total")

  /** Per-bin detail: (bin, ref_frac, cur_frac, psi_contrib) + the total in
    * every row (psi_total) — callers gate on `psi_total`, inspect bins to
    * see WHERE the drift sits. Edges are rounded to 6 decimals before
    * binning so engines that re-derive the cut agree bit-for-bit on
    * boundary rows. */
  def psi(reference: DataFrame, current: DataFrame, column: String,
      bins: Int = 10, eps: Double = 1e-6,
      approximate: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(bins >= 2, s"bins >= 2, got $bins")
    val percentages = (1 until bins).map(_.toDouble / bins)
    val pArr = array(percentages.map(lit): _*)
    val edgesCol =
      if (approximate) percentile_approx(q(column), pArr, lit(accuracy))
      else percentile(q(column), pArr)
    val edgesRow = reference.agg(edgesCol.cast("array<double>")).head()
    require(!edgesRow.isNullAt(0), s"psi: reference has no non-null '$column'")
    val edges = edgesRow.getSeq[Double](0).map(e => math.rint(e * 1e6) / 1e6)

    def binned(df: DataFrame, frac: String): DataFrame = {
      val bin = edges.foldLeft(lit(0))((acc, e) =>
        acc + when(q(column) > e, 1).otherwise(0))
      df.filter(q(column).isNotNull)
        .groupBy(bin.as("bin")).agg(count(lit(1)).as("n"))
        .withColumn(frac, col("n").cast("double") /
          sum(col("n")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
        .select(col("bin"), col(frac))
    }
    // the bins-row frames are tiny — the full outer join and the total
    // broadcast are driver-trivial at any corpus size
    val spark0 = reference.sparkSession
    import spark0.implicits._
    val allBins = (0 until bins).toDF("bin")
    finalizePsi(allBins
      .join(binned(reference, "ref_frac"), Seq("bin"), "left")
      .join(binned(current, "cur_frac"), Seq("bin"), "left"), "bin", eps)
  }

  /** PSI for a CATEGORICAL column: one cell per reference category, with
    * everything outside the `maxCategories` most frequent reference
    * categories (count desc, value asc — deterministic) collapsed into an
    * `__other__` cell. The cap is what keeps this sane on unbounded-
    * cardinality columns (user agents, URLs): the category table is one
    * TakeOrdered on the reference, then each side is one codegen'd
    * aggregation against the broadcast category set. Categories new in
    * `current` also land in `__other__` — appearing mass there IS the
    * drift signal. Null category is its own cell (`__null__`). */
  def psiCategorical(reference: DataFrame, current: DataFrame, column: String,
      maxCategories: Int = 100, eps: Double = 1e-6): DataFrame = {
    require(maxCategories >= 1, s"maxCategories >= 1, got $maxCategories")
    val cat = coalesce(q(column).cast("string"), lit("__null__"))
    val top = reference.groupBy(cat.as("cell")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("cell")).limit(maxCategories)
      .select("cell").collect().map(_.getString(0)).toSeq

    def fractions(df: DataFrame, frac: String): DataFrame = {
      val cell = when(cat.isin(top: _*), cat).otherwise(lit("__other__"))
      val counts = df.groupBy(cell.as("cell")).agg(count(lit(1)).as("n"))
      counts.withColumn(frac, col("n").cast("double") /
          sum(col("n")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
        .select(col("cell"), col(frac))
    }
    val spark0 = reference.sparkSession
    import spark0.implicits._
    // distinct: a LITERAL "__other__" category in the top-K would
    // otherwise appear twice and double-count psi_total (its real mass is
    // then conflated with the overflow cell — acceptable for a sentinel
    // chosen to be improbable, a duplicated row is not)
    val cells = (top :+ "__other__").distinct.toDF("cell")
    finalizePsi(cells
      .join(fractions(reference, "ref_frac"), Seq("cell"), "left")
      .join(fractions(current, "cur_frac"), Seq("cell"), "left"), "cell", eps)
  }
}
