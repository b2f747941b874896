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
    * which is bins/categories-sized — never data-sized). `totalBy` keys the
    * total: empty for the single-column operators, `Seq("column")` for the
    * batch ones (one psi_total per analyzed column). */
  private def finalizePsi(joined: DataFrame, keyCols: Seq[String], eps: Double,
      totalBy: Seq[String] = Nil): DataFrame =
    joined
      .withColumn("ref_frac", greatest(coalesce(col("ref_frac"), lit(0.0)), lit(eps)))
      .withColumn("cur_frac", greatest(coalesce(col("cur_frac"), lit(0.0)), lit(eps)))
      .withColumn("psi_contrib", round(
        (col("cur_frac") - col("ref_frac")) * log(col("cur_frac") / col("ref_frac")), 6))
      .withColumn("ref_frac", round(col("ref_frac"), 6))
      .withColumn("cur_frac", round(col("cur_frac"), 6))
      .withColumn("psi_total", round(
        sum(col("psi_contrib")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(totalBy.map(col): _*)), 6))
      .select((keyCols ++ Seq("ref_frac", "cur_frac", "psi_contrib", "psi_total"))
        .map(col): _*)

  /** 6-dp HALF_UP edge rounding — the one rounding used by every numeric
    * grid operator. BigDecimal, not `math.rint(e * 1e6) / 1e6` (r17
    * review): the rint form silently stops rounding past 2^53/1e6 ≈
    * 9.0e9 — double integer overflow, and an epoch-micros column sits at
    * ~1.7e15 — and rint's half-even ties disagree with the half-away
    * semantics of Spark's round() and DuckDB's ROUND, breaking the
    * "engines that re-derive the cut agree bit-for-bit" contract exactly
    * at boundary rows. Non-finite values pass through (percentiles of a
    * column carrying ±Infinity). */
  private def round6(e: Double): Double =
    if (e.isNaN || e.isInfinite) e
    else BigDecimal(e).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** One reference aggregation → the interior `bins-1` quantile edges,
    * 6-dp rounded so profiles/oracles reproduce them exactly. Shared by
    * every numeric grid operator (psi/ks/wasserstein1/profile) so a
    * binning or rounding fix lands once (r9 review). */
  private def quantileEdges(reference: DataFrame, column: String, bins: Int,
      approximate: Boolean, accuracy: Int, opName: String): Seq[Double] = {
    val percentages = (1 until bins).map(_.toDouble / bins)
    val pArr = array(percentages.map(lit): _*)
    val edgesCol =
      if (approximate) percentile_approx(q(column), pArr, lit(accuracy))
      else percentile(q(column), pArr)
    val edgesRow = reference.agg(edgesCol.cast("array<double>")).head()
    require(!edgesRow.isNullAt(0), s"$opName: reference has no non-null '$column'")
    edgesRow.getSeq[Double](0).map(round6)
  }

  /** Every column's edges in ONE fused reference aggregation — the
    * multi-column twin of [[quantileEdges]] (r17 review: psiMulti and
    * ksMulti carried verbatim inline copies of this and of [[multiSide]],
    * re-opening the drift-apart risk quantileEdges was extracted to
    * close). */
  private def multiQuantileEdges(reference: DataFrame, columns: Seq[String],
      bins: Int, approximate: Boolean, accuracy: Int,
      opName: String): Seq[(String, Seq[Double])] = {
    val percentages = (1 until bins).map(_.toDouble / bins)
    val pArr = array(percentages.map(lit): _*)
    def edgesCol(c: String) =
      (if (approximate) percentile_approx(q(c), pArr, lit(accuracy))
       else percentile(q(c), pArr)).cast("array<double>")
    val edgesRow = reference.agg(edgesCol(columns.head),
      columns.tail.map(edgesCol): _*).head()
    columns.zipWithIndex.map { case (c, i) =>
      require(!edgesRow.isNullAt(i), s"$opName: reference has no non-null '$c'")
      c -> edgesRow.getSeq[Double](i).map(round6)
    }
  }

  /** Job-2 half shared by [[psiMulti]]/[[ksMulti]]: both sides' (column,
    * bin) cells counted in ONE pass over `reference UNION ALL current`
    * (each row explodes to its per-column cells, nulls excluded per
    * column), returned as a side-selector: `(sideName, fracAlias)` → the
    * (column, bin, frac) frame for that side. */
  private def multiSide(reference: DataFrame, current: DataFrame,
      edgesByCol: Seq[(String, Seq[Double])]): (String, String) => DataFrame = {
    def cells(df: DataFrame, side: String): DataFrame = {
      val entries = edgesByCol.map { case (c, edges) =>
        val bin = edges.foldLeft(lit(0))((acc, e) =>
          acc + when(q(c) > e, 1).otherwise(0))
        struct(lit(c).as("column"), bin.as("bin"), q(c).isNotNull.as("ok"))
      }
      df.select(lit(side).as("side"), explode(array(entries: _*)).as("e"))
        .filter(col("e.ok"))
        .select(col("side"), col("e.column").as("column"), col("e.bin").as("bin"))
    }
    val counts = cells(reference, "ref").unionAll(cells(current, "cur"))
      .groupBy("side", "column", "bin").agg(count(lit(1)).as("n"))
      .withColumn("frac", col("n").cast("double") /
        sum(col("n")).over(org.apache.spark.sql.expressions.Window
          .partitionBy("side", "column")))
    (s, frac) => counts.filter(col("side") === s)
      .select(col("column"), col("bin"), col("frac").as(frac))
  }

  /** Current-side bin fractions against a profile's literal edges, plus
    * the (bin, ref_frac) literal frame — the shared serve half of
    * [[psiAgainstProfile]]/[[ksAgainstProfile]] (r17 review: verbatim
    * duplicated). */
  private def profileJoin(current: DataFrame, column: String,
      edges: Seq[Double], refFracs: Seq[Double]): DataFrame = {
    val bins = refFracs.length
    require(bins >= 2, s"profile needs >= 2 bins, got $bins")
    require(edges.length == bins - 1,
      s"profile inconsistent: ${edges.length} edges for $bins bins")
    val bin = edges.foldLeft(lit(0))((acc, e) =>
      acc + when(q(column) > e, 1).otherwise(0))
    val cur = current.filter(q(column).isNotNull)
      .groupBy(bin.as("bin")).agg(count(lit(1)).as("n"))
      .withColumn("cur_frac", col("n").cast("double") /
        sum(col("n")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("bin"), col("cur_frac"))
    val spark0 = current.sparkSession
    import spark0.implicits._
    val allBins = refFracs.zipWithIndex.map { case (f, i) => (i, f) }
      .toDF("bin", "ref_frac")
    allBins.join(cur, Seq("bin"), "left")
  }

  /** Codegen'd edge-comparison bin assignment for one side: (bin, `frac`)
    * rows with per-side fractions; nulls excluded. */
  private def binnedFracs(df: DataFrame, column: String, edges: Seq[Double],
      frac: String): DataFrame = {
    val bin = edges.foldLeft(lit(0))((acc, e) =>
      acc + when(q(column) > e, 1).otherwise(0))
    df.filter(q(column).isNotNull)
      .groupBy(bin.as("bin")).agg(count(lit(1)).as("n"))
      .withColumn(frac, col("n").cast("double") /
        sum(col("n")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("bin"), col(frac))
  }

  /** Batch-side reference profile for
    * [[graft.streaming.StreamingValidation.windowedPsi]]: the interior
    * percentile bin edges (6-dp rounded, same convention as [[psi]]) and
    * the reference bin fractions. Two jobs, run ONCE when a monitor
    * starts; the profile then rides every micro-batch as plain literals —
    * no reference scan, no join per trigger. */
  def referenceNumericProfile(reference: DataFrame, column: String,
      bins: Int = 10, approximate: Boolean = false,
      accuracy: Int = 10000): (Seq[Double], Seq[Double]) = {
    require(bins >= 2, s"bins >= 2, got $bins")
    val edges = quantileEdges(reference, column, bins, approximate, accuracy,
      "referenceNumericProfile")
    val bin = edges.foldLeft(lit(0))((acc, e) =>
      acc + when(q(column) > e, 1).otherwise(0))
    val counts = reference.filter(q(column).isNotNull)
      .groupBy(bin.as("bin")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    val fracs = (0 until bins).map(i => counts.getOrElse(i, 0L) / total)
    (edges, fracs)
  }

  /** Per-bin detail: (bin, ref_frac, cur_frac, psi_contrib) + the total in
    * every row (psi_total) — callers gate on `psi_total`, inspect bins to
    * see WHERE the drift sits. Edges are rounded to 6 decimals before
    * binning so engines that re-derive the cut agree bit-for-bit on
    * boundary rows. */
  def psi(reference: DataFrame, current: DataFrame, column: String,
      bins: Int = 10, eps: Double = 1e-6,
      approximate: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(bins >= 2, s"bins >= 2, got $bins")
    val edges = quantileEdges(reference, column, bins, approximate, accuracy, "psi")
    // the bins-row frames are tiny — the full outer join and the total
    // broadcast are driver-trivial at any corpus size
    val spark0 = reference.sparkSession
    import spark0.implicits._
    val allBins = (0 until bins).toDF("bin")
    finalizePsi(allBins
      .join(binnedFracs(reference, column, edges, "ref_frac"), Seq("bin"), "left")
      .join(binnedFracs(current, column, edges, "cur_frac"), Seq("bin"), "left"),
      Seq("bin"), eps)
  }

  /** Batch numeric PSI over several columns in TWO jobs total (r5/r6
    * verdict: the per-call `psi` issues its reference-percentile action
    * eagerly, so monitoring N columns paid 3·N jobs): job 1 computes every
    * column's bin edges in ONE fused reference aggregation (the validator's
    * fusion trick); job 2 bins BOTH sides of every column in ONE pass over
    * `reference UNION ALL current` — each row explodes to its (column, bin)
    * cells, nulls excluded per column, and one aggregation counts all
    * (side, column, bin) cells. Output = `psi`'s schema plus a leading
    * `column` key; psi_total is per column. */
  def psiMulti(reference: DataFrame, current: DataFrame, columns: Seq[String],
      bins: Int = 10, eps: Double = 1e-6,
      approximate: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(bins >= 2, s"bins >= 2, got $bins")
    require(columns.nonEmpty, "psiMulti: no columns given")
    // job 1: one fused aggregation → every column's edge array;
    // job 2: one union pass counting both sides' (column, bin) cells
    val edgesByCol =
      multiQuantileEdges(reference, columns, bins, approximate, accuracy,
        "psiMulti")
    val side = multiSide(reference, current, edgesByCol)
    val spark0 = reference.sparkSession
    import spark0.implicits._
    val allCells = columns.flatMap(c => (0 until bins).map(b => (c, b)))
      .toDF("column", "bin")
    finalizePsi(allCells
      .join(side("ref", "ref_frac"), Seq("column", "bin"), "left")
      .join(side("cur", "cur_frac"), Seq("column", "bin"), "left"),
      Seq("column", "bin"), eps, totalBy = Seq("column"))
  }

  /** Reference profile for a categorical column, for the streaming
    * windowed-PSI monitor ([[graft.streaming.StreamingValidation
    * .windowedPsiCategorical]]): the top-`maxCategories` categories
    * (count desc, value asc — the same deterministic order
    * [[psiCategorical]] uses) and the reference fraction of each, with the
    * trailing entry the `__other__` overflow mass. Null is its own
    * `__null__` category. ONE job; the collect is ≤ maxCategories+1
    * cells. */
  def referenceCategoricalProfile(reference: DataFrame, column: String,
      maxCategories: Int = 100): (Seq[String], Seq[Double]) = {
    require(maxCategories >= 1, s"maxCategories >= 1, got $maxCategories")
    val cat = coalesce(q(column).cast("string"), lit("__null__"))
    // sentinel-collision counters ride the same grouped scan: a REAL
    // (non-null) string value "__null__" would silently merge with the
    // null category's mass (r17 advice — the sibling "__other__" check
    // below only looked at the TOP cells; a literal "__other__" outside
    // the top-K merged with the overflow mass just as silently)
    val counted = reference.groupBy(cat.as("cell")).agg(
      count(lit(1)).as("n"),
      count(when(q(column).isNotNull &&
        q(column).cast("string") === "__null__", 1)).as("n_lit_null"))
    // top-K and the grand total in ONE aggregation over the grouped
    // cells — the k-heap folds map-side, the collect is capped at
    // maxCategories no matter the column's cardinality. (r17 review: a
    // separate reference.count() was a second FULL reference scan per
    // profiled column — the doc said "ONE job" and the code paid two;
    // counts ride as exact doubles, fine to 2^53.)
    val row = counted.agg(
      graft.functions.TopKByScore.of(col("n").cast("double"), col("cell"),
        maxCategories).as("top"),
      sum(col("n")).as("total"),
      sum(col("n_lit_null")).as("lit_null"),
      sum(when(col("cell") === "__other__", col("n")).otherwise(0L))
        .as("lit_other")).head()
    require(!row.isNullAt(1), "referenceCategoricalProfile: reference is empty")
    val top = row.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(1) -> r.getDouble(0))
    val total = row.getLong(1).toDouble
    // fail at FIT time, where it is fixable (r17 review: the serve-side
    // monitors — psiCategoricalAgainstProfile and the windowed monitor —
    // refuse profiles whose cells contain the overflow sentinel, so a
    // profile that fit and saved successfully was permanently unusable)
    require(row.getLong(3) == 0L,
      "referenceCategoricalProfile: the reference holds the literal " +
        "string \"__other__\", which collides with the overflow sentinel " +
        "cell — rename that value upstream")
    require(row.getLong(2) == 0L,
      "referenceCategoricalProfile: the reference holds the literal " +
        "string \"__null__\" as a real (non-null) value, which collides " +
        "with the null-category sentinel cell — rename that value upstream")
    val otherMass = (total - top.map(_._2).sum) / total
    (top.map(_._1).toSeq, top.map(_._2 / total).toSeq :+ otherMass)
  }

  /** PSI for a CATEGORICAL column: one cell per reference category, with
    * everything outside the `maxCategories` most frequent reference
    * categories (count desc, value asc — deterministic) collapsed into an
    * `__other__` cell. The cap is what keeps this sane on unbounded-
    * cardinality columns (user agents, URLs): the category table is one
    * TakeOrdered on the reference, then each side is one codegen'd
    * aggregation against the broadcast category set. Categories new in
    * `current` also land in `__other__` — appearing mass there IS the
    * drift signal. Null category is its own cell (`__null__`).
    *
    * Sentinel caveat: a column whose REAL string values include the literal
    * `"__null__"` (or `"__other__"`) conflates that value's mass with the
    * sentinel cell — the fractions stay a valid partition of the data (no
    * double counting, psi_total is still well-defined), but the two sources
    * are indistinguishable in the per-cell report. Rename such values
    * upstream if the distinction matters. */
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
      .join(fractions(current, "cur_frac"), Seq("cell"), "left"), Seq("cell"), eps)
  }

  /** Batch categorical PSI over several columns in TWO jobs total
    * (cf. [[psiMulti]]): job 1 derives every column's top-`maxCategories`
    * reference category table in ONE aggregation — rows explode to
    * (column, cell) pairs, one count aggregation, then a per-column k-heap
    * (graft.functions.TopKByScore on count desc, cell asc) instead of N
    * TakeOrdered actions; job 2 counts both sides' cells in one pass over
    * `reference UNION ALL current`. Same `__other__` / `__null__` sentinel
    * semantics as [[psiCategorical]]. */
  def psiCategoricalMulti(reference: DataFrame, current: DataFrame,
      columns: Seq[String], maxCategories: Int = 100,
      eps: Double = 1e-6): DataFrame = {
    require(maxCategories >= 1, s"maxCategories >= 1, got $maxCategories")
    require(columns.nonEmpty, "psiCategoricalMulti: no columns given")
    def catCells(df: DataFrame): DataFrame =
      df.select(explode(array(columns.map(c => struct(lit(c).as("column"),
        coalesce(q(c).cast("string"), lit("__null__")).as("cell"))): _*)).as("e"))
        .select(col("e.column").as("column"), col("e.cell").as("cell"))
    // job 1: per-column top-K categories via the map-side k-heap — the
    // heap key mirrors (count desc, value asc): primary score n, ties
    // broken by the item ordering inside the heap is ascending on the
    // payload, so pack the cell itself as the payload
    val topByCol: Map[String, Seq[String]] = catCells(reference)
      .groupBy("column", "cell").agg(count(lit(1)).as("n"))
      .groupBy("column")
      .agg(graft.functions.TopKByScore.of(col("n").cast("double"), col("cell"),
        maxCategories).as("tk"))
      .select(col("column"), col("tk.item").as("cells"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    columns.foreach(c => require(topByCol.contains(c),
      s"psiCategoricalMulti: reference has no rows for '$c'"))

    // job 2: one pass over both sides; the per-column top-K membership is
    // one chained literal predicate (≤ columns × maxCategories literals),
    // so the collapse to __other__ stays a single codegen'd expression —
    // no per-column re-scan
    val inTop = columns.map(c =>
      col("column") === c && col("cell").isin(topByCol(c): _*)).reduce(_ || _)
    val collapsed = catCells(reference).withColumn("side", lit("ref"))
      .unionAll(catCells(current).withColumn("side", lit("cur")))
      .withColumn("cell", when(inTop, col("cell")).otherwise(lit("__other__")))
      .groupBy("side", "column", "cell").agg(count(lit(1)).as("n"))
      .withColumn("frac", col("n").cast("double") /
        sum(col("n")).over(org.apache.spark.sql.expressions.Window
          .partitionBy("side", "column")))
    def side(s: String, frac: String): DataFrame =
      collapsed.filter(col("side") === s)
        .select(col("column"), col("cell"), col("frac").as(frac))

    val spark0 = reference.sparkSession
    import spark0.implicits._
    val allCells = columns.flatMap(c =>
      (topByCol(c) :+ "__other__").distinct.map(cell => (c, cell)))
      .toDF("column", "cell")
    finalizePsi(allCells
      .join(side("ref", "ref_frac"), Seq("column", "cell"), "left")
      .join(side("cur", "cur_frac"), Seq("column", "cell"), "left"),
      Seq("column", "cell"), eps, totalBy = Seq("column"))
  }

  /** Grid Kolmogorov–Smirnov drift statistic: the maximum gap between the
    * two empirical CDFs, evaluated at the reference's `bins`-quantile
    * edges — KS's sup over the full real line needs a global sort of both
    * datasets (the classic two-sample test is O(n log n) and single-node
    * in every stats package), which is exactly the plan you can't run at
    * 100 TB. Evaluating at the quantile grid keeps the same two-scan shape
    * as [[psi]] (edges = one reference aggregation; both sides binned by
    * codegen'd edge comparisons) and under-estimates true KS by at most
    * the reference mass of one bin (≈ 1/bins) — raise `bins` for a finer
    * grid at unchanged plan shape.
    *
    * Output: per-bin rows (bin, ref_cum, cur_cum, gap) + `ks_stat` (the
    * max gap) repeated on every row, all 6-dp rounded; the cumulative and
    * max windows run over the `bins`-row cell frame, never the data. */
  def ks(reference: DataFrame, current: DataFrame, column: String,
      bins: Int = 20, approximate: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(bins >= 2, s"bins >= 2, got $bins")
    val edges = quantileEdges(reference, column, bins, approximate, accuracy, "ks")
    val spark0 = reference.sparkSession
    import spark0.implicits._
    val allBins = (0 until bins).toDF("bin")
    finalizeKs(allBins
      .join(binnedFracs(reference, column, edges, "ref_frac"), Seq("bin"), "left")
      .join(binnedFracs(current, column, edges, "cur_frac"), Seq("bin"), "left"))
  }

  /** Shared KS tail (cf. [[finalizePsi]]): cumulative CDFs over the
    * bin-ordered cell frame, per-key max gap, 6-dp display rounding. The
    * windows run over bins (× columns) rows — never the data. */
  private def finalizeKs(joined: DataFrame,
      totalBy: Seq[String] = Nil): DataFrame = {
    val keys = totalBy.map(col)
    val cum = org.apache.spark.sql.expressions.Window.partitionBy(keys: _*)
      .orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    joined
      .withColumn("ref_cum", sum(coalesce(col("ref_frac"), lit(0.0))).over(cum))
      .withColumn("cur_cum", sum(coalesce(col("cur_frac"), lit(0.0))).over(cum))
      .withColumn("gap", abs(col("ref_cum") - col("cur_cum")))
      .withColumn("ks_stat", round(
        max(col("gap")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(keys: _*)), 6))
      .select(keys ++ Seq(col("bin"), round(col("ref_cum"), 6).as("ref_cum"),
        round(col("cur_cum"), 6).as("cur_cum"),
        round(col("gap"), 6).as("gap"), col("ks_stat")): _*)
  }

  /** Grid Wasserstein-1 (earth-mover) drift — the third face of the drift
    * family: PSI weighs log-ratio divergence per bin, KS takes the max
    * CDF gap, W1 integrates the gap over the VALUE AXIS, so it reads in
    * the column's own units ("the distributions are ~$120 of
    * extendedprice apart") and grows with how FAR mass moved, not just
    * how much. Same two-scan plan as [[ks]]: reference quantile edges in
    * one aggregation, both sides binned by codegen'd edge comparisons;
    * the integral is the left-endpoint rule over the interior edge gaps
    *
    *   W1 ≈ Σ_{b=0}^{bins-3} |refCum_b − curCum_b| · (e_{b+2} − e_{b+1})
    *
    * which ignores mass displacement beyond the reference's outer
    * quantiles (the grid estimate, like grid-KS's 1/bins
    * under-estimate — raise `bins` for finer resolution at unchanged
    * plan shape). Output: per-bin rows (bin, ref_cum, cur_cum, gap,
    * width) + `w1_stat` repeated on every row, display-rounded; all
    * windows run over the bins-row cell frame, never the data. */
  def wasserstein1(reference: DataFrame, current: DataFrame, column: String,
      bins: Int = 20, approximate: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(bins >= 3, s"bins >= 3, got $bins")
    val edges = quantileEdges(reference, column, bins, approximate, accuracy,
      "wasserstein1")
    val spark0 = reference.sparkSession
    import spark0.implicits._
    // interior edge gap to the RIGHT of each bin's cum point: the cum at
    // bin b is F(e_{b+1}), integrated over [e_{b+1}, e_{b+2}]
    val widthDf = (0 until bins).map { b =>
      (b, if (b <= bins - 3) edges(b + 1) - edges(b) else 0.0)
    }.toDF("bin", "width")
    val cumW = org.apache.spark.sql.expressions.Window.orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val whole = org.apache.spark.sql.expressions.Window.partitionBy()
    (0 until bins).toDF("bin")
      .join(binnedFracs(reference, column, edges, "ref_frac"), Seq("bin"), "left")
      .join(binnedFracs(current, column, edges, "cur_frac"), Seq("bin"), "left")
      .join(widthDf, Seq("bin"))
      .withColumn("ref_cum", sum(coalesce(col("ref_frac"), lit(0.0))).over(cumW))
      .withColumn("cur_cum", sum(coalesce(col("cur_frac"), lit(0.0))).over(cumW))
      .withColumn("gap", abs(col("ref_cum") - col("cur_cum")))
      .withColumn("w1_stat", round(sum(col("gap") * col("width")).over(whole), 4))
      .select(col("bin"), round(col("ref_cum"), 6).as("ref_cum"),
        round(col("cur_cum"), 6).as("cur_cum"), round(col("gap"), 6).as("gap"),
        round(col("width"), 6).as("width"), col("w1_stat"))
  }

  /** Batch grid-KS over several columns in TWO jobs total — the same
    * fusion as [[psiMulti]] (job 1: every column's quantile edges in one
    * reference aggregation; job 2: both sides' (column, bin) cells in one
    * union pass) with [[ks]]'s cumulative-gap tail per column. Output =
    * [[ks]]'s schema plus a leading `column` key; ks_stat is per column. */
  def ksMulti(reference: DataFrame, current: DataFrame, columns: Seq[String],
      bins: Int = 20, approximate: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(bins >= 2, s"bins >= 2, got $bins")
    require(columns.nonEmpty, "ksMulti: no columns given")
    val edgesByCol =
      multiQuantileEdges(reference, columns, bins, approximate, accuracy,
        "ksMulti")
    val side = multiSide(reference, current, edgesByCol)
    val spark0 = reference.sparkSession
    import spark0.implicits._
    val allCells = columns.flatMap(c => (0 until bins).map(b => (c, b)))
      .toDF("column", "bin")
    finalizeKs(allCells
      .join(side("ref", "ref_frac"), Seq("column", "bin"), "left")
      .join(side("cur", "cur_frac"), Seq("column", "bin"), "left"),
      totalBy = Seq("column"))
  }

  /** Numeric PSI of a batch against a STORED reference profile
    * ([[referenceNumericProfile]] / [[DriftProfile]]): bins the current
    * side in one pass; the reference fractions ride as literals — the
    * reference corpus is never re-read (the batch sibling of
    * [[graft.streaming.StreamingValidation.windowedPsi]], and the serve
    * half of the profile-persistence deployment shape: profile a 100 TB
    * reference ONCE, monitor every subsequent crawl batch against the
    * saved document). Output and arithmetic are identical to [[psi]] run
    * with the profile's reference — gated hash-identical. */
  def psiAgainstProfile(current: DataFrame, column: String,
      edges: Seq[Double], refFracs: Seq[Double],
      eps: Double = 1e-6): DataFrame =
    finalizePsi(profileJoin(current, column, edges, refFracs),
      Seq("bin"), eps)

  /** Grid-KS against a stored profile ([[referenceNumericProfile]] /
    * [[DriftProfile]]) — the KS sibling of [[psiAgainstProfile]]: the
    * reference CDF rides as literals from the saved document (exact
    * double round-trip), so monitoring a batch costs ONE scan of the
    * batch and never re-reads the 100 TB reference. Hash-identical to
    * the two-sided [[ks]] on the same reference by construction (the
    * profile's fracs are the same exact count/total doubles `ks` bins). */
  def ksAgainstProfile(current: DataFrame, column: String,
      edges: Seq[Double], refFracs: Seq[Double]): DataFrame =
    finalizeKs(profileJoin(current, column, edges, refFracs))

  /** Categorical PSI against a stored profile
    * ([[referenceCategoricalProfile]] / [[DriftProfile]]): `cells` are the
    * reference top-K categories, `refFracs` one fraction per cell PLUS the
    * trailing `__other__` mass. Same semantics as [[psiCategorical]] with
    * the reference side replaced by literals. */
  def psiCategoricalAgainstProfile(current: DataFrame, column: String,
      cells: Seq[String], refFracs: Seq[Double],
      eps: Double = 1e-6): DataFrame = {
    require(cells.nonEmpty, "profile has no cells")
    require(cells.distinct.size == cells.size, "profile cells must be distinct")
    require(!cells.contains("__other__"),
      "__other__ is the reserved overflow cell — not a profile category")
    require(refFracs.length == cells.length + 1,
      s"profile inconsistent: ${refFracs.length} fracs for ${cells.length} cells + __other__")
    val cat = coalesce(q(column).cast("string"), lit("__null__"))
    val cellCol = when(cat.isin(cells: _*), cat).otherwise(lit("__other__"))
    val cur = current.groupBy(cellCol.as("cell")).agg(count(lit(1)).as("n"))
      .withColumn("cur_frac", col("n").cast("double") /
        sum(col("n")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("cell"), col("cur_frac"))
    val spark0 = current.sparkSession
    import spark0.implicits._
    val all = ((cells :+ "__other__") zip refFracs).toDF("cell", "ref_frac")
    finalizePsi(all.join(cur, Seq("cell"), "left"), Seq("cell"), eps)
  }
}
