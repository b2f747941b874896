package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tukey-fence (IQR) outlier handling — the robust univariate outlier rule
  * (Tukey 1977): a value is an outlier when it falls outside
  * [q1 − k·iqr, q3 + k·iqr], k = 1.5 classic / 3.0 "far out".
  *
  * Scale shape mirrors Sampling.keepTopFraction: the fences are ONE
  * aggregation (exact interpolated quartiles by default — `quantile_cont`
  * semantics, re-derivable in any engine; `approximate = true` opts into
  * the `percentile_approx` sketch at 100 TB), then flagging or dropping is
  * a pure codegen'd filter — one scan, no shuffle. Fences are rounded to
  * 6 decimals so re-derivations agree bit-for-bit on boundary rows. */
object Outliers {

  private def q(n: String): Column = col("`" + n.replace("`", "``") + "`")

  /** (lo, hi) Tukey fences for `column`. */
  def iqrFences(df: DataFrame, column: String, k: Double = 1.5,
      approximate: Boolean = false, accuracy: Int = 10000): (Double, Double) = {
    require(k >= 0, s"k >= 0, got $k")
    val ps = array(lit(0.25), lit(0.75))
    val qCol = if (approximate) percentile_approx(q(column), ps, lit(accuracy))
               else percentile(q(column), ps)
    val row = df.agg(qCol.cast("array<double>")).head()
    require(!row.isNullAt(0), s"iqrFences: no non-null values in '$column'")
    val Seq(q1, q3) = row.getSeq[Double](0).toSeq
    val iqr = q3 - q1
    (math.rint((q1 - k * iqr) * 1e6) / 1e6, math.rint((q3 + k * iqr) * 1e6) / 1e6)
  }

  /** Tukey fences for SEVERAL columns in ONE aggregation job (the
    * validator's fusion trick; cf. Drift.psiMulti): monitoring N columns
    * previously paid N quartile actions. Returns column → (lo, hi); feed
    * the tuples to flagOutliers/dropOutliers via their `fences` parameter
    * to add zero further jobs. */
  def iqrFencesMulti(df: DataFrame, columns: Seq[String], k: Double = 1.5,
      approximate: Boolean = false,
      accuracy: Int = 10000): Map[String, (Double, Double)] = {
    require(k >= 0, s"k >= 0, got $k")
    require(columns.nonEmpty, "iqrFencesMulti: no columns given")
    val ps = array(lit(0.25), lit(0.75))
    def qc(c: String) =
      (if (approximate) percentile_approx(q(c), ps, lit(accuracy))
       else percentile(q(c), ps)).cast("array<double>")
    val row = df.agg(qc(columns.head), columns.tail.map(qc): _*).head()
    columns.zipWithIndex.map { case (c, i) =>
      require(!row.isNullAt(i), s"iqrFencesMulti: no non-null values in '$c'")
      val Seq(q1, q3) = row.getSeq[Double](i).toSeq
      val iqr = q3 - q1
      c -> ((math.rint((q1 - k * iqr) * 1e6) / 1e6,
        math.rint((q3 + k * iqr) * 1e6) / 1e6))
    }.toMap
  }

  /** Median-absolute-deviation fences (the Hampel identifier — Hampel
    * 1974; Leys et al. 2013's recommended default over mean ± k·σ):
    *
    *   [med − k·c·MAD, med + k·c·MAD],  MAD = median(|x − med|),
    *   c = 1.4826 (≈ 1/Φ⁻¹(3/4), the consistency constant making MAD
    *   estimate σ under normality), k = 3.0 conventional.
    *
    * Where the IQR fence has a 25% breakdown point, MAD has 50% — the
    * fence a heavy-tailed quality metric (tokens/doc, bytes/doc) wants.
    * Cost: TWO aggregations (median, then median of absolute deviations
    * from the ROUNDED median — rounded first so both engines and both
    * steps agree bit-for-bit), each exact interpolated percentile by
    * default with the `percentile_approx` sketch opt-in at 100 TB.
    * Compose with [[flagOutliers]]/[[dropOutliers]] via their `fences`
    * parameter. */
  def madFences(df: DataFrame, column: String, k: Double = 3.0,
      approximate: Boolean = false, accuracy: Int = 10000): (Double, Double) = {
    require(k >= 0, s"k >= 0, got $k")
    def med(c: Column): Double = {
      val e = if (approximate)
        percentile_approx(c, lit(0.5), lit(accuracy)).cast("double")
      else percentile(c, lit(0.5))
      val row = df.agg(e).head()
      require(!row.isNullAt(0), s"madFences: no non-null values in '$column'")
      math.rint(row.getDouble(0) * 1e6) / 1e6
    }
    val m = med(q(column))
    val mad = med(abs(q(column) - lit(m)))
    val c = 1.4826
    (math.rint((m - k * c * mad) * 1e6) / 1e6,
      math.rint((m + k * c * mad) * 1e6) / 1e6)
  }

  /** Add a boolean `flagCol` marking outliers (null values are not
    * flagged — nullability is the schema's business, not the fence's).
    * Pass precomputed `fences` to reuse one quartile job across several
    * flag/drop calls on the same column. */
  def flagOutliers(df: DataFrame, column: String, k: Double = 1.5,
      flagCol: String = "is_outlier", approximate: Boolean = false,
      fences: Option[(Double, Double)] = None): DataFrame = {
    val (lo, hi) = fences.getOrElse(iqrFences(df, column, k, approximate))
    df.withColumn(flagCol,
      q(column).isNotNull && (q(column) < lo || q(column) > hi))
  }

  /** Keep only rows inside the fences (nulls pass through). */
  def dropOutliers(df: DataFrame, column: String, k: Double = 1.5,
      approximate: Boolean = false,
      fences: Option[(Double, Double)] = None): DataFrame = {
    val (lo, hi) = fences.getOrElse(iqrFences(df, column, k, approximate))
    df.filter(q(column).isNull || (q(column) >= lo && q(column) <= hi))
  }
}
