package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A named, serializable validation predicate.
  *
  * Reference model: pandera/api/checks.py:18-222 — a Check carries a name,
  * serializable `statistics`, and modifiers (ignore_na, raise_warning,
  * n_failure_cases, element_wise). On Spark every vectorized check compiles
  * to a Catalyst `Column` so that ALL row-level checks of a schema fuse into
  * ONE aggregate pass (see graft.backend.Validator), instead of the
  * reference's one-Spark-action-per-check
  * (pandera/backends/pyspark/builtin_checks.py:48-49).
  */
sealed trait Check {
  def name: String
  def statistics: Map[String, Any]
  def ignoreNa: Boolean
  def raiseWarning: Boolean
  def nFailureCases: Int
  def error: Option[String]
  def described: String = error.getOrElse {
    if (statistics.isEmpty) name
    else s"$name(${statistics.toSeq.sortBy(_._1).map(_._2).mkString(", ")})"
  }
}

/** Row-level check on a single column. `cond` maps the column to a boolean
  * pass-condition. Null handling follows the reference's ignore_na semantics
  * (pandera/backends/pandas/checks.py:83-118): with ignoreNa, nulls pass.
  */
final case class ColumnCheck(
    name: String,
    cond: Column => Column,
    statistics: Map[String, Any] = Map.empty,
    ignoreNa: Boolean = true,
    raiseWarning: Boolean = false,
    nFailureCases: Int = Check.DefaultNFailureCases,
    error: Option[String] = None)
    extends Check {
  /** Per-row failure predicate for column `c`. */
  def failCond(c: Column): Column =
    if (ignoreNa) c.isNotNull && !coalesce(cond(c), lit(false))
    else !coalesce(cond(c), lit(false))
}

/** Row-level check over the whole row (table-level "wide" check, the
  * reference's dataframe-level Check / @dataframe_check). `cond` sees the
  * DataFrame only to reference its columns; it must return a row predicate.
  */
final case class WideCheck(
    name: String,
    cond: DataFrame => Column,
    statistics: Map[String, Any] = Map.empty,
    ignoreNa: Boolean = true,
    raiseWarning: Boolean = false,
    nFailureCases: Int = Check.DefaultNFailureCases,
    error: Option[String] = None)
    extends Check {
  def failCond(df: DataFrame): Column =
    if (ignoreNa) !coalesce(cond(df), lit(true))
    else !coalesce(cond(df), lit(false))
}

/** Outcome of an aggregate-class check. */
final case class AggOutcome(passed: Boolean, observed: String,
                            failureCases: Seq[String] = Nil)

/** A check whose semantics need their own aggregation job (set equality,
  * groupby comparisons, hypothesis tests). `eval` receives the validated
  * DataFrame and the column under check (None for table-level).
  * These cannot ride the fused row-level pass; the Validator runs each as a
  * separate (still single) Spark job.
  */
final case class AggregateCheck(
    name: String,
    eval: (DataFrame, Option[String]) => AggOutcome,
    statistics: Map[String, Any] = Map.empty,
    raiseWarning: Boolean = false,
    error: Option[String] = None)
    extends Check {
  val ignoreNa: Boolean = true
  val nFailureCases: Int = Check.DefaultNFailureCases
}

/** Built-in check factories — the exhaustive list from
  * pandera/api/checks.py (SURVEY.md §2.A). Each compiles to a codegen'd
  * Catalyst expression; no UDFs in the hot path.
  */
object Check {
  val DefaultNFailureCases = 10

  // -- comparison checks -----------------------------------------------
  /** reference: api/checks.py:263 equal_to / eq */
  def equalTo(v: Any): ColumnCheck =
    ColumnCheck("equal_to", _ === lit(v), Map("value" -> v))
  def eq(v: Any): ColumnCheck = equalTo(v)

  /** reference: api/checks.py:278 not_equal_to / ne */
  def notEqualTo(v: Any): ColumnCheck =
    ColumnCheck("not_equal_to", _ =!= lit(v), Map("value" -> v))
  def ne(v: Any): ColumnCheck = notEqualTo(v)

  /** reference: api/checks.py:292 greater_than / gt */
  def greaterThan(v: Any): ColumnCheck =
    ColumnCheck("greater_than", _ > lit(v), Map("min_value" -> v))
  def gt(v: Any): ColumnCheck = greaterThan(v)

  /** reference: api/checks.py:312 greater_than_or_equal_to / ge */
  def greaterThanOrEqualTo(v: Any): ColumnCheck =
    ColumnCheck("greater_than_or_equal_to", _ >= lit(v), Map("min_value" -> v))
  def ge(v: Any): ColumnCheck = greaterThanOrEqualTo(v)

  /** reference: api/checks.py:330 less_than / lt */
  def lessThan(v: Any): ColumnCheck =
    ColumnCheck("less_than", _ < lit(v), Map("max_value" -> v))
  def lt(v: Any): ColumnCheck = lessThan(v)

  /** reference: api/checks.py:348 less_than_or_equal_to / le */
  def lessThanOrEqualTo(v: Any): ColumnCheck =
    ColumnCheck("less_than_or_equal_to", _ <= lit(v), Map("max_value" -> v))
  def le(v: Any): ColumnCheck = lessThanOrEqualTo(v)

  /** reference: api/checks.py:366 in_range / between (inclusive flags). */
  def inRange(min: Any, max: Any, includeMin: Boolean = true,
              includeMax: Boolean = true): ColumnCheck = {
    val lo = (c: Column) => if (includeMin) c >= lit(min) else c > lit(min)
    val hi = (c: Column) => if (includeMax) c <= lit(max) else c < lit(max)
    ColumnCheck("in_range", c => lo(c) && hi(c),
      Map("min_value" -> min, "max_value" -> max,
          "include_min" -> includeMin, "include_max" -> includeMax))
  }
  def between(min: Any, max: Any): ColumnCheck = inRange(min, max)

  // -- membership checks -----------------------------------------------
  /** reference: api/checks.py:475. Small literal lists stay in-expression
    * (codegen'd hash-set probe); at 100 TB a huge allowed-set should instead
    * be a broadcast semi-join — see graft.ext.SetMembership. */
  def isin(values: Seq[Any]): ColumnCheck =
    ColumnCheck("isin", _.isin(values: _*), Map("allowed_values" -> values))

  /** reference: api/checks.py:532 */
  def notin(values: Seq[Any]): ColumnCheck =
    ColumnCheck("notin", c => !c.isin(values: _*),
      Map("forbidden_values" -> values))

  // -- string checks -----------------------------------------------------
  /** reference: api/checks.py:588; pyspark impl anchors the pattern with `^`
    * if absent (backends/pyspark/builtin_checks.py:280-301). */
  def strMatches(pattern: String): ColumnCheck = {
    val anchored = if (pattern.startsWith("^")) pattern else "^" + pattern
    ColumnCheck("str_matches", _.rlike(anchored), Map("pattern" -> pattern))
  }

  /** reference: api/checks.py:610 — regex found anywhere. */
  def strContains(pattern: String): ColumnCheck =
    ColumnCheck("str_contains", _.rlike(pattern), Map("pattern" -> pattern))

  /** reference: api/checks.py:634 — literal prefix. */
  def strStartswith(prefix: String): ColumnCheck =
    ColumnCheck("str_startswith", _.startsWith(prefix), Map("string" -> prefix))

  /** reference: api/checks.py:650 — literal suffix. */
  def strEndswith(suffix: String): ColumnCheck =
    ColumnCheck("str_endswith", _.endsWith(suffix), Map("string" -> suffix))

  /** reference: api/checks.py:665 — min <= length(x) <= max. */
  def strLength(min: Option[Int] = None, max: Option[Int] = None): ColumnCheck = {
    val cond = (c: Column) => (min, max) match {
      case (Some(lo), Some(hi)) => length(c) >= lo && length(c) <= hi
      case (Some(lo), None)     => length(c) >= lo
      case (None, Some(hi))     => length(c) <= hi
      case (None, None)         => lit(true)
    }
    ColumnCheck("str_length", cond,
      Map("min_value" -> min.orNull, "max_value" -> max.orNull))
  }

  // -- aggregate-class builtin ------------------------------------------
  /** reference: api/checks.py:731 unique_values_eq — SET EQUALITY between the
    * column's distinct values and `values`. The reference collects distinct
    * to the driver (backends/pyspark/builtin_checks.py:403-422); we instead
    * compute two bounded aggregates in one job: |distinct ∩ set| == |set| and
    * count(values ∉ set) == 0 — never materializing unbounded distincts.
    */
  def uniqueValuesEq(values: Seq[Any]): AggregateCheck =
    AggregateCheck(
      "unique_values_eq",
      (df, colOpt) => {
        val c = col(colOpt.getOrElse(
          sys.error("unique_values_eq requires a column")))
        val row = df
          .select(
            countDistinct(when(c.isin(values: _*), c)).as("in_set"),
            count(when(c.isNotNull && !c.isin(values: _*), lit(1))).as("extra"))
          .head()
        val inSet = row.getLong(0)
        val extra = row.getLong(1)
        AggOutcome(inSet == values.distinct.size && extra == 0L,
          s"distinct_in_set=$inSet expected=${values.distinct.size} extraneous_rows=$extra")
      },
      Map("values" -> values))

  // -- sketch-based checks (beyond reference; the 100 TB-native variants
  // of cardinality/quantile constraints — one bounded aggregate each,
  // never a distinct materialization) -----------------------------------
  /** Distinct-count bounds via HyperLogLog (approx_count_distinct; exact in
    * sparse mode at low cardinality, rsd error bound above). */
  def approxDistinctBetween(min: Long, max: Long, rsd: Double = 0.05): AggregateCheck =
    AggregateCheck(
      "approx_distinct_between",
      (df, colOpt) => {
        val c = col(colOpt.getOrElse(
          sys.error("approx_distinct_between requires a column")))
        val est = df.select(approx_count_distinct(c, rsd)).head().getLong(0)
        AggOutcome(est >= min && est <= max,
          s"approx_distinct=$est expected_in=[$min,$max]")
      },
      Map("min_value" -> min, "max_value" -> max, "rsd" -> rsd))

  /** Quantile bounds via the positional-error quantile sketch
    * (percentile_approx): the `prob` quantile must lie in [lo, hi]. */
  def quantileBetween(prob: Double, lo: Double, hi: Double,
                      accuracy: Int = 10000): AggregateCheck =
    AggregateCheck(
      "quantile_between",
      (df, colOpt) => {
        val c = col(colOpt.getOrElse(
          sys.error("quantile_between requires a column")))
        val qv = df.select(percentile_approx(c.cast("double"), lit(prob),
          lit(accuracy)).cast("double")).head().getDouble(0)
        AggOutcome(qv >= lo && qv <= hi,
          s"quantile($prob)=$qv expected_in=[$lo,$hi]")
      },
      Map("prob" -> prob, "min_value" -> lo, "max_value" -> hi,
        "accuracy" -> accuracy))

  /** Column mean must lie in [lo, hi] — one aggregate. */
  def meanBetween(lo: Double, hi: Double): AggregateCheck =
    AggregateCheck(
      "mean_between",
      (df, colOpt) => {
        val c = col(colOpt.getOrElse(sys.error("mean_between requires a column")))
        val m = df.select(avg(c.cast("double"))).head().getDouble(0)
        AggOutcome(m >= lo && m <= hi, s"mean=$m expected_in=[$lo,$hi]")
      },
      Map("min_value" -> lo, "max_value" -> hi))

  /** Sample standard deviation must lie in [lo, hi] — one aggregate. */
  def stddevBetween(lo: Double, hi: Double): AggregateCheck =
    AggregateCheck(
      "stddev_between",
      (df, colOpt) => {
        val c = col(colOpt.getOrElse(sys.error("stddev_between requires a column")))
        val s = df.select(stddev_samp(c.cast("double"))).head().getDouble(0)
        AggOutcome(s >= lo && s <= hi, s"stddev=$s expected_in=[$lo,$hi]")
      },
      Map("min_value" -> lo, "max_value" -> hi))

  /** Pearson correlation with `otherCol` must lie in [lo, hi] — one
    * aggregate over the pair (r9). The feature-vs-target sanity bound a
    * training pipeline wants validated ("this feature still correlates
    * with the label", "these two columns stay independent"); rows where
    * either side is null are excluded, as corr's pairwise semantics
    * define. Degenerate inputs (a constant column → corr undefined/NaN)
    * fail with an explicit message instead of a vacuous pass. */
  def corrBetween(otherCol: String, lo: Double, hi: Double): AggregateCheck =
    AggregateCheck(
      "corr_between",
      (df, colOpt) => {
        val x = col(colOpt.getOrElse(sys.error("corr_between requires a column")))
          .cast("double")
        val y = col(otherCol).cast("double")
        // sufficient statistics over PAIRWISE-complete rows (corr's
        // semantics), divided on the driver behind a zero-variance guard —
        // Spark's corr() under ANSI mode raises DIVIDE_BY_ZERO on a
        // constant column instead of returning NaN
        val r = df.filter(x.isNotNull && y.isNotNull)
          .select(stddev_samp(x).as("sx"), stddev_samp(y).as("sy"),
            covar_samp(x, y).as("cv")).head()
        if (r.isNullAt(0) || r.isNullAt(1) || r.isNullAt(2) ||
            r.getDouble(0) == 0.0 || r.getDouble(1) == 0.0)
          AggOutcome(passed = false,
            s"corr with '$otherCol' undefined (constant or empty column)")
        else {
          val v = r.getDouble(2) / (r.getDouble(0) * r.getDouble(1))
          AggOutcome(v >= lo && v <= hi,
            s"corr=$v expected_in=[$lo,$hi] other=$otherCol")
        }
      },
      Map("other_column" -> otherCol, "min_value" -> lo, "max_value" -> hi))

  // -- custom checks ------------------------------------------------------
  /** Vectorized custom check (the default custom-Check form,
    * api/checks.py:21-124): user supplies Column => Column. */
  def custom(name: String)(cond: Column => Column): ColumnCheck =
    ColumnCheck(name, cond)

  /** Element-wise escape hatch (api/checks.py:83-86) — a Scala lambda run
    * per value through a UDF. Loses codegen; prefer `custom`. */
  def elementWise[T](name: String)(f: T => Boolean)(
      implicit enc: scala.reflect.runtime.universe.TypeTag[T]): ColumnCheck = {
    val u = udf((v: T) => if (v == null) null.asInstanceOf[java.lang.Boolean]
                          else java.lang.Boolean.valueOf(f(v)))
    ColumnCheck(name, c => u(c))
  }

  /** Table-level custom check: row predicate over the whole DataFrame
    * (the reference's dataframe-level Check). */
  def wide(name: String)(cond: DataFrame => Column): WideCheck =
    WideCheck(name, cond)

  /** Groupby check (api/checks.py:148-154 doc example mean(A) > mean(B)):
    * aggregates `aggExpr` per group of `groupbyCol` and passes the
    * groupKey -> value map to `decide`. One groupBy job; the reference's
    * pyspark backend raises NotImplementedError for groupby
    * (backends/pyspark/checks.py:28-48) — this is a capability we add.
    *
    * Driver memory is HARD-BOUNDED: at most `maxGroups` group aggregates
    * are collected; past the cap the check errors (CHECK_ERROR) instead of
    * OOM-ing the driver on a high-cardinality key (user_id, url_host...).
    * For unbounded-cardinality keys use [[groupbyHaving]], whose decision
    * never leaves the executors.
    */
  def groupbyAgg(name: String, groupbyCol: String, aggExpr: Column,
                 maxGroups: Int = 10000)(
      decide: Map[String, Double] => Boolean): AggregateCheck =
    AggregateCheck(
      name,
      (df, _) => {
        val rows = df.groupBy(col(groupbyCol)).agg(aggExpr.as("agg"))
          .limit(maxGroups + 1).collect()
        if (rows.length > maxGroups)
          sys.error(s"groupby check '$name' on '$groupbyCol' exceeds " +
            s"maxGroups=$maxGroups groups; use groupbyHaving (executor-side " +
            s"decision) or raise maxGroups")
        val m = rows.map(r => String.valueOf(r.get(0)) -> (r.get(1) match {
          case null => Double.NaN
          case n: Number => n.doubleValue()
          case o => o.toString.toDouble
        })).toMap
        AggOutcome(decide(m), m.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=$v" }.mkString(", "))
      },
      Map("groupby" -> groupbyCol))

  /** Groupby check whose decision is an EXPRESSION over the per-group
    * aggregate (`having`-style): every group must satisfy
    * `having(aggValue)`. Scales to arbitrary group cardinality — the plan
    * is groupBy → aggregate → one global count + bounded sample, so no
    * per-group data ever reaches the driver. Prefer this over
    * [[groupbyAgg]] for keys like user_id/url_host at 100 TB.
    */
  def groupbyHaving(name: String, groupbyCol: String, aggExpr: Column)(
      having: Column => Column): AggregateCheck =
    AggregateCheck(
      name,
      (df, _) => {
        val bad = !coalesce(having(col("agg")), lit(false))
        val row = df.groupBy(col(groupbyCol)).agg(aggExpr.as("agg"))
          .agg(
            count(when(bad, lit(1))).as("n_bad"),
            count(lit(1)).as("n_groups"),
            graft.functions.BoundedCollect.of(
              when(bad, concat(col(groupbyCol).cast("string"), lit("="),
                coalesce(col("agg").cast("string"), lit("null")))),
              DefaultNFailureCases).as("cases"))
          .head()
        val nBad = row.getLong(0); val nGroups = row.getLong(1)
        AggOutcome(nBad == 0L,
          s"groups_failing_having=$nBad of $nGroups",
          row.getSeq[String](2).toSeq)
      },
      Map("groupby" -> groupbyCol))

  /** Per-check input dtype restrictions, mirroring the reference's
    * `@register_input_datatypes` (backends/pyspark/decorators.py:42-105):
    * e.g. `str_contains` on an int column is rejected with a clear
    * SchemaError at validation-plan time instead of surfacing as a silent
    * implicit cast or a runtime analysis error. Returns true when `dt` is
    * an acceptable input for the builtin check `name`; unrecognized
    * (custom) names are unrestricted.
    */
  def acceptsInputDtype(name: String,
                        dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    def ordered(d: DataType): Boolean = d match {
      case _: NumericType | DateType | TimestampType | TimestampNTZType |
           StringType => true
      case _ => false
    }
    name match {
      case "str_matches" | "str_contains" | "str_startswith" |
           "str_endswith" | "str_length" => dt == StringType
      case "greater_than" | "greater_than_or_equal_to" | "less_than" |
           "less_than_or_equal_to" | "in_range" => ordered(dt)
      case "mean_between" | "stddev_between" | "quantile_between" =>
        dt.isInstanceOf[NumericType]
      case "equal_to" | "not_equal_to" | "isin" | "notin" =>
        !dt.isInstanceOf[MapType] // Spark cannot compare maps for equality
      case _ => true
    }
  }

  /** Registry for user-defined named checks, mirroring
    * Check.REGISTERED_CUSTOM_CHECKS (api/extensions.py:156-340). */
  object registry {
    private val checks =
      scala.collection.concurrent.TrieMap.empty[String, Seq[Any] => Check]
    def register(name: String)(factory: Seq[Any] => Check): Unit =
      checks.put(name, factory)
    def apply(name: String, args: Any*): Check =
      checks.getOrElse(name,
        sys.error(s"no registered check named '$name'"))(args)
    def contains(name: String): Boolean = checks.contains(name)
  }
}
