package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.checks.{Check, ColumnCheck}
import graft.errors.ValidationResult
import graft.hypothesis.Hypothesis
import graft.inference.InferSchema
import graft.schema._

/** SURVEY §2.A built-in column checks, one gate per operator.
  *
  * One slice of the driver-contract gate registry (r16-verdict #6: the
  * registry was one 4.9k-line object; the split is purely mechanical —
  * every gate body and oracle is verbatim, combined unchanged in
  * [[SparkEntry.queries]]/[[SparkEntry.oracleSql]]). */
private[graft] object GatesChecks {
  import GateSupport._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.A built-in column checks, one per operator ----
    "chk_equal_to" -> ((s, d) =>
      failCount(s, "equal_to", t(s, d, "lineitem"), "l_linestatus", Check.equalTo("F"))),
    "chk_not_equal_to" -> ((s, d) =>
      failCount(s, "not_equal_to", t(s, d, "lineitem"), "l_returnflag", Check.notEqualTo("N"))),
    "chk_greater_than" -> ((s, d) =>
      failCount(s, "greater_than", t(s, d, "lineitem"), "l_quantity", Check.greaterThan(10.0))),
    "chk_greater_than_or_equal_to" -> ((s, d) =>
      failCount(s, "ge", t(s, d, "lineitem"), "l_extendedprice", Check.ge(0.0))),
    "chk_less_than" -> ((s, d) =>
      failCount(s, "less_than", t(s, d, "lineitem"), "l_discount", Check.lessThan(0.05))),
    "chk_less_than_or_equal_to" -> ((s, d) =>
      failCount(s, "le", t(s, d, "lineitem"), "l_tax", Check.le(0.05))),
    "chk_in_range" -> ((s, d) =>
      failCount(s, "in_range", t(s, d, "lineitem"), "l_quantity", Check.inRange(5.0, 45.0))),
    "chk_isin" -> ((s, d) =>
      failCount(s, "isin", t(s, d, "lineitem"), "l_returnflag", Check.isin(Seq("A", "R")))),
    "chk_notin" -> ((s, d) =>
      failCount(s, "notin", t(s, d, "orders"), "o_orderstatus", Check.notin(Seq("P")))),
    "chk_str_matches" -> ((s, d) =>
      failCount(s, "str_matches", t(s, d, "orders"), "o_orderpriority", Check.strMatches("[1-3]-"))),
    "chk_str_contains" -> ((s, d) =>
      failCount(s, "str_contains", t(s, d, "part"), "p_type", Check.strContains("ECO"))),
    "chk_str_startswith" -> ((s, d) =>
      failCount(s, "str_startswith", t(s, d, "customer"), "c_name", Check.strStartswith("Customer#"))),
    "chk_str_endswith" -> ((s, d) =>
      failCount(s, "str_endswith", t(s, d, "orders"), "o_orderpriority", Check.strEndswith("URGENT"))),
    "chk_str_length" -> ((s, d) =>
      failCount(s, "str_length", t(s, d, "part"), "p_name", Check.strLength(Some(5), Some(15)))),
    "chk_unique_values_eq" -> ((s, d) =>
      failCount(s, "unique_values_eq", t(s, d, "region"), "r_name",
        Check.uniqueValuesEq(Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")))),
    "chk_element_wise" -> ((s, d) =>
      failCount(s, "element_wise", t(s, d, "lineitem"), "l_quantity",
        Check.elementWise[java.lang.Double]("qty_int_ew")(v => v.doubleValue() == math.floor(v.doubleValue())))),

    // ---- §2.B core structural / table-level checks ----
    "chk_isin_large" -> ((s, d) => {
      // 100k-value allowed set (even part keys) via broadcast anti join —
      // the literal-list isin formulation would inline 100k literals into
      // the plan (VERDICT r1 "what's missing" #2)
      val allowed: Seq[Any] = (0L until 200000L by 2L).map(x => x: Any)
      ext.SetMembership.violations(t(s, d, "lineitem"), "l_partkey", allowed,
          semi = false)
        .agg(count(lit(1)).as("failure_count"))
        .select(lit("isin_large_violations").as("check_name"),
          col("failure_count"))
    }),

    // ---- §2.D hypothesis tests ----
    "chk_custom_fn" -> ((s, d) =>
      failCount(s, "custom_name_nonempty", t(s, d, "customer"), "c_name",
        ColumnCheck("name_nonempty", c => length(c) > 0))),

    // ---- §2.A check modifiers ----
    "chk_raise_warning" -> ((s, d) => {
      val res = DataFrameSchema("l_tax" -> ColumnSchema(Some(DoubleType),
        Seq(Check.le(0.05).copy(raiseWarning = true))))
        .validate(t(s, d, "lineitem"))
      import s.implicits._
      Seq(("raise_warning_failures", res.warnings.map(_.failureCount).sum),
        ("raise_warning_passed", if (res.passed) 0L else 1L))
        .toDF("check_name", "failure_count").orderBy("check_name")
    }),
    "chk_n_failure_cases" -> ((s, d) => {
      val res = DataFrameSchema("l_quantity" -> ColumnSchema(Some(DoubleType),
        Seq(Check.inRange(5.0, 45.0).copy(nFailureCases = 7))))
        .validate(t(s, d, "lineitem"))
      import s.implicits._
      Seq(("n_failure_cases_sample",
        res.errors.headOption.fold(0L)(_.failureCases.size.toLong)))
        .toDF("check_name", "failure_count")
    }),

    // ---- §2.B remaining structural operators ----
    "chk_mean_stddev" -> ((s, d) => {
      val res = DataFrameSchema("l_quantity" -> ColumnSchema(Some(DoubleType),
        Seq(Check.meanBetween(20.0, 30.0), Check.stddevBetween(5.0, 25.0))))
        .validate(t(s, d, "lineitem"))
      aggPassFail(s, "mean_stddev_between", res)
    }),
    "chk_corr" -> ((s, d) => {
      // round-9: Pearson-correlation bound check — the fixture's columns
      // are generated independently (corr ≈ 0 probed at all SFs), so the
      // wide band passes and the [0.9, 1.0] demand is detected as failing
      val li = t(s, d, "lineitem")
      val ok = DataFrameSchema("l_extendedprice" -> ColumnSchema(Some(DoubleType),
        Seq(Check.corrBetween("l_quantity", -0.5, 0.5)))).validate(li)
      val bad = DataFrameSchema("l_extendedprice" -> ColumnSchema(Some(DoubleType),
        Seq(Check.corrBetween("l_partkey", 0.9, 1.0)))).validate(li)
      import s.implicits._
      Seq(("corr_in_bounds", if (ok.passed) 0L else 1L),
          ("corr_out_of_bounds_detected", if (!bad.passed) 0L else 1L))
        .toDF("check_name", "failure_count").orderBy("check_name")
    }),
    "chk_approx_distinct" -> ((s, d) => {
      // n_name cardinality (25) is deep in HLL sparse mode → exact estimate
      val res = DataFrameSchema("n_name" -> ColumnSchema(Some(StringType),
        Seq(Check.approxDistinctBetween(20L, 30L))))
        .validate(t(s, d, "nation"))
      aggPassFail(s, "approx_distinct_between", res)
    }),
    "chk_quantile" -> ((s, d) => {
      val res = DataFrameSchema("l_quantity" -> ColumnSchema(Some(DoubleType),
        Seq(Check.quantileBetween(0.5, 10.0, 40.0))))
        .validate(t(s, d, "lineitem"))
      aggPassFail(s, "quantile_between", res)
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "chk_equal_to" ->
      "SELECT 'equal_to' AS check_name, count(*) FILTER (WHERE l_linestatus IS NOT NULL AND NOT (l_linestatus = 'F')) AS failure_count FROM lineitem",
    "chk_not_equal_to" ->
      "SELECT 'not_equal_to' AS check_name, count(*) FILTER (WHERE l_returnflag IS NOT NULL AND NOT (l_returnflag <> 'N')) AS failure_count FROM lineitem",
    "chk_greater_than" ->
      "SELECT 'greater_than' AS check_name, count(*) FILTER (WHERE l_quantity IS NOT NULL AND NOT (l_quantity > 10.0)) AS failure_count FROM lineitem",
    "chk_greater_than_or_equal_to" ->
      "SELECT 'ge' AS check_name, count(*) FILTER (WHERE l_extendedprice IS NOT NULL AND NOT (l_extendedprice >= 0.0)) AS failure_count FROM lineitem",
    "chk_less_than" ->
      "SELECT 'less_than' AS check_name, count(*) FILTER (WHERE l_discount IS NOT NULL AND NOT (l_discount < 0.05)) AS failure_count FROM lineitem",
    "chk_less_than_or_equal_to" ->
      "SELECT 'le' AS check_name, count(*) FILTER (WHERE l_tax IS NOT NULL AND NOT (l_tax <= 0.05)) AS failure_count FROM lineitem",
    "chk_in_range" ->
      "SELECT 'in_range' AS check_name, count(*) FILTER (WHERE l_quantity IS NOT NULL AND NOT (l_quantity >= 5.0 AND l_quantity <= 45.0)) AS failure_count FROM lineitem",
    "chk_isin" ->
      "SELECT 'isin' AS check_name, count(*) FILTER (WHERE l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A','R')) AS failure_count FROM lineitem",
    "chk_notin" ->
      "SELECT 'notin' AS check_name, count(*) FILTER (WHERE o_orderstatus IS NOT NULL AND o_orderstatus IN ('P')) AS failure_count FROM orders",
    "chk_str_matches" ->
      "SELECT 'str_matches' AS check_name, count(*) FILTER (WHERE o_orderpriority IS NOT NULL AND NOT regexp_matches(o_orderpriority, '^[1-3]-')) AS failure_count FROM orders",
    "chk_str_contains" ->
      "SELECT 'str_contains' AS check_name, count(*) FILTER (WHERE p_type IS NOT NULL AND NOT regexp_matches(p_type, 'ECO')) AS failure_count FROM part",
    "chk_str_startswith" ->
      "SELECT 'str_startswith' AS check_name, count(*) FILTER (WHERE c_name IS NOT NULL AND NOT starts_with(c_name, 'Customer#')) AS failure_count FROM customer",
    "chk_str_endswith" ->
      "SELECT 'str_endswith' AS check_name, count(*) FILTER (WHERE o_orderpriority IS NOT NULL AND NOT ends_with(o_orderpriority, 'URGENT')) AS failure_count FROM orders",
    "chk_str_length" ->
      "SELECT 'str_length' AS check_name, count(*) FILTER (WHERE p_name IS NOT NULL AND NOT (length(p_name) >= 5 AND length(p_name) <= 15)) AS failure_count FROM part",
    "chk_unique_values_eq" ->
      "SELECT 'unique_values_eq' AS check_name, CAST(CASE WHEN (SELECT count(DISTINCT r_name) FROM region WHERE r_name IN ('AFRICA','AMERICA','ASIA','EUROPE','MIDDLE EAST')) = 5 AND (SELECT count(*) FROM region WHERE r_name IS NOT NULL AND r_name NOT IN ('AFRICA','AMERICA','ASIA','EUROPE','MIDDLE EAST')) = 0 THEN 0 ELSE 1 END AS BIGINT) AS failure_count",
    "chk_element_wise" ->
      "SELECT 'element_wise' AS check_name, count(*) FILTER (WHERE l_quantity IS NOT NULL AND NOT (l_quantity = floor(l_quantity))) AS failure_count FROM lineitem",
    "chk_isin_large" ->
      "SELECT 'isin_large_violations' AS check_name, count(*) FILTER (WHERE l_partkey IS NOT NULL AND NOT (l_partkey % 2 = 0 AND l_partkey >= 0 AND l_partkey < 200000)) AS failure_count FROM lineitem",
    // one-sample t: engine decision (stat>0 and p/2<alpha) coincides with
    // t >> t_crit on this data (t is in the hundreds); oracle checks the
    // same decision via the t statistic computed in SQL.
    "chk_raise_warning" ->
      ("SELECT * FROM (" +
        "SELECT 'raise_warning_failures' AS check_name, count(*) FILTER (WHERE l_tax IS NOT NULL AND NOT (l_tax <= 0.05)) AS failure_count FROM lineitem " +
        "UNION ALL SELECT 'raise_warning_passed', CAST(0 AS BIGINT)" +
        ") u ORDER BY check_name"),
    "chk_n_failure_cases" ->
      "SELECT 'n_failure_cases_sample' AS check_name, least(count(*) FILTER (WHERE l_quantity IS NOT NULL AND NOT (l_quantity >= 5.0 AND l_quantity <= 45.0)), 7) AS failure_count FROM lineitem",
    "chk_custom_fn" ->
      "SELECT 'custom_name_nonempty' AS check_name, count(*) FILTER (WHERE c_name IS NOT NULL AND NOT (length(c_name) > 0)) AS failure_count FROM customer",
    "chk_mean_stddev" ->
      "SELECT 'mean_stddev_between' AS check_name, CAST(CASE WHEN avg(l_quantity) BETWEEN 20.0 AND 30.0 AND stddev_samp(l_quantity) BETWEEN 5.0 AND 25.0 THEN 0 ELSE 1 END AS BIGINT) AS failure_count FROM lineitem",
    "chk_approx_distinct" ->
      "SELECT 'approx_distinct_between' AS check_name, CAST(CASE WHEN count(DISTINCT n_name) BETWEEN 20 AND 30 THEN 0 ELSE 1 END AS BIGINT) AS failure_count FROM nation",
    "chk_corr" ->
      ("SELECT \"check_name\", CAST(fc AS BIGINT) AS failure_count FROM (VALUES " +
        "('corr_in_bounds', (SELECT CASE WHEN corr(l_extendedprice, l_quantity) BETWEEN -0.5 AND 0.5 THEN 0 ELSE 1 END FROM lineitem)), " +
        "('corr_out_of_bounds_detected', (SELECT CASE WHEN corr(l_extendedprice, l_partkey) BETWEEN 0.9 AND 1.0 THEN 1 ELSE 0 END FROM lineitem))" +
        ") v(\"check_name\", fc) ORDER BY \"check_name\""),
    "chk_quantile" ->
      "SELECT 'quantile_between' AS check_name, CAST(CASE WHEN quantile_disc(l_quantity, 0.5) BETWEEN 10.0 AND 40.0 THEN 0 ELSE 1 END AS BIGINT) AS failure_count FROM lineitem",
  )
}
