package graft

import org.apache.spark.sql.types._
import graft.checks.Check
import graft.schema._
import graft.errors.SchemaErrorReason
import graft.hypothesis.Hypothesis

class ValidatorSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "alpha", 10.0, "A"),
    (2L, "beta", 20.0, "B"),
    (3L, "gamma", -5.0, "A"),
    (4L, "delta", 40.0, "B"),
    (4L, null, 50.0, "A")
  ).toDF("id", "name", "price", "grp")

  test("passing schema yields no errors and returns the data") {
    val schema = DataFrameSchema(
      "id" -> ColumnSchema.of(LongType, Check.ge(1L)),
      "price" -> ColumnSchema.of(DoubleType, Check.inRange(-100.0, 100.0)))
    val res = schema.validate(df)
    assert(res.passed, res.errors.map(_.message).mkString("; "))
    assert(res.data.count() == 5)
  }

  test("row-level check failures are counted and sampled") {
    val schema = DataFrameSchema("price" -> ColumnSchema.of(DoubleType, Check.ge(0.0)))
    val res = schema.validate(df)
    assert(!res.passed)
    val e = res.hardErrors.head
    assert(e.failureCount == 1L)
    assert(e.failureCases == Seq("-5.0"))
    assert(e.reason == SchemaErrorReason.DATAFRAME_CHECK)
  }

  test("multiple failed checks sample their cases in one fused job") {
    // three distinct failing checks → ONE BoundedCollect sampling job;
    // each error must still carry only ITS failing values
    val schema = DataFrameSchema(
      "price" -> ColumnSchema.of(DoubleType, Check.ge(0.0), Check.le(45.0)),
      "name" -> ColumnSchema(Some(StringType), nullable = false))
    val res = schema.validate(df)
    val byCheck = res.hardErrors.map(e => e.check -> e).toMap
    assert(byCheck.keys.exists(_.startsWith("greater_than_or_equal_to")))
    val ge = byCheck.collectFirst { case (k, e) if k.startsWith("greater_than_or_equal_to") => e }.get
    val le = byCheck.collectFirst { case (k, e) if k.startsWith("less_than_or_equal_to") => e }.get
    val nn = byCheck("not_nullable")
    assert(ge.failureCount == 1L && ge.failureCases == Seq("-5.0"))
    assert(le.failureCount == 1L && le.failureCases == Seq("50.0"))
    assert(nn.failureCount == 1L && nn.failureCases == Seq("null"))
  }

  test("job-count invariants: 1 job clean, 2 jobs with failures, 0 schema-only") {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        counter.incrementAndGet()
    }
    val data = df.cache(); data.count() // materialize outside the window
    // AQE materializes query stages as separate jobs; disable it here so
    // one action == one job and the counts below mean "passes over data"
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.addSparkListener(listener)
    def jobsDuring(f: => Unit): Int = {
      Thread.sleep(300) // drain in-flight listener events
      counter.set(0)
      f
      Thread.sleep(300)
      counter.get()
    }
    try {
      // clean data, no uniqueness → exactly the ONE fused aggregate job
      val clean = DataFrameSchema("id" -> ColumnSchema.of(LongType, Check.ge(0L)))
      assert(jobsDuring(clean.validate(data)) == 1)
      // failing checks → fused pass + ONE sampling job, regardless of how
      // many checks failed
      val failing = DataFrameSchema(
        "price" -> ColumnSchema.of(DoubleType, Check.ge(0.0), Check.le(45.0)),
        "name" -> ColumnSchema(Some(StringType), nullable = false))
      assert(jobsDuring(failing.validate(data)) == 2)
      // schema-only depth → zero data jobs
      assert(jobsDuring(graft.backend.Validator.validate(
        failing, data, depth = graft.errors.GraftConfig.SchemaOnly)) == 0)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sparkContext.removeSparkListener(listener)
      data.unpersist()
    }
  }

  test("ignore_na: nulls pass checks by default, fail with ignoreNa=false") {
    val relaxed = DataFrameSchema("name" -> ColumnSchema.of(StringType, Check.strLength(Some(3))))
    assert(relaxed.validate(df).passed)
    val strict = DataFrameSchema("name" ->
      ColumnSchema.of(StringType, Check.strLength(Some(3)).copy(ignoreNa = false)))
    val res = strict.validate(df)
    assert(res.hardErrors.head.failureCount == 1L)
  }

  test("nullable=false catches nulls") {
    val schema = DataFrameSchema("name" -> ColumnSchema(Some(StringType), nullable = false))
    val res = schema.validate(df)
    assert(res.hardErrors.head.reason == SchemaErrorReason.SERIES_CONTAINS_NULLS)
    assert(res.hardErrors.head.failureCount == 1L)
  }

  test("column uniqueness via shuffle") {
    val schema = DataFrameSchema("id" -> ColumnSchema(Some(LongType), unique = true))
    val res = schema.validate(df)
    val e = res.hardErrors.head
    assert(e.reason == SchemaErrorReason.SERIES_CONTAINS_DUPLICATES)
    assert(e.failureCount == 2L) // report_duplicates=all: both rows of key 4
    assert(e.failureCases == Seq("4"))
  }

  test("report_duplicates=exclude_first counts n-1 per key") {
    val schema = DataFrameSchema("id" -> ColumnSchema(Some(LongType), unique = true))
      .copy(reportDuplicates = ReportDuplicates.ExcludeFirst)
    assert(schema.validate(df).hardErrors.head.failureCount == 1L)
  }

  test("table-level multi-column uniqueness") {
    val schema = DataFrameSchema("id" -> ColumnSchema(Some(LongType)))
      .copy(unique = Seq("id", "grp"))
    assert(schema.validate(df).passed) // (4,B) vs (4,A) differ
    val schema2 = schema.copy(unique = Seq("grp"))
    assert(!schema2.validate(df).passed)
  }

  test("metadata: missing column, wrong dtype, strict, ordered") {
    val schema = DataFrameSchema(
      "nope" -> ColumnSchema(Some(StringType)),
      "id" -> ColumnSchema(Some(IntegerType))) // actual is Long
      .copy(strict = Strict.Error)
    val res = schema.validate(df)
    val reasons = res.hardErrors.map(_.reason).toSet
    assert(reasons.contains(SchemaErrorReason.COLUMN_NOT_IN_DATAFRAME))
    assert(reasons.contains(SchemaErrorReason.WRONG_DATATYPE))
    assert(reasons.contains(SchemaErrorReason.COLUMN_NOT_IN_SCHEMA)) // name/price/grp extra
  }

  test("strict=filter drops extra columns") {
    val schema = DataFrameSchema(
      "id" -> ColumnSchema(Some(LongType)),
      "price" -> ColumnSchema(Some(DoubleType))).copy(strict = Strict.Filter)
    val res = schema.validate(df)
    assert(res.data.columns.toSeq == Seq("id", "price"))
  }

  test("coercion with try_cast counts un-coercible values") {
    val d = Seq(("1", "x"), ("2", "y"), ("oops", "z")).toDF("num", "s")
    val schema = DataFrameSchema(
      "num" -> ColumnSchema(Some(IntegerType), coerce = true))
    val res = schema.validate(d)
    assert(res.data.schema("num").dataType == IntegerType)
    val e = res.hardErrors.head
    assert(e.reason == SchemaErrorReason.DATATYPE_COERCION)
    assert(e.failureCount == 1L && e.failureCases == Seq("oops"))
  }

  test("add_missing_columns + set defaults") {
    val schema = DataFrameSchema(
      "id" -> ColumnSchema(Some(LongType)),
      "bonus" -> ColumnSchema(Some(DoubleType), default = Some(0.0)))
      .copy(addMissingColumns = true)
    val res = schema.validate(df)
    assert(res.passed)
    assert(res.data.columns.contains("bonus"))
    assert(res.data.select("bonus").distinct().collect().map(_.getDouble(0)).toSeq == Seq(0.0))
  }

  test("drop_invalid_rows filters failing rows instead of erroring") {
    val schema = DataFrameSchema(
      "price" -> ColumnSchema.of(DoubleType, Check.ge(0.0)),
      "name" -> ColumnSchema(Some(StringType), nullable = false))
      .copy(dropInvalidRows = true)
    val res = schema.validate(df)
    assert(res.data.count() == 3) // drops price=-5 and name=null rows
    assert(res.errors.isEmpty)
  }

  test("wide check over multiple columns") {
    val schema = DataFrameSchema("id" -> ColumnSchema(Some(LongType)))
      .setChecks(Check.wide("id_lt_price")(d => d("id") < d("price")))
    val res = schema.validate(df)
    assert(!res.passed) // row (id=3, price=-5.0) violates id < price
    assert(res.hardErrors.head.failureCount == 1L)
  }

  test("unique_values_eq is set equality") {
    val ok = DataFrameSchema("grp" ->
      ColumnSchema(Some(StringType), checks = Seq(Check.uniqueValuesEq(Seq("A", "B")))))
    assert(ok.validate(df).passed)
    val missing = DataFrameSchema("grp" ->
      ColumnSchema(Some(StringType), checks = Seq(Check.uniqueValuesEq(Seq("A", "B", "C")))))
    assert(!missing.validate(df).passed)
    val extra = DataFrameSchema("grp" ->
      ColumnSchema(Some(StringType), checks = Seq(Check.uniqueValuesEq(Seq("A")))))
    assert(!extra.validate(df).passed)
  }

  test("groupby aggregate check: mean(A) vs mean(B)") {
    val schema = DataFrameSchema("price" -> ColumnSchema(Some(DoubleType),
      checks = Seq(Check.groupbyAgg("meanB_gt_meanA", "grp",
        org.apache.spark.sql.functions.avg("price"))(m => m("B") > m("A")))))
    assert(schema.validate(df).passed)
  }

  test("groupbyAgg caps collected groups; groupbyHaving stays executor-side") {
    // cap: 4 distinct ids > maxGroups=2 → CHECK_ERROR, not a driver OOM path
    val capped = DataFrameSchema("price" -> ColumnSchema(Some(DoubleType),
      checks = Seq(Check.groupbyAgg("mean_by_id", "id",
        org.apache.spark.sql.functions.avg("price"), maxGroups = 2)(_ => true))))
    val res = capped.validate(df)
    assert(res.hardErrors.exists(e =>
      e.reason == SchemaErrorReason.CHECK_ERROR &&
        e.message.contains("maxGroups")))
    // having-style: every group's mean must be < 100 (passes) / > 15 (fails
    // for grp A) with the violating groups in the bounded sample
    def having(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      DataFrameSchema("price" -> ColumnSchema(Some(DoubleType),
        checks = Seq(Check.groupbyHaving("grp_mean", "grp",
          org.apache.spark.sql.functions.avg("price"))(f)))).validate(df)
    assert(having(_ < 100.0).passed)
    val bad = having(_ > 25.0)
    assert(!bad.passed)
    // grp A mean = (10-5+50)/3 ≈ 18.33 fails; grp B mean = 30 passes
    assert(bad.hardErrors.head.failureCases.exists(_.startsWith("A=")))
  }

  test("isinLarge/notinLarge: broadcast join membership for 100k-value sets") {
    val allowed: Seq[Any] = (0L until 200000L by 2L).map(x => x: Any)
    // ids 1..4: odds 1,3 violate the even-allowed set
    val viol = graft.ext.SetMembership.violations(df, "id", allowed, semi = false)
    assert(viol.count() == 2)
    val plan = viol.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast join:\n$plan")
    val schemaIsin = DataFrameSchema("id" -> ColumnSchema(Some(LongType),
      checks = Seq(graft.ext.SetMembership.isinLarge(allowed))))
    val res = schemaIsin.validate(df)
    assert(!res.passed)
    assert(res.hardErrors.head.message.contains("violations=2"))
    // notin: forbidden set hits ids 2,4 (4 twice)
    val schemaNotin = DataFrameSchema("id" -> ColumnSchema(Some(LongType),
      checks = Seq(graft.ext.SetMembership.notinLarge(Seq(2L, 4L)))))
    val res2 = schemaNotin.validate(df)
    assert(!res2.passed)
    assert(res2.hardErrors.head.message.contains("violations=3"))
  }

  test("check/dtype input restrictions reject mismatched checks at schema time") {
    // 1. str_* on a numeric column
    val strOnNum = DataFrameSchema("price" -> ColumnSchema(Some(DoubleType),
      checks = Seq(Check.strContains("abc")))).validate(df)
    assert(strOnNum.hardErrors.map(_.reason) ==
      Seq(SchemaErrorReason.INVALID_CHECK_INPUT_TYPE))
    assert(strOnNum.hardErrors.head.message.contains("str_contains"))
    // 2. ordered comparison on a boolean column
    val b = df.withColumn("flag", org.apache.spark.sql.functions.lit(true))
    val cmpOnBool = DataFrameSchema("flag" -> ColumnSchema(Some(BooleanType),
      checks = Seq(Check.gt(false)))).validate(b)
    assert(cmpOnBool.hardErrors.map(_.reason) ==
      Seq(SchemaErrorReason.INVALID_CHECK_INPUT_TYPE))
    // 3. statistical bound on a string column
    val meanOnStr = DataFrameSchema("name" -> ColumnSchema(Some(StringType),
      checks = Seq(Check.meanBetween(0.0, 1.0)))).validate(df)
    assert(meanOnStr.hardErrors.map(_.reason) ==
      Seq(SchemaErrorReason.INVALID_CHECK_INPUT_TYPE))
    // the rejected check is EXCLUDED from the fused pass (one schema error,
    // no data-side failure), and valid sibling checks still run
    val mixed = DataFrameSchema("price" -> ColumnSchema(Some(DoubleType),
      checks = Seq(Check.strContains("x"), Check.ge(0.0)))).validate(df)
    assert(mixed.hardErrors.map(_.reason).sorted ==
      Seq(SchemaErrorReason.DATAFRAME_CHECK, SchemaErrorReason.INVALID_CHECK_INPUT_TYPE).sorted)
    // restriction follows the POST-COERCION dtype: string→double coercion
    // makes ge legal even though the raw column is a string
    val s = df.withColumn("pstr",
      org.apache.spark.sql.functions.col("price").cast("string"))
    val coerced = DataFrameSchema("pstr" -> ColumnSchema(Some(DoubleType),
      checks = Seq(Check.ge(-100.0)), coerce = true)).validate(s)
    assert(coerced.passed, coerced.errors.map(_.message).mkString("; "))
  }

  test("two-sample t-test matches scipy on a known example") {
    // scipy.stats.ttest_ind([30,31,29,30,30],[26,25,27,26,26], equal_var=True)
    // -> stat ≈ 7.3380, pvalue ≈ 8.03e-05
    val d = (Seq(30.0, 31.0, 29.0, 30.0, 30.0).map(("a", _)) ++
      Seq(26.0, 25.0, 27.0, 26.0, 26.0).map(("b", _))).toDF("g", "v")
    val r = Hypothesis.twoSampleT(5, 30.0, 0.5, 5, 26.0, 0.5, equalVar = true)
    assert(math.abs(r.stat - 8.944271909999159) < 1e-9)
    val schema = DataFrameSchema("v" -> ColumnSchema(Some(DoubleType),
      checks = Seq(Hypothesis.twoSampleTtest("g", "a", "b",
        Hypothesis.GreaterThan, alpha = 0.01))))
    assert(schema.validate(d).passed)
    val wrongDir = DataFrameSchema("v" -> ColumnSchema(Some(DoubleType),
      checks = Seq(Hypothesis.twoSampleTtest("g", "a", "b",
        Hypothesis.LessThan, alpha = 0.01))))
    assert(!wrongDir.validate(d).passed)
  }

  test("grouped black-box hypothesis: capped per-group vectors") {
    // custom test fn over raw group vectors (reference: Hypothesis(test=fn,
    // samples=[...])): mean(B) - mean(A) = 30 - 18.33 > 0
    val schema = DataFrameSchema("price" -> ColumnSchema(Some(DoubleType),
      checks = Seq(Hypothesis.grouped("meanB_minus_meanA_pos", "grp", Seq("B", "A"),
        Hypothesis.Custom((stat, _) => stat > 0)) { vs =>
        (vs(0).sum / vs(0).size - vs(1).sum / vs(1).size, 0.0)
      })))
    assert(schema.validate(df).passed)
    // group exceeding the cap → CHECK_ERROR, never a silent partial test
    val capped = DataFrameSchema("price" -> ColumnSchema(Some(DoubleType),
      checks = Seq(Hypothesis.grouped("overflow", "grp", Seq("B", "A"),
        maxSamplePerGroup = 2) { vs => (0.0, 1.0) })))
    val res = capped.validate(df)
    assert(res.hardErrors.exists(e =>
      e.reason == SchemaErrorReason.CHECK_ERROR &&
        e.message.contains("maxSamplePerGroup")))
    // missing sample group → failed outcome with the group named
    val missing = DataFrameSchema("price" -> ColumnSchema(Some(DoubleType),
      checks = Seq(Hypothesis.grouped("missing", "grp", Seq("A", "Z")) {
        vs => (0.0, 1.0) })))
    assert(missing.validate(df).hardErrors.exists(_.message.contains("Z")))
  }

  test("groupedSampled: deterministic bounded sample past the cap, exact under it (r14)") {
    // 250 rows per group with a unique key: the sampled variant's draw is
    // bottom-k by md5(key||chr(1)||seed), so a driver-side recomputation
    // of the SAME hash must reproduce the engine's kept set bit-exactly
    // (the portable-hash contract the DuckDB oracle relies on). The
    // outcome detail only surfaces through a FAILED check's message, so
    // every probe below uses an always-false relationship.
    import org.apache.spark.sql.functions.{col, lit, when}
    val data = spark.range(500).select(
      col("id").as("k"),
      when(col("id") % 2 === 0, "A").otherwise("B").as("grp"),
      (col("id") % 97).cast("double").as("price"))
    val failRel = Hypothesis.Custom((_, _) => false)
    def detail(res: graft.errors.ValidationResult): String =
      res.errors.map(_.message).mkString
    def medianDiff(name: String, cap: Int) =
      DataFrameSchema("price" -> ColumnSchema(Some(DoubleType),
        checks = Seq(Hypothesis.groupedSampled(name, "grp", Seq("A", "B"),
          keyCol = "k", relationship = failRel,
          maxSamplePerGroup = cap, seed = 42L) { vs =>
          (Hypothesis.median(vs(0)) - Hypothesis.median(vs(1)), 0.0)
        })))
    // under the cap: exact, and the same stat token as the refusing
    // grouped form on the same data
    val exactDetail = detail(medianDiff("exact", cap = 1000).validate(data))
    assert(exactDetail.contains("n(A)=250 exact") && !exactDetail.contains("sampled"))
    val plainDetail = detail(DataFrameSchema("price" -> ColumnSchema(Some(DoubleType),
      checks = Seq(Hypothesis.grouped("plain", "grp", Seq("A", "B"), failRel) { vs =>
        (Hypothesis.median(vs(0)) - Hypothesis.median(vs(1)), 0.0)
      }))).validate(data))
    def statToken(s: String) = s.split("stat=")(1).split(" ")(0)
    assert(statToken(exactDetail) == statToken(plainDetail))
    // past the cap: kept=50 per group, visibly sampled, seed recorded
    val d1 = detail(medianDiff("sampled", cap = 50).validate(data))
    assert(d1.contains("kept(A)=50 sampled") && d1.contains("kept(B)=50 sampled")
      && d1.contains("seed=42"))
    // deterministic: a second validation reproduces the detail verbatim
    assert(d1 == detail(medianDiff("sampled", cap = 50).validate(data)))
    // driver-side mini-oracle: recompute the bottom-50 draw from the same
    // md5 hash and compare the group-A sampled median EXACTLY
    def hash32(key: String, seed: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest((key + "\u0001" + seed).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val keptA = (0 until 500 by 2)
      .sortBy(k => (hash32(k.toString, 42L), k.toString))
      .take(50).map(k => (k % 97).toDouble).toIndexedSeq
    val aOnly = detail(DataFrameSchema("price" -> ColumnSchema(Some(DoubleType),
      checks = Seq(Hypothesis.groupedSampled("a_only", "grp", Seq("A"),
        keyCol = "k", relationship = failRel,
        maxSamplePerGroup = 50, seed = 42L) { vs =>
        (Hypothesis.median(vs(0)), 0.0)
      }))).validate(data))
    assert(statToken(aOnly) == f"${Hypothesis.median(keptA)}%.6f")
    // null keys are refused loudly (no deterministic draw)
    val withNullKey = data.withColumn("k",
      when(col("k") === 3, lit(null).cast("long")).otherwise(col("k")))
    val nk = medianDiff("nullkey", cap = 50).validate(withNullKey)
    assert(nk.hardErrors.exists(e =>
      e.reason == SchemaErrorReason.CHECK_ERROR &&
        e.message.contains("null 'k'")))
    // missing group named, as in the plain form
    val miss = DataFrameSchema("price" -> ColumnSchema(Some(DoubleType),
      checks = Seq(Hypothesis.groupedSampled("m", "grp", Seq("A", "Z"),
        keyCol = "k", maxSamplePerGroup = 50) { vs => (0.0, 1.0) })))
      .validate(data)
    assert(miss.hardErrors.exists(_.message.contains("Z")))
  }

  test("regex column matching") {
    val d = Seq((1.0, 2.0, "x")).toDF("m_a", "m_b", "other")
    val schema = DataFrameSchema(
      "m_.*" -> ColumnSchema(Some(DoubleType), checks = Seq(Check.gt(0.0)), regex = true))
    assert(schema.validate(d).passed)
    val bad = Seq((1.0, -2.0, "x")).toDF("m_a", "m_b", "other")
    val res = schema.validate(bad)
    assert(res.hardErrors.map(_.column.get) == Seq("m_b"))
  }

  test("schema transforms are immutable copies") {
    val s = DataFrameSchema("a" -> ColumnSchema(Some(LongType)))
    val s2 = s.addColumns("b" -> ColumnSchema(Some(StringType)))
      .renameColumns(Map("a" -> "aa")).selectColumns("aa")
    assert(s2.columnNames == Seq("aa"))
    assert(s.columnNames == Seq("a"))
  }

  test("getMetadata exposes column- and schema-level metadata under the schema name") {
    val s = DataFrameSchema(
      "a" -> ColumnSchema(Some(LongType), metadata = Map("pii" -> "false")),
      "b" -> ColumnSchema(Some(StringType)))
      .copy(metadata = Map("owner" -> "data-eng"), name = Some("orders_schema"))
    // reference get_metadata wraps under the schema name
    // (api/dataframe/container.py:265-276)
    val m = s.getMetadata("orders_schema")
    assert(m("dataframe") == Map("owner" -> "data-eng"))
    assert(m("columns").asInstanceOf[Map[String, Map[String, String]]]("a") ==
      Map("pii" -> "false"))
    // unnamed schema keys on ""
    assert(s.copy(name = None).getMetadata.keySet == Set(""))
  }

  test("splitByRowChecks: complementary halves, nulls to invalid, coercion applied") {
    import spark.implicits._
    val df = Seq(
      ("1", 5.0),    // valid
      ("2", 200.0),  // fails in_range
      ("x", 5.0),    // un-coercible id
      (null, 5.0)    // null id: cmp is null, ignoreNa=false → invalid (3VL)
    ).toDF("id", "v")
    val schema = DataFrameSchema(
      "id" -> ColumnSchema(Some(LongType), Nil, coerce = true),
      "v" -> ColumnSchema(Some(DoubleType), Seq(Check.inRange(0.0, 100.0))))
      .setChecks(graft.checks.WideCheck("id_lt_100",
        d => org.apache.spark.sql.functions.expr("id < 100"), ignoreNa = false))
    val (valid, invalid) = graft.backend.Validator.splitByRowChecks(schema, df)
    val v = valid.collect(); val inv = invalid.collect()
    // exhaustive + disjoint partition of the batch
    assert(v.length + inv.length == 4)
    assert(v.length == 1 && v.head.getLong(0) == 1L)
    // coercion applied on both sides (id is LongType, not the raw string)
    assert(valid.schema("id").dataType == LongType)
    assert(invalid.schema("id").dataType == LongType)
    // no helper columns leak
    assert(valid.columns.toSeq == Seq("id", "v"))
  }

  test("schema-only depth runs zero data checks") {
    val schema = DataFrameSchema("price" -> ColumnSchema.of(DoubleType, Check.ge(0.0)))
    val res = graft.backend.Validator.validate(schema, df,
      depth = graft.errors.GraftConfig.SchemaOnly)
    assert(res.passed) // the ge(0) failure is a DATA check, skipped
  }

  test("validation report JSON shape") {
    val schema = DataFrameSchema("price" -> ColumnSchema.of(DoubleType, Check.ge(0.0)))
    val res = schema.validate(df)
    assert(res.reportJson.contains("\"DATA\""))
    assert(res.reportJson.contains("DATAFRAME_CHECK"))
  }

  test("defaults apply BEFORE coercion: un-coercible values are counted, not defaulted (r18 review)") {
    import spark.implicits._
    // reference order (backends/pandas/container.py:86-90): set_defaults
    // then coerce_dtype — the old coerce-first order let "abc" fall
    // through to the default silently (the failure condition tested the
    // post-default, never-null column)
    val d = Seq(Some("abc"), Some("7"), Option.empty[String]).toDF("age")
    val schema = DataFrameSchema("age" -> ColumnSchema(
      Some(IntegerType), Nil, coerce = true, default = Some(0)))
    val res = schema.validate(d)
    val coErr = res.errors.find(_.check.startsWith("coerce_dtype"))
    assert(coErr.exists(_.failureCount == 1L),
      s"'abc' must count as a coercion failure, got ${res.errors}")
    // the ORIGINAL null takes the default; "abc" coerces to null (try_cast)
    val vals = res.data.collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getInt(0))).toSet
    assert(vals == Set(None, Some(7), Some(0)),
      s"null→default 0, '7'→7, 'abc'→null; got $vals")
  }

  test("warning-only checks never drop or quarantine rows (r18 review)") {
    import spark.implicits._
    val d = Seq((1L, 5.0), (2L, 500.0)).toDF("id", "v")
    val schema = DataFrameSchema(
      "id" -> ColumnSchema(Some(LongType), Nil, nullable = false),
      "v" -> ColumnSchema(Some(DoubleType),
        Seq(Check.inRange(0.0, 100.0).copy(raiseWarning = true))))
      .copy(dropInvalidRows = true)
    val res = schema.validate(d)
    assert(res.data.count() == 2L,
      "an advisory failure must not remove rows under dropInvalidRows")
    assert(res.passed, "warnings do not fail validation")
    // the warning is still REPORTED on the non-dropping path (the
    // dropInvalidRows path skips row-error bookkeeping by design)
    val reported = schema.copy(dropInvalidRows = false).validate(d)
    assert(reported.passed && reported.errors.exists(_.isWarning),
      "the advisory failure reports as a warning without failing")
    val (valid, invalid) = graft.backend.Validator.splitByRowChecks(
      schema.copy(dropInvalidRows = false), d)
    assert(valid.count() == 2L && invalid.count() == 0L,
      "the quarantine split must not route advisory failures to invalid")
  }

  test("a DataFrameParser-created column is validated (r18 review)") {
    import spark.implicits._
    val d = Seq(("  x  ", 1L), ("", 2L)).toDF("raw", "id")
    val schema = new DataFrameSchema(
      columns = Seq(
        "id" -> ColumnSchema(Some(LongType), Nil, nullable = false),
        "norm" -> ColumnSchema(Some(StringType),
          Seq(graft.checks.ColumnCheck("nonblank",
            c => org.apache.spark.sql.functions.length(c) > 0)),
          nullable = false)),
      parsers = Seq(graft.schema.DataFrameParser("derive_norm",
        df0 => df0.withColumn("norm",
          org.apache.spark.sql.functions.trim(
            org.apache.spark.sql.functions.col("raw"))))))
    val res = graft.backend.Validator.validate(schema, d)
    // the parser created 'norm'; the blank row must FAIL its check — the
    // old presence snapshot (taken before parsers) skipped it silently
    assert(res.errors.exists(e =>
      e.column.contains("norm") && e.failureCount == 1L),
      s"parser-created column must be checked, got ${res.errors}")
  }

  test("table-level unique on a missing column accumulates, not crashes (r18 review)") {
    import spark.implicits._
    val d = Seq((1L, "a")).toDF("id", "x")
    val schema = new DataFrameSchema(
      columns = Seq("id" -> ColumnSchema(Some(LongType))),
      unique = Seq("id", "region"))
    val res = graft.backend.Validator.validate(schema, d)
    assert(!res.passed)
    assert(res.errors.exists(e =>
      e.check.startsWith("multiple_fields_uniqueness") &&
        e.message.contains("region")),
      s"missing unique key column must be an accumulated error, got ${res.errors}")
  }
}
