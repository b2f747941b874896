package graft

import org.apache.spark.sql.types._
import graft.checks.Check
import graft.io.SchemaIO
import graft.model.{DataFrameModel, Decorators}
import graft.schema._
import graft.synth.Synthesize

case class Item(id: Long, name: String, price: Double, active: Boolean)

class IoModelSynthSpec extends SparkSpec {
  import spark.implicits._

  private val schema = DataFrameSchema(
    "id" -> ColumnSchema(Some(LongType), Seq(Check.ge(0L)), nullable = false, unique = true),
    "name" -> ColumnSchema(Some(StringType),
      Seq(Check.strStartswith("item-"), Check.strLength(Some(6), Some(20)))),
    "price" -> ColumnSchema(Some(DoubleType), Seq(Check.inRange(0.5, 99.5))),
    "flag" -> ColumnSchema(Some(StringType), Seq(Check.isin(Seq("A", "B", "C"))), coerce = true),
    "ts" -> ColumnSchema(Some(TimestampType)))
    .copy(unique = Seq("id"), strict = Strict.Filter, ordered = false,
      name = Some("items"), reportDuplicates = ReportDuplicates.ExcludeFirst)

  test("YAML round trip preserves the full schema document") {
    val yaml = SchemaIO.toYaml(schema)
    val back = SchemaIO.fromYaml(yaml)
    assert(back.columnNames == schema.columnNames)
    assert(back.strict == Strict.Filter)
    assert(back.unique == Seq("id"))
    assert(back.reportDuplicates == ReportDuplicates.ExcludeFirst)
    assert(back.column("id").get.unique)
    assert(!back.column("id").get.nullable)
    assert(back.column("id").get.dtype.contains(LongType))
    assert(back.column("flag").get.coerce)
    val names = back.column("name").get.checks.map(_.name).toSet
    assert(names == Set("str_startswith", "str_length"))
    // and round-trip again: stable fixpoint
    assert(SchemaIO.toYaml(back) == yaml)
  }

  test("JSON round trip") {
    val back = SchemaIO.fromJson(SchemaIO.toJson(schema))
    assert(back.columnNames == schema.columnNames)
    assert(back.column("price").get.checks.head.name == "in_range")
  }

  test("pandera dtype spellings parse") {
    assert(SchemaIO.nameToDtype("int64") == LongType)
    assert(SchemaIO.nameToDtype("datetime64[ns]") == TimestampType)
    assert(SchemaIO.nameToDtype("str") == StringType)
    assert(SchemaIO.nameToDtype("decimal(10,2)") == DecimalType(10, 2))
    assert(SchemaIO.dtypeToName(DoubleType) == "float64")
  }

  test("hypothesis registry: YAML round trip, Custom unserializable, unknown flat key errors") {
    import graft.hypothesis.Hypothesis
    // registered hypothesis survives the round trip and rebuilds BY NAME
    val hyp = Hypothesis.registry("one_sample_ttest",
      Map("popmean" -> 5.0, "relationship" -> "GreaterThan", "alpha" -> 0.05))
    val s = DataFrameSchema("price" -> ColumnSchema(Some(DoubleType), Seq(hyp)))
    assert(SchemaIO.unserializable(s).isEmpty)
    val back = SchemaIO.fromYaml(SchemaIO.toYaml(s))
    val bc = back.column("price").get.checks.head
    assert(bc.name == "one_sample_ttest")
    assert(bc.statistics("popmean") == 5.0)
    assert(bc.statistics("relationship") == "GreaterThan")
    assert(SchemaIO.toYaml(back) == SchemaIO.toYaml(s))
    // reference snake-case relationship spellings parse too
    assert(Hypothesis.relationshipFromString("not_equal") == Hypothesis.NotEqual)
    // a Custom relationship cannot round-trip → reported unserializable
    val custom = Hypothesis.oneSampleTtest(1.0,
      Hypothesis.Custom((stat, _) => stat > 0), alpha = 0.05)
    val s2 = DataFrameSchema("price" -> ColumnSchema(Some(DoubleType), Seq(custom)))
    assert(SchemaIO.unserializable(s2).nonEmpty)
    // unknown registry name fails fast
    intercept[RuntimeException](Hypothesis.registry("no_such_hypothesis", Map.empty))
    // r7: an unrecognized flat check key is an ERROR, not a silent skip
    val doc =
      """schema_type: dataframe
        |columns:
        |  x:
        |    dtype: float64
        |    greater_thann: 0
        |""".stripMargin
    val err = intercept[IllegalArgumentException](SchemaIO.fromYaml(doc))
    assert(err.getMessage.contains("greater_thann"))
    // ...but only for FLAT documents: when a checks: slot is present it
    // wins (reference returns early), so a producer-extension key next to
    // it is NOT a check candidate and must not error
    val docWithSlot =
      """schema_type: dataframe
        |columns:
        |  x:
        |    dtype: float64
        |    vendor_extension_key: whatever
        |    checks:
        |      greater_than: 0
        |""".stripMargin
    val loaded = SchemaIO.fromYaml(docWithSlot)
    assert(loaded.column("x").get.checks.map(_.name) == Seq("greater_than"))
    // string-typed equal_var parses like the other string-tolerant fields
    // (regression: "true" == true is false → silently flipped to Welch)
    val pooled = Hypothesis.registry("two_sample_ttest", Map(
      "groupby" -> "g", "sample1" -> "a", "sample2" -> "b",
      "relationship" -> "not_equal", "alpha" -> "0.01", "equal_var" -> "true"))
    assert(pooled.statistics("equal_var") == true)
  }

  test("aggregate builtin checks round-trip through YAML (r7: previously dropped)") {
    val s = DataFrameSchema("price" -> ColumnSchema(Some(DoubleType), Seq(
      Check.uniqueValuesEq(Seq("A", "B")),
      Check.approxDistinctBetween(2L, 100L),
      Check.quantileBetween(0.5, 1.0, 50.0),
      Check.meanBetween(0.0, 10.0),
      Check.stddevBetween(0.0, 5.0))))
    assert(SchemaIO.unserializable(s).isEmpty)
    val back = SchemaIO.fromYaml(SchemaIO.toYaml(s))
    val names = back.column("price").get.checks.map(_.name).toSet
    assert(names == Set("unique_values_eq", "approx_distinct_between",
      "quantile_between", "mean_between", "stddev_between"))
    assert(SchemaIO.toYaml(back) == SchemaIO.toYaml(s))
    val q = back.column("price").get.checks.find(_.name == "quantile_between").get
    assert(q.statistics("prob") == 0.5 && q.statistics("accuracy") == 10000)
  }

  test("toScript emits compilable-looking schema code") {
    val code = SchemaIO.toScript(schema)
    assert(code.contains("Check.inRange(0.5, 99.5)"))
    assert(code.contains("\"id\" -> ColumnSchema"))
  }

  test("evalScript compiles the emitted code into a LIVE equivalent schema (r9)") {
    val compiled = SchemaIO.evalScript(SchemaIO.toScript(schema))
    assert(compiled.columns.map(_._1) == schema.columns.map(_._1))
    // same dtypes, nullability and serializable check set — the emitted
    // script is real code, not a string that merely looks compilable
    schema.columns.foreach { case (n, c) =>
      val cc = compiled.column(n).get
      assert(cc.dtype == c.dtype && cc.nullable == c.nullable, n)
    }
    // escaping survives the compile: a check value with quotes/backslashes
    val tricky = DataFrameSchema("s" -> ColumnSchema(Some(StringType),
      Seq(Check.isin(Seq("a\"b", "c\\d")), Check.strContains("x\"y"))))
    val back = SchemaIO.evalScript(SchemaIO.toScript(tricky))
    val isin = back.column("s").get.checks.find(_.name == "isin").get
    assert(isin.statistics("allowed_values") == Seq("a\"b", "c\\d"))
  }

  test("ValidatedIO: validate-on-read and validate-then-write boundaries") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vio").toString
    val schema = DataFrameSchema(
      "id" -> ColumnSchema(Some(LongType), Seq(Check.ge(0L)), nullable = false),
      "v" -> ColumnSchema(Some(DoubleType), Seq(Check.le(10.0))))
    val good = Seq((1L, 5.0), (2L, 7.5)).toDF("id", "v")
    val bad = Seq((1L, 5.0), (2L, 99.0)).toDF("id", "v")

    // passing write lands data; read-back validates clean
    val wres = graft.io.ValidatedIO.write(schema, good, s"$dir/ok", "parquet")
    assert(wres.passed)
    val rres = graft.io.ValidatedIO.read(spark, schema, s"$dir/ok")
    assert(rres.passed && rres.data.count() == 2)

    // failing write is withheld from the sink
    val fres = graft.io.ValidatedIO.write(schema, bad, s"$dir/blocked", "parquet")
    assert(!fres.passed)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/blocked")))

    // dropInvalidRows turns the sink into a quarantine: survivors land
    val dres = graft.io.ValidatedIO.write(
      schema.copy(dropInvalidRows = true), bad, s"$dir/quarantined", "parquet")
    assert(spark.read.parquet(s"$dir/quarantined").count() == 1)

    // csv read uses the declared schema (no inference) and flags bad rows
    good.write.option("header", "true").csv(s"$dir/csv")
    val cres = graft.io.ValidatedIO.read(spark, schema, s"$dir/csv", "csv",
      Map("header" -> "true"))
    assert(cres.passed && cres.data.schema("id").dataType == LongType)
  }

  test("ValidatedIO.write: schema-level failures withhold the quarantine write") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vio2").toString
    val schema = DataFrameSchema(
      "id" -> ColumnSchema(Some(LongType), Seq(Check.ge(0L)), nullable = false),
      "missing_col" -> ColumnSchema(Some(DoubleType)))
      .copy(dropInvalidRows = true)
    // a structural failure (required column absent) cannot be cured by
    // row-dropping: even with dropInvalidRows, nothing may land in the sink
    val df = Seq((1L, 5.0), (2L, 7.5)).toDF("id", "v")
    val res = graft.io.ValidatedIO.write(schema, df, s"$dir/blocked", "parquet")
    assert(!res.passed)
    assert(res.errors.exists(_.category == graft.errors.ErrorCategory.SCHEMA))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/blocked")))
  }

  test("ValidatedIO.write: cache knob persists the source across validate+write") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vio3").toString
    val schema = DataFrameSchema(
      "id" -> ColumnSchema(Some(LongType), Seq(Check.ge(0L)), nullable = false),
      "v" -> ColumnSchema(Some(DoubleType)))
    val df = Seq((1L, 5.0), (2L, 7.5), (3L, 1.0)).toDF("id", "v")
    graft.errors.GraftConfig.cacheOverride = Some(true)
    graft.errors.GraftConfig.keepCachedOverride = Some(true)
    try {
      val res = graft.io.ValidatedIO.write(schema, df, s"$dir/cached", "parquet")
      assert(res.passed)
      // the write-side plan replays from the persisted source — the
      // validated frame resolves to an InMemoryRelation, not a re-scan
      assert(res.data.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"))
      assert(spark.read.parquet(s"$dir/cached").count() == 3)
    } finally {
      graft.errors.GraftConfig.cacheOverride = None
      graft.errors.GraftConfig.keepCachedOverride = None
      df.unpersist()
    }
  }

  test("model DSL: derive from case class, attach checks, validate Dataset") {
    val ds = Seq(Item(1, "a", 5.0, true), Item(2, "b", 6.0, false)).toDS()
    val m = DataFrameModel.of[Item]
      .field("price", Check.gt(0.0))
      .unique("id").notNullable("name")
    assert(m.schema.columnNames == Seq("id", "name", "price", "active"))
    assert(m.schema.column("id").get.dtype.contains(LongType))
    val res = m.validate(ds)
    assert(res.passed)
    assert(res.orThrow.collect().length == 2)
    val bad = Seq(Item(1, "a", -5.0, true)).toDS()
    assert(!m.validate(bad).passed)
  }

  test("model DSL: config applies schema-wide options incl. uniform dtype") {
    val m = DataFrameModel.of[Item]
      .config(name = Some("items"), coerce = Some(true),
        ordered = Some(true), unique = Some(Seq("id", "name")))
    assert(m.schema.name.contains("items"))
    assert(m.schema.coerce && m.schema.ordered)
    assert(m.schema.unique == Seq("id", "name"))
    // uniform dtype override stamps every column (Config.dtype semantics)
    val all = DataFrameModel.of[Item].config(dtype = Some(StringType)).schema
    assert(all.getDtypes.values.toSet == Set(StringType))
    // coercing uniform-string schema validates the typed data
    val ds = Seq(Item(1, "a", 5.0, true)).toDS()
    assert(all.coerceDtype().validate(ds.toDF()).passed)
  }

  test("model DSL: parser hooks transform before checks; alias and regex fields") {
    import org.apache.spark.sql.functions._
    val ds = Seq(Item(1, "a", 150.0, true), Item(2, "b", 6.0, false)).toDS()
    // column parser clips price BEFORE the le check → passes, data parsed
    val m = DataFrameModel.of[Item]
      .parser("price", "clip_le_100")(c => least(c, lit(100.0)))
      .field("price", Check.le(100.0))
    val res = m.validate(ds)
    assert(res.passed, res.errors.map(_.message).mkString("; "))
    assert(res.data.collect().map(_.price).max == 100.0)
    // dataframe parser runs first too
    val m2 = DataFrameModel.of[Item]
      .dataframeParser("abs_price")(df => df.withColumn("price", abs(col("price"))))
      .field("price", Check.ge(0.0))
    val neg = Seq(Item(1, "a", -5.0, true)).toDS()
    assert(m2.validate(neg).passed)
    // alias: the field validates under the dataframe column name
    val aliased = DataFrameModel.of[Item].alias("price", "unit_price")
      .field("unit_price", Check.ge(0.0))
    val df = ds.toDF().withColumnRenamed("price", "unit_price")
    assert(aliased.validateDf(df).passed)
    assert(!aliased.validateDf(
      neg.toDF().withColumnRenamed("price", "unit_price")).passed)
    // regex field constrains columns beyond the typed ones
    val withExtra = ds.toDF()
      .withColumn("m_a", lit(1.0)).withColumn("m_b", lit(-2.0))
    val rx = DataFrameModel.of[Item].regexField("m_.*", Check.gt(0.0))
    val rxRes = rx.validateDf(withExtra)
    assert(rxRes.hardErrors.map(_.column.get) == Seq("m_b"))
  }

  test("decorators: checkInput / checkOutput / checkIo wrap function boundaries") {
    val in = DataFrameSchema("v" -> ColumnSchema(Some(LongType), Seq(Check.ge(0L))))
    val out = DataFrameSchema("v2" -> ColumnSchema(Some(LongType), Seq(Check.ge(0L))))
    val f = Decorators.checkIo(in, out)(df => df.selectExpr("v * 2 AS v2"))
    val good = Seq(1L, 2L).toDF("v")
    assert(f(good).collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 4L))
    val bad = Seq(-1L).toDF("v")
    intercept[graft.errors.SchemaErrorException] { f(bad) }
  }

  test("synthesis invariant: generated data validates against its schema") {
    val df = Synthesize.dataFrame(spark, schema, 2000, seed = 7)
    assert(df.count() == 2000)
    val res = schema.validate(df)
    assert(res.passed, res.errors.map(_.message).mkString("; "))
  }

  test("synthesis is deterministic in (seed, n) and partition-independent") {
    val a = Synthesize.dataFrame(spark, schema, 100, seed = 7).collect().map(_.toString).sorted
    val b = Synthesize.dataFrame(spark, schema, 100, seed = 7)
      .repartition(13).collect().map(_.toString).sorted
    assert(a.sameElements(b))
    val c = Synthesize.dataFrame(spark, schema, 100, seed = 8).collect().map(_.toString).sorted
    assert(!a.sameElements(c))
  }

  test("synthesis honors eq, isin, unique and nullable") {
    val s = DataFrameSchema(
      "k" -> ColumnSchema(Some(LongType), Seq(Check.equalTo(5L)), nullable = false),
      "cat" -> ColumnSchema(Some(StringType), Seq(Check.isin(Seq("x", "y")))),
      "u" -> ColumnSchema(Some(LongType), nullable = false, unique = true))
    val df = Synthesize.dataFrame(spark, s, 500, seed = 1)
    val res = s.validate(df)
    assert(res.passed, res.errors.map(_.message).mkString("; "))
    assert(df.select("k").distinct().collect().map(_.getLong(0)).toSeq == Seq(5L))
  }

  test("ModelStore: merges and weights round-trip exactly, incl. unicode and extreme doubles") {
    val dir = java.nio.file.Files.createTempDirectory("graft-modelstore-spec").toString
    val merges = Seq("t" -> "h", "Ä" -> "中", "\"q\"" -> "\\b", "a b" -> "\t")
    graft.ext.ModelStore.saveBpeMerges(merges, s"$dir/m.json")
    assert(graft.ext.ModelStore.loadBpeMerges(s"$dir/m.json") == merges)
    val w = Array(0.1 + 0.2, -1.7976931348623157e308, 4.9e-324, 0.0, -0.0, 42.0)
    graft.ext.ModelStore.saveLinearWeights(w, s"$dir/w.json")
    val l = graft.ext.ModelStore.loadLinearWeights(s"$dir/w.json")
    assert(w.zip(l).forall { case (a, b) =>
      java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b) })
    intercept[IllegalArgumentException] {
      graft.ext.ModelStore.loadBpeMerges(s"$dir/w.json") // wrong format sentinel
    }
  }

  test("ValidatedIO.readQuarantined: malformed csv/json records surface raw, good rows validate") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-quarantine").toString
    val schema = DataFrameSchema(
      "id" -> ColumnSchema(Some(LongType), Nil, nullable = false),
      "name" -> ColumnSchema(Some(StringType)))
    // csv: one arity-mismatch line, one unparseable id
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.csv"),
      "1,alpha\n2,beta\nonly_one_field\nnope,gamma\n3,delta\n".getBytes("UTF-8"))
    val (cres, cbad) = graft.io.ValidatedIO.readQuarantined(
      spark, schema, s"$dir/a.csv", "csv")
    assert(cres.passed)
    assert(cres.data.count() == 3L)
    assert(cbad.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("nope,gamma", "only_one_field"))
    // json: a syntactically-broken line is quarantined raw
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b.json"),
      """{"id": 1, "name": "alpha"}
        |{"id": 2 "name": "broken"}
        |{"id": 3, "name": "gamma"}
        |""".stripMargin.getBytes("UTF-8"))
    val (jres, jbad) = graft.io.ValidatedIO.readQuarantined(
      spark, schema, s"$dir/b.json", "json")
    assert(jres.passed)
    assert(jres.data.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(jbad.count() == 1L &&
      jbad.head().getString(0).contains("\"broken\""))
    // parquet is rejected: corrupt-record capture is a text-format concept
    intercept[IllegalArgumentException] {
      graft.io.ValidatedIO.readQuarantined(spark, schema, dir, "parquet")
    }
    // nullable=false violations in WELL-FORMED rows are validation
    // failures, not quarantine rows
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/c.csv"),
      "1,alpha\n,beta\n".getBytes("UTF-8"))
    val (nres, nbad) = graft.io.ValidatedIO.readQuarantined(
      spark, schema, s"$dir/c.csv", "csv")
    assert(nbad.count() == 0L)
    assert(!nres.passed && nres.errors.exists(_.check.contains("not_nullable")))
  }
}
