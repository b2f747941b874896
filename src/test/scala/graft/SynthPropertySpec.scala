package graft

import org.apache.spark.sql.types._
import org.scalacheck.{Gen, rng}
import graft.checks.Check
import graft.schema.{ColumnSchema, DataFrameSchema}
import graft.synth.Synthesize

/** The synthesis invariant from the reference's property suite
  * (tests/strategies/test_strategies.py:128-160): data generated FROM a
  * schema must VALIDATE against that schema — here over randomly drawn
  * constrained schemas (ScalaCheck generators, fixed seeds, so failures
  * reproduce). Round 2 extends the drawn kinds to cover ALL 15 builtin
  * checks: str_matches, str_contains, ne and standalone notin included
  * (the round-1 gap), plus unique columns with UPPER bounds.
  */
class SynthPropertySpec extends SparkSpec {

  private val genNumericCol: Gen[ColumnSchema] = for {
    lo <- Gen.choose(-1000.0, 1000.0)
    span <- Gen.choose(10.0, 500.0)
    dt <- Gen.oneOf[DataType](LongType, DoubleType)
    kind <- Gen.oneOf(0, 1, 2, 3, 4)
    nullable <- Gen.oneOf(true, false)
  } yield {
    val (l, h) = (math.floor(lo), math.floor(lo + span))
    val checks = kind match {
      case 0 => Seq(Check.inRange(l, h))
      case 1 => Seq(Check.ge(l))
      case 2 => Seq(Check.le(h))
      case 3 => // standalone notin: forbidden integers inside the range
        Seq(Check.inRange(l, h),
          Check.notin(Seq(l.toLong + 1, l.toLong + 3, h.toLong - 1)))
      case 4 => // ne carves one value out
        Seq(Check.ge(l), Check.ne(l.toLong + 2))
    }
    ColumnSchema(Some(dt), checks, nullable = nullable)
  }

  private val regexPool = Seq(
    "[a-c]{3}\\d{2}",
    "(foo|bar)+",
    "^id-\\d{4}",
    "[a-z]+@[a-z]{3}\\.(com|org)",
    "a?b+c{2,5}",
    "v\\d+\\.\\d+",
    "(north|south)-(east|west)")

  private val genStringCol: Gen[ColumnSchema] = for {
    kind <- Gen.oneOf(0, 1, 2, 3, 4, 5, 6, 7)
    values <- Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))
      .map(_.distinct.take(5)).suchThat(_.size >= 2)
    prefix <- Gen.alphaStr.suchThat(s => s.nonEmpty && s.length <= 6)
    pattern <- Gen.oneOf(regexPool)
    nullable <- Gen.oneOf(true, false)
  } yield kind match {
    case 0 => ColumnSchema(Some(StringType), Seq(Check.isin(values)),
      nullable = nullable)
    case 1 => ColumnSchema(Some(StringType),
      Seq(Check.strStartswith(prefix),
        Check.strLength(Some(prefix.length), Some(prefix.length + 12))),
      nullable = nullable)
    case 2 => // notin carves values out of isin
      ColumnSchema(Some(StringType),
        Seq(Check.isin(values), Check.notin(values.tail)), nullable = nullable)
    case 3 => ColumnSchema(Some(StringType), Seq(Check.equalTo(values.head)),
      nullable = nullable)
    case 4 => // regex match (anchored) — round-2 generator
      ColumnSchema(Some(StringType), Seq(Check.strMatches(pattern)),
        nullable = nullable)
    case 5 => // regex contains + a minimum length
      ColumnSchema(Some(StringType),
        Seq(Check.strContains(pattern), Check.strLength(Some(3), None)),
        nullable = nullable)
    case 6 => // standalone notin over free strings
      ColumnSchema(Some(StringType), Seq(Check.notin(values)),
        nullable = nullable)
    case 7 => // ne over free strings
      ColumnSchema(Some(StringType), Seq(Check.ne(values.head)),
        nullable = nullable)
  }

  private val genUniqueCol: Gen[ColumnSchema] = for {
    lo <- Gen.choose(-1000L, 1000L)
    bounded <- Gen.oneOf(true, false)
  } yield {
    // upper-bounded unique columns: span 5000 >> n=300 rows (round-1 bug:
    // the generator ignored hi entirely)
    val checks = if (bounded) Seq(Check.inRange(lo.toDouble, lo.toDouble + 5000.0))
                 else Seq(Check.ge(lo.toDouble))
    ColumnSchema(Some(LongType), checks, nullable = false, unique = true)
  }

  // round-4 generator: temporal columns with drawn bounds — gt/ge/lt/le/
  // in_range over Date (epoch-day domain) and Timestamp (epoch-micro)
  private val genTemporalCol: Gen[ColumnSchema] = for {
    startDay <- Gen.choose(15000L, 20000L) // ~2011..2024 epoch days
    spanDays <- Gen.choose(30L, 2000L)
    isDate <- Gen.oneOf(true, false)
    kind <- Gen.oneOf(0, 1, 2, 3)
    nullable <- Gen.oneOf(true, false)
  } yield {
    def day(d: Long) = java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(d))
    def ts(d: Long) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.ofEpochDay(d).atStartOfDay)
    val (lo, hi): (Any, Any) =
      if (isDate) (day(startDay), day(startDay + spanDays))
      else (ts(startDay), ts(startDay + spanDays))
    val checks = kind match {
      case 0 => Seq(Check.inRange(lo, hi))
      case 1 => Seq(Check.ge(lo), Check.le(hi))
      case 2 => Seq(Check.gt(lo), Check.lt(hi))
      case 3 => Seq(Check.ge(lo))
    }
    ColumnSchema(Some(if (isDate) DateType else TimestampType), checks,
      nullable = nullable)
  }

  private val genSchema: Gen[DataFrameSchema] = for {
    n <- Gen.choose(1, 4)
    cols <- Gen.listOfN(n, Gen.frequency(
      4 -> genNumericCol, 4 -> genStringCol, 2 -> genTemporalCol, 1 -> genUniqueCol))
  } yield new DataFrameSchema(
    columns = cols.zipWithIndex.map { case (c, i) => s"c$i" -> c })

  test("synthesized data validates against randomly drawn schemas") {
    val params = Gen.Parameters.default
    (1 to 40).foreach { i =>
      val schema = genSchema.pureApply(params, rng.Seed(i.toLong), retries = 200)
      val df = Synthesize.dataFrame(spark, schema, 300, seed = i.toLong)
      val res = schema.validate(df)
      assert(res.passed,
        s"seed=$i schema=${schema.columns.map { case (n, c) =>
          s"$n:${c.dtype.get.simpleString}:${c.checks.map(_.described).mkString("+")}"
        }.mkString(", ")} errors=${res.errors.map(_.message).mkString("; ")}")
      assert(df.count() == 300)
    }
  }

  test("every regex in the pool synthesizes anchored matches") {
    regexPool.foreach { p =>
      val schema = DataFrameSchema(
        "s" -> ColumnSchema(Some(StringType), Seq(Check.strMatches(p)), nullable = false))
      val res = schema.validate(Synthesize.dataFrame(spark, schema, 200, seed = 7))
      assert(res.passed, s"pattern '$p': ${res.errors.map(_.message).mkString("; ")}")
    }
  }

  test("unique integer column refuses n > span instead of overflowing hi") {
    val schema = DataFrameSchema(
      "u" -> ColumnSchema(Some(LongType),
        Seq(Check.inRange(0.0, 9.0)), nullable = false, unique = true))
    val e = intercept[RuntimeException] {
      Synthesize.dataFrame(spark, schema, 100, seed = 1)
    }
    assert(e.getMessage.contains("unique"))
    // exactly-fitting span works and stays in range + unique
    val fits = DataFrameSchema(
      "u" -> ColumnSchema(Some(LongType),
        Seq(Check.inRange(0.0, 99.0)), nullable = false, unique = true))
    assert(fits.validate(Synthesize.dataFrame(spark, fits, 100, seed = 1)).passed)
    // unique + ne: the forbidden value is skipped, uniqueness preserved
    val withNe = DataFrameSchema(
      "u" -> ColumnSchema(Some(LongType),
        Seq(Check.ge(0L), Check.ne(3L)), nullable = false, unique = true))
    assert(withNe.validate(Synthesize.dataFrame(spark, withNe, 50, seed = 1)).passed)
    // unique doubles respect the upper bound via spacing
    val dbl = DataFrameSchema(
      "u" -> ColumnSchema(Some(DoubleType),
        Seq(Check.inRange(0.0, 1.0)), nullable = false, unique = true))
    assert(dbl.validate(Synthesize.dataFrame(spark, dbl, 500, seed = 1)).passed)
  }

  test("temporal bounds: infer → synthesize → validate round-trips (r3 verdict #1)") {
    import spark.implicits._
    // a frame with Date, Timestamp and numeric columns; infer attaches
    // ge(min)/le(max) with TEMPORAL statistic values — synthesis used to
    // throw NumberFormatException on them
    val src = Seq(
      (java.sql.Date.valueOf("2021-03-01"), java.sql.Timestamp.valueOf("2021-03-01 10:00:00"), 5.0),
      (java.sql.Date.valueOf("2022-07-15"), java.sql.Timestamp.valueOf("2022-07-15 23:59:59"), 9.5),
      (java.sql.Date.valueOf("2023-11-30"), java.sql.Timestamp.valueOf("2023-11-30 00:00:01"), 1.25)
    ).toDF("d", "ts", "v")
    val inferred = graft.inference.InferSchema.infer(src)
    val synth = Synthesize.dataFrame(spark, inferred, 2000, seed = 3)
    val res = inferred.validate(synth)
    assert(res.passed, res.errors.map(_.message).mkString("; "))
    // bounds genuinely respected, not vacuously (values span inside [min,max])
    val row = synth.agg(
      org.apache.spark.sql.functions.min($"d"), org.apache.spark.sql.functions.max($"d"),
      org.apache.spark.sql.functions.min($"ts"), org.apache.spark.sql.functions.max($"ts")).head()
    assert(!row.getDate(0).before(java.sql.Date.valueOf("2021-03-01")))
    assert(!row.getDate(1).after(java.sql.Date.valueOf("2023-11-30")))
    assert(!row.getTimestamp(2).before(java.sql.Timestamp.valueOf("2021-03-01 10:00:00")))
    assert(!row.getTimestamp(3).after(java.sql.Timestamp.valueOf("2023-11-30 00:00:01")))
  }

  test("temporal checks: explicit gt/lt and unique date/timestamp columns") {
    val loD = java.sql.Date.valueOf("2020-06-01")
    val hiD = java.sql.Date.valueOf("2020-06-30")
    val schema = DataFrameSchema(
      "d" -> ColumnSchema(Some(DateType),
        Seq(Check.gt(loD), Check.lt(hiD)), nullable = false),
      "ts" -> ColumnSchema(Some(TimestampType),
        Seq(Check.ge(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
          Check.le(java.sql.Timestamp.valueOf("2024-01-02 00:00:00"))), nullable = false),
      "ud" -> ColumnSchema(Some(DateType),
        Seq(Check.inRange(java.sql.Date.valueOf("2019-01-01"),
          java.sql.Date.valueOf("2019-12-31"))), nullable = false, unique = true))
    val df = Synthesize.dataFrame(spark, schema, 300, seed = 11)
    val res = schema.validate(df)
    assert(res.passed, res.errors.map(_.message).mkString("; "))
    // strict bounds: gt excludes the bound day itself
    assert(df.filter(org.apache.spark.sql.functions.col("d") <= loD).count() == 0)
    assert(df.filter(org.apache.spark.sql.functions.col("d") >= hiD).count() == 0)
    // unique date refuses n > span
    val e = intercept[RuntimeException] {
      Synthesize.dataFrame(spark, schema, 400, seed = 11)
    }
    assert(e.getMessage.contains("unique"))
  }

  test("gate shape: infer(lineitem) incl. timestamp_ntz synthesizes and validates") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val inferred = graft.inference.InferSchema.infer(li)
    val df = Synthesize.dataFrame(spark, inferred, 2000, seed = 42)
    val res = inferred.validate(df)
    assert(res.passed, res.errors.map(_.message).mkString("; "))
    assert(df.count() == 2000)
  }

  test("joint uniqueness: schema.unique tuples are distinct by construction") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    // finite×finite×unbounded: 3 regions × 10 buckets = 30 < 2000 rows →
    // the free string column absorbs the quotient
    val schema = new DataFrameSchema(
      columns = Seq(
        "region" -> ColumnSchema(Some(StringType),
          Seq(Check.isin(Seq("NA", "EU", "APAC"))), nullable = false),
        "bucket" -> ColumnSchema(Some(LongType),
          Seq(Check.inRange(0L, 9L)), nullable = false),
        "label" -> ColumnSchema(Some(StringType), Nil, nullable = false),
        "score" -> ColumnSchema(Some(DoubleType),
          Seq(Check.inRange(0.0, 1.0)))),
      unique = Seq("region", "bucket", "label"))
    val df = Synthesize.dataFrame(spark, schema, 2000, seed = 5)
    val res = schema.validate(df)
    assert(res.passed, res.errors.map(_.message).mkString("; "))
    // all three key columns genuinely vary (no degenerate single-value fix)
    val r = df.agg(countDistinct(col("region")), countDistinct(col("bucket")),
      countDistinct(col("label"))).head()
    assert(r.getLong(0) == 3 && r.getLong(1) == 10 && r.getLong(2) >= 2000 / 30)

    // finite-only domain large enough: no unbounded column needed
    val finite = new DataFrameSchema(
      columns = Seq(
        "a" -> ColumnSchema(Some(LongType), Seq(Check.inRange(0L, 49L)), nullable = false),
        "b" -> ColumnSchema(Some(LongType), Seq(Check.inRange(0L, 19L)), nullable = false)),
      unique = Seq("a", "b"))
    assert(finite.validate(Synthesize.dataFrame(spark, finite, 1000, seed = 5)).passed)

    // impossible joint domain errors out instead of silently violating
    val tooSmall = new DataFrameSchema(
      columns = Seq(
        "a" -> ColumnSchema(Some(LongType), Seq(Check.inRange(0L, 4L)), nullable = false),
        "b" -> ColumnSchema(Some(LongType), Seq(Check.inRange(0L, 4L)), nullable = false)),
      unique = Seq("a", "b"))
    val e = intercept[RuntimeException] {
      Synthesize.dataFrame(spark, tooSmall, 100, seed = 5)
    }
    assert(e.getMessage.contains("joint domain"))
  }

  test("nested Array/Map/Struct columns synthesize and honor the container invariants (r18)") {
    import org.apache.spark.sql.functions._
    val schema = DataFrameSchema(
      "tags" -> ColumnSchema(Some(ArrayType(StringType)), Nil, nullable = false),
      "scores" -> ColumnSchema(Some(ArrayType(DoubleType)), Nil, nullable = false),
      "attrs" -> ColumnSchema(Some(MapType(StringType, LongType)), Nil, nullable = false),
      "tmap" -> ColumnSchema(Some(MapType(LongType, DoubleType)), Nil, nullable = false),
      "deep" -> ColumnSchema(Some(ArrayType(ArrayType(LongType))), Nil, nullable = false),
      "meta" -> ColumnSchema(
        Some(StructType(Seq(StructField("a", LongType), StructField("b", StringType)))),
        Nil, nullable = false),
      "opt" -> ColumnSchema(Some(ArrayType(LongType)), Nil, nullable = true))
    val df = Synthesize.dataFrame(spark, schema, 2000, seed = 7)
    assert(schema.validate(df).passed)
    // documented invariants: 1 ≤ size ≤ 4, no null elements/keys/values,
    // map keys distinct per row (map_from_arrays would throw otherwise,
    // but assert the data, not the absence of an exception)
    val bad = df.filter(
      !size(col("tags")).between(1, 4) ||
        exists(col("tags"), e => e.isNull || length(e) === 0) ||
        !size(col("scores")).between(1, 4) ||
        exists(col("scores"), e => e.isNull || e < 0.0 || e > 1000.0) ||
        !size(col("attrs")).between(1, 4) ||
        size(array_distinct(map_keys(col("attrs")))) =!= size(col("attrs")) ||
        exists(map_values(col("attrs")), v => v.isNull || v < 0L || v > 1000L) ||
        !size(col("tmap")).between(1, 4) ||
        size(array_distinct(map_keys(col("tmap")))) =!= size(col("tmap")) ||
        !size(col("deep")).between(1, 4) ||
        exists(col("deep"), a => a.isNull || !size(a).between(1, 4)) ||
        col("meta").getField("a").isNull || col("meta").getField("b").isNull)
      .count()
    assert(bad == 0L)
    // the nullable container column actually exercises the null sprinkle
    assert(df.filter(col("opt").isNull).count() > 0)
    // determinism: the generator is pure in (seed, id). Map columns can't
    // ride a set operation — compare on entry arrays (map_from_arrays
    // preserves the build order, itself deterministic in (seed, id)).
    def comparable(x: org.apache.spark.sql.DataFrame) = x
      .withColumn("attrs", map_entries(col("attrs")))
      .withColumn("tmap", map_entries(col("tmap")))
    val again = Synthesize.dataFrame(spark, schema, 2000, seed = 7)
    assert(comparable(df).exceptAll(comparable(again)).count() == 0 &&
      comparable(again).exceptAll(comparable(df)).count() == 0)
  }

  test("decimal domains clamp to precision instead of overflowing to null (r18 review)") {
    import org.apache.spark.sql.functions._
    // the [0,1000) continuous default overflows Decimal(4,2) (max 99.99):
    // unclamped, a non-ANSI cast nulls ~90% of values — silently for the
    // bare column, as a map_from_arrays crash for the map keys
    val schema = DataFrameSchema(
      "d" -> ColumnSchema(Some(DecimalType(4, 2)), Nil, nullable = false),
      "arr" -> ColumnSchema(Some(ArrayType(DecimalType(3, 1))), Nil, nullable = false),
      "m" -> ColumnSchema(Some(MapType(DecimalType(4, 2), LongType)), Nil, nullable = false))
    val df = Synthesize.dataFrame(spark, schema, 3000, seed = 11)
    assert(schema.validate(df).passed)
    assert(df.filter(col("d").isNull ||
      exists(col("arr"), e => e.isNull) ||
      size(array_distinct(map_keys(col("m")))) =!= size(col("m"))).count() == 0)
    // unique decimals denser than the type's quantum must refuse loudly
    // (rounding would collapse equally-spaced neighbors into duplicates)
    val dense = DataFrameSchema("u" -> ColumnSchema(Some(DecimalType(4, 2)),
      Seq(Check.inRange(java.math.BigDecimal.ZERO,
        new java.math.BigDecimal("99.99"))), nullable = false, unique = true))
    val e = intercept[RuntimeException](
      Synthesize.dataFrame(spark, dense, 20000, seed = 11))
    assert(e.getMessage.contains("quantum"), e.getMessage)
    // ...but a FULL-capacity request (exactly span/quantum + 1 values
    // exist) is satisfiable and must generate, unique and in range
    // (r18 second-pass review: the first guard refused it off-by-one)
    val full = DataFrameSchema("u" -> ColumnSchema(Some(DecimalType(4, 2)),
      Seq(Check.inRange(java.math.BigDecimal.ZERO,
        new java.math.BigDecimal("99.99"))), nullable = false, unique = true))
    assert(full.validate(Synthesize.dataFrame(spark, full, 10000, seed = 11)).passed)
    // OFF-GRID bounds at full grid capacity: enumeration must snap to
    // the quantum grid (r18 third-pass review: an off-grid origin put
    // every value at a rounding midpoint, where the double→decimal cast
    // collapsed neighbors into duplicates and overshot hi)
    val offgrid = DataFrameSchema("u" -> ColumnSchema(Some(DecimalType(4, 2)),
      Seq(Check.inRange(new java.math.BigDecimal("0.005"),
        new java.math.BigDecimal("99.985"))), nullable = false, unique = true))
    assert(offgrid.validate(
      Synthesize.dataFrame(spark, offgrid, 9998, seed = 11)).passed)
  }

  test("wide-precision unique decimals enumerate exactly (r19 ADVICE)") {
    import org.apache.spark.sql.functions._
    // slots = 1e18+1 quanta — past 2^53, where the former Double grid
    // arithmetic lost exactness and could admit duplicates or
    // out-of-range values despite its epsilons; BigInt quanta are exact
    val wide = DataFrameSchema("u" -> ColumnSchema(Some(DecimalType(30, 15)),
      Seq(Check.inRange(java.math.BigDecimal.ZERO,
        new java.math.BigDecimal("1000"))), nullable = false, unique = true))
    val df = Synthesize.dataFrame(spark, wide, 5000, seed = 13)
    assert(wide.validate(df).passed)
    assert(df.select(countDistinct(col("u"))).head.getLong(0) == 5000L)
    assert(df.filter(col("u") < lit(java.math.BigDecimal.ZERO) ||
      col("u") > lit(new java.math.BigDecimal("1000"))).count() == 0)
    // negative off-grid lo at high scale: origin snaps UP onto the grid
    val neg = DataFrameSchema("u" -> ColumnSchema(Some(DecimalType(25, 12)),
      Seq(Check.inRange(new java.math.BigDecimal("-5.0000000000005"),
        new java.math.BigDecimal("5"))), nullable = false, unique = true))
    val ndf = Synthesize.dataFrame(spark, neg, 2000, seed = 13)
    assert(neg.validate(ndf).passed)
    assert(ndf.select(countDistinct(col("u"))).head.getLong(0) == 2000L)
  }

  test("narrow integral map keys clamp to the dtype range (r19 ADVICE)") {
    import org.apache.spark.sql.functions._
    // the [0,1000) numeric default cast base+ordinal out of Byte range —
    // wrapping under non-ANSI casts (duplicate/negative keys), crashing
    // under ANSI; the clamp keeps every key representable and distinct
    val schema = DataFrameSchema(
      "mb" -> ColumnSchema(Some(MapType(ByteType, LongType)), Nil, nullable = false),
      "ms" -> ColumnSchema(Some(MapType(ShortType, LongType)), Nil, nullable = false))
    val df = Synthesize.dataFrame(spark, schema, 3000, seed = 17)
    assert(schema.validate(df).passed)
    val bad = df.filter(
      size(array_distinct(map_keys(col("mb")))) =!= size(col("mb")) ||
      size(array_distinct(map_keys(col("ms")))) =!= size(col("ms")) ||
      exists(map_keys(col("mb")), k => k.isNull) ||
      exists(map_keys(col("ms")), k => k.isNull)).count()
    assert(bad == 0L)
  }

  test("constraint merging is intersection, not last-wins (r19 hunt)") {
    import org.apache.spark.sql.functions._
    // gt(50) then between(0,100): the former fold overwrote lo=51 with
    // lo=0 and ~half the rows failed gt(50)
    val sch = DataFrameSchema("v" -> ColumnSchema(Some(LongType),
      Seq(Check.greaterThan(50L), Check.inRange(0L, 100L)), nullable = false))
    val df = Synthesize.dataFrame(spark, sch, 2000, seed = 5)
    assert(sch.validate(df).passed)
    assert(df.filter(col("v") <= 50 || col("v") > 100).count() == 0)
    // two isin intersect; disjoint sets refuse at generation
    val both = DataFrameSchema("v" -> ColumnSchema(Some(StringType),
      Seq(Check.isin(Seq("a", "b", "c")), Check.isin(Seq("b", "c", "d"))),
      nullable = false))
    val d2 = Synthesize.dataFrame(spark, both, 500, seed = 5)
    assert(both.validate(d2).passed)
    assert(d2.select("v").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("b", "c")))
    // two str_length: tightest pair wins
    val len = DataFrameSchema("v" -> ColumnSchema(Some(StringType),
      Seq(Check.strLength(Some(3), None), Check.strLength(Some(6), Some(20))),
      nullable = false))
    assert(len.validate(Synthesize.dataFrame(spark, len, 500, seed = 5)).passed)
    // conflicting duplicate regexes refuse loudly
    val e = intercept[RuntimeException](Synthesize.dataFrame(spark,
      DataFrameSchema("v" -> ColumnSchema(Some(StringType),
        Seq(Check.strMatches("[a-z]{3}"), Check.strMatches("[0-9]{3}")),
        nullable = false)), 10, seed = 5))
    assert(e.getMessage.contains("str_matches"))
    // ordering bounds on strings refuse instead of crashing/ignoring
    val e2 = intercept[RuntimeException](Synthesize.dataFrame(spark,
      DataFrameSchema("v" -> ColumnSchema(Some(StringType),
        Seq(Check.greaterThan("m")), nullable = false)), 10, seed = 5))
    assert(e2.getMessage.contains("string columns"))
  }

  test("narrow integral domains clamp; unique enumeration refuses overflow (r19 hunt)") {
    import org.apache.spark.sql.functions._
    // ByteType default domain [0,1000) formerly wrapped under the cast
    val sch = DataFrameSchema(
      "b" -> ColumnSchema(Some(ByteType), Seq(Check.ge(0.toByte)), nullable = false),
      "s" -> ColumnSchema(Some(ShortType), Nil, nullable = false))
    val df = Synthesize.dataFrame(spark, sch, 3000, seed = 9)
    assert(sch.validate(df).passed)
    assert(df.filter(col("b") < 0).count() == 0)
    // unique ByteType with count > 256 refuses instead of silently
    // wrapping into duplicates
    val e = intercept[RuntimeException](Synthesize.dataFrame(spark,
      DataFrameSchema("b" -> ColumnSchema(Some(ByteType), Nil,
        nullable = false, unique = true)), 300, seed = 9))
    assert(e.getMessage.contains("unique"), e.getMessage)
    // unique FloatType below float precision refuses
    val e2 = intercept[RuntimeException](Synthesize.dataFrame(spark,
      DataFrameSchema("f" -> ColumnSchema(Some(FloatType),
        Seq(Check.inRange(0.0f, 1.0f)), nullable = false, unique = true)),
      50000000L.toInt, seed = 9))
    assert(e2.getMessage.contains("float"), e2.getMessage)
  }

  test("strict decimal bounds honor the quantum; notin respected everywhere (r19 hunt)") {
    import org.apache.spark.sql.functions._
    // gt(5) on Decimal(10,2): the flat 1e-6 eps vanished in HALF_UP and
    // admitted exactly 5.00
    val strict = DataFrameSchema("d" -> ColumnSchema(Some(DecimalType(10, 2)),
      Seq(Check.greaterThan(new java.math.BigDecimal("5")),
        Check.le(new java.math.BigDecimal("9"))), nullable = false))
    val df = Synthesize.dataFrame(spark, strict, 3000, seed = 21)
    assert(strict.validate(df).passed)
    assert(df.filter(col("d") <= lit(new java.math.BigDecimal("5"))).count() == 0)
    // unique double, no bounds, ne(0.0): row id 0 formerly emitted 0.0
    val uq = DataFrameSchema("v" -> ColumnSchema(Some(DoubleType),
      Seq(Check.notEqualTo(0.0)), nullable = false, unique = true))
    val d2 = Synthesize.dataFrame(spark, uq, 1000, seed = 21)
    assert(uq.validate(d2).passed)
    assert(d2.filter(col("v") === 0.0).count() == 0)
    assert(d2.select(countDistinct(col("v"))).head.getLong(0) == 1000L)
    // unique bounded double with a forbidden grid value
    val ub = DataFrameSchema("v" -> ColumnSchema(Some(DoubleType),
      Seq(Check.inRange(0.0, 100.0), Check.notEqualTo(0.0)),
      nullable = false, unique = true))
    val d3 = Synthesize.dataFrame(spark, ub, 1000, seed = 21)
    assert(ub.validate(d3).passed)
    assert(d3.select(countDistinct(col("v"))).head.getLong(0) == 1000L)
    // continuous decimal draws that ROUND into a forbidden value nudge off
    val cont = DataFrameSchema("d" -> ColumnSchema(Some(DecimalType(6, 2)),
      Seq(Check.inRange(java.math.BigDecimal.ZERO,
        new java.math.BigDecimal("10")),
        Check.notEqualTo(new java.math.BigDecimal("7.50"))), nullable = false))
    val d4 = Synthesize.dataFrame(spark, cont, 20000, seed = 21)
    assert(cont.validate(d4).passed)
    assert(d4.filter(col("d") === lit(new java.math.BigDecimal("7.50"))).count() == 0)
  }

  test("string length padding preserves suffixes everywhere (r19 hunt)") {
    import org.apache.spark.sql.functions._
    // plain generator, lenMin only + endswith: pad went AFTER the suffix
    val plain = DataFrameSchema("v" -> ColumnSchema(Some(StringType),
      Seq(Check.strEndswith("end"), Check.strLength(Some(15), None)),
      nullable = false))
    val df = Synthesize.dataFrame(spark, plain, 1000, seed = 31)
    assert(plain.validate(df).passed)
    assert(df.filter(!col("v").endsWith("end") || length(col("v")) < 15).count() == 0)
    // regex generator with lenMin + endswith
    val rx = DataFrameSchema("v" -> ColumnSchema(Some(StringType),
      Seq(Check.strMatches("[a-z]{3}"), Check.strEndswith("end"),
        Check.strLength(Some(20), None)), nullable = false))
    val d2 = Synthesize.dataFrame(spark, rx, 500, seed = 31)
    assert(rx.validate(d2).passed)
    // unique enumeration honors lenMin and keeps the suffix + uniqueness
    val uq = DataFrameSchema("v" -> ColumnSchema(Some(StringType),
      Seq(Check.strEndswith("end"), Check.strLength(Some(12), None)),
      nullable = false, unique = true))
    val d3 = Synthesize.dataFrame(spark, uq, 2000, seed = 31)
    assert(uq.validate(d3).passed)
    assert(d3.select(countDistinct(col("v"))).head.getLong(0) == 2000L)
    // unique + regex refuses loudly instead of emitting "u0","u1",...
    val e = intercept[RuntimeException](Synthesize.dataFrame(spark,
      DataFrameSchema("v" -> ColumnSchema(Some(StringType),
        Seq(Check.strMatches("[a-z]{5}")), nullable = false, unique = true)),
      10, seed = 31))
    assert(e.getMessage.contains("unique string enumeration"))
  }

  test("enumeration avoid-shift is chain-free; short lenMin never truncates cores (r19 review)") {
    import org.apache.spark.sql.functions._
    // adjacent forbidden decimals a quantum apart on the grid: the
    // former one-quantum bump chained 0.02 -> 0.03 (forbidden) -> 0.04
    // (the next grid point, a duplicate); the index-shift is exact
    val dec = DataFrameSchema("d" -> ColumnSchema(Some(DecimalType(10, 2)),
      Seq(Check.inRange(java.math.BigDecimal.ZERO,
        new java.math.BigDecimal("1.10")),
        Check.notin(Seq(new java.math.BigDecimal("0.02"),
          new java.math.BigDecimal("0.03")))),
      nullable = false, unique = true))
    val df = Synthesize.dataFrame(spark, dec, 50, seed = 41)
    assert(dec.validate(df).passed)
    assert(df.select(countDistinct(col("d"))).head.getLong(0) == 50L)
    // random-draw chain with reversed notin order: a 7.50-rounding draw
    // must not come to rest on 7.51 (whose fold had already run)
    val cont = DataFrameSchema("d" -> ColumnSchema(Some(DecimalType(6, 2)),
      Seq(Check.inRange(java.math.BigDecimal.ZERO,
        new java.math.BigDecimal("10")),
        Check.notin(Seq(new java.math.BigDecimal("7.51"),
          new java.math.BigDecimal("7.50")))), nullable = false))
    val d2 = Synthesize.dataFrame(spark, cont, 30000, seed = 41)
    assert(cont.validate(d2).passed)
    // unique bounded doubles with two forbidden grid values stay unique
    val ud = DataFrameSchema("v" -> ColumnSchema(Some(DoubleType),
      Seq(Check.inRange(0.0, 100.0),
        Check.notin(Seq(0.0, 0.1))), nullable = false, unique = true))
    val d3 = Synthesize.dataFrame(spark, ud, 1000, seed = 41)
    assert(ud.validate(d3).passed)
    assert(d3.select(countDistinct(col("v"))).head.getLong(0) == 1000L)
    // lenMin SMALLER than the widest core: rpad must never truncate
    // "u10".."u99" down to colliding stubs
    val short = DataFrameSchema("v" -> ColumnSchema(Some(StringType),
      Seq(Check.strLength(Some(2), None)), nullable = false, unique = true))
    val d4 = Synthesize.dataFrame(spark, short, 100, seed = 41)
    assert(short.validate(d4).passed)
    assert(d4.select(countDistinct(col("v"))).head.getLong(0) == 100L)
  }

  test("continuous notin stays linear in forbidden count (r19 green-tree " +
      "fix: 3 values OOM'd an 8 GB driver under the nested-fold form)") {
    import org.apache.spark.sql.functions._
    // the exact shape that aborted the suite: double in_range + Long-typed
    // notin values, here with SIX forbidden values (the old construction's
    // tree grew ~5^(nf²) — nf=6 would be ~5^36 nodes; linear is instant)
    val sch = DataFrameSchema("v" -> ColumnSchema(Some(DoubleType),
      Seq(Check.inRange(675.0, 1065.0),
        Check.notin(Seq(676L, 678L, 700L, 800L, 900L, 1064L))),
      nullable = false))
    val df = Synthesize.dataFrame(spark, sch, 2000, seed = 5)
    assert(sch.validate(df).passed)
    assert(df.filter(col("v").isin(676.0, 678.0, 700.0, 800.0, 900.0,
      1064.0)).count() == 0)
    // adjacent forbidden decimals: the driver-side grid walk escapes the
    // whole run in one hop (the old fold bounced forever at the hi edge)
    val dec = DataFrameSchema("d" -> ColumnSchema(Some(DecimalType(6, 2)),
      Seq(Check.inRange(java.math.BigDecimal.ZERO,
        new java.math.BigDecimal("10")),
        Check.notin(Seq(new java.math.BigDecimal("9.98"),
          new java.math.BigDecimal("9.99"),
          new java.math.BigDecimal("10.00")))), nullable = false))
    val d2 = Synthesize.dataFrame(spark, dec, 30000, seed = 5)
    assert(dec.validate(d2).passed)
    assert(d2.filter(col("d") >= lit(new java.math.BigDecimal("9.98")))
      .count() == 0)
  }

  test("binary container elements differ per position (r18 review)") {
    import org.apache.spark.sql.functions._
    val schema = DataFrameSchema(
      "b" -> ColumnSchema(Some(ArrayType(BinaryType)), Nil, nullable = false))
    val df = Synthesize.dataFrame(spark, schema, 500, seed = 3)
    assert(df.filter(size(col("b")) >= 2 &&
      size(array_distinct(col("b"))) === 1).count() == 0,
      "multi-element binary arrays must not hold identical copies")
  }

  test("map keys of unsupported dtype fail fast (r18)") {
    val schema = DataFrameSchema(
      "m" -> ColumnSchema(Some(MapType(BooleanType, LongType)), Nil, nullable = false))
    val e = intercept[RuntimeException] {
      Synthesize.dataFrame(spark, schema, 10, seed = 1).collect()
    }
    assert(e.getMessage.contains("map keys"))
  }

  test("unsupported regex constructs fail fast, not silently") {
    val neg = DataFrameSchema("s" -> ColumnSchema(Some(StringType),
      Seq(Check.strMatches("[^a-z]+")), nullable = false))
    val e = intercept[IllegalArgumentException] {
      Synthesize.dataFrame(spark, neg, 10, seed = 1).collect()
    }
    assert(e.getMessage.contains("negated"))
  }
}
