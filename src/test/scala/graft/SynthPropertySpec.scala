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

  private val genSchema: Gen[DataFrameSchema] = for {
    n <- Gen.choose(1, 4)
    cols <- Gen.listOfN(n, Gen.frequency(
      4 -> genNumericCol, 4 -> genStringCol, 1 -> genUniqueCol))
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

  test("unsupported regex constructs fail fast, not silently") {
    val neg = DataFrameSchema("s" -> ColumnSchema(Some(StringType),
      Seq(Check.strMatches("[^a-z]+")), nullable = false))
    val e = intercept[IllegalArgumentException] {
      Synthesize.dataFrame(spark, neg, 10, seed = 1).collect()
    }
    assert(e.getMessage.contains("negated"))
  }
}
