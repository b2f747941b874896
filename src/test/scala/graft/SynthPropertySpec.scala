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
  * reproduce).
  */
class SynthPropertySpec extends SparkSpec {

  private val genNumericCol: Gen[ColumnSchema] = for {
    lo <- Gen.choose(-1000.0, 1000.0)
    span <- Gen.choose(1.0, 500.0)
    dt <- Gen.oneOf[DataType](LongType, DoubleType)
    kind <- Gen.oneOf(0, 1, 2)
    nullable <- Gen.oneOf(true, false)
  } yield {
    val (l, h) = (math.floor(lo), math.floor(lo + span))
    val checks = kind match {
      case 0 => Seq(Check.inRange(l, h))
      case 1 => Seq(Check.ge(l))
      case 2 => Seq(Check.le(h))
    }
    ColumnSchema(Some(dt), checks, nullable = nullable)
  }

  private val genStringCol: Gen[ColumnSchema] = for {
    kind <- Gen.oneOf(0, 1, 2, 3)
    values <- Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))
      .map(_.distinct.take(5)).suchThat(_.size >= 2)
    prefix <- Gen.alphaStr.suchThat(s => s.nonEmpty && s.length <= 6)
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
  }

  private val genUniqueCol: Gen[ColumnSchema] = for {
    lo <- Gen.choose(-1000L, 1000L)
  } yield ColumnSchema(Some(LongType), Seq(Check.ge(lo.toDouble)),
    nullable = false, unique = true)

  private val genSchema: Gen[DataFrameSchema] = for {
    n <- Gen.choose(1, 4)
    cols <- Gen.listOfN(n, Gen.frequency(
      4 -> genNumericCol, 4 -> genStringCol, 1 -> genUniqueCol))
  } yield new DataFrameSchema(
    columns = cols.zipWithIndex.map { case (c, i) => s"c$i" -> c })

  test("synthesized data validates against randomly drawn schemas") {
    val params = Gen.Parameters.default
    (1 to 25).foreach { i =>
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
}
