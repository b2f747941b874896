package graft

import graft.hypothesis.Hypothesis
import graft.checks.AggregateCheck

class HypothesisStatsSpec extends SparkSpec {
  import spark.implicits._

  private def run(chk: AggregateCheck,
      df: org.apache.spark.sql.DataFrame, c: String) = chk.eval(df, Some(c))

  // 2x2 contingency [[10,20],[30,40]]: chi2 = 4/12+4/18+4/28+4/42 = 0.793651
  private def table2x2 = {
    val rows =
      Seq.fill(10)(("r1", "c1")) ++ Seq.fill(20)(("r1", "c2")) ++
      Seq.fill(30)(("r2", "c1")) ++ Seq.fill(40)(("r2", "c2"))
    rows.toDF("a", "b")
  }

  test("chi-square independence: statistic matches the hand-computed table") {
    val got = Hypothesis.chiSquareStatDF(table2x2, "a", "b")
      .as[(Double, Double, Double)].head()
    assert(got._1 == 0.7937, s"chi2=$got") // 0.79365079 rounded to 4
    assert(got._2 == 1.0 && got._3 == 100.0)
  }

  test("chi-square independence check: weak association passes Equal, perfect fails") {
    val weak = run(Hypothesis.chiSquareIndependence("b", alpha = 0.01), table2x2, "a")
    assert(weak.passed, weak.observed) // p ~ 0.373 >= 0.01
    val dep = (Seq.fill(50)(("x", "u")) ++ Seq.fill(50)(("y", "v"))).toDF("a", "b")
    val strong = run(Hypothesis.chiSquareIndependence("b", alpha = 0.01), dep, "a")
    assert(!strong.passed, strong.observed) // chi2 ~ 100, p ~ 0
  }

  test("chi-square independence: zero-observed combos enter the statistic") {
    // [[10,0],[10,10]]: exp r1c2 = 20*10/30 = 6.667 — the missing cell
    // contributes (0-3.333)^2/3.333; statDF and the check must agree
    val df = (Seq.fill(10)(("r1", "c1")) ++ Seq.fill(10)(("r2", "c1")) ++
      Seq.fill(10)(("r2", "c2"))).toDF("a", "b")
    val stat = Hypothesis.chiSquareStatDF(df, "a", "b")
      .as[(Double, Double, Double)].head()._1
    // exp: r1c1=6.6667, r1c2=3.3333, r2c1=13.3333, r2c2=6.6667
    val want = math.pow(10 - 20.0 / 3, 2) / (20.0 / 3) +
      math.pow(0 - 10.0 / 3, 2) / (10.0 / 3) +
      math.pow(10 - 40.0 / 3, 2) / (40.0 / 3) +
      math.pow(10 - 20.0 / 3, 2) / (20.0 / 3)
    assert(math.abs(stat - want) < 5e-4, s"stat=$stat want=$want")
    val msg = run(Hypothesis.chiSquareIndependence("b"), df, "a").observed
    assert(msg.contains(f"chi2=$want%.4f".take(9)), msg)
  }

  test("chi-square GoF: exact fit passes, bad fit fails, unknown category raises") {
    val exact = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c")).toDF("v")
    val exp = Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)
    assert(run(Hypothesis.chiSquareGof(exp), exact, "v").passed)
    val off = (Seq.fill(90)("a") ++ Seq.fill(5)("b") ++ Seq.fill(5)("c")).toDF("v")
    assert(!run(Hypothesis.chiSquareGof(exp, alpha = 0.01), off, "v").passed)
    val rogue = (Seq.fill(10)("a") ++ Seq.fill(10)("zzz")).toDF("v")
    val e = intercept[RuntimeException](run(Hypothesis.chiSquareGof(exp), rogue, "v"))
    assert(e.getMessage.contains("zzz"))
  }

  test("mann-whitney statDF: hand example with ties, no continuity correction") {
    // g1=[1,2,3] g2=[2,3,4]: midranks 1, 2.5, 4.5, 6 -> R1=8, U1=2
    val df = Seq(("g1", 1.0), ("g1", 2.0), ("g1", 3.0),
                 ("g2", 2.0), ("g2", 3.0), ("g2", 4.0)).toDF("g", "v")
    val (u1, z, n1, n2) = Hypothesis.mannWhitneyStatDF(df, "v", "g", "g1", "g2")
      .as[(Double, Double, Long, Long)].head()
    assert(u1 == 2.0 && n1 == 3 && n2 == 3)
    val sigma = math.sqrt(9.0 / 12 * (7 - 12.0 / 30))
    val wantZ = BigDecimal((2.0 - 4.5) / sigma)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(z == wantZ, s"z=$z want=$wantZ")
  }

  test("mann-whitney check: separated samples reject equality, identical ones don't") {
    val sep = ((1 to 100).map(i => ("lo", i.toDouble)) ++
               (1 to 100).map(i => ("hi", 1000.0 + i))).toDF("g", "v")
    val r1 = run(Hypothesis.mannWhitneyU("g", "lo", "hi",
      Hypothesis.NotEqual, alpha = 0.01), sep, "v")
    assert(r1.passed, r1.observed) // p ~ 0 < alpha -> "not equal" confirmed
    val same = ((1 to 100).map(i => ("x", (i % 10).toDouble)) ++
                (1 to 100).map(i => ("y", (i % 10).toDouble))).toDF("g", "v")
    val r2 = run(Hypothesis.mannWhitneyU("g", "x", "y",
      Hypothesis.Equal, alpha = 0.01), same, "v")
    assert(r2.passed, r2.observed) // z = 0, p = 1 -> equality stands
  }

  test("mann-whitney: driver check agrees with the distributed statDF") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 500).map { i =>
      (if (i % 2 == 0) "a" else "b", rnd.nextInt(40).toDouble)
    }.toDF("g", "v")
    val (u1, z, _, _) = Hypothesis.mannWhitneyStatDF(df, "v", "g", "a", "b")
      .as[(Double, Double, Long, Long)].head()
    val msg = run(Hypothesis.mannWhitneyU("g", "a", "b"), df, "v").observed
    val gotU = "U=([-0-9.]+)".r.findFirstMatchIn(msg).get.group(1).toDouble
    val gotZ = "z=([-0-9.]+)".r.findFirstMatchIn(msg).get.group(1).toDouble
    assert(gotU == u1, s"$msg vs U=$u1")
    assert(math.abs(gotZ - z) < 1e-5, s"$msg vs z=$z")
  }

  test("mann-whitney: distinct-value cap raises, registry builds by name") {
    val df = (1 to 100).map(i => ("a", i.toDouble)).toDF("g", "v")
      .union((1 to 100).map(i => ("b", i + 0.5)).toDF("g", "v"))
    val e = intercept[RuntimeException](
      run(Hypothesis.mannWhitneyU("g", "a", "b", maxDistinct = 10), df, "v"))
    assert(e.getMessage.contains("maxDistinct"))
    val byName = Hypothesis.registry("mann_whitney_u", Map(
      "groupby" -> "g", "sample1" -> "a", "sample2" -> "b",
      "relationship" -> "NotEqual", "alpha" -> 0.01))
    assert(run(byName, df, "v").observed.contains("U="))
    val chiByName = Hypothesis.registry("chi_square_independence", Map(
      "other_column" -> "b", "relationship" -> "Equal", "alpha" -> 0.01))
    assert(run(chiByName, table2x2, "a").observed.contains("chi2="))
  }

  test("mann-whitney: fully-tied degenerate samples pass Equal instead of NaN (r9)") {
    val df = (Seq.fill(30)(("a", 5.0)) ++ Seq.fill(40)(("b", 5.0))).toDF("g", "v")
    val eq = run(Hypothesis.mannWhitneyU("g", "a", "b",
      relationship = Hypothesis.Equal), df, "v")
    assert(eq.passed, eq.observed) // two identical constant samples ARE equal
    assert(eq.observed.contains("degenerate"))
    val ne = run(Hypothesis.mannWhitneyU("g", "a", "b",
      relationship = Hypothesis.NotEqual), df, "v")
    assert(!ne.passed, ne.observed)
    // the distributed plan pins z = 0 for the same input
    val z = Hypothesis.mannWhitneyStatDF(df, "v", "g", "a", "b")
      .select("z").head().getDouble(0)
    assert(z == 0.0)
  }

  test("ks two-sample: D matches hand computation; identical samples pass Equal, shifted fail") {
    // F1 steps at {1,2,3} by 1/3; F2 steps at {2,3,4} by 1/3 →
    // D = max gap = 1/3 (at v=1: 1/3 vs 0)
    val df = (Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 3.0), ("b", 4.0))).toDF("g", "v")
    val d = Hypothesis.ksTwoSampleStatDF(df, "v", "g", "a", "b").head()
    assert(math.abs(d.getDouble(0) - 0.333333) < 1e-6, d.toString)
    assert(d.getLong(1) == 3 && d.getLong(2) == 3)
    // large identical samples: D = 0, p = 1 → Equal passes
    val same = (1 to 500).flatMap(i =>
      Seq(("a", (i % 37).toDouble), ("b", (i % 37).toDouble))).toDF("g", "v")
    val eq = run(Hypothesis.ksTwoSample("g", "a", "b"), same, "v")
    assert(eq.passed, eq.observed)
    assert(eq.observed.contains("D=0.000000"))
    // clearly shifted large samples: Equal fails
    val shifted = ((1 to 500).map(i => ("a", (i % 37).toDouble)) ++
      (1 to 500).map(i => ("b", (i % 37) + 20.0))).toDF("g", "v")
    val ne = run(Hypothesis.ksTwoSample("g", "a", "b"), shifted, "v")
    assert(!ne.passed, ne.observed)
    // driver form and distributed plan agree on D
    val obsD = "D=([0-9.]+)".r.findFirstMatchIn(ne.observed).get.group(1).toDouble
    val planD = Hypothesis.ksTwoSampleStatDF(shifted, "v", "g", "a", "b")
      .head().getDouble(0)
    assert(math.abs(obsD - planD) < 1e-6)
    // registry round-trip
    val byName = Hypothesis.registry("ks_two_sample", Map(
      "groupby" -> "g", "sample1" -> "a", "sample2" -> "b",
      "relationship" -> "Equal", "alpha" -> 0.01))
    assert(run(byName, same, "v").passed)
    // r10: an ABSENT group in the DF form yields NULL d (mirrors the
    // driver form's failed outcome), never a silent 0/0 = NaN statistic
    val absent = Hypothesis.ksTwoSampleStatDF(
      df.filter(org.apache.spark.sql.functions.col("g") === "a"),
      "v", "g", "a", "b").head()
    assert(absent.isNullAt(0) && absent.getLong(1) == 3 && absent.getLong(2) == 0,
      absent.toString)
  }

  test("stat DFs: no unpartitioned window over an unbounded frame (r12)") {
    // The r11 verdict's one scale-killer: Window.orderBy with no
    // partitionBy funnels every distinct value through one task. After the
    // bucketed two-level cumsum, any orderBy-only window must sit above the
    // bucket-totals Aggregate (a frame bounded by the numBuckets literal).
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val df = (1 to 200).map(i => (if (i % 2 == 0) "a" else "b", i / 7.0))
      .toDF("g", "v")
    for (plan <- Seq(
        Hypothesis.mannWhitneyStatDF(df, "v", "g", "a", "b"),
        Hypothesis.ksTwoSampleStatDF(df, "v", "g", "a", "b"))) {
      val unpart = plan.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      assert(unpart.nonEmpty, "expected the bounded bucket-offset windows")
      unpart.foreach { w =>
        val agg = w.collectFirst { case a: Aggregate => a }
        assert(agg.isDefined &&
          agg.get.groupingExpressions.exists(_.references.exists(
            _.name == "bkt")),
          s"unpartitioned window over a non-bucket-totals frame:\n$w")
      }
    }
  }

  test("stat DFs: continuous high-distinct column agrees with driver forms (r12)") {
    // 4000 distinct doubles spread over many width_bucket cells — exercises
    // cross-bucket offset stitching, tie-free and tie-full midranks
    val rnd = new scala.util.Random(42)
    val rows = (1 to 4000).map { i =>
      (if (i % 2 == 0) "a" else "b",
       if (i % 5 == 0) (i % 13).toDouble else rnd.nextDouble() * 1000)
    }
    val df = rows.toDF("g", "v").repartition(8)
    val (u1, z, n1, n2) = Hypothesis.mannWhitneyStatDF(df, "v", "g", "a", "b")
      .as[(Double, Double, Long, Long)].head()
    assert(n1 == 2000 && n2 == 2000)
    val mwMsg = run(Hypothesis.mannWhitneyU("g", "a", "b"), df, "v").observed
    assert("U=([-0-9.]+)".r.findFirstMatchIn(mwMsg).get.group(1).toDouble == u1,
      s"$mwMsg vs U=$u1")
    assert(math.abs(
      "z=([-0-9.]+)".r.findFirstMatchIn(mwMsg).get.group(1).toDouble - z) < 1e-5)
    val ksRow = Hypothesis.ksTwoSampleStatDF(df, "v", "g", "a", "b").head()
    val ksMsg = run(Hypothesis.ksTwoSample("g", "a", "b"), df, "v").observed
    val obsD = "D=([0-9.]+)".r.findFirstMatchIn(ksMsg).get.group(1).toDouble
    assert(math.abs(obsD - ksRow.getDouble(0)) < 1e-6, s"$ksMsg vs $ksRow")
    // an extreme outlier degrades bucket balance, never correctness
    val out = (rows :+ (("a", 1e12))).toDF("g", "v")
    val ksOut = Hypothesis.ksTwoSampleStatDF(out, "v", "g", "a", "b").head()
    val outMsg = run(Hypothesis.ksTwoSample("g", "a", "b"), out, "v").observed
    assert(math.abs(
      "D=([0-9.]+)".r.findFirstMatchIn(outMsg).get.group(1).toDouble -
        ksOut.getDouble(0)) < 1e-6)
  }

  test("stat DFs: NaN and ±Infinity values get sentinel buckets, not null stats (r13)") {
    // width_bucket returns null for NaN input and NaN/infinite bounds; a
    // null bkt silently dropped every row at the bucket equi-join, so the
    // statistic came back null masquerading as the 'absent group' outcome.
    // Sentinels preserve Spark sort order: -Inf < finite < +Inf < NaN.
    // g1=[-Inf,1,2] g2=[1,+Inf,NaN]: sorted -Inf,1,1,2,Inf,NaN →
    // ranks 1, 2.5, 2.5, 4, 5, 6 → R1 = 1+2.5+4 = 7.5, U1 = 7.5-6 = 1.5;
    // KS D = max gap = |1 - 1/3| at v=2 = 2/3
    val df = Seq(
      ("a", Double.NegativeInfinity), ("a", 1.0), ("a", 2.0),
      ("b", 1.0), ("b", Double.PositiveInfinity), ("b", Double.NaN))
      .toDF("g", "v")
    val mw = Hypothesis.mannWhitneyStatDF(df, "v", "g", "a", "b").head()
    assert(!mw.isNullAt(0) && mw.getDouble(0) == 1.5, mw.toString)
    assert(mw.getLong(2) == 3 && mw.getLong(3) == 3)
    val ks = Hypothesis.ksTwoSampleStatDF(df, "v", "g", "a", "b").head()
    assert(!ks.isNullAt(0), "KS d must not be null on non-finite values")
    assert(math.abs(ks.getDouble(0) - 0.666667) < 1e-6, ks.toString)
    // all-non-finite column: bounds are null but no row takes the
    // width_bucket path, so the plan still produces a real statistic
    val nf = Seq(("a", Double.NegativeInfinity), ("a", Double.NaN),
      ("b", Double.PositiveInfinity), ("b", Double.NaN)).toDF("g", "v")
    val ks2 = Hypothesis.ksTwoSampleStatDF(nf, "v", "g", "a", "b").head()
    // sorted: -Inf, +Inf, NaN,NaN → gaps 1/2, 1/2+? → F1: 1/2,1/2,1; F2: 0,1/2,1
    assert(!ks2.isNullAt(0) && math.abs(ks2.getDouble(0) - 0.5) < 1e-6,
      ks2.toString)
  }

  test("kolmogorov p-value: known reference points") {
    // Q(0) = 1; Q is decreasing; scipy.special.kolmogorov(1.0) ≈ 0.26999967
    assert(Hypothesis.kolmogorovPValue(0.0) == 1.0)
    assert(math.abs(Hypothesis.kolmogorovPValue(1.0) - 0.26999967) < 1e-6)
    assert(Hypothesis.kolmogorovPValue(3.0) < 1e-6)
    val ps = Seq(0.2, 0.5, 0.8, 1.1, 1.5).map(Hypothesis.kolmogorovPValue)
    assert(ps == ps.sorted.reverse)
  }

  test("t-tests: degenerate and starved inputs answer cleanly (r18 review)") {
    import graft.hypothesis.Hypothesis._
    // two identical constant samples satisfy Equal (t=0, p=1), mirroring
    // mann-whitney's sigma=0 branch — the former 0/0=NaN failed Equal
    val const = (Seq.fill(10)(("a", 5.0)) ++ Seq.fill(10)(("b", 5.0)))
      .toDF("g", "v")
    val eq = twoSampleTtest("g", "a", "b", relationship = Equal)
      .eval(const, Some("v"))
    assert(eq.passed, eq.observed)
    // two DIFFERENT constants reject Equal with infinite evidence
    val diff = (Seq.fill(10)(("a", 5.0)) ++ Seq.fill(10)(("b", 7.0)))
      .toDF("g", "v")
    assert(!twoSampleTtest("g", "a", "b", relationship = Equal)
      .eval(diff, Some("v")).passed)
    // a single-row group is a clean failed outcome, not an NPE
    val single = (Seq(("a", 1.0)) ++ Seq.fill(10)(("b", 2.0))).toDF("g", "v")
    val starved = twoSampleTtest("g", "a", "b").eval(single, Some("v"))
    assert(!starved.passed && starved.observed.contains("fewer than 2"))
    // one-sample: empty and single-row columns answer cleanly too
    val empty = Seq.empty[Double].toDF("v")
    val e1 = oneSampleTtest(0.0).eval(empty, Some("v"))
    assert(!e1.passed && e1.observed.contains(">= 2"))
    // all-constant one-sample column: matches popmean → Equal passes
    val c1 = Seq.fill(5)(3.0).toDF("v")
    assert(oneSampleTtest(3.0, relationship = Equal).eval(c1, Some("v")).passed)
    assert(!oneSampleTtest(4.0, relationship = Equal).eval(c1, Some("v")).passed)
  }

  test("mann-whitney statDF: an absent group surfaces as NULL, not z=0 (r18 review)") {
    val d = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("g", "v")
    val r = Hypothesis.mannWhitneyStatDF(d, "v", "g", "a", "MISSPELLED").head()
    assert(r.isNullAt(0) && r.isNullAt(1),
      "absent group must yield NULL u1/z — z=0 reads as 'no difference'")
    assert(r.getLong(3) == 0L)
  }

  test("non-numeric values are excluded from the rank/KS histograms, not NPEs (r18 review)") {
    val d = Seq(("a", "1.0"), ("a", "2.0"), ("a", "abc"),
      ("b", "2.0"), ("b", "3.0")).toDF("g", "v")
    // driver forms used to NPE on the cast-null row; plan forms silently
    // biased the totals — now the row is excluded on all four paths
    val mw = Hypothesis.mannWhitneyU("g", "a", "b").eval(d, Some("v"))
    assert(mw.observed.contains("n1=2"), mw.observed)
    val ks = Hypothesis.ksTwoSample("g", "a", "b").eval(d, Some("v"))
    assert(ks.observed.contains("n1=2"), ks.observed)
    val kd = Hypothesis.ksTwoSampleStatDF(d, "v", "g", "a", "b").head()
    assert(kd.getLong(1) == 2L && kd.getLong(2) == 2L)
  }

  test("chi-square GoF: registry round trip and zero-proportion refusal (r18 review)") {
    val d = (Seq.fill(25)("A") ++ Seq.fill(25)("B") ++ Seq.fill(50)("C"))
      .toDF("cat")
    val stats = Map[String, Any](
      "expected" -> Map("A" -> 0.25, "B" -> 0.25, "C" -> 0.5),
      "relationship" -> "Equal", "alpha" -> 0.01)
    assert(Hypothesis.registry.contains("chi_square_gof"),
      "fully-data-parameterized builtin must be registry-buildable")
    val rebuilt = Hypothesis.registry("chi_square_gof", stats)
    assert(rebuilt.eval(d, Some("cat")).passed)
    // java-map statistics (the jackson deserialization shape) build too
    val jm = new java.util.HashMap[String, Object]()
    jm.put("A", Double.box(0.25)); jm.put("B", Double.box(0.25))
    jm.put("C", Double.box(0.5))
    assert(Hypothesis.registry("chi_square_gof",
      Map("expected" -> jm, "relationship" -> "Equal", "alpha" -> 0.01))
      .eval(d, Some("cat")).passed)
    val zero = intercept[Exception](Hypothesis.chiSquareGof(
      Map("A" -> 0.0, "B" -> 0.5, "C" -> 0.5)).eval(d, Some("cat")))
    assert(zero.getMessage.contains("> 0"), zero.getMessage)
  }

  test("corr bound check: wide band passes, impossible band fails, constant column is an explicit failure") {
    import graft.checks.Check
    val df = (1 to 200).map(i => (i.toDouble, i * 2.0 + (i % 7), 5.0))
      .toDF("x", "y", "c")
    val pos = Check.corrBetween("y", 0.9, 1.0).eval(df, Some("x"))
    assert(pos.passed, pos.observed) // y ≈ 2x → corr ~ 1
    val neg = Check.corrBetween("y", -1.0, -0.5).eval(df, Some("x"))
    assert(!neg.passed)
    val const = Check.corrBetween("c", -1.0, 1.0).eval(df, Some("x"))
    assert(!const.passed && const.observed.contains("undefined"))
  }
}
