package graft.hypothesis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.commons.math3.distribution.{ChiSquaredDistribution, NormalDistribution, TDistribution}
import graft.checks.{AggregateCheck, AggOutcome}

/** Statistical hypothesis checks.
  *
  * Reference: pandera/api/hypotheses.py:15-381 — a Hypothesis wraps a test
  * returning (stat, pvalue) and a `relationship` deciding pass/fail
  * (backends/pandas/hypotheses.py:17-34). The reference delegates to
  * scipy.stats; here the sufficient statistics (n, mean, variance per group)
  * are computed distributed in ONE Spark aggregation and the t statistic +
  * p-value (commons-math3 TDistribution, already on Spark's classpath) are
  * evaluated on the driver — no data ever leaves the executors.
  */
object Hypothesis {

  sealed trait Relationship
  case object GreaterThan extends Relationship // stat > 0 and pvalue/2 < alpha
  case object LessThan extends Relationship    // stat < 0 and pvalue/2 < alpha
  case object NotEqual extends Relationship    // pvalue < alpha
  case object Equal extends Relationship       // pvalue >= alpha
  /** Callable relationship (reference: api/hypotheses.py:15-100 allows a
    * custom (stat, pvalue) => decision function). */
  final case class Custom(fn: (Double, Double) => Boolean) extends Relationship

  final case class TestResult(stat: Double, pvalue: Double, df: Double)

  private def decide(rel: Relationship, stat: Double, pvalue: Double,
                     alpha: Double): Boolean = rel match {
    case GreaterThan => stat > 0 && pvalue / 2 < alpha
    case LessThan    => stat < 0 && pvalue / 2 < alpha
    case NotEqual    => pvalue < alpha
    case Equal       => pvalue >= alpha
    case Custom(fn)  => fn(stat, pvalue)
  }

  /** Two-sided p-value from a t statistic. */
  def tPValue(stat: Double, degFreedom: Double): Double = {
    if (degFreedom <= 0 || stat.isNaN) return Double.NaN
    val dist = new TDistribution(degFreedom)
    2.0 * (1.0 - dist.cumulativeProbability(math.abs(stat)))
  }

  /** t statistic from sufficient statistics; Welch when !equalVar
    * (mirrors scipy.stats.ttest_ind used at api/hypotheses.py:182-292). */
  def twoSampleT(n1: Long, m1: Double, v1: Double,
                 n2: Long, m2: Double, v2: Double,
                 equalVar: Boolean): TestResult = {
    // se == 0 (both samples constant): identical means are infinitely
    // consistent (t=0, p=1 — two byte-identical constant samples must
    // satisfy Equal, the same invariant mannWhitneyU's sigma=0 branch
    // pins), different means infinitely inconsistent (t=±Inf, p=0);
    // the former 0/0 = NaN failed Equal on identical data (r18 review)
    def res(se: Double, dof: Double): TestResult =
      if (se == 0.0) {
        val t = if (m1 == m2) 0.0
          else if (m1 > m2) Double.PositiveInfinity
          else Double.NegativeInfinity
        TestResult(t, if (m1 == m2) 1.0 else 0.0, dof)
      } else {
        val t = (m1 - m2) / se
        TestResult(t, tPValue(t, dof), dof)
      }
    if (equalVar) {
      val dof = (n1 + n2 - 2).toDouble
      val sp2 = ((n1 - 1) * v1 + (n2 - 1) * v2) / dof
      res(math.sqrt(sp2 * (1.0 / n1 + 1.0 / n2)), dof)
    } else {
      val a = v1 / n1; val b = v2 / n2
      val dof = math.pow(a + b, 2) /
        (math.pow(a, 2) / (n1 - 1) + math.pow(b, 2) / (n2 - 1))
      res(math.sqrt(a + b), dof)
    }
  }

  /** Two-sample t-test on `valueCol`, groups selected from `groupbyCol`
    * (reference: api/hypotheses.py:182-292 two_sample_ttest; sample1 vs
    * sample2 with relationship + alpha + equal_var).
    * One distributed aggregation computes (count, mean, var_samp) per group.
    */
  def twoSampleTtest(
      groupbyCol: String,
      sample1: String,
      sample2: String,
      relationship: Relationship = NotEqual,
      alpha: Double = 0.01,
      equalVar: Boolean = true): AggregateCheck =
    AggregateCheck(
      "two_sample_ttest",
      (df, colOpt) => {
        val c = colOpt.getOrElse(sys.error("two_sample_ttest needs a column"))
        val rows = df
          .filter(col(groupbyCol).isin(sample1, sample2) && col(c).isNotNull)
          .groupBy(col(groupbyCol))
          .agg(count(col(c)).as("n"), avg(col(c)).as("m"),
               var_samp(col(c)).as("v"))
          .collect()
        val byGroup = rows.map(r =>
          String.valueOf(r.get(0)) -> ((r.getLong(1), r.getDouble(2),
            // var_samp over a single row is NULL — surface as a clean
            // failed outcome below, not an NPE (r18 review)
            if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))).toMap
        (byGroup.get(sample1), byGroup.get(sample2)) match {
          case (Some((n1, _, v1)), Some((n2, _, v2)))
              if v1.isNaN || v2.isNaN =>
            AggOutcome(passed = false,
              s"group(s) with fewer than 2 rows (variance undefined): " +
                Seq(sample1 -> v1, sample2 -> v2)
                  .collect { case (g, v) if v.isNaN => g }.mkString(","))
          case (Some((n1, m1, v1)), Some((n2, m2, v2))) =>
            val res = twoSampleT(n1, m1, v1, n2, m2, v2, equalVar)
            AggOutcome(decide(relationship, res.stat, res.pvalue, alpha),
              f"t=${res.stat}%.6f p=${res.pvalue}%.6f df=${res.df}%.2f " +
                f"mean($sample1)=$m1%.6f mean($sample2)=$m2%.6f")
          case _ =>
            AggOutcome(passed = false,
              s"missing group(s): ${Seq(sample1, sample2).filterNot(byGroup.contains).mkString(",")}")
        }
      },
      Map("groupby" -> groupbyCol, "sample1" -> sample1, "sample2" -> sample2,
          "relationship" -> relationship.toString, "alpha" -> alpha,
          "equal_var" -> equalVar))

  /** Black-box grouped hypothesis — the reference's
    * `Hypothesis(test=fn, samples=[...], groupby=...)` executing an
    * arbitrary test over per-group sample vectors
    * (backends/pandas/hypotheses.py:78-130). This closes the round-1
    * restriction to aggregate-expressible forms: the per-group vectors are
    * collected through a HARD-CAPPED BoundedCollect (O(maxSamplePerGroup)
    * driver memory however large the data); a group larger than the cap
    * fails fast with a clear error instead of silently testing a partial
    * sample. `test` receives the vectors in `samples` order and returns
    * (stat, pvalue).
    */
  def grouped(
      name: String,
      groupbyCol: String,
      samples: Seq[String],
      relationship: Relationship = NotEqual,
      alpha: Double = 0.01,
      maxSamplePerGroup: Int = 100000)(
      test: Seq[IndexedSeq[Double]] => (Double, Double)): AggregateCheck =
    AggregateCheck(
      name,
      (df, colOpt) => {
        val c = colOpt.getOrElse(sys.error(s"$name needs a column"))
        val rows = df
          .filter(col(groupbyCol).isin(samples: _*) && col(c).isNotNull)
          .groupBy(col(groupbyCol))
          .agg(count(col(c)).as("n"),
            graft.functions.BoundedCollect.of(col(c).cast("string"),
              maxSamplePerGroup).as("vals"))
          .collect() // ≤ |samples| rows, each capped at maxSamplePerGroup
        val byGroup = rows.map { r =>
          String.valueOf(r.get(0)) ->
            ((r.getLong(1), r.getSeq[String](r.fieldIndex("vals"))))
        }.toMap
        val missing = samples.filterNot(byGroup.contains)
        if (missing.nonEmpty)
          AggOutcome(passed = false, s"missing group(s): ${missing.mkString(",")}")
        else {
          byGroup.foreach { case (g, (n, vals)) =>
            if (n > vals.size)
              sys.error(s"grouped hypothesis '$name': group '$g' has $n " +
                s"values, exceeding maxSamplePerGroup=$maxSamplePerGroup; " +
                s"raise the cap, use an aggregate-form hypothesis, or opt " +
                s"into the deterministic sampled form (groupedSampled)")
          }
          val vectors = samples.map(g => byGroup(g)._2.map(_.toDouble).toIndexedSeq)
          val (stat, pvalue) = test(vectors)
          AggOutcome(decide(relationship, stat, pvalue, alpha),
            f"stat=$stat%.6f p=$pvalue%.6f " +
              samples.zip(vectors).map { case (g, v) => s"n($g)=${v.size}" }.mkString(" "))
        }
      },
      Map("groupby" -> groupbyCol, "samples" -> samples,
        "relationship" -> relationship.toString, "alpha" -> alpha,
        "max_sample_per_group" -> maxSamplePerGroup))

  /** Scale path for [[grouped]] (r14): same black-box contract, but a
    * group larger than `maxSamplePerGroup` is tested on a DETERMINISTIC
    * uniform sample of exactly `maxSamplePerGroup` values instead of
    * refusing — the opt-in that [[grouped]]'s loud cap refusal points at.
    * A 100 TB user with a black-box grouped test previously had only
    * "raise the cap"; this gives them a bounded, reproducible answer.
    *
    * The draw is bottom-k by the engine-portable md5 key hash (the
    * [[graft.ext.Sampling]] convention: first 8 hex chars of
    * md5(key || chr(1) || seed) as a 32-bit integer): selection is a pure
    * function of (keyCol value, seed) — retry-deterministic and
    * re-derivable in any SQL engine as
    * `row_number() OVER (PARTITION BY group ORDER BY hash, key) <= cap`
    * (hash ties, possible at 32 bits, break on the key's string form, so
    * the kept set is bit-reproducible even then). Groups at or under the
    * cap are tested EXACTLY — the heap simply holds everything — so this
    * degrades to [[grouped]] on small groups.
    *
    * Scale shape: ONE aggregation; the bounded k-heap
    * ([[graft.functions.TopKByScore]]) folds map-side, so at most `cap`
    * entries per group per task cross the shuffle however large the
    * groups get — no window sort, no full collect; driver memory is
    * O(|samples| × cap). `keyCol` must be unique and non-null per row —
    * BOTH are enforced in the same pass and refused loudly: a null key
    * has no deterministic draw, and a duplicate key would make the kept
    * multiset depend on engine-internal tie order (the k-heap ties on
    * (key, value) strings; a SQL re-derivation ordering by (hash, key)
    * alone could keep the OTHER duplicate's value — r14 review finding).
    * Values arrive in hash order, not data order — `test` must be
    * order-invariant, true of any honest two-sample statistic.
    *
    * The outcome detail records the seed and per-group kept/total counts,
    * so a sampled decision is visibly sampled in the validation report.
    * The reference collects full groups unconditionally
    * (backends/pandas/hypotheses.py:78-130) — both the cap refusal and
    * this sampled form are beyond-reference surface. */
  def groupedSampled(
      name: String,
      groupbyCol: String,
      samples: Seq[String],
      keyCol: String,
      relationship: Relationship = NotEqual,
      alpha: Double = 0.01,
      maxSamplePerGroup: Int = 100000,
      seed: Long = 42L)(
      test: Seq[IndexedSeq[Double]] => (Double, Double)): AggregateCheck =
    AggregateCheck(
      name,
      (df, colOpt) => {
        val c = colOpt.getOrElse(sys.error(s"$name needs a column"))
        // the shared engine-portable key hash — ONE definition repo-wide
        // (a drifted copy would silently desynchronize every oracle
        // built on the convention)
        val keyHash = graft.ext.Sampling.hash32(col(keyCol), seed)
        val rows = df
          .filter(col(groupbyCol).isin(samples: _*) && col(c).isNotNull)
          .groupBy(col(groupbyCol))
          .agg(count(col(c)).as("n"),
            coalesce(sum(when(col(keyCol).isNull, 1L)), lit(0L)).as("nullk"),
            (count(col(keyCol)) - count_distinct(col(keyCol))).as("dupk"),
            graft.functions.TopKByScore.of(
              -keyHash.cast("double"),
              struct(col(keyCol).cast("string").as("k"),
                col(c).cast("string").as("v")),
              maxSamplePerGroup).as("tk"))
          .collect() // ≤ |samples| rows, each capped at maxSamplePerGroup
        val byGroup = rows.map { r =>
          if (r.getLong(r.fieldIndex("nullk")) > 0L)
            sys.error(s"grouped hypothesis '$name': group " +
              s"'${String.valueOf(r.get(0))}' has null '$keyCol' values — " +
              "a null key has no deterministic draw; filter or fill it")
          if (r.getLong(r.fieldIndex("dupk")) > 0L)
            sys.error(s"grouped hypothesis '$name': group " +
              s"'${String.valueOf(r.get(0))}' has duplicate '$keyCol' " +
              "values — the draw is keyed on them, so duplicates would " +
              "make the kept sample depend on engine tie order; use a " +
              "unique row key")
          val tk = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("tk"))
          String.valueOf(r.get(0)) ->
            ((r.getLong(r.fieldIndex("n")), tk.map(_.getStruct(1).getString(1))))
        }.toMap
        val missing = samples.filterNot(byGroup.contains)
        if (missing.nonEmpty)
          AggOutcome(passed = false,
            s"missing group(s): ${missing.mkString(",")}")
        else {
          val vectors = samples.map(g =>
            byGroup(g)._2.map(_.toDouble).toIndexedSeq)
          val (stat, pvalue) = test(vectors)
          AggOutcome(decide(relationship, stat, pvalue, alpha),
            f"stat=$stat%.6f p=$pvalue%.6f seed=$seed " +
              samples.map { g =>
                val (n, kept) = byGroup(g)
                if (n > kept.size) s"n($g)=$n kept($g)=${kept.size} sampled"
                else s"n($g)=$n exact"
              }.mkString(" "))
        }
      },
      Map("groupby" -> groupbyCol, "samples" -> samples, "key" -> keyCol,
        "relationship" -> relationship.toString, "alpha" -> alpha,
        "max_sample_per_group" -> maxSamplePerGroup, "seed" -> seed))

  /** Exact median of a sample vector (sorted midpoint / mean of the two
    * midpoints) — matches SQL `median`/`quantile_cont(0.5)`. */
  def median(v: IndexedSeq[Double]): Double = {
    val s = v.sorted
    val n = s.size
    if (n == 0) Double.NaN
    else if (n % 2 == 1) s(n / 2)
    else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** Parse a serialized relationship (inverse of `Relationship.toString`;
    * the reference's snake-case spellings from api/hypotheses.py:40-47
    * RELATIONSHIPS are accepted too). `Custom` callables cannot
    * round-trip — deserializing one raises, which marks the owning check
    * unserializable in SchemaIO's report. */
  def relationshipFromString(s: String): Relationship = s match {
    case "GreaterThan" | "greater_than" => GreaterThan
    case "LessThan" | "less_than"       => LessThan
    case "NotEqual" | "not_equal"       => NotEqual
    case "Equal" | "equal"              => Equal
    case other =>
      throw new IllegalArgumentException(s"cannot deserialize relationship '$other'")
  }

  /** Named-hypothesis registry — the analog of
    * `register_builtin_hypothesis` (reference: api/extensions.py:107-114,
    * which routes hypotheses through the same registration machinery as
    * checks). A hypothesis registers a STATISTICS-DRIVEN factory under its
    * name; `SchemaIO` then (a) rebuilds it from a serialized document the
    * same way registered checks rebuild (checkFromStats dispatches here
    * first) and (b) reports it serializable, so registered hypotheses
    * survive YAML/JSON round-trips. The built-in t-tests self-register
    * below; user hypotheses register the same way. */
  object registry {
    private val factories = scala.collection.concurrent
      .TrieMap.empty[String, Map[String, Any] => AggregateCheck]
    def register(name: String)(factory: Map[String, Any] => AggregateCheck): Unit =
      factories.put(name, factory)
    def apply(name: String, stats: Map[String, Any]): AggregateCheck =
      factories.getOrElse(name,
        sys.error(s"no registered hypothesis named '$name'"))(stats)
    def contains(name: String): Boolean = factories.contains(name)

    // built-in registrations live INSIDE the registry object: accessing a
    // nested Scala object does NOT initialize its enclosing object, so
    // registrations in the Hypothesis body would be invisible to a caller
    // whose first touch of this module is the registry itself
    register("two_sample_ttest") { st =>
      twoSampleTtest(
        st("groupby").toString, st("sample1").toString, st("sample2").toString,
        relationshipFromString(st("relationship").toString),
        st("alpha").toString.toDouble,
        // tolerate string-typed booleans like every other field here
        // (alpha/popmean accept "0.01" via toString): a JSON-emitted
        // equal_var: "true" must not silently flip pooled → Welch
        st.get("equal_var").forall(_.toString.toBoolean))
    }
    register("one_sample_ttest") { st =>
      oneSampleTtest(
        st("popmean").toString.toDouble,
        relationshipFromString(st("relationship").toString),
        st("alpha").toString.toDouble)
    }
    register("mann_whitney_u") { st =>
      mannWhitneyU(
        st("groupby").toString, st("sample1").toString, st("sample2").toString,
        relationshipFromString(st("relationship").toString),
        st("alpha").toString.toDouble,
        st.get("max_distinct").map(_.toString.toDouble.toInt).getOrElse(1000000))
    }
    register("chi_square_independence") { st =>
      chiSquareIndependence(
        st("other_column").toString,
        relationshipFromString(st("relationship").toString),
        st("alpha").toString.toDouble,
        st.get("max_cells").map(_.toString.toDouble.toInt).getOrElse(100000))
    }
    register("chi_square_gof") { st =>
      // `expected` survives serialization as a nested map (jackson emits
      // java maps; a Scala map arrives from in-process round trips)
      val exp: Map[String, Double] = st("expected") match {
        case m: scala.collection.Map[_, _] =>
          m.map { case (k, v) => String.valueOf(k) -> v.toString.toDouble }.toMap
        case m: java.util.Map[_, _] =>
          import scala.jdk.CollectionConverters._
          m.asScala.map { case (k, v) =>
            String.valueOf(k) -> v.toString.toDouble }.toMap
        case other => sys.error(s"chi_square_gof: bad 'expected' stats: $other")
      }
      chiSquareGof(exp,
        relationshipFromString(st("relationship").toString),
        st("alpha").toString.toDouble)
    }
    register("ks_two_sample") { st =>
      ksTwoSample(
        st("groupby").toString, st("sample1").toString, st("sample2").toString,
        relationshipFromString(st("relationship").toString),
        st("alpha").toString.toDouble,
        st.get("max_distinct").map(_.toString.toDouble.toInt).getOrElse(1000000))
    }
  }

  /** Two-sided p-value from a chi-squared statistic. */
  def chiSquarePValue(stat: Double, degFreedom: Double): Double = {
    if (degFreedom <= 0 || stat.isNaN) return Double.NaN
    1.0 - new ChiSquaredDistribution(degFreedom).cumulativeProbability(stat)
  }

  /** Per-distinct-value histogram `(v, n1, n2)` shared by the MW/KS
    * driver and plan forms (r18 review: the shape was hand-copied four
    * times). Values that pass isNotNull but cast to a NULL double (a
    * non-numeric string under try-cast semantics) are EXCLUDED here —
    * they used to NPE the driver forms and silently bias the plan forms'
    * totals (the null bucket dropped from the cumsums but not from
    * t1/t2). */
  private def valueHistogram(df: DataFrame, valueCol: String,
      groupbyCol: String, sample1: String, sample2: String): DataFrame = {
    // try_cast, not cast: under ANSI a malformed string would throw out
    // of the aggregation; under non-ANSI a plain cast nulls silently —
    // try_cast gives the tolerate-and-exclude semantics on both
    val v = expr(s"try_cast(`${valueCol.replace("`", "``")}` AS double)")
    df.filter(col(groupbyCol).isin(sample1, sample2) &&
        col(valueCol).isNotNull && v.isNotNull)
      .groupBy(v.as("v"))
      .agg(sum(when(col(groupbyCol) === sample1, 1.0).otherwise(0.0)).as("n1"),
           sum(when(col(groupbyCol) === sample2, 1.0).otherwise(0.0)).as("n2"))
  }

  /** Chi-squared test of independence between the schema column and
    * `otherCol` — the categorical-association hypothesis the reference
    * reaches via `Hypothesis(test=scipy.stats.chi2_contingency, ...)`
    * (api/hypotheses.py:15-100 accepts any callable test). The
    * contingency table is built in ONE distributed aggregation; only
    * cell counts reach the driver, hard-capped at `maxCells` (a table
    * bigger than that is a misuse of a chi-squared test, not a scale
    * problem to engineer around). Zero-observed (row, col) combinations
    * contribute their full expected count, as in the textbook statistic.
    * `Equal` relationship reads "independent": pass iff p >= alpha. */
  def chiSquareIndependence(
      otherCol: String,
      relationship: Relationship = Equal,
      alpha: Double = 0.01,
      maxCells: Int = 100000): AggregateCheck =
    AggregateCheck(
      "chi_square_independence",
      (df, colOpt) => {
        val c = colOpt.getOrElse(sys.error("chi_square_independence needs a column"))
        val rows = df
          .filter(col(c).isNotNull && col(otherCol).isNotNull)
          .groupBy(col(c).cast("string").as("a"),
                   col(otherCol).cast("string").as("b"))
          .agg(count(lit(1)).cast("double").as("n"))
          .limit(maxCells + 1)
          .collect()
        if (rows.length > maxCells)
          sys.error(s"chi_square_independence: contingency table exceeds " +
            s"maxCells=$maxCells cells; a test this fragmented is " +
            s"uninterpretable — reduce cardinality first")
        val cells = rows.map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        val rowT = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
        val colT = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
        val n = cells.map(_._3).sum
        val obs = cells.map(t => (t._1, t._2) -> t._3).toMap
        // keys.toSeq, NOT keys: a for-comprehension over Sets yields a Set,
        // which would collapse equal cell contributions into one
        val stat = (for (a <- rowT.keys.toSeq; b <- colT.keys.toSeq) yield {
          val exp = rowT(a) * colT(b) / n
          val o = obs.getOrElse((a, b), 0.0)
          (o - exp) * (o - exp) / exp
        }).sum
        val dof = ((rowT.size - 1) * (colT.size - 1)).toDouble
        val p = chiSquarePValue(stat, dof)
        AggOutcome(decide(relationship, stat, p, alpha),
          f"chi2=$stat%.6f p=$p%.6f df=$dof%.0f r=${rowT.size} c=${colT.size} n=$n%.0f")
      },
      Map("other_column" -> otherCol, "relationship" -> relationship.toString,
          "alpha" -> alpha, "max_cells" -> maxCells))

  /** Chi-squared goodness-of-fit of the schema column's category
    * frequencies against `expected` proportions (which must sum to ~1;
    * categories observed outside `expected` fail fast — they make the
    * statistic undefined). One distributed count aggregation, bounded by
    * |expected| driver cells. `Equal`: pass iff p >= alpha ("the data
    * follows the stated distribution"). */
  def chiSquareGof(
      expected: Map[String, Double],
      relationship: Relationship = Equal,
      alpha: Double = 0.01): AggregateCheck =
    AggregateCheck(
      "chi_square_gof",
      (df, colOpt) => {
        val c = colOpt.getOrElse(sys.error("chi_square_gof needs a column"))
        require(math.abs(expected.values.sum - 1.0) < 1e-6,
          s"chi_square_gof: expected proportions sum to ${expected.values.sum}, not 1")
        require(expected.values.forall(_ > 0),
          "chi_square_gof: every expected proportion must be > 0 (a zero " +
            "cell makes the statistic Inf/NaN — drop the category instead)")
        // limit caps the collect at |expected| + a few unknowns for the
        // error message — a high-cardinality column errors instead of
        // OOMing the driver (mirrors chiSquareIndependence's maxCells and
        // mannWhitneyU's maxDistinct guards)
        val rows = df.filter(col(c).isNotNull)
          .groupBy(col(c).cast("string").as("a"))
          .agg(count(lit(1)).cast("double").as("n"))
          .limit(expected.size + 8)
          .collect()
        val obs = rows.map(r => r.getString(0) -> r.getDouble(1)).toMap
        val unknown = obs.keySet -- expected.keySet
        if (unknown.nonEmpty)
          sys.error(s"chi_square_gof: observed categories absent from the " +
            s"expected distribution: ${unknown.toSeq.sorted.take(5).mkString(",")}")
        val n = obs.values.sum
        val stat = expected.map { case (k, p) =>
          val e = n * p
          val o = obs.getOrElse(k, 0.0)
          (o - e) * (o - e) / e
        }.sum
        val dof = (expected.size - 1).toDouble
        val pv = chiSquarePValue(stat, dof)
        AggOutcome(decide(relationship, stat, pv, alpha),
          f"chi2=$stat%.6f p=$pv%.6f df=$dof%.0f n=$n%.0f")
      },
      Map("expected" -> expected, "relationship" -> relationship.toString,
          "alpha" -> alpha))

  /** Mann–Whitney U (Wilcoxon rank-sum) between two groups — the
    * distribution-free alternative to [[twoSampleTtest]] (the reference
    * reaches it via `Hypothesis(test=scipy.stats.mannwhitneyu, ...)`).
    *
    * Distributed shape: the samples reduce to a per-distinct-VALUE
    * histogram `(value, n1, n2)` in one aggregation — midranks, tie
    * correction, U and the normal-approximation z are all functions of
    * that histogram, so the driver sees O(distinct values) cells
    * (hard-capped at `maxDistinct`; a continuous column at 100 TB should
    * be rounded/binned first, which changes the test by less than the
    * measurement noise that motivates rounding). No continuity
    * correction (both engines in the gate share the exact formula).
    * z > 0 when group `sample1` stochastically dominates. */
  def mannWhitneyU(
      groupbyCol: String,
      sample1: String,
      sample2: String,
      relationship: Relationship = NotEqual,
      alpha: Double = 0.01,
      maxDistinct: Int = 1000000): AggregateCheck =
    AggregateCheck(
      "mann_whitney_u",
      (df, colOpt) => {
        val c = colOpt.getOrElse(sys.error("mann_whitney_u needs a column"))
        val rows = valueHistogram(df, c, groupbyCol, sample1, sample2)
          .limit(maxDistinct + 1)
          .collect()
        if (rows.length > maxDistinct)
          sys.error(s"mann_whitney_u: more than maxDistinct=$maxDistinct " +
            s"distinct values; round/bin the column first")
        val hist = rows.map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
          .sortBy(_._1)
        val n1 = hist.map(_._2).sum
        val n2 = hist.map(_._3).sum
        if (n1 == 0 || n2 == 0)
          AggOutcome(passed = false, s"empty group(s): n1=$n1 n2=$n2")
        else {
          var cum = 0.0; var r1 = 0.0; var ties = 0.0
          hist.foreach { case (_, a, b) =>
            val t = a + b
            r1 += a * (cum + (t + 1) / 2) // midrank of this value block
            ties += t * t * t - t
            cum += t
          }
          val nn = n1 + n2
          val u1 = r1 - n1 * (n1 + 1) / 2
          val mu = n1 * n2 / 2
          val sigma = math.sqrt(n1 * n2 / 12.0 * ((nn + 1) - ties / (nn * (nn - 1))))
          if (sigma == 0.0) {
            // every observation shares one value (hist collapses to a
            // single fully-tied block): the rank statistic carries zero
            // information, so report the degenerate case explicitly with
            // z=0, p=1 ("no evidence of difference") instead of NaN —
            // two identical constant samples must satisfy `Equal`.
            AggOutcome(decide(relationship, 0.0, 1.0, alpha),
              f"degenerate: all values tied (distinct=${hist.length}); " +
                f"z=0 p=1 n1=$n1%.0f n2=$n2%.0f")
          } else {
            val z = (u1 - mu) / sigma
            val p = 2.0 * (1.0 - new NormalDistribution(0, 1)
              .cumulativeProbability(math.abs(z)))
            AggOutcome(decide(relationship, z, p, alpha),
              f"U=$u1%.1f z=$z%.6f p=$p%.6f n1=$n1%.0f n2=$n2%.0f distinct=${hist.length}")
          }
        }
      },
      Map("groupby" -> groupbyCol, "sample1" -> sample1, "sample2" -> sample2,
          "relationship" -> relationship.toString, "alpha" -> alpha,
          "max_distinct" -> maxDistinct))

  /** [[chiSquareIndependence]]'s statistic as a fully-distributed PLAN —
    * nothing reaches the driver; intermediates are contingency-sized.
    * Returns one row `(chi2, dof, n)`; `chi2` rounded to 4 decimals so a
    * cross-engine oracle can match it exactly despite summation-order
    * float drift. Zero-observed combos enter via the (row-totals ×
    * col-totals) cross join — both factors are category-sized, so the
    * cross join is a broadcast of scalars, not a data-sized product. */
  def chiSquareStatDF(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df
      .filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA).cast("string").as("a"),
               col(colB).cast("string").as("b"))
      .agg(count(lit(1)).cast("double").as("c"))
    val rt = cells.groupBy("a").agg(sum("c").as("ra"))
    val ct = cells.groupBy("b").agg(sum("c").as("cb"))
    val tot = cells.agg(sum(col("c")).as("n"),
      (count_distinct(col("a")) - 1) * (count_distinct(col("b")) - 1)
        cast "double" as "dof")
    // dv*dv rather than pow(dv, 2): a single multiply is correctly rounded
    // in both engines, pow may not be
    val expCount = col("ra") * col("cb") / col("n")
    val dv = coalesce(col("c"), lit(0.0)) - expCount
    rt.crossJoin(ct).crossJoin(tot)
      .join(cells, Seq("a", "b"), "left")
      .agg(
        round(sum(dv * dv / expCount), 4).as("chi2"),
        first(col("dof")).as("dof"),
        first(col("n")).as("n"))
  }

  /** Distributed prefix sums over the per-value histogram `(v, n1, n2)` —
    * the shared engine under [[mannWhitneyStatDF]] and [[ksTwoSampleStatDF]].
    *
    * Replaces the former `Window.orderBy("v")` (no partitionBy) funnel —
    * which Spark executes by moving EVERY distinct value to one task, a
    * scale-killer when the column is continuous (distinct ≈ row count) —
    * with a two-level cumulative sum:
    *
    *  1. rows are assigned a v-ordered bucket via `width_bucket(v, min(v),
    *     max(v), numBuckets)`. min/max are EXACT aggregates, so the bucket
    *     id is a deterministic pure function of `v` — both plan branches
    *     below re-derive identical assignments even though the histogram
    *     shuffle itself is order-nondeterministic (this is why range
    *     repartitioning, whose sampled bounds can differ between branches,
    *     is not used);
    *  2. per-bucket inclusive cumsums run under
    *     `Window.partitionBy("bkt").orderBy("v")` — parallel across buckets;
    *  3. cross-bucket offsets come from a `groupBy("bkt")` aggregate (at
    *     most `numBuckets` rows — the only unpartitioned window in the plan
    *     runs over THIS literally-bounded frame) broadcast-joined back.
    *
    * All cumulants are integer-valued counts carried as doubles (exact to
    * 2^53), so the two-level decomposition is bit-identical to the former
    * single-pass window. Caveat (documented, not load-bearing): the grid is
    * equal-width over [min, max], so a lone extreme outlier can concentrate
    * the remaining distinct values into one bucket — that degrades
    * parallelism of step 2, never correctness or the boundedness of step 3.
    *
    * Non-finite values (r13, advice fix): `width_bucket` returns null for a
    * NaN input and for NaN/infinite bounds, and a null `bkt` would silently
    * drop every row at the bucket equi-join — so bounds are computed over
    * FINITE values only and non-finite values get deterministic sentinel
    * buckets matching Spark's double sort order (−Inf < finite < +Inf <
    * NaN): −Inf → 0, +Inf → numBuckets+1, NaN → numBuckets+2. Each holds at
    * most one histogram row (the hist is grouped by v; Spark normalizes all
    * NaNs to one group), so the v-ordered cumsum is unchanged from what the
    * former global window produced.
    *
    * Output: hist columns + `c1`,`c2` (inclusive cumsums of n1,n2 in
    * v-order) + `t1`,`t2` (grand totals). */
  private[graft] def histPrefixSums(hist: DataFrame,
      numBuckets: Int = 1024): DataFrame = {
    val b = math.max(numBuckets, 1)
    val vFinite = !isnan(col("v")) &&
      col("v") =!= lit(Double.PositiveInfinity) &&
      col("v") =!= lit(Double.NegativeInfinity)
    val bounds = hist.agg(
      min(when(vFinite, col("v"))).as("_vmin"),
      max(when(vFinite, col("v"))).as("_vmax"))
    val bucketed = hist.crossJoin(broadcast(bounds))
      .withColumn("bkt",
        when(isnan(col("v")), lit(b.toLong + 2L))
          .when(col("v") === lit(Double.PositiveInfinity), lit(b.toLong + 1L))
          .when(col("v") === lit(Double.NegativeInfinity), lit(0L))
          .when(col("_vmin") === col("_vmax"), lit(1L))
          .otherwise(
            least(width_bucket(col("v"), col("_vmin"), col("_vmax"), lit(b)),
                  lit(b.toLong))))
      .drop("_vmin", "_vmax")
    val wLoc = Window.partitionBy("bkt").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = bucketed
      .withColumn("lc1", sum(col("n1")).over(wLoc))
      .withColumn("lc2", sum(col("n2")).over(wLoc))
    // <= numBuckets rows: the only orderBy-without-partitionBy windows in
    // the plan run over this literally-bounded bucket-totals frame
    val wOff = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offs = bucketed.groupBy("bkt")
      .agg(sum(col("n1")).as("bt1"), sum(col("n2")).as("bt2"))
      .withColumn("off1", coalesce(sum(col("bt1")).over(wOff), lit(0.0)))
      .withColumn("off2", coalesce(sum(col("bt2")).over(wOff), lit(0.0)))
      .withColumn("t1", sum(col("bt1")).over(wAll))
      .withColumn("t2", sum(col("bt2")).over(wAll))
      .select("bkt", "off1", "off2", "t1", "t2")
    local.join(broadcast(offs), Seq("bkt"))
      .withColumn("c1", col("lc1") + col("off1"))
      .withColumn("c2", col("lc2") + col("off2"))
      .drop("bkt", "lc1", "lc2", "off1", "off2")
  }

  /** [[mannWhitneyU]]'s (U, z) as a fully-distributed PLAN over the
    * per-value histogram. The cumulative ranks come from
    * [[histPrefixSums]]'s bucketed two-level cumsum — parallel across
    * v-range buckets, no task ever holds more than one bucket of distinct
    * values (the former single-partition `Window.orderBy` is gone).
    * Returns one row `(u1, z, n1, n2)` rounded for cross-engine matching. */
  def mannWhitneyStatDF(df: DataFrame, valueCol: String, groupbyCol: String,
      sample1: String, sample2: String): DataFrame = {
    val hist = valueHistogram(df, valueCol, groupbyCol, sample1, sample2)
    val ranked = histPrefixSums(hist)
      .withColumn("t", col("n1") + col("n2"))
      // strictly-preceding total = inclusive cumsum minus own row — exact,
      // all terms are integer-valued doubles
      .withColumn("cum", col("c1") + col("c2") - col("t"))
    ranked.agg(
        sum(col("n1")).as("N1"), sum(col("n2")).as("N2"),
        sum(col("n1") * (col("cum") + (col("t") + 1) / 2)).as("R1"),
        sum(col("t") * col("t") * col("t") - col("t")).as("T3"),
        sum(col("t")).as("NN"))
      // sigma materialized so the fully-tied degenerate case (sigma=0,
      // where the division would yield null) pins z=0 — matching the
      // driver form's explicit degenerate outcome
      .withColumn("SIG", sqrt(col("N1") * col("N2") / 12.0
        * ((col("NN") + 1) - col("T3") / (col("NN") * (col("NN") - 1)))))
      .select(
        // an ABSENT group must surface as NULL u1/z, mirroring
        // ksTwoSampleStatDF and the driver form's failed outcome — the
        // former plan read z=0 for a misspelled group label, identical
        // to the all-tied degenerate "no evidence" answer (r18 review)
        when(col("N1") === 0 || col("N2") === 0, lit(null))
          .otherwise(round(col("R1") - col("N1") * (col("N1") + 1) / 2, 4))
          .as("u1"),
        when(col("N1") === 0 || col("N2") === 0, lit(null))
          .when(col("SIG") === 0.0, lit(0.0)).otherwise(
            round((col("R1") - col("N1") * (col("N1") + 1) / 2
              - col("N1") * col("N2") / 2) / col("SIG"), 6)).as("z"),
        col("N1").cast("long").as("n1"), col("N2").cast("long").as("n2"))
  }

  /** Kolmogorov complementary CDF Q(λ) = 2·Σ_{j≥1} (−1)^{j−1} e^{−2j²λ²} —
    * the asymptotic two-sided p-value of a KS statistic (the series scipy's
    * kstest(mode='asymp') evaluates). Converges in a handful of terms for
    * any λ of practical size. */
  def kolmogorovPValue(lambda: Double): Double = {
    if (lambda.isNaN) return Double.NaN
    if (lambda <= 0) return 1.0
    var sum = 0.0; var j = 1
    var term = Double.MaxValue
    while (j <= 100 && math.abs(term) > 1e-12) {
      term = 2.0 * (if (j % 2 == 1) 1.0 else -1.0) *
        math.exp(-2.0 * j * j * lambda * lambda)
      sum += term
      j += 1
    }
    math.min(math.max(sum, 0.0), 1.0)
  }

  /** Two-sample Kolmogorov–Smirnov test between two groups — the
    * distribution-EQUALITY test (sensitive to any CDF difference: location,
    * scale, shape) where [[mannWhitneyU]] tests stochastic dominance and
    * [[twoSampleTtest]] means only. The reference reaches it via
    * `Hypothesis(test=scipy.stats.ks_2samp, ...)`.
    *
    * Distributed shape mirrors [[mannWhitneyU]]: ONE aggregation reduces
    * both samples to a per-distinct-value histogram `(value, n1, n2)` —
    * D = max |F̂1 − F̂2| is a function of that histogram, so the driver sees
    * O(distinct values) cells (hard-capped at `maxDistinct`; bin a
    * continuous column first at 100 TB). p-value is the asymptotic
    * Kolmogorov series at λ = √(n1·n2/(n1+n2))·D (no small-sample exact
    * enumeration — at validation scale n is never small). `Equal` reads
    * "same distribution": pass iff p >= alpha. */
  def ksTwoSample(
      groupbyCol: String,
      sample1: String,
      sample2: String,
      relationship: Relationship = Equal,
      alpha: Double = 0.01,
      maxDistinct: Int = 1000000): AggregateCheck =
    AggregateCheck(
      "ks_two_sample",
      (df, colOpt) => {
        val c = colOpt.getOrElse(sys.error("ks_two_sample needs a column"))
        val rows = valueHistogram(df, c, groupbyCol, sample1, sample2)
          .limit(maxDistinct + 1)
          .collect()
        if (rows.length > maxDistinct)
          sys.error(s"ks_two_sample: more than maxDistinct=$maxDistinct " +
            s"distinct values; round/bin the column first")
        val hist = rows.map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
          .sortBy(_._1)
        val n1 = hist.map(_._2).sum
        val n2 = hist.map(_._3).sum
        if (n1 == 0 || n2 == 0)
          AggOutcome(passed = false, s"empty group(s): n1=$n1 n2=$n2")
        else {
          var c1 = 0.0; var c2 = 0.0; var d = 0.0
          hist.foreach { case (_, a, b) =>
            c1 += a; c2 += b
            val gap = math.abs(c1 / n1 - c2 / n2)
            if (gap > d) d = gap
          }
          val en = math.sqrt(n1 * n2 / (n1 + n2))
          val p = kolmogorovPValue(en * d)
          AggOutcome(decide(relationship, d, p, alpha),
            f"D=$d%.6f p=$p%.6f n1=$n1%.0f n2=$n2%.0f distinct=${hist.length}")
        }
      },
      Map("groupby" -> groupbyCol, "sample1" -> sample1, "sample2" -> sample2,
          "relationship" -> relationship.toString, "alpha" -> alpha,
          "max_distinct" -> maxDistinct))

  /** [[ksTwoSample]]'s D statistic as a fully-distributed PLAN over the
    * per-value histogram — cumulative CDFs and grand totals both come from
    * [[histPrefixSums]]'s bucketed two-level cumsum (parallel across
    * v-range buckets; the former single-partition `Window.orderBy` and
    * whole-frame `Window.partitionBy()` are gone). Returns one row
    * `(d, n1, n2)`, D rounded to 6 decimals for cross-engine matching. */
  def ksTwoSampleStatDF(df: DataFrame, valueCol: String, groupbyCol: String,
      sample1: String, sample2: String): DataFrame = {
    val hist = valueHistogram(df, valueCol, groupbyCol, sample1, sample2)
    histPrefixSums(hist)
      .agg(
        // an absent group (t=0) must surface as a NULL d, mirroring the
        // driver form's explicit n1==0/n2==0 failed outcome — never a
        // silent 0/0 = NaN statistic
        round(max(when(col("t1") === 0 || col("t2") === 0, lit(null))
          .otherwise(abs(col("c1") / col("t1") - col("c2") / col("t2")))), 6)
          .as("d"),
        max(col("t1")).cast("long").as("n1"),
        max(col("t2")).cast("long").as("n2"))
  }

  /** One-sample t-test vs `popmean`
    * (reference: api/hypotheses.py:293-381 one_sample_ttest). */
  def oneSampleTtest(
      popmean: Double,
      relationship: Relationship = NotEqual,
      alpha: Double = 0.01): AggregateCheck =
    AggregateCheck(
      "one_sample_ttest",
      (df, colOpt) => {
        val c = colOpt.getOrElse(sys.error("one_sample_ttest needs a column"))
        val r = df.filter(col(c).isNotNull)
          .agg(count(col(c)).as("n"), avg(col(c)).as("m"),
               stddev_samp(col(c)).as("s")).head()
        val n = r.getLong(0)
        // empty / single-row columns surface as clean failed outcomes,
        // not NPEs on the NULL avg/stddev (r18 review); an all-constant
        // column gets the same degenerate treatment as twoSampleT
        if (n < 2)
          AggOutcome(passed = false,
            s"one_sample_ttest needs >= 2 non-null rows, got $n")
        else {
          val m = r.getDouble(1); val s = r.getDouble(2)
          val (t, p) =
            if (s == 0.0) {
              val t0 = if (m == popmean) 0.0
                else if (m > popmean) Double.PositiveInfinity
                else Double.NegativeInfinity
              (t0, if (m == popmean) 1.0 else 0.0)
            } else {
              val t0 = (m - popmean) / (s / math.sqrt(n.toDouble))
              (t0, tPValue(t0, (n - 1).toDouble))
            }
          AggOutcome(decide(relationship, t, p, alpha),
            f"t=$t%.6f p=$p%.6f n=$n mean=$m%.6f popmean=$popmean")
        }
      },
      Map("popmean" -> popmean, "relationship" -> relationship.toString,
          "alpha" -> alpha))
}
