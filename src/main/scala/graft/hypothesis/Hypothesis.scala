package graft.hypothesis

import org.apache.spark.sql.functions._
import org.apache.commons.math3.distribution.TDistribution
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
    if (equalVar) {
      val dof = (n1 + n2 - 2).toDouble
      val sp2 = ((n1 - 1) * v1 + (n2 - 1) * v2) / dof
      val se = math.sqrt(sp2 * (1.0 / n1 + 1.0 / n2))
      val t = (m1 - m2) / se
      TestResult(t, tPValue(t, dof), dof)
    } else {
      val a = v1 / n1; val b = v2 / n2
      val se = math.sqrt(a + b)
      val t = (m1 - m2) / se
      val dof = math.pow(a + b, 2) /
        (math.pow(a, 2) / (n1 - 1) + math.pow(b, 2) / (n2 - 1))
      TestResult(t, tPValue(t, dof), dof)
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
          String.valueOf(r.get(0)) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
        (byGroup.get(sample1), byGroup.get(sample2)) match {
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
                s"raise the cap or use an aggregate-form hypothesis")
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
        val n = r.getLong(0); val m = r.getDouble(1); val s = r.getDouble(2)
        val t = (m - popmean) / (s / math.sqrt(n.toDouble))
        val p = tPValue(t, (n - 1).toDouble)
        AggOutcome(decide(relationship, t, p, alpha),
          f"t=$t%.6f p=$p%.6f n=$n mean=$m%.6f popmean=$popmean")
      },
      Map("popmean" -> popmean, "relationship" -> relationship.toString,
          "alpha" -> alpha))
}
