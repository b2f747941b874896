package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.checks.{AggregateCheck, AggOutcome, Check}

/** Large-set membership checks via broadcast semi/anti joins.
  *
  * `Check.isin/notin` inline the allowed/forbidden values as an
  * in-expression literal list — ideal for small sets (codegen'd hash-set
  * probe, rides the fused validation pass), but a 100k-value set bloats the
  * plan, the codegen source, and every task's deserialized expression tree.
  * Reference behavior is the same membership semantics
  * (pandera/api/checks.py:475, :532); the broadcast-join formulation is the
  * Spark-native scale path for huge sets (SURVEY.md §2.A rows 8-9).
  *
  * Shape at 100 TB: the value set broadcasts once per executor (not per
  * task); violations are counted plus bounded-sampled in ONE aggregation
  * job over a broadcast ANTI (isin) / SEMI (notin) join — no shuffle of the
  * data side, no driver materialization beyond n_failure_cases samples.
  */
object SetMembership {

  /** Rows of `df` violating the membership constraint, via a broadcast
    * join. `semi=false` (isin): anti join keeps rows NOT in the set;
    * `semi=true` (notin): semi join keeps rows that ARE in the forbidden
    * set. Values are matched after casting to the column's type. */
  def violations(df: DataFrame, column: String, values: Seq[Any],
                 semi: Boolean): DataFrame = {
    val spark = df.sparkSession
    val dt = df.schema(column).dataType
    val valuesDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        values.map(v => org.apache.spark.sql.Row(String.valueOf(v))),
        math.max(1, values.size / 500000)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__graft_set_value",
          org.apache.spark.sql.types.StringType))))
      .select(col("__graft_set_value").cast(dt).as("__graft_set_value"))
    val joinType = if (semi) "left_semi" else "left_anti"
    df.filter(col(column).isNotNull)
      .join(broadcast(valuesDf), col(column) === col("__graft_set_value"), joinType)
  }

  private def membershipCheck(name: String, values: Seq[Any],
                              semi: Boolean): AggregateCheck =
    AggregateCheck(
      name,
      (df, colOpt) => {
        val c = colOpt.getOrElse(sys.error(s"$name requires a column"))
        val row = violations(df, c, values, semi).agg(
          count(lit(1)).as("n_bad"),
          graft.functions.BoundedCollect.of(col(c).cast("string"),
            Check.DefaultNFailureCases).as("cases")).head()
        val nBad = row.getLong(0)
        AggOutcome(nBad == 0L, s"violations=$nBad set_size=${values.size}",
          row.getSeq[String](1).toSeq)
      },
      Map("n_values" -> values.size))

  /** All values must be IN the (large) allowed set: broadcast anti join —
    * rows with no match in the set are violations. */
  def isinLarge(values: Seq[Any]): AggregateCheck =
    membershipCheck("isin_large", values, semi = false)

  /** No value may be in the (large) forbidden set: broadcast semi join —
    * rows WITH a match are violations. */
  def notinLarge(values: Seq[Any]): AggregateCheck =
    membershipCheck("notin_large", values, semi = true)
}
