package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-stage salted aggregation — the standard defense when a groupBy key
  * is so skewed that one reducer owns the hot key's entire mass (AQE's
  * skew handling splits skewed JOIN partitions, but a skewed AGGREGATION
  * key still funnels every pre-aggregated partial for that key to one
  * task). Stage 1 groups by (key, salt) — the hot key's rows spread over
  * `saltBuckets` reducers; stage 2 re-aggregates the bucket partials by
  * key alone, shuffling only #keys·saltBuckets tiny rows.
  *
  * Restricted to ALGEBRAIC aggregates (partials merge exactly):
  * sum/count/min/max arrive decomposed; avg = salted sum / salted count,
  * assembled in stage 2. Results are exactly the plain groupBy's up to
  * float addition order (integer/decimal sums are bit-identical; the gate
  * rounds the double column like every other sum oracle).
  *
  * Note Spark's hash aggregation already does map-side partial combine,
  * which absorbs MOST skew; the salt matters when the number of DISTINCT
  * hot-key partials still overwhelms one reducer — i.e. very many map
  * tasks, or high-cardinality secondary grouping. The ScaleProbe's
  * `salted` leg measures both stages. */
object Salting {

  private def q(n: String): Column = col("`" + n.replace("`", "``") + "`")

  /** Supported aggregate spec: output column name → ("sum"|"count"|"min"|
    * "max"|"avg", input column; count ignores it / lit(1)). */
  def saltedAggregate(df: DataFrame, keys: Seq[String],
      aggs: Seq[(String, (String, String))],
      saltBuckets: Int = 32): DataFrame = {
    require(keys.nonEmpty, "saltedAggregate: at least one key")
    require(aggs.nonEmpty, "saltedAggregate: at least one aggregate")
    require(saltBuckets >= 1, "saltBuckets >= 1")
    val ops = Set("sum", "count", "min", "max", "avg")
    aggs.foreach { case (out, (op, _)) =>
      require(ops.contains(op), s"saltedAggregate: unsupported op '$op' for '$out'")
      require(!out.startsWith("__"), "output names may not start with __")
    }
    // deterministic salt from a row hash — no rand(), so retried tasks
    // salt identically and results are reproducible
    val salt = pmod(xxhash64(monotonically_increasing_id(), lit(0x5a17)),
      lit(saltBuckets.toLong))
    // stage 1: decomposed partials per (keys, salt)
    val partials = aggs.flatMap { case (out, (op, in)) =>
      op match {
        case "sum"   => Seq(sum(q(in)).as(s"__s_$out"))
        case "count" => Seq(count(lit(1)).as(s"__c_$out"))
        case "min"   => Seq(min(q(in)).as(s"__m_$out"))
        case "max"   => Seq(max(q(in)).as(s"__x_$out"))
        case "avg"   => Seq(sum(q(in)).as(s"__s_$out"),
          count(q(in)).as(s"__c_$out"))
      }
    }
    val stage1 = df.withColumn("__salt", salt)
      .groupBy((keys.map(q) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
    // stage 2: merge bucket partials per key
    val finals = aggs.map { case (out, (op, _)) =>
      op match {
        case "sum"   => sum(col(s"__s_$out")).as(out)
        case "count" => sum(col(s"__c_$out")).as(out)
        case "min"   => min(col(s"__m_$out")).as(out)
        case "max"   => max(col(s"__x_$out")).as(out)
        case "avg"   => (sum(col(s"__s_$out")) / sum(col(s"__c_$out"))).as(out)
      }
    }
    stage1.groupBy(keys.map(q): _*).agg(finals.head, finals.tail: _*)
  }
}
