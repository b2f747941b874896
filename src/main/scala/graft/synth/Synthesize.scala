package graft.synth

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.checks.{Check, ColumnCheck}
import graft.schema.{ColumnSchema, DataFrameSchema}

/** Property-based data synthesis from a schema — the reference's
  * `schema.example()` / strategies module (strategies/pandas_strategies.py).
  *
  * Two key design points carried over:
  *  - constraints from ALL of a column's checks are MERGED into one
  *    generator (the reference's one-shot constraint aggregation,
  *    base_strategies.py:42 CONSTRAINT_DISPATCHER) instead of
  *    generate-then-filter;
  *  - the invariant: data synthesized from a schema must VALIDATE against
  *    that schema (tests/strategies/test_strategies.py:128-160).
  *
  * Unlike the reference (hypothesis generates rows on the driver), the
  * generator is a Spark plan over `spark.range(n)` — deterministic in
  * (seed, row id), embarrassingly parallel, and therefore able to
  * synthesize 100 TB as easily as 100 rows.
  */
object Synthesize {

  private final case class Merged(
      lo: Option[Double] = None,       // inclusive lower
      hi: Option[Double] = None,       // inclusive upper
      eq: Option[Any] = None,
      isin: Option[Seq[Any]] = None,
      notin: Seq[Any] = Nil,
      prefix: Option[String] = None,
      suffix: Option[String] = None,
      lenMin: Option[Int] = None,
      lenMax: Option[Int] = None)

  private def mergeConstraints(checks: Seq[Check]): Merged =
    checks.foldLeft(Merged()) {
      case (m, c: ColumnCheck) =>
        val st = c.statistics
        def d(k: String): Double = st(k).toString.toDouble
        c.name match {
          case "equal_to" => m.copy(eq = Some(st("value")))
          case "greater_than" => m.copy(lo = Some(d("min_value") + 1e-6))
          case "greater_than_or_equal_to" => m.copy(lo = Some(d("min_value")))
          case "less_than" => m.copy(hi = Some(d("max_value") - 1e-6))
          case "less_than_or_equal_to" => m.copy(hi = Some(d("max_value")))
          case "in_range" =>
            val lo = d("min_value") + (if (st("include_min") == false) 1e-6 else 0)
            val hi = d("max_value") - (if (st("include_max") == false) 1e-6 else 0)
            m.copy(lo = Some(lo), hi = Some(hi))
          case "isin" => m.copy(isin = Some(st("allowed_values").asInstanceOf[Seq[Any]]))
          case "notin" => m.copy(notin = m.notin ++ st("forbidden_values").asInstanceOf[Seq[Any]])
          case "str_startswith" => m.copy(prefix = Some(st("string").toString))
          case "str_endswith" => m.copy(suffix = Some(st("string").toString))
          case "str_length" => m.copy(
            lenMin = Option(st.getOrElse("min_value", null)).map(_.toString.toDouble.toInt),
            lenMax = Option(st.getOrElse("max_value", null)).map(_.toString.toDouble.toInt))
          case _ => m // non-constraining or unsupported check: ignored
        }
      case (m, _) => m
    }

  /** Deterministic uniform double in [0,1) keyed on (seed, row id, salt) —
    * NOT rand(): resumable, partition-count-independent. */
  private def u01(seed: Long, salt: Int): Column =
    pmod(xxhash64(col("id"), lit(seed), lit(salt)), lit(1000000007L))
      .cast("double") / 1000000007.0

  private def generator(name: String, cs: ColumnSchema, seed: Long, salt: Int): Column = {
    val dt = cs.dtype.getOrElse(StringType)
    val m = mergeConstraints(cs.checks)
    val base: Column = m.eq match {
      case Some(v) => lit(v).cast(dt)
      case None => m.isin.map(_.filterNot(m.notin.contains)) match {
        case Some(vs) if vs.isEmpty =>
          sys.error(s"column '$name': isin minus notin leaves no legal values")
        case Some(vs) =>
          element_at(array(vs.map(v => lit(v).cast(dt)): _*),
            (pmod(xxhash64(col("id"), lit(seed), lit(salt)), lit(vs.size)) + 1).cast("int"))
        case None => dt match {
          case _: NumericType =>
            // default the missing bound RELATIVE to the present one — a
            // le(-451) alone must not default lo to 0 (span would clamp
            // to 0 and emit the out-of-range constant 0)
            val lo = m.lo.getOrElse(m.hi.map(_ - 1000.0).getOrElse(0.0))
            val hi = m.hi.getOrElse(lo + 1000.0)
            dt match {
              case DoubleType | FloatType | _: DecimalType =>
                (lit(lo) + u01(seed, salt) * lit(math.max(hi - lo, 0.0))).cast(dt)
              case _ =>
                // int family: uniform integer in [ceil(lo), floor(hi)] —
                // naive floor(lo + u*span) dips below a fractional lo
                val l = math.ceil(lo)
                val h = math.max(math.floor(hi), l)
                (lit(l) + floor(u01(seed, salt) * lit(h - l + 1.0))).cast(dt)
            }
          case BooleanType => (u01(seed, salt) < 0.5).cast(dt)
          case DateType =>
            date_add(lit(java.sql.Date.valueOf("2020-01-01")),
              floor(u01(seed, salt) * 3650).cast("int"))
          case TimestampType =>
            timestamp_seconds(lit(1577836800L) + floor(u01(seed, salt) * 86400 * 3650).cast("long"))
          case StringType =>
            val prefix = m.prefix.getOrElse("")
            val suffix = m.suffix.getOrElse("")
            val body = lower(conv(
              pmod(xxhash64(col("id"), lit(seed), lit(salt)), lit(Int.MaxValue.toLong)).cast("string"),
              10, 36))
            val raw = concat(lit(prefix), body, lit(suffix))
            (m.lenMin, m.lenMax) match {
              case (mn, Some(mx)) =>
                val padded = rpad(raw, mn.getOrElse(1).max(prefix.length + suffix.length + 1), "x")
                // keep the suffix intact when truncating
                if (suffix.nonEmpty)
                  concat(substring(padded, 1, mx - suffix.length), lit(suffix))
                else substring(padded, 1, mx)
              case (Some(mn), None) => rpad(raw, mn.max(1), "x")
              case _ => raw
            }
          case BinaryType => encode(conv(col("id").cast("string"), 10, 16), "UTF-8")
          case other => lit(null).cast(other)
        }
      }
    }
    val withUnique =
      if (!cs.unique) base
      else dt match {
        // uniqueness wins over range randomness: derive from the row id
        case _: NumericType => (lit(m.lo.getOrElse(0.0)).cast(dt) + col("id").cast(dt))
        case StringType => concat(lit(m.prefix.getOrElse("")), lit("u"), col("id").cast("string"),
          lit(m.suffix.getOrElse("")))
        case _ => base
      }
    if (cs.nullable && cs.default.isEmpty && !cs.unique)
      when(u01(seed, salt + 7919) < 0.03, lit(null).cast(dt)).otherwise(withUnique)
    else withUnique
  }

  /** Synthesize `n` rows satisfying `schema`. Fully distributed plan. */
  def dataFrame(spark: SparkSession, schema: DataFrameSchema, n: Long,
                seed: Long = 42L): DataFrame = {
    val cols = schema.columns.zipWithIndex.map { case ((name, cs), i) =>
      generator(name, cs, seed, i).as(name)
    }
    spark.range(n).select(cols: _*)
  }
}
