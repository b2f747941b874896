package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, key-based sampling and split assignment for training-data
  * pipelines (beyond-reference additions, SURVEY.md §2.F north star).
  *
  * `df.sample()` draws per-partition random bits: the selected set changes
  * with partition count, task retries, and engine version — unacceptable
  * when the sample defines a training set that must be reproducible and
  * auditable years later. Every operator here instead derives its decision
  * from a HASH OF THE ROW'S KEY, so membership is:
  *   - deterministic in (key, seed) — independent of partitioning, ordering,
  *     cluster size, retries, or AQE re-planning;
  *   - consistent across engines (md5 is universal — the same predicate
  *     re-evaluates identically in any SQL engine, so downstream systems can
  *     verify or re-derive the sample);
  *   - stable under incremental appends — a row's verdict never changes as
  *     the corpus grows, enabling exactly-once sample maintenance on a
  *     growing 100 TB corpus.
  *
  * Everything is a pure codegen'd expression over one scan: no shuffle, no
  * UDF, no state.
  */
object Sampling {

  private def q(n: String): Column = col("`" + n.replace("`", "``") + "`")

  /** Field separator inside hashed keys: chr(1) — effectively absent from
    * real keys, and replicable as chr(1) in any SQL engine. */
  private[ext] val Sep = "\u0001"

  /** The shared 32-bit key hash: first 8 hex chars of
    * md5(key + chr(1) + seed) as a long in [0, 2^32). This convention is
    * load-bearing for every DuckDB oracle that re-derives a draw —
    * repo-wide visibility (r14) so callers outside ext (the sampled
    * grouped hypothesis) reuse it instead of re-inlining the expression.
    *
    * NULL keys: concat_ws skips null arguments, so every null key hashes
    * to ONE constant — under the by-key determinism contract that makes
    * all null-key rows a single group that keeps/drops/buckets EN BLOC
    * (exactly like any shared key value). That is the documented
    * semantics for sampleByKey/assignSplits/mixCorpora (a sampler keyed
    * on a column with nulls gets all-or-nothing for that slice — pass a
    * non-null key if per-row draws are wanted); operators whose output
    * re-attaches by key equality must EXCLUDE null keys instead (null
    * never `===`-joins — see [[weightedSampleWOR]]). */
  private[graft] def hash32(key: Column, seed: Long): Column =
    conv(substring(md5(concat_ws(Sep, key.cast("string"), lit(seed.toString))),
      1, 8), 16, 10).cast("long")

  /** Deterministic uniform double in [0,1) from (key, seed): [[hash32]]
    * scaled. 32 bits gives fraction resolution of 2.3e-10 — far below any
    * sampling noise that matters. */
  def hashBucket(key: Column, seed: Long): Column =
    hash32(key, seed).cast("double") / 4294967296.0

  /** Deterministic bucket index in [0, buckets) from (key, seed) — the
    * shard assignment for operators that parallelize a sequential scan
    * (e.g. [[Packing.packGreedy]]). */
  def hashBucketInt(key: Column, buckets: Int, seed: Long): Column = {
    require(buckets > 0, "buckets > 0")
    (hash32(key, seed) % buckets).cast("int")
  }

  /** Keep each row with probability `fraction`, decided by the key hash. */
  def sampleByKey(df: DataFrame, keyCol: String, fraction: Double,
      seed: Long = 42L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction in [0,1], got $fraction")
    df.filter(hashBucket(q(keyCol), seed) < fraction)
  }

  /** Stratified sampling with per-stratum fractions (the deterministic
    * counterpart of `df.stat.sampleBy`): rows in stratum s survive with
    * probability fractions(s), others with `defaultFraction`. One scan,
    * no shuffle — rebalancing a 100 TB corpus by language/source is a
    * filter, not an aggregation. */
  def stratifiedSampleByKey(df: DataFrame, keyCol: String, strataCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      seed: Long = 42L): DataFrame = {
    (fractions.values.toSeq :+ defaultFraction).foreach(f =>
      require(f >= 0 && f <= 1, s"fractions in [0,1], got $f"))
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (s, f)) =>
      when(q(strataCol) === lit(s), lit(f)).otherwise(acc)
    }
    df.filter(hashBucket(q(keyCol), seed) < frac)
  }

  /** Assign each row to one of `splits` (name, weight) by key hash —
    * train/validation/test partitioning that is reproducible, engine-
    * portable, and append-stable (a document keeps its split forever, so a
    * later crawl snapshot can never leak test documents into train).
    * Weights are normalized; assignment thresholds are the cumulative
    * weight prefix sums. Adds `splitCol` (default "split"). */
  def assignSplits(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)], seed: Long = 42L,
      splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "at least one split")
    splits.foreach { case (n, w) => require(w > 0, s"split '$n' weight > 0, got $w") }
    val total = splits.map(_._2).sum
    val b = hashBucket(q(keyCol), seed)
    val cum = splits.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
    // the last branch is the unconditional fallback so b == 1-ulp edge
    // cases (and float-sum drift) can never produce a null split
    val assigned = splits.init.zip(cum.init).foldRight(lit(splits.last._1)) {
      case (((name, _), hi), acc) => when(b < hi, lit(name)).otherwise(acc)
    }
    df.withColumn(splitCol, assigned)
  }

  /** Deterministic global shuffle: order the corpus by the key hash — the
    * "shuffle the training data" step, reproducible in (key, seed) and
    * re-derivable in any engine (unlike `orderBy(rand())`, whose order
    * changes with partitioning and retries). Spark plans this as a range
    * partition on the hash + per-partition sort; the 32-bit hash is
    * uniform, so the range partitions are balanced by construction — the
    * canonical distributed sort, no skew, no driver involvement. The key
    * itself is the tie-break so equal hashes (2^-32 of pairs) stay
    * deterministic. */
  def shuffleByKey(df: DataFrame, keyCol: String, seed: Long = 42L): DataFrame =
    df.orderBy(hash32(q(keyCol), seed), q(keyCol))

  /** Mix several corpora into one training stream at given sampling rates —
    * the "data mixture" step of a pretraining pipeline (e.g. 3 parts web,
    * 1 part code, upsampled books). Each source is downsampled to its rate
    * by the same deterministic key-hash as [[sampleByKey]] — so the mixture
    * is reproducible, append-stable, and re-derivable in any engine — then
    * tagged with its source name and unioned BY NAME (sources may disagree
    * on column order; with `allowMissingColumns` columns absent from a
    * source come back null, otherwise heterogeneous schemas are an
    * AnalysisException).
    *
    * The source name participates in the hash, so the same key sampled in
    * two sources makes independent decisions (a document present in two
    * crawls is not all-or-nothing across the mixture).
    *
    * Rates may exceed 1: rate 2.5 emits every row twice plus a 0.5-rate
    * sampled third copy — deterministic upsampling for high-quality
    * sources, matching how mixture weights > 1 are applied in practice.
    * A `copy` ordinal distinguishes the replicas (0-based) so downstream
    * shuffles/splits still have a unique key: hash on (key, source, copy).
    *
    * One scan per source, zero shuffles. */
  def mixCorpora(sources: Seq[(String, DataFrame, Double)], keyCol: String,
      seed: Long = 42L, sourceCol: String = "source",
      copyCol: String = "copy",
      allowMissingColumns: Boolean = false): DataFrame = {
    require(sources.nonEmpty, "at least one source")
    sources.foreach { case (n, _, r) => require(r >= 0, s"source '$n' rate >= 0, got $r") }
    // rate-0 sources contribute nothing and are not unioned at all (their
    // schema never constrains the mixture)
    val active = sources.filter(_._3 > 0)
    if (active.isEmpty) {
      // every rate == 0: a valid empty stream with the output schema
      val (_, df0, _) = sources.head
      return df0.withColumn(copyCol, lit(0)).withColumn(sourceCol, lit("")).limit(0)
    }
    val parts = active.map { case (name, df, rate) =>
      val full = math.floor(rate).toInt
      val frac = rate - full
      val h = hashBucket(concat_ws(Sep, lit(name), q(keyCol)), seed)
      // ONE scan per source at ANY rate: each row explodes to its copy
      // ordinals 0..nCopies-1 (nCopies = floor(rate) + the fractional
      // hash draw) — rate 12.5 used to be 13 scans of the source, now the
      // generate runs inside the same scan. slice(, 1, 0) → empty array →
      // explode drops the row, so a lost fractional draw emits nothing.
      val nCopies = (lit(full) + when(h < frac, 1).otherwise(0)).cast("int")
      df.withColumn(copyCol,
          explode(slice(sequence(lit(0), lit(full)), lit(1), nCopies)))
        .withColumn(sourceCol, lit(name))
    }
    parts.reduce(_.unionByName(_, allowMissingColumns))
  }

  /** Mix corpora to hit a TOKEN budget — the practical form of the data-
    * mixture step: "2T tokens total, 70% web / 20% code / 10% books" is
    * how pretraining mixtures are actually specified, with under-sized
    * high-quality sources repeated over multiple epochs (weights give the
    * budget SHARE, not a sampling rate). Per source s with (normalized)
    * weight w_s and total tokens N_s, the sampling rate is
    * budget·w_s / N_s — below 1 a deterministic downsample, above 1
    * floor(rate) full epochs plus a hash-drawn fractional epoch — then
    * the whole mixture is ONE [[mixCorpora]] pass (one scan per source,
    * zero shuffles; every decision re-derivable from (key, source, seed)).
    *
    * The per-source token totals are ONE fused aggregation job over the
    * union of all sources (a bounded sources-row collect — the
    * validator's fusion trick, not a job per source). Expected realized
    * tokens per source = budget·w_s exactly; the variance comes only from
    * which documents the fractional-epoch hash admits.
    *
    * `tokensCol` is a per-row token count column (e.g.
    * [[TextAnalysis.tokenCount]] materialized by the caller). Sources
    * with zero tokens and positive weight are an error (their share is
    * unfillable), weight-0 sources are dropped. */
  def mixToTokenBudget(sources: Seq[(String, DataFrame, Double)],
      keyCol: String, tokensCol: String, budget: Long, seed: Long = 42L,
      sourceCol: String = "source", copyCol: String = "copy",
      allowMissingColumns: Boolean = false): DataFrame = {
    require(sources.nonEmpty, "at least one source")
    require(budget > 0, s"budget > 0, got $budget")
    sources.foreach { case (n, _, w) =>
      require(w >= 0, s"source '$n' weight >= 0, got $w") }
    val wsum = sources.map(_._3).sum
    require(wsum > 0, "at least one positive weight")
    // r17 review: duplicate source names silently MERGED their token
    // totals (each duplicate's rate computed against the combined N —
    // the realized budget missed the target with no error), and a
    // weight-0 source still paid a full token scan for a total that was
    // never used ("dropped" sources must cost nothing)
    require(sources.map(_._1).distinct.size == sources.size,
      s"mixToTokenBudget: duplicate source names " +
        s"(${sources.map(_._1).mkString(", ")}) — totals would merge and " +
        "every duplicate's rate would be computed against the combined N")
    val live = sources.filter(_._3 > 0)
    val totals = tokenTotals(live.map { case (n, df, _) => (n, df) }, tokensCol)
    val rated = live.map { case (name, df, w) =>
      val n = totals.getOrElse(name, 0L)
      require(n > 0L,
        s"mixToTokenBudget: source '$name' has weight $w but zero tokens")
      // evaluation order fixed (budget · w̄) / N so any engine re-deriving
      // the rate from the same inputs lands on the same IEEE double
      (name, df, budget.toDouble * (w / wsum) / n.toDouble)
    }
    mixCorpora(rated, keyCol, seed, sourceCol, copyCol, allowMissingColumns)
  }

  /** One fused job: every source's token total in a single aggregation
    * (a bounded sources-row collect — the validator's fusion trick, not a
    * job per source). Shared by [[mixToTokenBudget]] and
    * [[mixByTemperature]]. */
  private def tokenTotals(sources: Seq[(String, DataFrame)],
      tokensCol: String): Map[String, Long] = sources
    .map { case (n, df) =>
      df.select(lit(n).as("__src"), q(tokensCol).cast("long").as("__tok")) }
    .reduce(_.unionByName(_))
    .groupBy("__src").agg(sum("__tok").as("__n"))
    .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1)))
    .toMap

  /** Temperature-weighted corpus mixing — the multilingual/multi-domain
    * pretraining recipe (XLM-R, mT5, LLaMA data mixtures): a source's
    * budget SHARE is proportional to N_s^alpha, where N_s is its token
    * total. alpha = 1 reproduces natural proportions (every source
    * sampled at the same uniform rate), alpha = 0 gives every source an
    * equal share regardless of size, and the usual 0.2-0.7 range
    * up-weights small high-value sources without letting them dominate.
    *
    * The token totals come from the SAME single fused aggregation as
    * [[mixToTokenBudget]]; the share exponentiation is driver-side
    * O(#sources); the mixture itself is one [[mixCorpora]] pass — one
    * scan per source, zero shuffles, every draw re-derivable from
    * (key, source, seed). */
  def mixByTemperature(sources: Seq[(String, DataFrame)], keyCol: String,
      tokensCol: String, budget: Long, alpha: Double = 0.3, seed: Long = 42L,
      sourceCol: String = "source", copyCol: String = "copy",
      allowMissingColumns: Boolean = false): DataFrame = {
    require(sources.nonEmpty, "at least one source")
    require(budget > 0, s"budget > 0, got $budget")
    require(alpha >= 0 && alpha <= 1, s"alpha in [0,1], got $alpha")
    require(sources.map(_._1).distinct.size == sources.size,
      s"mixByTemperature: duplicate source names " +
        s"(${sources.map(_._1).mkString(", ")}) — totals would merge " +
        "(r17 review, same hazard as mixToTokenBudget)")
    val totals = tokenTotals(sources, tokensCol)
    sources.foreach { case (name, _) =>
      require(totals.getOrElse(name, 0L) > 0L,
        s"mixByTemperature: source '$name' has zero tokens") }
    val weights = sources.map { case (name, _) =>
      name -> math.pow(totals(name).toDouble, alpha) }.toMap
    // sum in SOURCES order (not Map iteration order) so the realized
    // double is re-derivable by an oracle summing in the declared order
    val wsum = sources.map { case (name, _) => weights(name) }.sum
    val rated = sources.map { case (name, df) =>
      // same fixed evaluation order as mixToTokenBudget: (budget · w̄) / N
      (name, df,
        budget.toDouble * (weights(name) / wsum) / totals(name).toDouble)
    }
    mixCorpora(rated, keyCol, seed, sourceCol, copyCol, allowMissingColumns)
  }

  /** Keep the top `fraction` of rows by `scoreCol` — the "take the best X%
    * by quality score" corpus cut. The threshold is ONE aggregation job
    * (exact interpolated percentile by default — identical semantics to
    * SQL `quantile_cont`, so the cut is re-derivable in any engine;
    * `approximate = true` switches to `percentile_approx`, the
    * bounded-memory sketch for 100 TB corpora where an exact percentile
    * would sort the score column), then the cut itself is a pure filter —
    * one scan, no shuffle. Ties at the threshold are all kept (>=).
    *
    * A NULL score is never "in the top fraction" — null-score rows are
    * dropped at EVERY fraction, including 1.0, so the operator is
    * continuous in `fraction` (r6 ADVICE: fraction == 1.0 previously
    * returned the input verbatim, so null-score rows discontinuously
    * reappeared at exactly 1.0). `keepTopFraction(df, c, 1.0)` ≡
    * `df.filter(c IS NOT NULL)`. */
  def keepTopFraction(df: DataFrame, scoreCol: String, fraction: Double,
      approximate: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"fraction in (0,1], got $fraction")
    val scored = df.filter(q(scoreCol).isNotNull)
    if (fraction == 1.0) return scored
    val p = lit(1.0 - fraction)
    val thrCol = if (approximate) percentile_approx(q(scoreCol), p, lit(accuracy))
                 else percentile(q(scoreCol), p)
    val row = df.agg(thrCol.cast("double")).head()
    if (row.isNullAt(0)) scored // no non-null scores → empty, consistently
    else scored.filter(q(scoreCol) >= lit(row.getDouble(0)))
  }

  /** Cap each group at `n` rows — the "domain balancing" step of a corpus
    * pipeline (no single domain/site/source may contribute more than n
    * documents). The survivors are the n rows with the SMALLEST key hash
    * (ties by key asc), so the selection is deterministic in (key, seed),
    * append-stable while a group is under its cap, and re-derivable in any
    * engine (`row_number() OVER (PARTITION BY group ORDER BY md5-hash)`).
    *
    * Scale shape: a `row_number` window would shuffle EVERY row of a group
    * to one partition and sort it — a straggler on skewed domains (one
    * giant site is exactly the case balancing exists for). Instead the
    * kept keys are found with the bounded k-heap aggregate
    * ([[graft.functions.TopKByScore]]) which folds map-side — at most n
    * keys per group per task cross the shuffle, regardless of skew — and
    * survivors re-attach by a left-semi join on (group, key) that AQE
    * broadcasts when groups×n is small (it usually is: caps are small by
    * construction).
    *
    * Keys are assumed unique per group and NON-NULL (they're document
    * ids); duplicate keys occupy one heap slot each and all rows of a kept
    * key survive, null keys never match the re-attach join. */
  def capPerGroup(df: DataFrame, keyCol: String, groupCol: String, n: Int,
      seed: Long = 42L): DataFrame = {
    require(n > 0, "n > 0")
    val kept = df
      .select(q(groupCol).as("__g"), q(keyCol).as("__k"))
      .groupBy("__g")
      .agg(graft.functions.TopKByScore.of(
        -hash32(col("__k"), seed).cast("double"), col("__k"), n).as("__tk"))
      .select(col("__g"), explode(col("__tk.item")).as("__k"))
    df.join(kept, q(groupCol) <=> col("__g") && q(keyCol) === col("__k"), "left_semi")
  }

  /** Weighted sampling WITHOUT replacement — Efraimidis & Spirakis (2006,
    * "Weighted random sampling with a reservoir"): each row draws a
    * deterministic uniform u from (key, seed) and the k largest values of
    * u^(1/w) win; selection probabilities match sequential weighted
    * draws-without-replacement exactly. Ranking by ln(u)/w (monotone in
    * u^(1/w), no underflow for tiny weights) through the map-side k-heap
    * aggregate — ONE job, no window sort, candidate set ≤ groups·k rows
    * broadcast into the semi join. u derives from the engine-portable md5
    * key hash, so the draw is reproducible anywhere (and in the DuckDB
    * oracle). Rows with weight ≤ 0 or null never win, and neither do
    * NULL-key rows (r17 review: a null key hashes to one shared constant
    * — [[hash32]]'s concat_ws skips nulls — so null rows used to steal
    * heap slots they could never convert, the `===` re-attach matches
    * nothing, and the sample silently came back smaller than k; the same
    * reasoning as saltedJoin's "null keys never equi-join"); with
    * `groupCol`, an independent k-sample per group (quality-weighted
    * selection per domain/language — the data-mixing primitive). Keys
    * are assumed unique per group (duplicates occupy one heap slot). */
  def weightedSampleWOR(df: DataFrame, keyCol: String, weightCol: String,
      k: Int, seed: Long = 42L, groupCol: Option[String] = None): DataFrame = {
    require(k > 0, "k > 0")
    // u in (0,1): +0.5 keeps ln finite at hash 0 and unbiased overall
    val u = (hash32(q(keyCol), seed).cast("double") + 0.5) / 4294967296.0
    val es = log(u) / q(weightCol).cast("double")
    val slim = df.filter(q(weightCol) > 0 && q(keyCol).isNotNull).select(
      groupCol.map(g => q(g)).getOrElse(lit(0)).as("__g"),
      q(keyCol).as("__k"), es.as("__es"))
    val kept = slim.groupBy("__g")
      .agg(graft.functions.TopKByScore.of(col("__es"), col("__k"), k).as("__tk"))
      .select(col("__g"), explode(col("__tk.item")).as("__k"))
    groupCol match {
      case Some(g) =>
        df.join(kept, q(g) <=> col("__g") && q(keyCol) === col("__k"), "left_semi")
      case None =>
        df.join(kept.select("__k"), q(keyCol) === col("__k"), "left_semi")
    }
  }
}
