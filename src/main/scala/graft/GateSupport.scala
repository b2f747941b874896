package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.checks.{Check, ColumnCheck}
import graft.errors.ValidationResult
import graft.hypothesis.Hypothesis
import graft.inference.InferSchema
import graft.schema._

/** Shared plumbing for the gate-registry family objects (Gates*): the
  * parquet-table reader, the single-check harness helpers, and every
  * reused DuckDB oracle snippet. Split out of SparkEntry verbatim
  * (r16-verdict #6). */
private[graft] object GateSupport {
  private[graft] def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Run a single-check schema through the engine; emit its failure count. */
  private[graft] def failCount(s: SparkSession, label: String, df: DataFrame,
                        column: String, check: Check): DataFrame = {
    val res = DataFrameSchema(column -> ColumnSchema(checks = Seq(check))).validate(df)
    val n = res.errors.map(_.failureCount).sum
    import s.implicits._
    Seq((label, n)).toDF("check_name", "failure_count")
  }

  private[graft] def aggPassFail(s: SparkSession, label: String, res: ValidationResult,
                          extraOk: Boolean = true): DataFrame = {
    import s.implicits._
    Seq((label, if (res.passed && extraOk) 0L else 1L)).toDF("check_name", "failure_count")
  }


  /** Shared by events_sessions (batch) and events_sessions_stream (replay):
    * the two gates must answer to one oracle — that IS the batch ≡ streaming
    * claim. */
  private[graft] val sessionsOracleSql: String =
    "WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, value FROM events), " +
      "w AS (SELECT user_id, us, value, CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL " +
      "OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) > 1800000000 THEN 1 ELSE 0 END AS ns FROM e), " +
      "s AS (SELECT user_id, us, value, sum(ns) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid FROM w) " +
      "SELECT user_id, min(us) AS session_start_us, CAST(max(us) + 1800000000 AS BIGINT) AS session_end_us, " +
      "count(*) AS n_events, round(sum(value), 3) AS total_value " +
      "FROM s GROUP BY user_id, sid ORDER BY user_id, session_start_us"

  /** One column's worth of the drift_ks_multi oracle: the same DuckDB
    * pipeline as the drift_ks oracle (20-bin quantile grid, cumulative
    * CDFs, per-column max gap), CTE-suffixed so three columns can share
    * one WITH clause, tagged with the column name. */
  private[graft] def ksMultiOracleCol(c: String, i: Int): String = {
    val s = i.toString
    // Locale.ROOT: default-locale %.2f under e.g. de_DE emits "0,05" and
    // breaks the generated DuckDB list literal (r7 ADVICE).
    val ps = (1 until 20)
      .map(p => String.format(java.util.Locale.ROOT, "%.2f", Double.box(p * 0.05)))
      .mkString(", ")
    s"edges$s AS (SELECT list_transform(quantile_cont($c, [$ps]), e -> round(e, 6)) AS es FROM lineitem), " +
      s"refb$s AS (SELECT CAST(list_sum(list_transform((SELECT es FROM edges$s), e -> CASE WHEN $c > e THEN 1 ELSE 0 END)) AS INTEGER) AS bin FROM lineitem WHERE $c IS NOT NULL), " +
      s"curb$s AS (SELECT CAST(list_sum(list_transform((SELECT es FROM edges$s), e -> CASE WHEN $c > e THEN 1 ELSE 0 END)) AS INTEGER) AS bin FROM lineitem WHERE $c IS NOT NULL AND l_returnflag = 'A'), " +
      s"refc$s AS (SELECT bin, count(*)::DOUBLE / (SELECT count(*) FROM refb$s) AS rf FROM refb$s GROUP BY bin), " +
      s"curc$s AS (SELECT bin, count(*)::DOUBLE / (SELECT count(*) FROM curb$s) AS cf FROM curb$s GROUP BY bin), " +
      s"bins$s AS (SELECT CAST(i AS INTEGER) AS bin FROM range(0, 20) t(i)), " +
      s"j$s AS (SELECT bin, coalesce(rf, 0) AS rf, coalesce(cf, 0) AS cf FROM bins$s LEFT JOIN refc$s USING (bin) LEFT JOIN curc$s USING (bin)), " +
      s"cum$s AS (SELECT bin, sum(rf) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS rc, sum(cf) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cc FROM j$s), " +
      s"g$s AS (SELECT bin, rc, cc, abs(rc - cc) AS gap FROM cum$s), " +
      s"kout$s AS (SELECT '$c' AS \"column\", bin, round(rc, 6) AS ref_cum, round(cc, 6) AS cur_cum, round(gap, 6) AS gap, round(max(gap) OVER (), 6) AS ks_stat FROM g$s)"
  }

  /** One column's worth of the drift_psi_multi oracle: the same DuckDB
    * pipeline as the drift_psi oracle, CTE-suffixed so three columns can
    * share one WITH clause, tagged with the column name. */
  private[graft] def psiMultiOracleCol(c: String, i: Int): String = {
    val s = i.toString
    s"edges$s AS (SELECT list_transform(quantile_cont($c, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]), e -> round(e, 6)) AS es FROM lineitem), " +
      s"refb$s AS (SELECT CAST(list_sum(list_transform((SELECT es FROM edges$s), e -> CASE WHEN $c > e THEN 1 ELSE 0 END)) AS INTEGER) AS bin FROM lineitem WHERE $c IS NOT NULL), " +
      s"curb$s AS (SELECT CAST(list_sum(list_transform((SELECT es FROM edges$s), e -> CASE WHEN $c > e THEN 1 ELSE 0 END)) AS INTEGER) AS bin FROM lineitem WHERE $c IS NOT NULL AND l_returnflag = 'A'), " +
      s"refc$s AS (SELECT bin, count(*)::DOUBLE / (SELECT count(*) FROM refb$s) AS ref_frac FROM refb$s GROUP BY bin), " +
      s"curc$s AS (SELECT bin, count(*)::DOUBLE / (SELECT count(*) FROM curb$s) AS cur_frac FROM curb$s GROUP BY bin), " +
      s"bins$s AS (SELECT CAST(i AS INTEGER) AS bin FROM range(0, 10) t(i)), " +
      s"j$s AS (SELECT bin, greatest(coalesce(ref_frac, 0), 1e-6) AS rf, greatest(coalesce(cur_frac, 0), 1e-6) AS cf " +
      s"FROM bins$s LEFT JOIN refc$s USING (bin) LEFT JOIN curc$s USING (bin)), " +
      s"k$s AS (SELECT bin, rf, cf, round((cf - rf) * ln(cf / rf), 6) AS psi_contrib FROM j$s), " +
      s"out$s AS (SELECT '$c' AS \"column\", bin, round(rf, 6) AS ref_frac, round(cf, 6) AS cur_frac, psi_contrib, " +
      s"(SELECT round(sum(psi_contrib), 6) FROM k$s) AS psi_total FROM k$s)"
  }

  /** Golden pin for the IVF top-k — shared by `sim_topk_ivf` (one-shot)
    * and `sim_topk_ivf_pruned` (train + cell-partitioned store +
    * partition-pruned serve), hash-identical by construction. */
  private[graft] val ivfOracleSql: String =
    ("SELECT CAST(query_id AS BIGINT) AS query_id, CAST(corpus_id AS BIGINT) AS corpus_id, CAST(\"rank\" AS INTEGER) AS \"rank\", CAST(cosine AS DOUBLE) AS cosine FROM (" +
        "SELECT * FROM (VALUES (0, 0, 1, 1.0), (0, 17, 2, 0.3345), (0, 225, 3, 0.3151), (0, 483, 4, 0.3005), (0, 73, 5, 0.2972), (1, 1, 1, 1.0), (1, 257, 2, 0.3918), (1, 209, 3, 0.3815), (1, 129, 4, 0.3515), (1, 376, 5, 0.3048), (2, 2, 1, 1.0), (2, 443, 2, 0.3576), (2, 246, 3, 0.2898), (2, 234, 4, 0.2777), (2, 309, 5, 0.2523), (3, 3, 1, 1.0), (3, 223, 2, 0.3409), (3, 205, 3, 0.3366), (3, 84, 4, 0.3197), (3, 212, 5, 0.3197), (4, 4, 1, 1.0), (4, 345, 2, 0.3749), (4, 98, 3, 0.3398), (4, 143, 4, 0.3297), (4, 343, 5, 0.3124)) v(query_id, corpus_id, \"rank\", cosine) WHERE (SELECT count(*) FROM lineitem) < 10000 " +
        "UNION ALL SELECT * FROM (VALUES (0, 0, 1, 1.0), (0, 423, 2, 0.2969), (0, 73, 3, 0.2954), (0, 190, 4, 0.2818), (0, 464, 5, 0.2766), (1, 1, 1, 1.0), (1, 386, 2, 0.3715), (1, 407, 3, 0.327), (1, 195, 4, 0.3227), (1, 64, 5, 0.3164), (2, 2, 1, 1.0), (2, 145, 2, 0.2635), (2, 418, 3, 0.254), (2, 112, 4, 0.2453), (2, 172, 5, 0.2398), (3, 3, 1, 1.0), (3, 130, 2, 0.3999), (3, 149, 3, 0.3299), (3, 343, 4, 0.3085), (3, 192, 5, 0.2908), (4, 4, 1, 1.0), (4, 408, 2, 0.3228), (4, 482, 3, 0.3139), (4, 280, 4, 0.2798), (4, 249, 5, 0.2796)) v(query_id, corpus_id, \"rank\", cosine) WHERE (SELECT count(*) FROM lineitem) >= 10000 AND (SELECT count(*) FROM lineitem) < 100000 " +
        "UNION ALL SELECT * FROM (VALUES (0, 0, 1, 1.0), (0, 1204, 2, 0.4065), (0, 291, 3, 0.3919), (0, 1511, 4, 0.3288), (0, 144, 5, 0.3243), (1, 1, 1, 1.0), (1, 1950, 2, 0.3861), (1, 1580, 3, 0.3668), (1, 1832, 4, 0.3312), (1, 134, 5, 0.3064), (2, 2, 1, 1.0), (2, 1303, 2, 0.394), (2, 953, 3, 0.3691), (2, 337, 4, 0.3574), (2, 1053, 5, 0.356), (3, 3, 1, 1.0), (3, 263, 2, 0.398), (3, 1701, 3, 0.388), (3, 1542, 4, 0.3242), (3, 650, 5, 0.3157), (4, 4, 1, 1.0), (4, 1166, 2, 0.3787), (4, 660, 3, 0.3197), (4, 773, 4, 0.3078), (4, 685, 5, 0.3069)) v(query_id, corpus_id, \"rank\", cosine) WHERE (SELECT count(*) FROM lineitem) >= 100000" +
        ") u ORDER BY query_id, \"rank\"")

  /** Golden pin for the IVF-PQ top-k — shared by `sim_topk_ivfpq` (one-shot)
    * and `sim_topk_ivfpq_persisted` (save/load + materialized codes), which
    * must be hash-identical by construction. */
  private[graft] val ivfPqOracleSql: String =
    ("SELECT CAST(query_id AS BIGINT) AS query_id, CAST(corpus_id AS BIGINT) AS corpus_id, CAST(\"rank\" AS INTEGER) AS \"rank\", CAST(cosine AS DOUBLE) AS cosine FROM (" +
      "SELECT * FROM (VALUES (0, 0, 1, 1.0), (0, 17, 2, 0.3345), (0, 225, 3, 0.3151), (0, 483, 4, 0.3005), (0, 212, 5, 0.2814), (1, 1, 1, 1.0), (1, 257, 2, 0.3918), (1, 209, 3, 0.3815), (1, 376, 4, 0.3048), (1, 75, 5, 0.29), (2, 2, 1, 1.0), (2, 443, 2, 0.3576), (2, 246, 3, 0.2898), (2, 91, 4, 0.2789), (2, 183, 5, 0.2506), (3, 3, 1, 1.0), (3, 223, 2, 0.3409), (3, 205, 3, 0.3366), (3, 84, 4, 0.3197), (3, 212, 5, 0.3197), (4, 4, 1, 1.0), (4, 98, 2, 0.3398), (4, 143, 3, 0.3297), (4, 62, 4, 0.2886), (4, 100, 5, 0.2601)) v(query_id, corpus_id, \"rank\", cosine) WHERE (SELECT count(*) FROM lineitem) < 10000 " +
      "UNION ALL SELECT * FROM (VALUES (0, 0, 1, 1.0), (0, 387, 2, 0.3311), (0, 423, 3, 0.2969), (0, 73, 4, 0.2954), (0, 7, 5, 0.2928), (1, 1, 1, 1.0), (1, 386, 2, 0.3715), (1, 27, 3, 0.3482), (1, 407, 4, 0.327), (1, 195, 5, 0.3227), (2, 2, 1, 1.0), (2, 117, 2, 0.3181), (2, 145, 3, 0.2635), (2, 188, 4, 0.2633), (2, 197, 5, 0.2331), (3, 3, 1, 1.0), (3, 130, 2, 0.3999), (3, 149, 3, 0.3299), (3, 343, 4, 0.3085), (3, 207, 5, 0.2917), (4, 4, 1, 1.0), (4, 114, 2, 0.3985), (4, 482, 3, 0.3139), (4, 280, 4, 0.2798), (4, 249, 5, 0.2796)) v(query_id, corpus_id, \"rank\", cosine) WHERE (SELECT count(*) FROM lineitem) >= 10000 AND (SELECT count(*) FROM lineitem) < 100000 " +
        "UNION ALL SELECT * FROM (VALUES (0, 0, 1, 1.0), (0, 144, 2, 0.3243), (0, 794, 3, 0.3108), (0, 1033, 4, 0.296), (0, 462, 5, 0.2917), (1, 1, 1, 1.0), (1, 1580, 2, 0.3668), (1, 732, 3, 0.3029), (1, 1594, 4, 0.2969), (1, 85, 5, 0.2564), (2, 2, 1, 1.0), (2, 1303, 2, 0.394), (2, 953, 3, 0.3691), (2, 990, 4, 0.3337), (2, 1196, 5, 0.3168), (3, 3, 1, 1.0), (3, 263, 2, 0.398), (3, 1701, 3, 0.388), (3, 720, 4, 0.3656), (3, 1617, 5, 0.3028), (4, 4, 1, 1.0), (4, 995, 2, 0.3589), (4, 913, 3, 0.3195), (4, 773, 4, 0.3078), (4, 685, 5, 0.3069)) v(query_id, corpus_id, \"rank\", cosine) WHERE (SELECT count(*) FROM lineitem) >= 100000" +
      ") u ORDER BY query_id, \"rank\"")

  /** sim_ann_lifecycle shares the gate-density ivfPq pins (its serve
    * is hash-identical to the one-shot there) but auto-scales probe
    * parameters with corpus density, so its sf0.1 branch (nCentroids
    * 32, nProbe 24, refineFactor 16 at 2000 vectors) is its own. */
  private[graft] val lifecycleOracleSql: String =
    ("SELECT CAST(query_id AS BIGINT) AS query_id, CAST(corpus_id AS BIGINT) AS corpus_id, CAST(\"rank\" AS INTEGER) AS \"rank\", CAST(cosine AS DOUBLE) AS cosine FROM (" +
      "SELECT * FROM (VALUES (0, 0, 1, 1.0), (0, 17, 2, 0.3345), (0, 225, 3, 0.3151), (0, 483, 4, 0.3005), (0, 212, 5, 0.2814), (1, 1, 1, 1.0), (1, 257, 2, 0.3918), (1, 209, 3, 0.3815), (1, 376, 4, 0.3048), (1, 75, 5, 0.29), (2, 2, 1, 1.0), (2, 443, 2, 0.3576), (2, 246, 3, 0.2898), (2, 91, 4, 0.2789), (2, 183, 5, 0.2506), (3, 3, 1, 1.0), (3, 223, 2, 0.3409), (3, 205, 3, 0.3366), (3, 84, 4, 0.3197), (3, 212, 5, 0.3197), (4, 4, 1, 1.0), (4, 98, 2, 0.3398), (4, 143, 3, 0.3297), (4, 62, 4, 0.2886), (4, 100, 5, 0.2601)) v(query_id, corpus_id, \"rank\", cosine) WHERE (SELECT count(*) FROM lineitem) < 10000 " +
      "UNION ALL SELECT * FROM (VALUES (0, 0, 1, 1.0), (0, 387, 2, 0.3311), (0, 423, 3, 0.2969), (0, 73, 4, 0.2954), (0, 7, 5, 0.2928), (1, 1, 1, 1.0), (1, 386, 2, 0.3715), (1, 27, 3, 0.3482), (1, 407, 4, 0.327), (1, 195, 5, 0.3227), (2, 2, 1, 1.0), (2, 117, 2, 0.3181), (2, 145, 3, 0.2635), (2, 188, 4, 0.2633), (2, 197, 5, 0.2331), (3, 3, 1, 1.0), (3, 130, 2, 0.3999), (3, 149, 3, 0.3299), (3, 343, 4, 0.3085), (3, 207, 5, 0.2917), (4, 4, 1, 1.0), (4, 114, 2, 0.3985), (4, 482, 3, 0.3139), (4, 280, 4, 0.2798), (4, 249, 5, 0.2796)) v(query_id, corpus_id, \"rank\", cosine) WHERE (SELECT count(*) FROM lineitem) >= 10000 AND (SELECT count(*) FROM lineitem) < 100000 " +
        "UNION ALL SELECT * FROM (VALUES (0, 0, 1, 1.0), (0, 1204, 2, 0.4065), (0, 291, 3, 0.3919), (0, 1020, 4, 0.376), (0, 1511, 5, 0.3288), (1, 1, 1, 1.0), (1, 1950, 2, 0.3861), (1, 1580, 3, 0.3668), (1, 1832, 4, 0.3312), (1, 173, 5, 0.3109), (2, 2, 1, 1.0), (2, 1303, 2, 0.394), (2, 953, 3, 0.3691), (2, 1053, 4, 0.356), (2, 1912, 5, 0.3519), (3, 3, 1, 1.0), (3, 720, 2, 0.3656), (3, 930, 3, 0.3417), (3, 1542, 4, 0.3242), (3, 1567, 5, 0.3113), (4, 4, 1, 1.0), (4, 524, 2, 0.4191), (4, 995, 3, 0.3589), (4, 1645, 4, 0.3266), (4, 174, 5, 0.3114)) v(query_id, corpus_id, \"rank\", cosine) WHERE (SELECT count(*) FROM lineitem) >= 100000" +
      ") u ORDER BY query_id, \"rank\"")

  /** Save → load round-trip through a fresh temp JSON path — the
    * persistence leg shared by the three `*_profile` drift gates
    * (r19 hunt: three verbatim temp-path blocks were drift-prone). */
  private[graft] def roundTripProfile(
      prof: graft.ext.DriftProfile): graft.ext.DriftProfile = {
    val path = java.nio.file.Files.createTempDirectory("graft-driftprof")
      .resolve("profile.json").toString
    prof.save(path)
    graft.ext.DriftProfile.load(path)
  }

  /** The shared BM25-family query batch: every 100th document queries
    * with its own first three tokens. ONE definition for all five
    * BM25-family gates (text_bm25, _store, _stream, _delete, text_rrf —
    * r19 hunt: five verbatim copies were a desync hazard), kept in
    * lock-step with the oracles' shared `qtok` CTE below
    * (`WHERE doc_id % 100 = 0`, `unnest(t[1:3])`). */
  private[graft] def bm25QueryBatch(docs: DataFrame): DataFrame =
    docs.filter(pmod(col("doc_id"), lit(100)) === 0)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ",
          slice(graft.ext.TextAnalysis.tokens(col("text")), 1, 3)).as("qtext"))

  /** Full BM25 re-derivation in SQL — shared by text_bm25 (one-shot) and
    * text_bm25_store (persisted postings index, hash-identical serve). */
  private[graft] val bm25OracleSql: String =
    ("WITH tk AS (SELECT doc_id, CASE WHEN len(trim(text)) = 0 THEN [] ELSE string_split_regex(trim(text), '\\s+') END AS t FROM documents), " +
      "dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM tk), " +
      "post AS (SELECT doc_id, token, count(*)::DOUBLE AS tf FROM (SELECT doc_id, unnest(t) AS token FROM tk) GROUP BY 1, 2), " +
      "st AS (SELECT count(*)::DOUBLE AS n_docs, round(avg(dl), 6) AS avgdl FROM dl), " +
      "qtok AS (SELECT DISTINCT query_id, token FROM (SELECT doc_id AS query_id, unnest(t[1:3]) AS token FROM tk WHERE doc_id % 100 = 0)), " +
      "dfp AS (SELECT token, count(*)::DOUBLE AS df FROM post GROUP BY 1), " +
      "term AS (SELECT query_id, qtok.token, ln((n_docs - df + 0.5) / (df + 0.5) + 1) AS idf FROM qtok JOIN dfp ON dfp.token = qtok.token CROSS JOIN st), " +
      "sc AS (SELECT query_id, post.doc_id, round(sum(idf * tf * (1.2 + 1) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS score " +
      "FROM term JOIN post ON post.token = term.token JOIN dl ON dl.doc_id = post.doc_id CROSS JOIN st GROUP BY 1, 2), " +
      "rk AS (SELECT query_id, doc_id, score, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk FROM sc) " +
      "SELECT query_id, doc_id, CAST(rnk AS INTEGER) AS \"rank\", score FROM rk WHERE rnk <= 5 ORDER BY query_id, \"rank\"")

  /** text_bm25_delete: both takedown phases re-derived. Masked = scores
    * computed with FULL-corpus statistics (n_docs/avgdl/df include the
    * deleted docs), deleted docs excluded from the ranking only; healed =
    * plain BM25 over the live corpus (post-compaction state). Queries are
    * doc_id % 100 = 0, never in the doc_id % 5 = 2 takedown set. */
  private[graft] val bm25DeleteOracleSql: String =
    ("WITH tk AS (SELECT doc_id, CASE WHEN len(trim(text)) = 0 THEN [] ELSE string_split_regex(trim(text), '\\s+') END AS t FROM documents), " +
      "qtok AS (SELECT DISTINCT query_id, token FROM (SELECT doc_id AS query_id, unnest(t[1:3]) AS token FROM tk WHERE doc_id % 100 = 0)), " +
      // masked phase: full-corpus stats, results-only exclusion
      "dl1 AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM tk), " +
      "post1 AS (SELECT doc_id, token, count(*)::DOUBLE AS tf FROM (SELECT doc_id, unnest(t) AS token FROM tk) GROUP BY 1, 2), " +
      "st1 AS (SELECT count(*)::DOUBLE AS n_docs, round(avg(dl), 6) AS avgdl FROM dl1), " +
      "dfp1 AS (SELECT token, count(*)::DOUBLE AS df FROM post1 GROUP BY 1), " +
      "term1 AS (SELECT query_id, qtok.token, ln((n_docs - df + 0.5) / (df + 0.5) + 1) AS idf FROM qtok JOIN dfp1 ON dfp1.token = qtok.token CROSS JOIN st1), " +
      "sc1 AS (SELECT query_id, post1.doc_id, round(sum(idf * tf * (1.2 + 1) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS score " +
      "FROM term1 JOIN post1 ON post1.token = term1.token JOIN dl1 ON dl1.doc_id = post1.doc_id CROSS JOIN st1 " +
      "WHERE post1.doc_id % 5 != 2 GROUP BY 1, 2), " +
      "rk1 AS (SELECT 'masked' AS phase, query_id, doc_id, score, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk FROM sc1), " +
      // healed phase: the live corpus only
      "tk2 AS (SELECT * FROM tk WHERE doc_id % 5 != 2), " +
      "dl2 AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM tk2), " +
      "post2 AS (SELECT doc_id, token, count(*)::DOUBLE AS tf FROM (SELECT doc_id, unnest(t) AS token FROM tk2) GROUP BY 1, 2), " +
      "st2 AS (SELECT count(*)::DOUBLE AS n_docs, round(avg(dl), 6) AS avgdl FROM dl2), " +
      "dfp2 AS (SELECT token, count(*)::DOUBLE AS df FROM post2 GROUP BY 1), " +
      "term2 AS (SELECT query_id, qtok.token, ln((n_docs - df + 0.5) / (df + 0.5) + 1) AS idf FROM qtok JOIN dfp2 ON dfp2.token = qtok.token CROSS JOIN st2), " +
      "sc2 AS (SELECT query_id, post2.doc_id, round(sum(idf * tf * (1.2 + 1) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS score " +
      "FROM term2 JOIN post2 ON post2.token = term2.token JOIN dl2 ON dl2.doc_id = post2.doc_id CROSS JOIN st2 GROUP BY 1, 2), " +
      "rk2 AS (SELECT 'healed' AS phase, query_id, doc_id, score, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk FROM sc2) " +
      "SELECT phase, query_id, doc_id, CAST(rnk AS INTEGER) AS \"rank\", score FROM (SELECT * FROM rk1 UNION ALL SELECT * FROM rk2) " +
      "WHERE rnk <= 5 ORDER BY phase, query_id, \"rank\"")

  /** Shared by join_asof and its streaming enrichment twin (batch ≡
    * stream by construction — per-row verdicts are pure functions of
    * (row, static right side)). */
  private[graft] val asofOracle: String =
    ("SELECT l.event_id, l.user_id, epoch_us(l.ts) AS click_us, " +
        "epoch_us(r.ts) AS view_us, round(r.value, 3) AS view_value " +
        "FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l " +
        "ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'view') r " +
        "ON l.user_id = r.user_id AND l.ts >= r.ts ORDER BY l.event_id")

  /** Shared by dedup_incremental_store and dedup_store_compacted (r9):
    * compaction must serve the exact same rows, so both gates pin the
    * same DuckDB exact cross-Jaccard recomputation. */
  private[graft] val mhStoreOracle: String =
    ("WITH docs AS (SELECT doc_id, text FROM documents), " +
      "inc AS (SELECT doc_id + 1000000 AS doc_id, text || ' graft r8 incremental tail' AS text FROM docs WHERE doc_id % 5 = 0 " +
      "UNION ALL SELECT doc_id + 2000000, 'fresh graft content ' || doc_id::VARCHAR FROM docs WHERE doc_id % 5 = 3), " +
      "ta AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM inc), " +
      "sa AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3 " +
      "THEN list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) " +
      "ELSE [array_to_string(toks, ' ')] END) AS sh FROM ta), " +
      "tb AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM docs), " +
      "sb AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3 " +
      "THEN list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) " +
      "ELSE [array_to_string(toks, ' ')] END) AS sh FROM tb), " +
      // inverted shingle index instead of the r13 all-pairs theta-join
      // (identical at threshold 0.8 > 0: a matching pair shares >= 1
      // shingle; value-equality spot-verified at sf0.01, seconds at sf0.1)
      "ea AS (SELECT doc_id, unnest(sh) AS g FROM sa), " +
      "eb AS (SELECT doc_id, unnest(sh) AS g FROM sb), " +
      "sza AS (SELECT doc_id, len(sh) AS n FROM sa), " +
      "szb AS (SELECT doc_id, len(sh) AS n FROM sb), " +
      "xi AS (SELECT ea.doc_id AS id_a, eb.doc_id AS id_b, count(*) AS i " +
      "FROM ea JOIN eb ON ea.g = eb.g GROUP BY 1, 2), " +
      "matched AS (SELECT DISTINCT id_a AS doc_id FROM xi " +
      "JOIN sza ON sza.doc_id = xi.id_a JOIN szb ON szb.doc_id = xi.id_b " +
      "WHERE round(i::DOUBLE / (sza.n + szb.n - i), 4) >= 0.8) " +
      "SELECT doc_id FROM inc WHERE doc_id NOT IN (SELECT doc_id FROM matched) ORDER BY doc_id")

  /** Shared by dedup_fp_store and its streaming replay twin (batch ≡
    * stream by construction — same store, same crawl batch). */
  private[graft] val fpStoreOracle: String =
    ("WITH docs AS (SELECT doc_id, text FROM documents), " +
        "b2 AS (SELECT doc_id + 1000000 AS doc_id, text || ' graft fp-store tail' AS text FROM docs WHERE doc_id % 5 = 1), " +
        "b3 AS (SELECT doc_id, text FROM docs WHERE doc_id % 5 = 0 " +
        "UNION ALL SELECT doc_id + 3000000, text || ' graft fp-store tail' FROM docs WHERE doc_id % 5 = 1 " +
        "UNION ALL SELECT doc_id + 4000000, text || ' fresh crawl content' FROM docs WHERE doc_id % 5 = 2), " +
        "seen AS (SELECT DISTINCT lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS ntext FROM (SELECT text FROM docs UNION ALL SELECT text FROM b2)) " +
        "SELECT doc_id FROM b3 WHERE lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) " +
        "NOT IN (SELECT ntext FROM seen) ORDER BY doc_id")

  /** dedup_fp_retract: membership = normalized text of ALL docs MINUS the
    * normalized text of the retracted docs (a retraction removes the
    * FINGERPRINT, so any doc sharing the normalized text is uncovered
    * with it). The re-crawl keeps exactly the rows whose ntext is not in
    * the live membership. */
  private[graft] val fpRetractOracle: String =
    ("WITH docs AS (SELECT doc_id, text FROM documents), " +
      "b AS (SELECT doc_id + 1000000 AS doc_id, text FROM docs), " +
      "seen AS (SELECT DISTINCT lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS ntext FROM docs), " +
      "retr AS (SELECT DISTINCT lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS ntext FROM docs WHERE doc_id % 10 = 1), " +
      "live AS (SELECT ntext FROM seen WHERE ntext NOT IN (SELECT ntext FROM retr)) " +
      "SELECT doc_id FROM b WHERE lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) " +
      "NOT IN (SELECT ntext FROM live) ORDER BY doc_id")

  /** dedup_store_retract: exact 3-shingle Jaccard >= 0.8 of the re-crawl
    * batch vs the LIVE corpus only (retracted docs excluded) — the same
    * inverted-shingle-index derivation as mhStoreOracle. */
  private[graft] val mhRetractOracle: String =
    ("WITH docs AS (SELECT doc_id, text FROM documents), " +
      "inc AS (SELECT doc_id + 1000000 AS doc_id, text || ' graft r14 retract tail' AS text FROM docs WHERE doc_id % 5 = 0), " +
      "hist AS (SELECT doc_id, text FROM docs WHERE doc_id % 10 != 0), " +
      "ta AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM inc), " +
      "sa AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3 " +
      "THEN list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) " +
      "ELSE [array_to_string(toks, ' ')] END) AS sh FROM ta), " +
      "tb AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM hist), " +
      "sb AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3 " +
      "THEN list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) " +
      "ELSE [array_to_string(toks, ' ')] END) AS sh FROM tb), " +
      "ea AS (SELECT doc_id, unnest(sh) AS g FROM sa), " +
      "eb AS (SELECT doc_id, unnest(sh) AS g FROM sb), " +
      "sza AS (SELECT doc_id, len(sh) AS n FROM sa), " +
      "szb AS (SELECT doc_id, len(sh) AS n FROM sb), " +
      "xi AS (SELECT ea.doc_id AS id_a, eb.doc_id AS id_b, count(*) AS i " +
      "FROM ea JOIN eb ON ea.g = eb.g GROUP BY 1, 2), " +
      "matched AS (SELECT DISTINCT id_a AS doc_id FROM xi " +
      "JOIN sza ON sza.doc_id = xi.id_a JOIN szb ON szb.doc_id = xi.id_b " +
      "WHERE round(i::DOUBLE / (sza.n + szb.n - i), 4) >= 0.8) " +
      "SELECT doc_id FROM inc WHERE doc_id NOT IN (SELECT doc_id FROM matched) ORDER BY doc_id")

  /** Shared by drift_psi and its profile-persistence twin (the serve path
    * is hash-identical to the direct computation by construction). */
  private[graft] val driftKsOracle: String =
    ("WITH edges AS (SELECT list_transform(quantile_cont(l_extendedprice, [0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.35, 0.4, 0.45, 0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95]), e -> round(e, 6)) AS es FROM lineitem), " +
        "refb AS (SELECT CAST(list_sum(list_transform((SELECT es FROM edges), e -> CASE WHEN l_extendedprice > e THEN 1 ELSE 0 END)) AS INTEGER) AS bin FROM lineitem WHERE l_extendedprice IS NOT NULL), " +
        "curb AS (SELECT CAST(list_sum(list_transform((SELECT es FROM edges), e -> CASE WHEN l_extendedprice > e THEN 1 ELSE 0 END)) AS INTEGER) AS bin FROM lineitem WHERE l_extendedprice IS NOT NULL AND l_returnflag = 'A'), " +
        "refc AS (SELECT bin, count(*)::DOUBLE / (SELECT count(*) FROM refb) AS rf FROM refb GROUP BY bin), " +
        "curc AS (SELECT bin, count(*)::DOUBLE / (SELECT count(*) FROM curb) AS cf FROM curb GROUP BY bin), " +
        "bins AS (SELECT CAST(i AS INTEGER) AS bin FROM range(0, 20) t(i)), " +
        "j AS (SELECT bin, coalesce(rf, 0) AS rf, coalesce(cf, 0) AS cf FROM bins LEFT JOIN refc USING (bin) LEFT JOIN curc USING (bin)), " +
        "c AS (SELECT bin, sum(rf) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS rc, sum(cf) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cc FROM j), " +
        "g AS (SELECT bin, rc, cc, abs(rc - cc) AS gap FROM c) " +
        "SELECT bin, round(rc, 6) AS ref_cum, round(cc, 6) AS cur_cum, round(gap, 6) AS gap, round(max(gap) OVER (), 6) AS ks_stat FROM g ORDER BY bin")

  /** drift_w1: the driftKsOracle pipeline + interior-edge-gap widths and
    * the integrated |CDF gap| (left-endpoint rule), matching
    * Drift.wasserstein1's grid estimate bin-for-bin. */
  private[graft] val driftW1Oracle: String =
    ("WITH edges AS (SELECT list_transform(quantile_cont(l_extendedprice, [0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.35, 0.4, 0.45, 0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95]), e -> round(e, 6)) AS es FROM lineitem), " +
      "refb AS (SELECT CAST(list_sum(list_transform((SELECT es FROM edges), e -> CASE WHEN l_extendedprice > e THEN 1 ELSE 0 END)) AS INTEGER) AS bin FROM lineitem WHERE l_extendedprice IS NOT NULL), " +
      "curb AS (SELECT CAST(list_sum(list_transform((SELECT es FROM edges), e -> CASE WHEN l_extendedprice > e THEN 1 ELSE 0 END)) AS INTEGER) AS bin FROM lineitem WHERE l_extendedprice IS NOT NULL AND l_returnflag = 'A'), " +
      "refc AS (SELECT bin, count(*)::DOUBLE / (SELECT count(*) FROM refb) AS rf FROM refb GROUP BY bin), " +
      "curc AS (SELECT bin, count(*)::DOUBLE / (SELECT count(*) FROM curb) AS cf FROM curb GROUP BY bin), " +
      "bins AS (SELECT CAST(i AS INTEGER) AS bin FROM range(0, 20) t(i)), " +
      "j AS (SELECT bin, coalesce(rf, 0) AS rf, coalesce(cf, 0) AS cf FROM bins LEFT JOIN refc USING (bin) LEFT JOIN curc USING (bin)), " +
      "c AS (SELECT bin, sum(rf) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS rc, sum(cf) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cc FROM j), " +
      "w AS (SELECT bin, rc, cc, abs(rc - cc) AS gap, CASE WHEN bin <= 17 THEN (SELECT es FROM edges)[bin + 2] - (SELECT es FROM edges)[bin + 1] ELSE 0 END AS width FROM c) " +
      "SELECT bin, round(rc, 6) AS ref_cum, round(cc, 6) AS cur_cum, round(gap, 6) AS gap, round(width, 6) AS width, round(sum(gap * width) OVER (), 4) AS w1_stat FROM w ORDER BY bin")

  private[graft] val driftPsiOracle: String =
    ("WITH edges AS (SELECT list_transform(quantile_cont(l_extendedprice, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]), e -> round(e, 6)) AS es FROM lineitem), " +
      "refb AS (SELECT CAST(list_sum(list_transform((SELECT es FROM edges), e -> CASE WHEN l_extendedprice > e THEN 1 ELSE 0 END)) AS INTEGER) AS bin FROM lineitem WHERE l_extendedprice IS NOT NULL), " +
      "curb AS (SELECT CAST(list_sum(list_transform((SELECT es FROM edges), e -> CASE WHEN l_extendedprice > e THEN 1 ELSE 0 END)) AS INTEGER) AS bin FROM lineitem WHERE l_extendedprice IS NOT NULL AND l_returnflag = 'A'), " +
      "refc AS (SELECT bin, count(*)::DOUBLE / (SELECT count(*) FROM refb) AS ref_frac FROM refb GROUP BY bin), " +
      "curc AS (SELECT bin, count(*)::DOUBLE / (SELECT count(*) FROM curb) AS cur_frac FROM curb GROUP BY bin), " +
      "bins AS (SELECT CAST(i AS INTEGER) AS bin FROM range(0, 10) t(i)), " +
      "j AS (SELECT bin, greatest(coalesce(ref_frac, 0), 1e-6) AS rf, greatest(coalesce(cur_frac, 0), 1e-6) AS cf " +
      "FROM bins LEFT JOIN refc USING (bin) LEFT JOIN curc USING (bin)), " +
      "k AS (SELECT bin, rf, cf, round((cf - rf) * ln(cf / rf), 6) AS psi_contrib FROM j) " +
      "SELECT bin, round(rf, 6) AS ref_frac, round(cf, 6) AS cur_frac, psi_contrib, " +
      "(SELECT round(sum(psi_contrib), 6) FROM k) AS psi_total FROM k ORDER BY bin")

  private[graft] val driftPsiCategoricalOracle: String =
    ("WITH cat AS (SELECT coalesce(lang, '__null__') AS c, doc_id FROM documents), " +
      "top3 AS (SELECT c AS cell FROM (SELECT c, count(*) AS n FROM cat GROUP BY c ORDER BY n DESC, c LIMIT 3)), " +
      "refx AS (SELECT CASE WHEN c IN (SELECT cell FROM top3) THEN c ELSE '__other__' END AS cell FROM cat), " +
      "curx AS (SELECT CASE WHEN c IN (SELECT cell FROM top3) THEN c ELSE '__other__' END AS cell FROM cat WHERE doc_id % 2 = 0), " +
      "refc AS (SELECT cell, count(*)::DOUBLE / (SELECT count(*) FROM refx) AS ref_frac FROM refx GROUP BY cell), " +
      "curc AS (SELECT cell, count(*)::DOUBLE / (SELECT count(*) FROM curx) AS cur_frac FROM curx GROUP BY cell), " +
      "cells AS (SELECT cell FROM top3 UNION ALL SELECT '__other__'), " +
      "j AS (SELECT cell, greatest(coalesce(ref_frac, 0), 1e-6) AS rf, greatest(coalesce(cur_frac, 0), 1e-6) AS cf " +
      "FROM cells LEFT JOIN refc USING (cell) LEFT JOIN curc USING (cell)), " +
      "k AS (SELECT cell, rf, cf, round((cf - rf) * ln(cf / rf), 6) AS psi_contrib FROM j) " +
      "SELECT cell, round(rf, 6) AS ref_frac, round(cf, 6) AS cur_frac, psi_contrib, " +
      "(SELECT round(sum(psi_contrib), 6) FROM k) AS psi_total FROM k ORDER BY cell")

  /** Unrolled Morton-interleave SQL mirroring ZOrder.interleave: bit i of
    * column j lands at position i*n + j. */
  private[graft] def zInterleaveSql(cols: Seq[String], bits: Int): String =
    (for { (c, j) <- cols.zipWithIndex; i <- 0 until bits }
      yield s"((($c >> $i) & 1) << ${i * cols.size + j})").mkString(" | ")


  /** Double-precision cosine between embeddings a.embedding / b.embedding
    * (list_sum folds in list order, matching Spark's aggregate). */
  private[graft] val cosineSql: String =
    "list_sum(list_transform(range(1, len(a.embedding) + 1), i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) / " +
      "(sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE))) * " +
      "sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE))))"

  /** Exact word-3-gram Jaccard pairs >= threshold, re-derived in DuckDB via
    * an inverted shingle index rather than an all-pairs theta-join: explode
    * shingles, count shared shingles per co-occurring (id_a < id_b) pair,
    * then jaccard = i / (|A| + |B| - i) (shingle lists are distinct, so the
    * shared count IS the intersection size). Identical to the brute
    * all-pairs form for any threshold > 0 — a pair with jaccard > 0 shares
    * at least one shingle and therefore appears in `inter`; every consumer
    * filters at >= 0.5. The r13 all-pairs form was value-identical
    * (verified at sf0.01) but quadratic in the corpus, timing out the
    * sf0.1 standing verify at 120 s; this form finishes in seconds. */
  private[graft] def jaccardPairCtes(src: String = "documents"): String =
    s"t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM $src), " +
      "s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3 " +
      "THEN list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) " +
      "ELSE [array_to_string(toks, ' ')] END) AS sh FROM t), " +
      "sz AS (SELECT doc_id, len(sh) AS n FROM s), " +
      "e AS (SELECT doc_id, unnest(sh) AS g FROM s), " +
      "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i " +
      "FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
      "j AS (SELECT id_a, id_b, round(i::DOUBLE / (na.n + nb.n - i), 4) AS jaccard " +
      "FROM inter JOIN sz na ON na.doc_id = id_a JOIN sz nb ON nb.doc_id = id_b)"

  private[graft] def jaccardOracle(threshold: Double): String =
    s"WITH ${jaccardPairCtes()} " +
      s"SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= $threshold ORDER BY id_a, id_b"

  /** Connected components over the jaccard pair list via transitive closure
    * (recursive CTE) + per-node min reachable id — the same min-of-component
    * labeling clusterPairs converges to. */
  private[graft] def componentCtes(threshold: Double, src: String = "documents"): String =
    s"${jaccardPairCtes(src)}, " +
      s"p AS (SELECT id_a, id_b FROM j WHERE jaccard >= $threshold), " +
      "edges AS (SELECT id_a AS u, id_b AS v FROM p UNION SELECT id_b, id_a FROM p), " +
      "reach(u, v) AS (SELECT u, v FROM edges " +
      "UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u), " +
      "comp AS (SELECT u AS id, least(u, min(v)) AS cid FROM reach GROUP BY u)"

  private[graft] def clusterOracle(threshold: Double): String =
    s"WITH RECURSIVE ${componentCtes(threshold)} " +
      "SELECT d.doc_id AS doc_id, CAST(coalesce(c.cid, d.doc_id) AS BIGINT) AS cluster_id " +
      "FROM documents d LEFT JOIN comp c ON d.doc_id = c.id ORDER BY d.doc_id"

  private[graft] def dropNearDupOracle(threshold: Double): String =
    s"WITH RECURSIVE ${componentCtes(threshold)} " +
      "SELECT doc_id FROM documents " +
      "WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> cid) ORDER BY doc_id"

  /** Full pipeline oracle: exact collapse on the normalized text (min id
    * per group), then the jaccard closure over the survivors only. */
  private[graft] def pipelineOracle(threshold: Double): String =
    "WITH RECURSIVE r AS (SELECT min(doc_id) AS id FROM (SELECT doc_id, " +
      "lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS f FROM documents) t0 GROUP BY f), " +
      "docs2 AS (SELECT d.* FROM documents d JOIN r ON d.doc_id = r.id), " +
      s"${componentCtes(threshold, "docs2")} " +
      "SELECT doc_id FROM docs2 " +
      "WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> cid) ORDER BY doc_id"
}
