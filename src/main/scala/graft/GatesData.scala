package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.checks.{Check, ColumnCheck}
import graft.errors.ValidationResult
import graft.hypothesis.Hypothesis
import graft.inference.InferSchema
import graft.schema._

/** extension gates: drift/outliers, sampling/mixing, joins, salting, layout.
  *
  * One slice of the driver-contract gate registry (r16-verdict #6: the
  * registry was one 4.9k-line object; the split is purely mechanical —
  * every gate body and oracle is verbatim, combined unchanged in
  * [[SparkEntry.queries]]/[[SparkEntry.oracleSql]]). */
private[graft] object GatesData {
  import GateSupport._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_hash" -> ((s, d) =>
      ext.Sampling.sampleByKey(t(s, d, "documents"), "doc_id", 0.25, seed = 7)
        .select("doc_id").orderBy("doc_id")),
    "sample_stratified" -> ((s, d) =>
      ext.Sampling.stratifiedSampleByKey(t(s, d, "documents"), "doc_id", "lang",
        Map("en" -> 0.25, "de" -> 0.8), defaultFraction = 0.5, seed = 7)
        .select("doc_id", "lang").orderBy("doc_id")),
    "agg_salted" -> ((s, d) =>
      // round-8: two-stage salted aggregation — the skewed-groupBy-key
      // defense (hot key spreads over 32 salt buckets in stage 1, tiny
      // partials re-merge in stage 2). Must equal the plain GROUP BY.
      // r19 hunt: avg runs over floor()ed prices — integral doubles sum
      // exactly at any addition order (the file's join_salted_right
      // discipline), so the salted two-stage partial-sum merge order
      // can never move the compared avg across a rounding boundary
      // (l_quantity/l_discount are already integral / exact-decimal).
      ext.Salting.saltedAggregate(
        t(s, d, "lineitem")
          .withColumn("l_price_int", floor(col("l_extendedprice"))),
        Seq("l_returnflag"),
        Seq(
          "sum_qty" -> ("sum", "l_quantity"),
          "n_rows" -> ("count", ""),
          "avg_price" -> ("avg", "l_price_int"),
          "min_disc" -> ("min", "l_discount"),
          "max_disc" -> ("max", "l_discount")))
        .select(col("l_returnflag"), round(col("sum_qty"), 3).as("sum_qty"),
          col("n_rows"), round(col("avg_price"), 3).as("avg_price"),
          col("min_disc"), col("max_disc"))
        .orderBy("l_returnflag")),
    "join_salted" -> ((s, d) => {
      // round-8: salted (hot-key-replicated) equi-join — lineitem joins
      // orders with hotKeyThreshold=5, so multi-line orders (up to 7
      // lineitems) go through the hot path: salted left rows meet
      // replicated right rows, single-line orders ride salt 0. Must equal
      // the plain join (DuckDB oracle); quantities are integral doubles,
      // so the sums compare exactly at any addition order.
      val joined = ext.Salting.saltedJoin(
        t(s, d, "lineitem"), t(s, d, "orders"),
        Seq("l_orderkey"), Seq("o_orderkey"),
        saltFactor = 4, hotKeyThreshold = 5)
      joined.groupBy(col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n_items"),
          round(sum("l_quantity"), 3).as("sum_qty"))
        .orderBy("priority")
    }),
    "join_salted_right" -> ((s, d) => {
      // r12 (verdict #7): right-outer salted join by composition —
      // salted INNER ∪ (right LEFT ANTI distinct left keys,
      // null-extended). Every synthetic customer places orders, so the
      // left side keeps only custkey % 3 != 0 orders: a third of the
      // customers have NO left partner and must surface exactly once
      // with null order columns (the anti leg under test). The RIGHT
      // side keeps positive-balance customers only, so some surviving
      // orders point at filtered-out customers — unmatched LEFT rows a
      // right join must DROP (kills a left-preserving-core mutation).
      // Sums are over floor()ed values: integral doubles sum exactly at
      // any addition order, so the salted union's partition order can
      // never flake the 3-dp string compare (join_salted discipline).
      val joined = ext.Salting.saltedJoin(
        t(s, d, "orders").filter(col("o_custkey") % 3 =!= 0),
        t(s, d, "customer").filter(col("c_acctbal") > 0),
        Seq("o_custkey"), Seq("c_custkey"),
        saltFactor = 4, hotKeyThreshold = 5, joinType = "right")
      joined.groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("o_orderkey")).as("n_matched"),
          sum(floor(coalesce(col("o_totalprice"), lit(0.0))).cast("long"))
            .as("price_sum"))
        .orderBy("segment")
    }),
    "join_salted_full" -> ((s, d) => {
      // r12 (verdict #7): full-outer salted join — salted LEFT ∪ the
      // same anti leg. Left keeps custkey % 3 != 0 orders, right keeps
      // positive-balance customers, so all three legs are populated:
      // matched pairs, orders of filtered-out customers (order_only),
      // customers with no surviving orders (customer_only). Leg counts
      // + sums re-derived in DuckDB from the plain FULL JOIN.
      val cust = t(s, d, "customer").filter(col("c_acctbal") > 0)
      val joined = ext.Salting.saltedJoin(
        t(s, d, "orders").filter(col("o_custkey") % 3 =!= 0), cust,
        Seq("o_custkey"), Seq("c_custkey"),
        saltFactor = 4, hotKeyThreshold = 5, joinType = "full")
      joined.select(
          when(col("c_custkey").isNull, lit("order_only"))
            .when(col("o_orderkey").isNull, lit("customer_only"))
            .otherwise(lit("matched")).as("leg"),
          col("o_totalprice"), col("c_acctbal"))
        .groupBy("leg")
        .agg(count(lit(1)).as("n_rows"),
          sum(floor(coalesce(col("o_totalprice"), lit(0.0))).cast("long"))
            .as("price_sum"),
          sum(floor(coalesce(col("c_acctbal"), lit(0.0))).cast("long"))
            .as("bal_sum"))
        .orderBy("leg")
    }),
    "join_range" -> ((s, d) => {
      // round-8: bucketized range join — purchases attributed to every
      // click by the same user within the preceding hour. The inequality
      // join is re-expressed as a hash EQUI-join on (user, time-bucket)
      // with interval replication bounded at 2 buckets (binWidth = window
      // length) — Spark's native plan for the same predicate is a
      // nested-loop; the oracle runs the plain inequality join in DuckDB
      val ev = t(s, d, "events")
      def us(c: org.apache.spark.sql.Column) = unix_micros(c.cast("timestamp"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          us(col("ts")).as("pts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          us(col("ts")).as("lo"), (us(col("ts")) + lit(3600000000L)).as("hi"))
      ext.RangeJoin.pointInInterval(purchases, "pts", clicks, "lo", "hi",
          Seq("user_id" -> "c_user"), binWidth = 3600000000L)
        .select(col("purchase_id"), col("user_id"), col("click_id"),
          (col("pts") - col("lo")).as("lag_us"))
        .orderBy("purchase_id", "click_id")
    }),
    "join_bucketed" -> ((s, d) => {
      // round-8: bucketed co-located join — orders and customer are laid
      // out bucketBy(8, custkey) ONCE, then the sort-merge join plans with
      // ZERO Exchange nodes (the 100 TB shape: the fact table's join
      // shuffle is paid at ingest, never per query). Broadcast is
      // suppressed via merge hints so the gate proves the bucketed
      // property, not a small-side fallback; the shuffle-freeness itself
      // is part of the oracle-checked row (join_shuffle_free = 1).
      // Integer aggregates (count + key sum) keep the compare float-free.
      val dir = java.nio.file.Files.createTempDirectory("graft-bkt").toString
      ext.Bucketing.writeBucketed(t(s, d, "orders"), "graft_bkt_orders",
        s"$dir/orders", Seq("o_custkey"), 8)
      ext.Bucketing.writeBucketed(t(s, d, "customer"), "graft_bkt_customer",
        s"$dir/customer", Seq("c_custkey"), 8)
      val joined = ext.Bucketing.colocatedJoin(s, "graft_bkt_orders",
        "graft_bkt_customer", Seq("o_custkey"), Seq("c_custkey"))
      val shuffleFree = ext.Bucketing.shuffleExchangeCount(joined) == 0
      joined.groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_orders"),
          sum("o_orderkey").as("key_sum"))
        .withColumn("join_shuffle_free", lit(if (shuffleFree) 1L else 0L))
        .orderBy("segment")
    }),
    "join_asof" -> ((s, d) => {
      // round-8: as-of join (pandas merge_asof / DuckDB ASOF JOIN) — for
      // every click, the latest view at-or-before it by the same user.
      // Spark-first union-window plan: ONE shuffle on the key + a running
      // last(ignoreNulls) frame — no range join, no pair explosion; the
      // oracle is DuckDB's NATIVE ASOF LEFT JOIN, a true cross-engine
      // semantic check. Timestamps compare as epoch micros on both sides
      // (unix_micros == epoch_us; the fixture's ts is timestamp[us]).
      val ev = t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"))
      ext.AsOfJoin.asOfJoin(clicks, views, Seq("user_id"), "ts", "ts",
          Seq("value"))
        .select(col("event_id"), col("user_id"),
          // ts is TIMESTAMP_NTZ; the cast is exact under the UTC session tz
          unix_micros(col("ts").cast("timestamp")).as("click_us"),
          unix_micros(col("asof_ts").cast("timestamp")).as("view_us"),
          round(col("asof_value"), 3).as("view_value"))
        .orderBy("event_id")
    }),
    "join_interval" -> ((s, d) => {
      // round-9: interval×interval OVERLAP join — concurrent 30-minute
      // activity windows per user between clicks and views, bucketized to
      // a hash equi-join with canonical-bucket exactly-once emission; the
      // oracle is DuckDB's direct inequality join
      val ev = t(s, d, "events")
      def usec(c: org.apache.spark.sql.Column) = unix_micros(c.cast("timestamp"))
      val a = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("a_id"), col("user_id").as("a_user"),
          usec(col("ts")).as("a_lo"), (usec(col("ts")) + lit(1800000000L)).as("a_hi"))
      val b = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("b_id"), col("user_id").as("b_user"),
          usec(col("ts")).as("b_lo"), (usec(col("ts")) + lit(1800000000L)).as("b_hi"))
      ext.RangeJoin.intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi",
          Seq("a_user" -> "b_user"), binWidth = 1800000000L)
        .select(col("a_id"), col("b_id"), col("a_user"))
        .orderBy("a_id", "b_id")
    }),
    "layout_zorder" -> ((s, d) => {
      // round-8: Z-order (Morton) multi-column clustering key — the Delta/
      // Iceberg OPTIMIZE ZORDER BY layout primitive. zval interleaves two
      // bounded key columns bit-by-bit; zrank goes through boundedRank
      // (clamp + IEEE-portable floor scaling) first. Pure codegen'd
      // builtins; cross-engine agreement is the whole point of the oracle
      // (DuckDB re-derives both with unrolled shift/mask arithmetic). The
      // file-skipping effect of clustering on this key is asserted in
      // ZOrderSpec (non-leading-column pruning vs a linear sort).
      t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
        ext.ZOrder.interleave(
          Seq(col("l_partkey") % 1024, col("l_suppkey") % 1024), 10).as("zval"),
        ext.ZOrder.zValue(Seq((col("l_quantity"), 1L, 50L),
          (col("l_partkey"), 0L, 1048576L)), 10).as("zrank"))
        .orderBy("l_orderkey", "l_linenumber")
    }),
    "outlier_mad" -> ((s, d) => {
      // round-9: Hampel (median ± k·1.4826·MAD) outlier fences — the
      // 50%-breakdown robust rule next to the IQR fence; the oracle
      // re-derives both medians with the same rounded-median second step
      val orders = t(s, d, "orders")
      val (lo, hi) = ext.Outliers.madFences(orders, "o_totalprice")
      ext.Outliers.flagOutliers(orders, "o_totalprice", fences = Some((lo, hi)))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("is_outlier"), 1L).otherwise(0L)).as("n_outliers"),
          lit(lo).as("lo"), lit(hi).as("hi"))
    }),
    "outlier_iqr" -> ((s, d) => {
      // round-5: Tukey-fence outlier detection on order totals — exact
      // quartile fences (== quantile_cont), then a pure flag filter
      val orders = t(s, d, "orders")
      val (lo, hi) = ext.Outliers.iqrFences(orders, "o_totalprice")
      ext.Outliers.flagOutliers(orders, "o_totalprice", fences = Some((lo, hi)))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("is_outlier"), 1L).otherwise(0L)).as("n_outliers"),
          lit(lo).as("lo"), lit(hi).as("hi"))
    }),
    "drift_psi" -> ((s, d) =>
      // round-5: distribution-drift monitoring — PSI of l_extendedprice
      // between the full lineitem snapshot (reference) and the returned-
      // goods slice (current), 10 reference-quantile bins
      ext.Drift.psi(t(s, d, "lineitem"),
        t(s, d, "lineitem").filter(col("l_returnflag") === "A"),
        "l_extendedprice", bins = 10)
        .orderBy("bin")),
    "drift_psi_multi" -> ((s, d) =>
      // round-7: fused multi-column drift (verdict r6 #4) — all three
      // columns' edges in ONE reference aggregation, both sides binned in
      // ONE union pass: 2 jobs total instead of 3 per column
      ext.Drift.psiMulti(t(s, d, "lineitem"),
        t(s, d, "lineitem").filter(col("l_returnflag") === "A"),
        Seq("l_extendedprice", "l_quantity", "l_discount"), bins = 10)
        .orderBy("column", "bin")),
    "drift_ks" -> ((s, d) =>
      // round-7: grid Kolmogorov-Smirnov — max empirical-CDF gap at the
      // reference's 20-quantile grid; same two-scan plan shape as PSI
      // (exact KS would need a global sort of both datasets)
      ext.Drift.ks(t(s, d, "lineitem"),
        t(s, d, "lineitem").filter(col("l_returnflag") === "A"),
        "l_extendedprice", bins = 20)
        .orderBy("bin")),
    "drift_w1" -> ((s, d) =>
      // round-9: grid Wasserstein-1 — the CDF gap INTEGRATED over the
      // value axis (earth-mover distance in the column's own units),
      // completing the drift family next to PSI (divergence) and KS
      // (max gap); same two-scan quantile-grid plan
      ext.Drift.wasserstein1(t(s, d, "lineitem"),
        t(s, d, "lineitem").filter(col("l_returnflag") === "A"),
        "l_extendedprice", bins = 20)
        .orderBy("bin")),
    "drift_ks_multi" -> ((s, d) =>
      // round-7: fused multi-column KS — all three columns' edges in ONE
      // reference aggregation, both sides binned in ONE union pass (2 jobs
      // total, the psiMulti fusion), per-column cumulative-gap tail
      ext.Drift.ksMulti(t(s, d, "lineitem"),
        t(s, d, "lineitem").filter(col("l_returnflag") === "A"),
        Seq("l_extendedprice", "l_quantity", "l_discount"), bins = 20)
        .orderBy("column", "bin")),
    "drift_psi_windowed" -> ((s, d) => {
      // round-7: streaming drift — PSI of the event value per event-time
      // hour window vs the full-table reference profile; the SAME
      // transformation runs append-mode streaming (one stateful windowed
      // agg carrying the bin counters; StreamingSpec replays it)
      val ev = t(s, d, "events")
      val (edges, fracs) = ext.Drift.referenceNumericProfile(ev, "value", bins = 5)
      streaming.StreamingValidation.windowedPsi(ev, "ts", "value", edges,
        fracs, windowDur = "1 hour").orderBy("window_start", "bin")
    }),
    "drift_psi_cat_windowed" -> ((s, d) => {
      // round-8 (r7 verdict #6): streaming CATEGORICAL drift — the
      // language/domain-mix monitor. PSI of the event_type mix per
      // event-time hour vs the full-table reference profile (top-2
      // categories + __other__, so the overflow cell carries real mass);
      // the SAME transformation runs append-mode streaming (one stateful
      // windowed agg carrying per-cell counters; StreamingSpec replays it)
      val ev = t(s, d, "events")
      val (cells, fracs) =
        ext.Drift.referenceCategoricalProfile(ev, "event_type", maxCategories = 2)
      streaming.StreamingValidation.windowedPsiCategorical(ev, "ts",
        "event_type", cells, fracs, windowDur = "1 hour")
        .orderBy("window_start", "cell")
    }),
    "drift_w1_windowed" -> ((s, d) => {
      // r12 (verdict #6): streaming Wasserstein-1 — the drift trio's
      // third face gets its windowed form: W1 of the event value per
      // event-time hour vs the full-table reference profile; same
      // one-stateful-agg shape as drift_psi_windowed (the cross-bin
      // cumsum is unrolled over the bounded bin cells, row-local);
      // StreamingSpec replays batch ≡ stream
      val ev = t(s, d, "events")
      val (edges, fracs) = ext.Drift.referenceNumericProfile(ev, "value", bins = 5)
      streaming.StreamingValidation.windowedWasserstein1(ev, "ts", "value",
        edges, fracs, windowDur = "1 hour").orderBy("window_start", "bin")
    }),
    "drift_psi_profile" -> ((s, d) => {
      // round-8: drift-profile PERSISTENCE serve path — fit the reference
      // profile once, save/load the JSON document, score the batch against
      // the LOADED profile without re-reading the reference. Same oracle
      // SQL as drift_psi: exact double round-trip + serve equivalence is
      // the gate
      val li = t(s, d, "lineitem")
      val prof = ext.DriftProfile.fit(li,
        numericCols = Seq("l_extendedprice"), bins = 10)
      val n = roundTripProfile(prof).numericFor("l_extendedprice")
      ext.Drift.psiAgainstProfile(li.filter(col("l_returnflag") === "A"),
        "l_extendedprice", n.edges, n.fracs).orderBy("bin")
    }),
    "drift_ks_profile" -> ((s, d) => {
      // round-8: KS served from the persisted profile — fit once (20
      // bins), save/load the JSON document, score the batch against the
      // stored CDF; hash-identical to the two-sided drift_ks, so it
      // shares that oracle
      val li = t(s, d, "lineitem")
      val prof = ext.DriftProfile.fit(li,
        numericCols = Seq("l_extendedprice"), bins = 20)
      val n = roundTripProfile(prof).numericFor("l_extendedprice")
      ext.Drift.ksAgainstProfile(li.filter(col("l_returnflag") === "A"),
        "l_extendedprice", n.edges, n.fracs).orderBy("bin")
    }),
    "drift_psi_cat_profile" -> ((s, d) => {
      // round-8: categorical sibling of drift_psi_profile (language-mix
      // monitor served from the stored document)
      val docs = t(s, d, "documents")
      val prof = ext.DriftProfile.fit(docs,
        categoricalCols = Seq("lang"), maxCategories = 3)
      val c = roundTripProfile(prof).categoricalFor("lang")
      ext.Drift.psiCategoricalAgainstProfile(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0), "lang",
        c.cells, c.fracs).orderBy("cell")
    }),
    "drift_psi_categorical" -> ((s, d) =>
      // round-5: categorical drift on language mix — top-3 reference
      // categories + __other__ bucket (the unbounded-cardinality guard)
      ext.Drift.psiCategorical(t(s, d, "documents"),
        t(s, d, "documents").filter(pmod(col("doc_id"), lit(2)) === 0),
        "lang", maxCategories = 3)
        .orderBy("cell")),
    "sample_top_fraction" -> ((s, d) =>
      // round-5: global quality cut — keep the top 25% of docs by n_chars
      // (exact interpolated percentile threshold == SQL quantile_cont)
      ext.Sampling.keepTopFraction(t(s, d, "documents"), "n_chars", 0.25)
        .select("doc_id").orderBy("doc_id")),
    "sample_cap_per_group" -> ((s, d) =>
      // round-5: domain balancing — ≤ 40 docs per language, chosen by
      // ascending key hash via the map-side k-heap (no window sort)
      ext.Sampling.capPerGroup(t(s, d, "documents"), "doc_id", "lang", 40, seed = 7)
        .select("doc_id", "lang").orderBy("doc_id")),
    "sample_weighted_wor" -> ((s, d) => {
      // round-8: Efraimidis–Spirakis weighted sampling without replacement,
      // weight = token count (longer docs proportionally likelier). The
      // md5-derived uniform makes the draw engine-portable, so the oracle
      // recomputes the exact same ln(u)/w top-k in SQL.
      val withW = t(s, d, "documents").select(col("doc_id").cast("long").as("doc_id"),
        ext.TextAnalysis.tokenCount(col("text")).cast("double").as("w"))
      ext.Sampling.weightedSampleWOR(withW, "doc_id", "w", k = 50, seed = 42)
        .select(col("doc_id"), col("w").cast("long").as("ntok"))
        .orderBy("doc_id")
    }),
    "sample_split" -> ((s, d) =>
      // weights 0.5/0.25/0.25 — cumulative thresholds exact in binary so
      // the oracle's literals compare identically
      ext.Sampling.assignSplits(t(s, d, "documents"), "doc_id",
        Seq("train" -> 0.5, "val" -> 0.25, "test" -> 0.25), seed = 7)
        .select(col("doc_id"), col("split")).orderBy("doc_id")),
    "sample_shuffle" -> ((s, d) =>
      // round-5: deterministic global shuffle — the ORDER ITSELF is the
      // contract, so the gate emits the first 200 rows in shuffled order
      ext.Sampling.shuffleByKey(t(s, d, "documents"), "doc_id", seed = 7)
        .select("doc_id").limit(200)),
    "sample_mix" -> ((s, d) => {
      // round-5: corpus mixture — en downsampled to 0.5, de upsampled 2.25×
      val docs = t(s, d, "documents")
      ext.Sampling.mixCorpora(Seq(
        ("en", docs.filter(col("lang") === "en").select("doc_id"), 0.5),
        ("de", docs.filter(col("lang") === "de").select("doc_id"), 2.25)),
        "doc_id")
        .select(col("doc_id"), col("source"), col("copy"))
        .orderBy("source", "copy", "doc_id")
    }),
    "sample_mix_budget" -> ((s, d) => {
      // round-7: token-budget mixture — "20k tokens, 70% en / 30% de";
      // per-source rates derive from ONE fused token-total job, then the
      // one-scan-per-source epoch explode emits floor(rate) full epochs +
      // a hash-drawn fractional epoch per document
      val docs = t(s, d, "documents")
        .withColumn("n_tok", ext.TextAnalysis.tokenCount(col("text")))
      ext.Sampling.mixToTokenBudget(Seq(
        ("en", docs.filter(col("lang") === "en").select("doc_id", "n_tok"), 0.7),
        ("de", docs.filter(col("lang") === "de").select("doc_id", "n_tok"), 0.3)),
        "doc_id", "n_tok", budget = 20000L)
        .select(col("doc_id"), col("source"), col("copy"))
        .orderBy("source", "copy", "doc_id")
    }),
    "sample_mix_temperature" -> ((s, d) => {
      // round-8: temperature-weighted mixing — alpha = 0.5 gives each
      // language a budget share ∝ sqrt(its token total): the smaller
      // source is up-weighted above natural proportions but below the
      // equal-share extreme (the XLM-R/mT5 recipe). Same hash-draw
      // machinery as sample_mix_budget, so the oracle re-derives every
      // copy; pow(x, 0.5) is exactly sqrt(x) in both engines.
      val docs = t(s, d, "documents")
        .withColumn("n_tok", ext.TextAnalysis.tokenCount(col("text")))
      ext.Sampling.mixByTemperature(Seq(
        ("en", docs.filter(col("lang") === "en").select("doc_id", "n_tok")),
        ("de", docs.filter(col("lang") === "de").select("doc_id", "n_tok"))),
        "doc_id", "n_tok", budget = 20000L, alpha = 0.5)
        .select(col("doc_id"), col("source"), col("copy"))
        .orderBy("source", "copy", "doc_id")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "agg_salted" ->
      ("SELECT l_returnflag, round(sum(l_quantity), 3) AS sum_qty, " +
        "CAST(count(*) AS BIGINT) AS n_rows, " +
        "round(avg(floor(l_extendedprice)), 3) AS avg_price, " +
        "min(l_discount) AS min_disc, max(l_discount) AS max_disc " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    // plain join in DuckDB — the salted plan's hot-key replication must
    // change nothing about the result
    "join_salted" ->
      ("SELECT o_orderpriority AS priority, CAST(count(*) AS BIGINT) AS n_items, " +
        "round(sum(l_quantity), 3) AS sum_qty " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY 1 ORDER BY 1"),
    // plain RIGHT/FULL joins in DuckDB — the salted composition
    // (salted core ∪ anti-derived null-extended leg) must change nothing
    "join_salted_right" ->
      ("SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(count(o_orderkey) AS BIGINT) AS n_matched, " +
        "CAST(sum(floor(coalesce(o_totalprice, 0.0))) AS BIGINT) AS price_sum " +
        "FROM (SELECT * FROM orders WHERE o_custkey % 3 <> 0) o " +
        "RIGHT JOIN (SELECT * FROM customer WHERE c_acctbal > 0) c " +
        "ON o_custkey = c_custkey " +
        "GROUP BY 1 ORDER BY 1"),
    "join_salted_full" ->
      ("SELECT CASE WHEN c_custkey IS NULL THEN 'order_only' " +
        "WHEN o_orderkey IS NULL THEN 'customer_only' " +
        "ELSE 'matched' END AS leg, " +
        "CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(sum(floor(coalesce(o_totalprice, 0.0))) AS BIGINT) AS price_sum, " +
        "CAST(sum(floor(coalesce(c_acctbal, 0.0))) AS BIGINT) AS bal_sum " +
        "FROM (SELECT * FROM orders WHERE o_custkey % 3 <> 0) o " +
        "FULL JOIN (SELECT * FROM customer WHERE c_acctbal > 0) c " +
        "ON o_custkey = c_custkey GROUP BY 1 ORDER BY 1"),
    "join_range" ->
      ("SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id, " +
        "epoch_us(p.ts) - epoch_us(c.ts) AS lag_us " +
        "FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p " +
        "JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c " +
        "ON p.user_id = c.user_id AND epoch_us(p.ts) >= epoch_us(c.ts) " +
        "AND epoch_us(p.ts) <= epoch_us(c.ts) + 3600000000 " +
        "ORDER BY purchase_id, click_id"),
    "join_asof" -> asofOracle,
    // plain join in DuckDB; the Spark side's zero-Exchange co-located plan
    // must produce the same rows AND report join_shuffle_free = 1
    "join_bucketed" ->
      ("SELECT c_mktsegment AS segment, count(*) AS n_orders, " +
       "CAST(sum(o_orderkey) AS BIGINT) AS key_sum, " +
       "CAST(1 AS BIGINT) AS join_shuffle_free " +
       "FROM orders JOIN customer ON o_custkey = c_custkey " +
       "GROUP BY 1 ORDER BY 1"),
    "join_interval" ->
      ("SELECT a.event_id AS a_id, b.event_id AS b_id, a.user_id AS a_user " +
        "FROM (SELECT event_id, user_id, epoch_us(ts) AS lo, epoch_us(ts) + 1800000000 AS hi FROM events WHERE event_type = 'click') a " +
        "JOIN (SELECT event_id, user_id, epoch_us(ts) AS lo, epoch_us(ts) + 1800000000 AS hi FROM events WHERE event_type = 'view') b " +
        "ON a.user_id = b.user_id AND a.lo <= b.hi AND b.lo <= a.hi " +
        "ORDER BY a_id, b_id"),
    "layout_zorder" ->
      ("WITH r AS (SELECT l_orderkey, l_linenumber, " +
        "CAST(floor((least(greatest(CAST(l_quantity AS BIGINT), 1), 50) - 1) * 1023 / 49) AS BIGINT) AS r1, " +
        "CAST(floor((least(greatest(l_partkey, 0), 1048576) - 0) * 1023 / 1048576) AS BIGINT) AS r2, " +
        "(l_partkey % 1024) AS x, (l_suppkey % 1024) AS y FROM lineitem) " +
        "SELECT l_orderkey, l_linenumber, " +
        s"CAST(${zInterleaveSql(Seq("x", "y"), 10)} AS BIGINT) AS zval, " +
        s"CAST(${zInterleaveSql(Seq("r1", "r2"), 10)} AS BIGINT) AS zrank " +
        "FROM r ORDER BY l_orderkey, l_linenumber"),
    // Golden pins for the three approximate operators: the pipelines are
    // fully deterministic (seeded xxhash64 signatures, seeded k-means,
    // ties broken by corpus id, k-heap with a total order), so the exact
    // result at each gate scale is a constant — pinned per SF (probed by
    // lineitem row count), recall-vs-brute additionally asserted in ExtSpec.
    "sample_hash" ->
      ("SELECT doc_id FROM documents " +
        "WHERE ('0x' || substr(md5(doc_id::VARCHAR || chr(1) || '7'), 1, 8))::BIGINT / 4294967296.0 < 0.25 " +
        "ORDER BY doc_id"),
    "sample_stratified" ->
      ("SELECT doc_id, lang FROM documents " +
        "WHERE ('0x' || substr(md5(doc_id::VARCHAR || chr(1) || '7'), 1, 8))::BIGINT / 4294967296.0 " +
        "< (CASE WHEN lang = 'en' THEN 0.25 WHEN lang = 'de' THEN 0.8 ELSE 0.5 END) " +
        "ORDER BY doc_id"),
    "outlier_mad" ->
      ("WITH m AS (SELECT round(quantile_cont(o_totalprice, 0.5), 6) AS med FROM orders), " +
        "d AS (SELECT round(quantile_cont(abs(o_totalprice - (SELECT med FROM m)), 0.5), 6) AS mad FROM orders), " +
        "b AS (SELECT round(med - 3.0 * 1.4826 * mad, 6) AS lo, round(med + 3.0 * 1.4826 * mad, 6) AS hi FROM m, d) " +
        "SELECT (SELECT count(*) FROM orders) AS n_total, " +
        "CAST((SELECT count(*) FROM orders, b WHERE o_totalprice IS NOT NULL AND (o_totalprice < lo OR o_totalprice > hi)) AS BIGINT) AS n_outliers, " +
        "lo, hi FROM b"),
    "outlier_iqr" ->
      ("WITH f AS (SELECT quantile_cont(o_totalprice, 0.25) AS q1, quantile_cont(o_totalprice, 0.75) AS q3 FROM orders), " +
        "b AS (SELECT round(q1 - 1.5 * (q3 - q1), 6) AS lo, round(q3 + 1.5 * (q3 - q1), 6) AS hi FROM f) " +
        "SELECT (SELECT count(*) FROM orders) AS n_total, " +
        "CAST((SELECT count(*) FROM orders, b WHERE o_totalprice IS NOT NULL AND (o_totalprice < lo OR o_totalprice > hi)) AS BIGINT) AS n_outliers, " +
        "lo, hi FROM b"),
    "drift_ks" -> driftKsOracle,
    "drift_w1" -> driftW1Oracle,
    "drift_psi" -> driftPsiOracle,
    // profile-persistence serve paths are hash-identical to the direct
    // two-sided computations by construction — same oracles
    "drift_psi_profile" -> driftPsiOracle,
    "drift_ks_profile" -> driftKsOracle,
    "drift_psi_cat_profile" -> driftPsiCategoricalOracle,
    "drift_psi_windowed" ->
      ("WITH edges AS (SELECT list_transform(quantile_cont(value, [0.2, 0.4, 0.6, 0.8]), e -> round(e, 6)) AS es FROM events), " +
        "refb AS (SELECT CAST(list_sum(list_transform((SELECT es FROM edges), e -> CASE WHEN value > e THEN 1 ELSE 0 END)) AS INTEGER) AS bin FROM events WHERE value IS NOT NULL), " +
        "refc AS (SELECT bin, count(*)::DOUBLE / (SELECT count(*) FROM refb) AS ref_frac FROM refb GROUP BY bin), " +
        "curb AS (SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start, CAST(list_sum(list_transform((SELECT es FROM edges), e -> CASE WHEN value > e THEN 1 ELSE 0 END)) AS INTEGER) AS bin FROM events WHERE value IS NOT NULL), " +
        "curc AS (SELECT window_start, bin, count(*) AS n FROM curb GROUP BY 1, 2), " +
        "tot AS (SELECT window_start, sum(n) AS t FROM curc GROUP BY 1), " +
        "grid AS (SELECT w.window_start, b.bin FROM (SELECT DISTINCT window_start FROM curb) w CROSS JOIN (SELECT CAST(i AS INTEGER) AS bin FROM range(0, 5) t(i)) b), " +
        "j AS (SELECT g.window_start, g.bin, greatest(coalesce(rc.ref_frac, 0), 1e-6) AS rf, greatest(coalesce(cc.n, 0)::DOUBLE / tt.t, 1e-6) AS cf " +
        "FROM grid g LEFT JOIN refc rc ON rc.bin = g.bin LEFT JOIN curc cc ON cc.window_start = g.window_start AND cc.bin = g.bin JOIN tot tt ON tt.window_start = g.window_start), " +
        "k AS (SELECT window_start, bin, rf, cf, round((cf - rf) * ln(cf / rf), 6) AS psi_contrib FROM j), " +
        "ptot AS (SELECT window_start, round(sum(psi_contrib), 6) AS psi_total FROM k GROUP BY 1) " +
        "SELECT k.window_start, k.bin, round(k.rf, 6) AS ref_frac, round(k.cf, 6) AS cur_frac, k.psi_contrib, ptot.psi_total " +
        "FROM k JOIN ptot USING (window_start) ORDER BY window_start, bin"),
    "drift_w1_windowed" ->
      ("WITH edges AS (SELECT list_transform(quantile_cont(value, [0.2, 0.4, 0.6, 0.8]), e -> round(e, 6)) AS es FROM events), " +
        "refb AS (SELECT CAST(list_sum(list_transform((SELECT es FROM edges), e -> CASE WHEN value > e THEN 1 ELSE 0 END)) AS INTEGER) AS bin FROM events WHERE value IS NOT NULL), " +
        "refc AS (SELECT bin, count(*)::DOUBLE / (SELECT count(*) FROM refb) AS ref_frac FROM refb GROUP BY bin), " +
        "bingrid AS (SELECT CAST(i AS INTEGER) AS bin FROM range(0, 5) t(i)), " +
        "refcum AS (SELECT b.bin, sum(coalesce(rc.ref_frac, 0)) OVER (ORDER BY b.bin) AS ref_cum FROM bingrid b LEFT JOIN refc rc ON rc.bin = b.bin), " +
        "widths AS (SELECT b.bin, CASE WHEN b.bin <= 2 THEN e.es[b.bin + 2] - e.es[b.bin + 1] ELSE 0.0 END AS width FROM bingrid b CROSS JOIN edges e), " +
        "curb AS (SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start, CAST(list_sum(list_transform((SELECT es FROM edges), e -> CASE WHEN value > e THEN 1 ELSE 0 END)) AS INTEGER) AS bin FROM events WHERE value IS NOT NULL), " +
        "curc AS (SELECT window_start, bin, count(*) AS n FROM curb GROUP BY 1, 2), " +
        "tot AS (SELECT window_start, sum(n) AS t FROM curc GROUP BY 1), " +
        "grid AS (SELECT w.window_start, b.bin FROM (SELECT DISTINCT window_start FROM curb) w CROSS JOIN bingrid b), " +
        "cum AS (SELECT g.window_start, g.bin, sum(coalesce(cc.n, 0)) OVER (PARTITION BY g.window_start ORDER BY g.bin)::DOUBLE / tt.t AS cur_cum " +
        "FROM grid g LEFT JOIN curc cc ON cc.window_start = g.window_start AND cc.bin = g.bin JOIN tot tt ON tt.window_start = g.window_start), " +
        "k AS (SELECT c.window_start, c.bin, r.ref_cum, c.cur_cum, abs(r.ref_cum - c.cur_cum) AS gap, w.width FROM cum c JOIN refcum r ON r.bin = c.bin JOIN widths w ON w.bin = c.bin), " +
        "wtot AS (SELECT window_start, round(sum(gap * width), 4) AS w1_stat FROM k GROUP BY 1) " +
        "SELECT k.window_start, k.bin, round(k.ref_cum, 6) AS ref_cum, round(k.cur_cum, 6) AS cur_cum, round(k.gap, 6) AS gap, round(k.width, 6) AS width, round(k.gap * k.width, 6) AS w1_contrib, wtot.w1_stat " +
        "FROM k JOIN wtot USING (window_start) ORDER BY window_start, bin"),
    "drift_psi_cat_windowed" ->
      ("WITH cat AS (SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start, coalesce(CAST(event_type AS VARCHAR), '__null__') AS cell FROM events), " +
        "tot0 AS (SELECT count(*) AS t FROM cat), " +
        "refc AS (SELECT cell, count(*) AS n FROM cat GROUP BY 1), " +
        "topk AS (SELECT cell FROM refc ORDER BY n DESC, cell LIMIT 2), " +
        "refp AS (SELECT cell, n::DOUBLE / (SELECT t FROM tot0) AS rf FROM refc WHERE cell IN (SELECT cell FROM topk) " +
        "UNION ALL SELECT '__other__', coalesce(sum(n), 0)::DOUBLE / (SELECT t FROM tot0) FROM refc WHERE cell NOT IN (SELECT cell FROM topk)), " +
        "curb AS (SELECT window_start, CASE WHEN cell IN (SELECT cell FROM topk) THEN cell ELSE '__other__' END AS cell FROM cat), " +
        "curc AS (SELECT window_start, cell, count(*) AS n FROM curb GROUP BY 1, 2), " +
        "wtot AS (SELECT window_start, sum(n) AS t FROM curc GROUP BY 1), " +
        "grid AS (SELECT w.window_start, p.cell, p.rf FROM (SELECT DISTINCT window_start FROM curb) w CROSS JOIN refp p), " +
        "j AS (SELECT g.window_start, g.cell, greatest(g.rf, 1e-6) AS rf, greatest(coalesce(c.n, 0)::DOUBLE / t.t, 1e-6) AS cf " +
        "FROM grid g LEFT JOIN curc c ON c.window_start = g.window_start AND c.cell = g.cell JOIN wtot t ON t.window_start = g.window_start), " +
        "k AS (SELECT window_start, cell, rf, cf, round((cf - rf) * ln(cf / rf), 6) AS psi_contrib FROM j), " +
        "pt AS (SELECT window_start, round(sum(psi_contrib), 6) AS psi_total FROM k GROUP BY 1) " +
        "SELECT k.window_start, k.cell, round(k.rf, 6) AS ref_frac, round(k.cf, 6) AS cur_frac, k.psi_contrib, pt.psi_total " +
        "FROM k JOIN pt USING (window_start) ORDER BY window_start, cell"),
    "drift_ks_multi" ->
      ("WITH " + Seq("l_extendedprice", "l_quantity", "l_discount")
        .zipWithIndex.map { case (c, i) => ksMultiOracleCol(c, i) }
        .mkString(", ") +
        " SELECT * FROM kout0 UNION ALL SELECT * FROM kout1 UNION ALL SELECT * FROM kout2" +
        " ORDER BY \"column\", bin"),
    "drift_psi_multi" ->
      ("WITH " + Seq("l_extendedprice", "l_quantity", "l_discount")
        .zipWithIndex.map { case (c, i) => psiMultiOracleCol(c, i) }
        .mkString(", ") +
        " SELECT * FROM out0 UNION ALL SELECT * FROM out1 UNION ALL SELECT * FROM out2" +
        " ORDER BY \"column\", bin"),
    "drift_psi_categorical" -> driftPsiCategoricalOracle,
    "sample_top_fraction" ->
      ("SELECT doc_id FROM documents " +
        "WHERE n_chars >= (SELECT quantile_cont(n_chars, 0.75) FROM documents) " +
        "ORDER BY doc_id"),
    "sample_cap_per_group" ->
      ("WITH r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang " +
        "ORDER BY ('0x' || substr(md5(doc_id::VARCHAR || chr(1) || '7'), 1, 8))::BIGINT, doc_id) AS rn FROM documents) " +
        "SELECT doc_id, lang FROM r WHERE rn <= 40 ORDER BY doc_id"),
    "sample_weighted_wor" ->
      ("WITH tk AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END AS ntok FROM documents), " +
        "es AS (SELECT doc_id, ntok, ln((('0x' || substr(md5(doc_id::VARCHAR || chr(1) || '42'), 1, 8))::BIGINT + 0.5) / 4294967296.0) / ntok AS k FROM tk WHERE ntok > 0) " +
        "SELECT doc_id, CAST(ntok AS BIGINT) AS ntok FROM (SELECT * FROM es ORDER BY k DESC, doc_id LIMIT 50) ORDER BY doc_id"),
    "sample_split" ->
      ("WITH b AS (SELECT doc_id, ('0x' || substr(md5(doc_id::VARCHAR || chr(1) || '7'), 1, 8))::BIGINT / 4294967296.0 AS h FROM documents) " +
        "SELECT doc_id, CASE WHEN h < 0.5 THEN 'train' WHEN h < 0.75 THEN 'val' ELSE 'test' END AS split FROM b ORDER BY doc_id"),
    "sample_shuffle" ->
      ("SELECT doc_id FROM documents " +
        "ORDER BY ('0x' || substr(md5(doc_id::VARCHAR || chr(1) || '7'), 1, 8))::BIGINT, doc_id LIMIT 200"),
    "sample_mix" ->
      ("WITH en AS (SELECT doc_id FROM documents WHERE lang = 'en'), " +
        "de AS (SELECT doc_id FROM documents WHERE lang = 'de'), " +
        "parts AS (" +
        "SELECT doc_id, 'en' AS source, 0 AS copy FROM en " +
        "WHERE ('0x' || substr(md5('en' || chr(1) || doc_id::VARCHAR || chr(1) || '42'), 1, 8))::BIGINT / 4294967296.0 < 0.5 " +
        "UNION ALL SELECT doc_id, 'de', 0 FROM de " +
        "UNION ALL SELECT doc_id, 'de', 1 FROM de " +
        "UNION ALL SELECT doc_id, 'de', 2 FROM de " +
        "WHERE ('0x' || substr(md5('de' || chr(1) || doc_id::VARCHAR || chr(1) || '42'), 1, 8))::BIGINT / 4294967296.0 < 0.25) " +
        "SELECT doc_id, source, copy FROM parts ORDER BY source, copy, doc_id"),
    "sample_mix_budget" ->
      ("WITH en AS (SELECT doc_id, CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tok FROM documents WHERE lang = 'en'), " +
        "de AS (SELECT doc_id, CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tok FROM documents WHERE lang = 'de'), " +
        "r AS (SELECT (20000.0 * (0.7 / (0.7 + 0.3))) / CAST((SELECT sum(n_tok) FROM en) AS DOUBLE) AS r_en, " +
        "(20000.0 * (0.3 / (0.7 + 0.3))) / CAST((SELECT sum(n_tok) FROM de) AS DOUBLE) AS r_de), " +
        "enp AS (SELECT doc_id, CAST(i AS INTEGER) AS copy, 'en' AS source FROM en, r, " +
        "unnest(range(0, CAST(floor(r_en) AS BIGINT) + CASE WHEN ('0x' || substr(md5('en' || chr(1) || doc_id::VARCHAR || chr(1) || '42'), 1, 8))::BIGINT / 4294967296.0 < r_en - floor(r_en) THEN 1 ELSE 0 END)) u(i)), " +
        "dep AS (SELECT doc_id, CAST(i AS INTEGER) AS copy, 'de' AS source FROM de, r, " +
        "unnest(range(0, CAST(floor(r_de) AS BIGINT) + CASE WHEN ('0x' || substr(md5('de' || chr(1) || doc_id::VARCHAR || chr(1) || '42'), 1, 8))::BIGINT / 4294967296.0 < r_de - floor(r_de) THEN 1 ELSE 0 END)) u(i)) " +
        "SELECT doc_id, source, copy FROM (SELECT * FROM enp UNION ALL SELECT * FROM dep) " +
        "ORDER BY source, copy, doc_id"),
    // identical draw machinery to sample_mix_budget; only the rate
    // derivation changes — shares ∝ sqrt(per-source token totals)
    "sample_mix_temperature" ->
      ("WITH en AS (SELECT doc_id, CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tok FROM documents WHERE lang = 'en'), " +
        "de AS (SELECT doc_id, CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tok FROM documents WHERE lang = 'de'), " +
        "t AS (SELECT CAST((SELECT sum(n_tok) FROM en) AS DOUBLE) AS ne, CAST((SELECT sum(n_tok) FROM de) AS DOUBLE) AS nd), " +
        "r AS (SELECT 20000.0 * (sqrt(ne) / (sqrt(ne) + sqrt(nd))) / ne AS r_en, " +
        "20000.0 * (sqrt(nd) / (sqrt(ne) + sqrt(nd))) / nd AS r_de FROM t), " +
        "enp AS (SELECT doc_id, CAST(i AS INTEGER) AS copy, 'en' AS source FROM en, r, " +
        "unnest(range(0, CAST(floor(r_en) AS BIGINT) + CASE WHEN ('0x' || substr(md5('en' || chr(1) || doc_id::VARCHAR || chr(1) || '42'), 1, 8))::BIGINT / 4294967296.0 < r_en - floor(r_en) THEN 1 ELSE 0 END)) u(i)), " +
        "dep AS (SELECT doc_id, CAST(i AS INTEGER) AS copy, 'de' AS source FROM de, r, " +
        "unnest(range(0, CAST(floor(r_de) AS BIGINT) + CASE WHEN ('0x' || substr(md5('de' || chr(1) || doc_id::VARCHAR || chr(1) || '42'), 1, 8))::BIGINT / 4294967296.0 < r_de - floor(r_de) THEN 1 ELSE 0 END)) u(i)) " +
        "SELECT doc_id, source, copy FROM (SELECT * FROM enp UNION ALL SELECT * FROM dep) " +
        "ORDER BY source, copy, doc_id"),
  )
}
