package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.checks.{Check, ColumnCheck}
import graft.errors.ValidationResult
import graft.hypothesis.Hypothesis
import graft.inference.InferSchema
import graft.schema._

/** extension gates: text analysis, BM25/retrieval, LMs, packing, corpus pipeline.
  *
  * One slice of the driver-contract gate registry (r16-verdict #6: the
  * registry was one 4.9k-line object; the split is purely mechanical —
  * every gate body and oracle is verbatim, combined unchanged in
  * [[SparkEntry.queries]]/[[SparkEntry.oracleSql]]). */
private[graft] object GatesText {
  import GateSupport._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_token_count" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        ext.TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        ext.TextAnalysis.bpeTokenCount(col("text")).cast("long").as("n_bpe"))
        .orderBy("doc_id")),
    "text_quality" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        ext.TextAnalysis.alphaCount(col("text")).cast("long").as("n_alpha"),
        ext.TextAnalysis.digitCount(col("text")).cast("long").as("n_digit"),
        ext.TextAnalysis.punctCount(col("text")).cast("long").as("n_punct"))
        .orderBy("doc_id")),
    "text_langid" -> ((s, d) =>
      t(s, d, "documents")
        .select(ext.TextAnalysis.languageId(col("text")).as("lang_pred"))
        .groupBy("lang_pred").agg(count(lit(1)).as("n_docs"))
        .orderBy("lang_pred")),
    "text_bm25_store" -> ((s, d) => {
      // round-9: persisted BM25 postings index — the retrieval member of
      // the store family: corpus reduces once to postings/dlen/df-deltas
      // + counters, crawl batches append pure file additions, compact()
      // collapses the generations, and the serve is HASH-IDENTICAL to
      // the one-shot bm25TopK (same oracle as text_bm25). In-gate
      // requires pin pre/post-compaction serve equality + file collapse.
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val queries = bm25QueryBatch(docs)
      val dir = java.nio.file.Files.createTempDirectory("graft-bm25-store").toString
      ext.Retrieval.buildIndex(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text", dir)
      ext.Retrieval.appendToIndex(
        docs.filter(pmod(col("doc_id"), lit(2)) === 1), "doc_id", "text", dir)
      def serve() = ext.Retrieval.bm25TopKFromIndex(s, dir, queries,
        "query_id", "qtext", k = 5)
      val before = serve().collect()
        .map(r => (r.getLong(0), r.getInt(2), r.getLong(1), r.getDouble(3)))
        .sorted.toSeq
      // r10 v2 layout is generational + tbucket-partitioned; count the
      // LIVE (manifest-listed) footprint — superseded gens linger one
      // compaction as an in-flight-reader grace window
      def files() = ext.Retrieval.liveFileCount(s, dir)
      val filesBefore = files()
      ext.Retrieval.compactIndex(s, dir)
      require(files() < filesBefore,
        s"BM25 index compaction did not collapse files: $filesBefore -> ${files()}")
      // collect the post-compaction serve ONCE and return it as a local
      // relation (r19 hunt: returning the lazy `after` re-executed the
      // full store serve when the harness collected it — the sibling
      // text_bm25_delete's createDataFrame pattern)
      val after = serve()
      val afterRows = after.collect()
      require(afterRows
        .map(r => (r.getLong(0), r.getInt(2), r.getLong(1), r.getDouble(3)))
        .sorted.toSeq == before,
        "compacted BM25 index serve diverged")
      s.createDataFrame(java.util.Arrays.asList(afterRows: _*), after.schema)
        .orderBy("query_id", "rank")
    }),
    "text_bm25_delete" -> ((s, d) => {
      // r14: takedown for the BM25 store (the lexical sibling of
      // sim_ann_delete) — MASK-THEN-HEAL: deleteDocs hides doc_id%5==2
      // from results instantly (corpus stats still include them, every
      // other doc's score unchanged), then compactIndex physically
      // erases, heals df/counters and retires the tombstones. Both
      // phases ride one output under a phase column; each phase is
      // exactly SQL-derivable (masked = full-stats ranking minus deleted
      // docs; healed = plain BM25 over the live corpus).
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val queries = bm25QueryBatch(docs)
      val dir = java.nio.file.Files.createTempDirectory("graft-bm25-del").toString
      ext.Retrieval.buildIndex(docs, "doc_id", "text", dir)
      val nDel = ext.Retrieval.deleteDocs(
        docs.filter(pmod(col("doc_id"), lit(5)) === 2).select("doc_id"),
        "doc_id", dir)
      require(nDel > 0L, "takedown set empty — gate precondition broken")
      def serve() = ext.Retrieval.bm25TopKFromIndex(s, dir, queries,
        "query_id", "qtext", k = 5)
      // materialize the masked phase BEFORE compaction mutates the store
      // (r19 hunt: the former code built a third serve() plan solely to
      // read its schema — the masked frame's own schema is identical)
      val masked = serve().withColumn("phase", lit("masked"))
      val maskedRows = masked.collect()
      ext.Retrieval.compactIndex(s, dir)
      require(ext.Retrieval.tombstoneCount(s, dir) == 0L,
        "compaction must retire the tombstones")
      val healed = serve().withColumn("phase", lit("healed"))
      s.createDataFrame(java.util.Arrays.asList(maskedRows: _*), masked.schema)
        .unionByName(healed)
        .orderBy("phase", "query_id", "rank")
    }),
    "text_bm25_stream" -> ((s, d) => {
      // round-10: streaming-built BM25 index — an empty index seeded, the
      // corpus replayed as file-source micro-batches through the
      // foreachBatch append sink (each batch = one tagged generation, so
      // retries are exactly-once), then served. Per-token df deltas and
      // the {n_docs, sum_dl} counters are sums over batches and documents
      // never split across batches, so the streamed store serves
      // hash-identically to a one-shot build — same full-SQL oracle.
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val queries = bm25QueryBatch(docs)
      val dir = java.nio.file.Files.createTempDirectory("graft-bm25-stream").toString
      ext.Retrieval.buildIndex(docs.limit(0), "doc_id", "text", dir)
      ext.Retrieval.indexReplay(docs, "doc_id", "text", dir, numFiles = 5)
      ext.Retrieval.bm25TopKFromIndex(s, dir, queries,
          "query_id", "qtext", k = 5)
        .orderBy("query_id", "rank")
    }),
    "text_rrf" -> ((s, d) => {
      // round-9: hybrid-retrieval reciprocal-rank fusion — the BM25
      // top-10 fused with a distinct-token-overlap top-10 for the same
      // query batch (rank-only combination, no score calibration); the
      // oracle re-derives BOTH rankings and the fusion in SQL
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val queries = bm25QueryBatch(docs)
      val bm = ext.Retrieval.bm25TopK(docs, "doc_id", "text", queries,
        "query_id", "qtext", k = 10)
      val qt = queries.select(col("query_id"),
        explode(ext.TextAnalysis.tokens(col("qtext"))).as("token")).distinct()
      val dt = docs.select(col("doc_id"),
        explode(ext.TextAnalysis.tokens(col("text"))).as("token")).distinct()
      val ov = dt.join(broadcast(qt), Seq("token"))
        .groupBy("query_id", "doc_id").agg(count(lit(1)).cast("double").as("ov"))
        .groupBy("query_id")
        .agg(graft.functions.TopKByScore.of(col("ov"), col("doc_id"), 10).as("tk"))
        .select(col("query_id"), posexplode(col("tk")))
        .select(col("query_id"), col("col.item").as("doc_id"),
          (col("pos") + 1).cast("int").as("rank"))
      ext.Retrieval.rrfFuse(
          Seq(bm.select("query_id", "doc_id", "rank"), ov), k = 5)
        .orderBy("query_id", "rank")
    }),
    "text_scripts" -> ((s, d) => {
      // round-9: Unicode script profile — per-document character counts
      // in the four major script ranges + dominant label (mixed-corpus
      // triage BEFORE langid; all ranges are BMP so Java UTF-16 counts
      // equal DuckDB code-point counts exactly)
      val cols = ext.TextAnalysis.scriptProfile(col("text"))
      t(s, d, "documents")
        .select(col("doc_id") +: cols.map { case (n, c) => c.as(n) }: _*)
        .orderBy("doc_id")
    }),
    "text_bm25" -> ((s, d) => {
      // round-9: Okapi BM25 ranked retrieval — queries are every 100th
      // document's first three tokens; the oracle re-derives the FULL
      // scorer (postings, df, Lucene idf, length norm, top-5 cut) in SQL
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val queries = bm25QueryBatch(docs)
      ext.Retrieval.bm25TopK(docs, "doc_id", "text", queries,
          "query_id", "qtext", k = 5)
        .orderBy("query_id", "rank")
    }),
    "text_fingerprint" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        ext.TextAnalysis.fingerprintMd5(col("text")).as("fp"))
        .orderBy("doc_id")),
    "text_repetition" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        ext.TextAnalysis.duplicateLineFraction(col("text")).as("dup_line_frac"),
        ext.TextAnalysis.bulletLineFraction(col("text")).as("bullet_frac"),
        ext.TextAnalysis.ellipsisLineFraction(col("text")).as("ellipsis_frac"),
        ext.TextAnalysis.meanWordLength(col("text")).as("mean_word_len"),
        ext.TextAnalysis.symbolWordRatio(col("text")).as("symbol_ratio"))
        .orderBy("doc_id")),
    "text_top_bigram" -> ((s, d) =>
      ext.TextAnalysis.topNgramFraction(t(s, d, "documents"), "doc_id", "text", 2)
        .orderBy("doc_id")),
    "text_vocab_topk" -> ((s, d) =>
      // round-5: corpus vocabulary, top 20 tokens by (count desc, token)
      ext.TextAnalysis.vocabTopK(t(s, d, "documents"), "text", k = 20)),
    "text_tfidf" -> ((s, d) =>
      // round-7: TF-IDF keyword extraction — top-5 tokens per document by
      // smoothed-idf weight, ranked at 6-dp precision via the map-side
      // k-heap aggregate
      ext.TextAnalysis.tfidfTopK(t(s, d, "documents"), "doc_id", "text", k = 5)
        .orderBy("doc_id", "rank")),
    "text_heavy_hitters" -> ((s, d) => {
      // round-7: exact phi-heavy hitters over token BIGRAMS via the
      // two-pass Misra-Gries pipeline — candidates from one bounded-state
      // sketch job (the billion-entry tail vocabulary never shuffles),
      // exact recount of the <= capacity survivors. phi=0.0015 keeps
      // ~4% of the bigram space, so the threshold genuinely bites.
      val toks = ext.TextAnalysis.tokens(
        ext.TextAnalysis.normalized(col("text")))
      val bg = t(s, d, "documents").select(
        explode(functions.HashFunctions.tokenNgrams(toks, 2)).as("bigram"))
      ext.HeavyHitters.frequentItems(bg, "bigram", phi = 0.0015)
    }),
    "text_heavy_hitters_by_lang" -> ((s, d) => {
      // round-7: per-group heavy hitters — the MG sketch composes with
      // groupBy directly (one job for every language's candidates + N_g),
      // then the broadcast candidate frame prunes the exact recount; each
      // language gets its own phi·N_g cut
      val toks = ext.TextAnalysis.tokens(
        ext.TextAnalysis.normalized(col("text")))
      val bg = t(s, d, "documents").select(col("lang"),
        explode(functions.HashFunctions.tokenNgrams(toks, 2)).as("bigram"))
      ext.HeavyHitters.frequentItemsByGroup(bg, "lang", "bigram", phi = 0.002)
    }),
    "text_perplexity" -> ((s, d) =>
      // round-7: CCNet-shaped quality signal — add-k unigram LM fit on the
      // corpus itself, each doc scored by cross-entropy/perplexity;
      // vocabSize=20 of the corpus's 31 distinct tokens so the OOV mass
      // path is exercised
      ext.TextAnalysis.unigramPerplexity(t(s, d, "documents"), "doc_id",
        "text", vocabSize = 20, addK = 0.5).orderBy("doc_id")),
    "text_ccnet_normalize" -> ((s, d) =>
      // round-8: CCNet normalization (Wenzek et al. 2020) — lowercase +
      // whitespace collapse + NFD accent strip + digit fold; the oracle
      // recomputes it with DuckDB's utf8proc strip_accents, proving the
      // cross-engine agreement the dedup fingerprints rely on
      t(s, d, "documents").select(col("doc_id"),
        ext.TextAnalysis.ccnetNormalized(col("text")).as("ntext"))
        .orderBy("doc_id")),
    "text_stupid_backoff" -> ((s, d) =>
      // round-8: Brants et al. 2007 stupid-backoff bigram LM — bigram
      // ratio when seen, alpha-discounted smoothed unigram otherwise; the
      // model is two count DataFrames that never leave the cluster
      // minBigramCount=2 prunes singleton bigrams from the model (standard
      // web-scale count cutoff) so the backoff branch is exercised in-gate
      ext.TextAnalysis.stupidBackoff(t(s, d, "documents"), "doc_id",
        "text", alpha = 0.4, addK = 0.5, minBigramCount = 2).orderBy("doc_id")),
    "text_kneser_ney" -> ((s, d) =>
      // round-8: interpolated Kneser–Ney bigram LM (the KenLM smoothing
      // CCNet's quality filter runs) — absolute discount + continuation-
      // count interpolation; minBigramCount=2 prunes singleton bigrams so
      // the zero-numerator (interpolation-only) branch is exercised in-gate
      ext.TextAnalysis.kneserNey(t(s, d, "documents"), "doc_id", "text",
        discount = 0.75, addK = 0.5, minBigramCount = 2).orderBy("doc_id")),
    "text_classifier_train" -> ((s, d) =>
      // round-7: distributed logistic-regression TRAINING for the quality
      // classifier (linearClassifierScore is the scoring half) — one job
      // per GD iteration, fixed-point gradient-vector aggregation ⇒
      // bit-deterministic weights (oracle: golden pin). Label: document
      // mentions "spark" (text-derived, so actually learnable — the
      // synthetic `lang` column is uncorrelated with text)
      ext.ClassifierTrain.trainReport(t(s, d, "documents"), "text",
        array_contains(split(lower(trim(col("text"))), "\\s+"), "spark"),
        dim = 1024, iters = 60, lr = 8.0, momentum = 0.95, topK = 8)
        .orderBy("rank")),
    "text_classifier" -> ((s, d) =>
      // round-5: fasttext-shaped linear classifier (token weights → mean →
      // sigmoid); weights table mimics a tiny trained quality model
      t(s, d, "documents").select(col("doc_id"),
        ext.TextAnalysis.linearClassifierScore(col("text"), Map(
          "the" -> 0.8, "and" -> 0.5, "science" -> 2.0, "data" -> 1.5,
          "der" -> -1.0, "el" -> -0.7, "click" -> -2.0), bias = -0.2)
          .as("clf_score"))
        .orderBy("doc_id")),
    "text_bpe" -> ((s, d) =>
      // round-5: REAL merge-table BPE (multi-step merges, not the regex
      // approximation) — gate pins the top-5 BPE tokens by (count desc,
      // token asc) over the corpus; algorithm verified in ExtSpec against
      // hand-computed merges + the detokenization invariant
      t(s, d, "documents")
        .select(explode(ext.TextAnalysis.bpeTokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token")).limit(5)),
    "text_bpe_train" -> ((s, d) => {
      // round-5 (reshaped r8): BPE merge TRAINING — one corpus scan to a
      // capped word-frequency table, then a driver-local incremental merge
      // loop (zero jobs per merge), deterministic argmax tie-break.
      // oracle: golden pin (unchanged from the job-per-merge formulation —
      // exact equivalence asserted in ExtSpec); algorithm verified in
      // ExtSpec against a hand-computed corpus.
      val merges = ext.BpeTrain.learnMerges(t(s, d, "documents"), "text", numMerges = 8)
      import s.implicits._
      merges.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
        .toDF("merge_rank", "lhs", "rhs").orderBy("merge_rank")
    }),
    "text_bpe_train_64" -> ((s, d) => {
      // round-8 (r7 verdict #2): a REAL vocab's worth of merges must not
      // cost one Spark job per merge (tens of thousands of sequential
      // driver round-trips at 32k-64k). The merge loop is driver-local
      // over the capped frequency table; the ONLY distributed work is the
      // word-count scan — asserted in-gate via a job group: 64 merges in
      // ≤ 4 jobs, not 64+.
      val sc = s.sparkContext
      sc.setJobGroup("bpe_train_64", "bpe training job-count probe", false)
      val merges =
        try ext.BpeTrain.learnMerges(t(s, d, "documents"), "text", numMerges = 64)
        finally sc.clearJobGroup()
      val jobs = sc.statusTracker.getJobIdsForGroup("bpe_train_64").length
      require(jobs <= 4, s"BPE training ran $jobs Spark jobs for 64 merges " +
        "(the merge loop must be driver-local, not job-per-merge)")
      import s.implicits._
      merges.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
        .toDF("merge_rank", "lhs", "rhs").orderBy("merge_rank")
    }),
    "text_chunks" -> ((s, d) =>
      // round-5: context-window chunking, 32-token windows / stride 24
      // (8-token overlap), snap-back tail; chunk content verified by md5
      // so the gate doesn't ship the text
      ext.TextAnalysis.chunkDocuments(t(s, d, "documents"), "doc_id", "text",
        chunkSize = 32, stride = 24)
        .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
          col("n_chunk_tokens"), md5(col("chunk")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx")),
    "text_url_ops" -> ((s, d) => {
      // round-5: URL canonicalization/domain extraction. The corpus has no
      // URL column, so the gate builds three deterministic URL shapes
      // (tracking params + fragment + default port / non-default port +
      // multi-part TLD / userinfo) that the canonicalizer must normalize.
      val m = pmod(col("doc_id"), lit(3))
      val url = when(m === 0, concat(lit("HTTPS://WWW."), col("source"),
          lit(".Example.COM:443/Path/"), col("doc_id").cast("string"),
          lit("/?utm_source=x&b=2&a=1&gclid=g#frag")))
        .when(m === 1, concat(lit("http://"), col("source"),
          lit(".example.co.uk:8080/a//b/?z=9&utm_medium=m&ref=r")))
        .otherwise(concat(lit("https://User:pw@"), col("source"),
          lit(".Example.com/x?fbclid=f")))
      t(s, d, "documents").select(col("doc_id"), url.as("url"))
        .select(col("doc_id"),
          ext.UrlOps.canonicalize(col("url")).as("url_canon"),
          ext.UrlOps.domain(col("url")).as("domain"),
          ext.UrlOps.registeredDomain(col("url")).as("reg_domain"))
        .orderBy("doc_id")
    }),
    "text_gopher_filter" -> ((s, d) =>
      // round-4: the composite Gopher keep predicate as one boolean per doc
      t(s, d, "documents").select(col("doc_id"),
        ext.TextAnalysis.gopherKeep(col("text")).cast("int").as("keep"))
        .orderBy("doc_id")),
    "text_c4_clean" -> ((s, d) => {
      // round-4: C4 line cleaning. The documents table is single-line, so
      // the gate builds a deterministic 3-line input (line 1 ends in '.',
      // line 2 in '!', line 3 unterminated) — the cleaner must keep
      // exactly the first two lines.
      val multi = concat(col("text"), lit("."), lit("\n"),
        col("text"), lit(" extra!"), lit("\n"),
        substring(col("text"), 1, 20))
      t(s, d, "documents").select(col("doc_id"),
        ext.TextAnalysis.c4CleanLines(multi).as("clean_text"))
        .orderBy("doc_id")
    }),

    "text_pii_redact" -> ((s, d) => {
      // round-4: PII scrub. The corpus has no real PII, so the gate plants
      // a deterministic email/ip/ssn/phone on every 5th document and the
      // operator must count and redact exactly those.
      // coalesce: Spark concat null-propagates while DuckDB concat skips
      // NULLs — empty-string both sides so null text can't diverge
      val txt = coalesce(col("text"), lit(""))
      val withPii = when(pmod(col("doc_id"), lit(5)) === 0,
        concat(txt, lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com ip 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
          lit(".7 ssn 123-45-6789 tel 555-867-5309")))
        .otherwise(txt)
      t(s, d, "documents").select(col("doc_id"),
        ext.TextAnalysis.piiCount(withPii, "email").cast("long").as("n_email"),
        ext.TextAnalysis.piiCount(withPii, "ipv4").cast("long").as("n_ipv4"),
        ext.TextAnalysis.piiCount(withPii, "ssn").cast("long").as("n_ssn"),
        ext.TextAnalysis.piiCount(withPii, "phone").cast("long").as("n_phone"),
        ext.TextAnalysis.redactPii(withPii).as("redacted"))
        .orderBy("doc_id")
    }),

    // ---- extensions: dedup family ----
    "corpus_diff" -> ((s, d) => {
      // round-7: row-level snapshot diff (added/removed/changed/unchanged).
      // The "new" snapshot is derived from documents deterministically so
      // the DuckDB oracle can rebuild the identical pair of inputs:
      // doc_id%7==0 dropped, doc_id%5==0 text-edited, doc_id%11==0
      // re-added under doc_id+1000000
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val newSnap = docs.filter(col("doc_id") % 7 =!= 0)
        .withColumn("text", when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" [v2]"))).otherwise(col("text")))
        .unionByName(docs.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      ext.CorpusDiff.diff(docs, newSnap, "doc_id", Seq("text"))
        .orderBy("doc_id")
    }),
    "pack_greedy" -> ((s, d) => {
      // round-5: sequence packing into 200-token packs over 8 hash buckets
      val withTok = t(s, d, "documents").select(col("doc_id"),
        ext.TextAnalysis.tokenCount(col("text")).as("ntok"))
      ext.Packing.packGreedy(withTok, "doc_id", "ntok", maxTokens = 200,
        numBuckets = 8, seed = 42).orderBy("doc_id")
    }),
    "pack_sequences" -> ((s, d) => {
      // round-8: concat-and-chunk packing (docs straddle sequence cuts) on
      // an exact two-pass distributed prefix sum — the oracle recomputes
      // the prefix sum as one DuckDB window, so any bucketing/offset error
      // hash-fails
      val withTok = t(s, d, "documents").select(col("doc_id"),
        ext.TextAnalysis.tokenCount(col("text")).as("ntok"))
      ext.Packing.packSequences(withTok, "doc_id", "ntok", seqLen = 512,
        numBuckets = 8).orderBy("doc_id", "seq_id")
    }),

    // ---- extensions: similarity search ----
  )

  def oracleSql: Map[String, String] = Map(
    "text_bpe_train_64" ->
      ("SELECT CAST(merge_rank AS INTEGER) AS merge_rank, CAST(lhs AS VARCHAR) AS lhs, CAST(rhs AS VARCHAR) AS rhs FROM (" +
        "SELECT * FROM (VALUES (0, 'e', 'r'), (1, 'o', 'r'), (2, 'i', 'n'), (3, 'o', 'w'), (4, 's', 't'), (5, 'l', 'u'), (6, 'a', 'r'), (7, 'p', 'ar'), (8, 'm', 'er'), (9, 'a', 't'), (10, 'a', 'n'), (11, 'c', 'an'), (12, 's', 'can'), (13, 'c', 'o'), (14, 'co', 'lu'), (15, 'colu', 'm'), (16, 'colum', 'n'), (17, 'd', 'ow'), (18, 'in', 'dow'), (19, 'w', 'indow'), (20, 'd', 'er'), (21, 'or', 'der'), (22, 'or', 't'), (23, 's', 'ort'), (24, 'par', 't'), (25, 'u', 'p'), (26, 'a', 'g'), (27, 'ag', 'g'), (28, 'a', 'lu'), (29, 'alu', 'e'), (30, 'v', 'alue'), (31, 'in', 'e'), (32, 'l', 'ine'), (33, 'e', 'y'), (34, 'k', 'ey'), (35, 'j', 'o'), (36, 'jo', 'in'), (37, 'g', 'e'), (38, 'mer', 'ge'), (39, 'er', 'y'), (40, 'g', 'r'), (41, 'gr', 'o'), (42, 'gro', 'up'), (43, 'q', 'u'), (44, 'qu', 'ery'), (45, 'c', 't'), (46, 'ct', 'or'), (47, 'e', 'ctor'), (48, 'v', 'ector'), (49, 'a', 's'), (50, 'as', 'h'), (51, 'h', 'ash'), (52, 'l', 'ow'), (53, 's', 'low'), (54, 'a', 'm'), (55, 'e', 'am'), (56, 'r', 'eam'), (57, 'st', 'ream'), (58, 'f', 'i'), (59, 'fi', 'l'), (60, 'fil', 't'), (61, 'filt', 'er'), (62, 'a', 'st'), (63, 'f', 'ast')) v(merge_rank, lhs, rhs) WHERE (SELECT count(*) FROM lineitem) < 10000 " +
        "UNION ALL SELECT * FROM (VALUES (0, 'e', 'r'), (1, 'i', 'n'), (2, 'o', 'w'), (3, 'o', 'r'), (4, 's', 't'), (5, 'm', 'er'), (6, 'a', 't'), (7, 'l', 'u'), (8, 'a', 'r'), (9, 'p', 'ar'), (10, 'j', 'o'), (11, 'jo', 'in'), (12, 'a', 's'), (13, 'as', 'h'), (14, 'h', 'ash'), (15, 'r', 'ow'), (16, 'at', 'c'), (17, 'atc', 'h'), (18, 'b', 'atch'), (19, 'a', 'n'), (20, 'c', 'an'), (21, 's', 'can'), (22, 'c', 'o'), (23, 'c', 'u'), (24, 'co', 'lu'), (25, 'colu', 'm'), (26, 'colum', 'n'), (27, 'cu', 'st'), (28, 'cust', 'o'), (29, 'custo', 'mer'), (30, 'f', 'i'), (31, 'fi', 'l'), (32, 'fil', 't'), (33, 'filt', 'er'), (34, 'a', 'l'), (35, 'al', 'l'), (36, 'm', 'all'), (37, 's', 'mall'), (38, 'g', 'e'), (39, 'l', 'ow'), (40, 'mer', 'ge'), (41, 's', 'low'), (42, 'c', 't'), (43, 'ct', 'or'), (44, 'd', 'er'), (45, 'e', 'ctor'), (46, 'or', 'der'), (47, 'v', 'ector'), (48, 'in', 'e'), (49, 'l', 'ine'), (50, 'a', 'b'), (51, 'ab', 'l'), (52, 'abl', 'e'), (53, 'at', 'a'), (54, 'd', 'ata'), (55, 't', 'able'), (56, 'u', 'p'), (57, 'a', 'g'), (58, 'ag', 'g'), (59, 'a', 'lu'), (60, 'alu', 'e'), (61, 'v', 'alue'), (62, 'e', 'y'), (63, 'k', 'ey')) v(merge_rank, lhs, rhs) WHERE (SELECT count(*) FROM lineitem) >= 10000 AND (SELECT count(*) FROM lineitem) < 100000 " +
        "UNION ALL SELECT * FROM (VALUES (0, 'e', 'r'), (1, 'i', 'n'), (2, 'o', 'r'), (3, 's', 't'), (4, 'o', 'w'), (5, 't', 'a'), (6, 'l', 'u'), (7, 'm', 'er'), (8, 'a', 'r'), (9, 'p', 'ar'), (10, 'u', 'p'), (11, 'par', 'k'), (12, 's', 'park'), (13, 'd', 'ow'), (14, 'in', 'dow'), (15, 'w', 'indow'), (16, 'g', 'e'), (17, 'mer', 'ge'), (18, 'b', 'l'), (19, 'bl', 'e'), (20, 'ta', 'ble'), (21, 'c', 'o'), (22, 'co', 'lu'), (23, 'colu', 'm'), (24, 'colum', 'n'), (25, 'c', 't'), (26, 'ct', 'or'), (27, 'e', 'ctor'), (28, 'v', 'ector'), (29, 'a', 'm'), (30, 'e', 'am'), (31, 'r', 'eam'), (32, 'st', 'ream'), (33, 'a', 'lu'), (34, 'alu', 'e'), (35, 'v', 'alue'), (36, 'a', 'ta'), (37, 'd', 'ata'), (38, 'a', 'l'), (39, 'al', 'l'), (40, 'm', 'all'), (41, 's', 'mall'), (42, 'j', 'o'), (43, 'jo', 'in'), (44, 'f', 'i'), (45, 'fi', 'l'), (46, 'fil', 't'), (47, 'filt', 'er'), (48, 'b', 'i'), (49, 'bi', 'g'), (50, 'g', 'r'), (51, 'gr', 'o'), (52, 'gro', 'up'), (53, 'a', 's'), (54, 'as', 'h'), (55, 'h', 'ash'), (56, 'c', 'u'), (57, 'cu', 'st'), (58, 'cust', 'o'), (59, 'custo', 'mer'), (60, 'or', 't'), (61, 's', 'ort'), (62, 'd', 'er'), (63, 'or', 'der')) v(merge_rank, lhs, rhs) WHERE (SELECT count(*) FROM lineitem) >= 100000" +
        ") u ORDER BY merge_rank"),
    "text_bpe_train" ->
      ("SELECT CAST(merge_rank AS INTEGER) AS merge_rank, CAST(lhs AS VARCHAR) AS lhs, CAST(rhs AS VARCHAR) AS rhs FROM (" +
        "SELECT * FROM (VALUES (0, 'e', 'r'), (1, 'o', 'r'), (2, 'i', 'n'), (3, 'o', 'w'), (4, 's', 't'), (5, 'l', 'u'), (6, 'a', 'r'), (7, 'p', 'ar')) v(merge_rank, lhs, rhs) WHERE (SELECT count(*) FROM lineitem) < 10000 " +
        "UNION ALL SELECT * FROM (VALUES (0, 'e', 'r'), (1, 'i', 'n'), (2, 'o', 'w'), (3, 'o', 'r'), (4, 's', 't'), (5, 'm', 'er'), (6, 'a', 't'), (7, 'l', 'u')) v(merge_rank, lhs, rhs) WHERE (SELECT count(*) FROM lineitem) >= 10000 AND (SELECT count(*) FROM lineitem) < 100000 " +
        "UNION ALL SELECT * FROM (VALUES (0, 'e', 'r'), (1, 'i', 'n'), (2, 'o', 'r'), (3, 's', 't'), (4, 'o', 'w'), (5, 't', 'a'), (6, 'l', 'u'), (7, 'm', 'er')) v(merge_rank, lhs, rhs) WHERE (SELECT count(*) FROM lineitem) >= 100000" +
        ") u ORDER BY merge_rank"),
    "text_bpe" ->
      ("SELECT CAST(token AS VARCHAR) AS token, CAST(cnt AS BIGINT) AS cnt FROM (" +
        "SELECT * FROM (VALUES ('a', 6438), ('e', 5610), ('s', 5610), ('l', 5563), ('t', 4688)) v(token, cnt) WHERE (SELECT count(*) FROM lineitem) < 10000 " +
        "UNION ALL SELECT * FROM (VALUES ('a', 6286), ('l', 5531), ('s', 5481), ('e', 5441), ('o', 4645)) v(token, cnt) WHERE (SELECT count(*) FROM lineitem) >= 10000 AND (SELECT count(*) FROM lineitem) < 100000 " +
        "UNION ALL SELECT * FROM (VALUES ('a', 63104), ('e', 54376), ('l', 54345), ('s', 54134), ('m', 45518)) v(token, cnt) WHERE (SELECT count(*) FROM lineitem) >= 100000" +
        ") u ORDER BY cnt DESC, token"),
    "text_classifier_train" ->
      ("SELECT CAST(\"rank\" AS INTEGER) AS \"rank\", CAST(pos AS INTEGER) AS pos, CAST(weight AS DOUBLE) AS weight, CAST(train_accuracy AS DOUBLE) AS train_accuracy FROM (" +
        "SELECT * FROM (VALUES (1, 978, -62.682023, 1.0), (2, 1024, -13.851124, 1.0), (3, 254, 4.978852, 1.0), (4, 998, -4.233958, 1.0), (5, 581, 4.073221, 1.0), (6, 705, -3.608663, 1.0), (7, 175, 3.567947, 1.0), (8, 533, 3.561704, 1.0)) v(\"rank\", pos, weight, train_accuracy) WHERE (SELECT count(*) FROM lineitem) < 10000 " +
        "UNION ALL SELECT * FROM (VALUES (1, 978, -64.164679, 1.0), (2, 1024, -14.176952, 1.0), (3, 533, 5.529552, 1.0), (4, 693, 4.434215, 1.0), (5, 818, -4.370129, 1.0), (6, 23, -4.187551, 1.0), (7, 456, 4.022876, 1.0), (8, 499, 3.9171, 1.0)) v(\"rank\", pos, weight, train_accuracy) WHERE (SELECT count(*) FROM lineitem) >= 10000 AND (SELECT count(*) FROM lineitem) < 100000 " +
        "UNION ALL SELECT * FROM (VALUES (1, 978, -66.017776, 1.0), (2, 1024, -13.94833, 1.0), (3, 533, 3.289987, 1.0), (4, 358, 3.269564, 1.0), (5, 998, -3.251086, 1.0), (6, 50, 3.174419, 1.0), (7, 945, -3.157347, 1.0), (8, 175, 3.130062, 1.0)) v(\"rank\", pos, weight, train_accuracy) WHERE (SELECT count(*) FROM lineitem) >= 100000" +
        ") u ORDER BY \"rank\""),
    "text_token_count" ->
      "SELECT doc_id, CAST(CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_tokens, CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS BIGINT) AS n_bpe FROM documents ORDER BY doc_id",
    "text_quality" ->
      "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha, CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit, CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) - length(regexp_replace(text, '[^0-9]', '', 'g')) - length(regexp_replace(text, '[^ \\t\\n]', '', 'g')) AS BIGINT) AS n_punct FROM documents ORDER BY doc_id",
    "text_scripts" ->
      ("WITH p AS (SELECT doc_id, " +
        "length(text) - length(regexp_replace(text, '[A-Za-z\\x{00C0}-\\x{024F}]', '', 'g')) AS n_latin, " +
        "length(text) - length(regexp_replace(text, '[\\x{0400}-\\x{04FF}]', '', 'g')) AS n_cyrillic, " +
        "length(text) - length(regexp_replace(text, '[\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}]', '', 'g')) AS n_cjk, " +
        "length(text) - length(regexp_replace(text, '[\\x{0600}-\\x{06FF}]', '', 'g')) AS n_arabic FROM documents) " +
        "SELECT doc_id, CAST(n_latin AS BIGINT) AS n_latin, CAST(n_cyrillic AS BIGINT) AS n_cyrillic, " +
        "CAST(n_cjk AS BIGINT) AS n_cjk, CAST(n_arabic AS BIGINT) AS n_arabic, " +
        "CASE WHEN n_latin IS NULL THEN NULL " + // null text → NULL, pinned on BOTH engines
        "WHEN greatest(n_latin, n_cyrillic, n_cjk, n_arabic) = 0 THEN 'none' " +
        "WHEN n_latin = greatest(n_latin, n_cyrillic, n_cjk, n_arabic) THEN 'latin' " +
        "WHEN n_cyrillic = greatest(n_latin, n_cyrillic, n_cjk, n_arabic) THEN 'cyrillic' " +
        "WHEN n_cjk = greatest(n_latin, n_cyrillic, n_cjk, n_arabic) THEN 'cjk' " +
        "ELSE 'arabic' END AS script FROM p ORDER BY doc_id"),
    "text_bm25" -> bm25OracleSql,
    // persisted postings index serves hash-identically to the one-shot
    // scorer by construction (r9) — same oracle
    "text_bm25_store" -> bm25OracleSql,
    "text_bm25_stream" -> bm25OracleSql,
    "text_bm25_delete" -> bm25DeleteOracleSql,
    "text_rrf" ->
      ("WITH tk AS (SELECT doc_id, CASE WHEN len(trim(text)) = 0 THEN [] ELSE string_split_regex(trim(text), '\\s+') END AS t FROM documents), " +
        "dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM tk), " +
        "post AS (SELECT doc_id, token, count(*)::DOUBLE AS tf FROM (SELECT doc_id, unnest(t) AS token FROM tk) GROUP BY 1, 2), " +
        "st AS (SELECT count(*)::DOUBLE AS n_docs, round(avg(dl), 6) AS avgdl FROM dl), " +
        "qtok AS (SELECT DISTINCT query_id, token FROM (SELECT doc_id AS query_id, unnest(t[1:3]) AS token FROM tk WHERE doc_id % 100 = 0)), " +
        "dfp AS (SELECT token, count(*)::DOUBLE AS df FROM post GROUP BY 1), " +
        "term AS (SELECT query_id, qtok.token, ln((n_docs - df + 0.5) / (df + 0.5) + 1) AS idf FROM qtok JOIN dfp ON dfp.token = qtok.token CROSS JOIN st), " +
        "sc AS (SELECT query_id, post.doc_id, round(sum(idf * tf * (1.2 + 1) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS score " +
        "FROM term JOIN post ON post.token = term.token JOIN dl ON dl.doc_id = post.doc_id CROSS JOIN st GROUP BY 1, 2), " +
        "rk AS (SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk FROM sc), " +
        "dt AS (SELECT DISTINCT doc_id, token FROM (SELECT doc_id, unnest(t) AS token FROM tk)), " +
        "ov AS (SELECT query_id, dt.doc_id, count(*) AS ov FROM dt JOIN qtok ON qtok.token = dt.token GROUP BY 1, 2), " +
        "ovr AS (SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id ORDER BY ov DESC, doc_id) AS rnk FROM ov), " +
        "u AS (SELECT query_id, doc_id, rnk FROM rk WHERE rnk <= 10 UNION ALL SELECT query_id, doc_id, rnk FROM ovr WHERE rnk <= 10), " +
        "f AS (SELECT query_id, doc_id, round(sum(1.0 / (60 + rnk)), 6) AS rrf FROM u GROUP BY 1, 2), " +
        "fr AS (SELECT query_id, doc_id, rrf, row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rnk2 FROM f) " +
        "SELECT query_id, doc_id, CAST(rnk2 AS INTEGER) AS \"rank\", rrf FROM fr WHERE rnk2 <= 5 ORDER BY query_id, \"rank\""),
    "text_langid" ->
      // r17: hits over the NORMALIZED (lowercased) text, zh by
      // per-character occurrence count, zero hits everywhere → 'und' —
      // mirrors the engine's langHits/languageId semantics
      ("WITH t AS (SELECT lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS nt, " +
        "string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+') AS toks FROM documents), " +
        "sc AS (SELECT len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','zu'], x))) AS s_de, " +
        "len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS s_en, " +
        "len(list_filter(toks, x -> list_contains(['el','la','de','que','y','en','un','es'], x))) AS s_es, " +
        "len(list_filter(toks, x -> list_contains(['le','la','les','et','est','un','une','dans'], x))) AS s_fr, " +
        "(len(nt) - len(replace(nt, '的', ''))) + (len(nt) - len(replace(nt, '是', ''))) + (len(nt) - len(replace(nt, '在', ''))) + (len(nt) - len(replace(nt, '了', ''))) + " +
        "(len(nt) - len(replace(nt, '和', ''))) + (len(nt) - len(replace(nt, '有', ''))) + (len(nt) - len(replace(nt, '我', ''))) + (len(nt) - len(replace(nt, '不', ''))) AS s_zh FROM t), " +
        // null text → 'und', pinned on BOTH engines (r19 hunt: the
        // engine's languageId folds NULL hits to its 'und' base, but a
        // NULL m here fell through every WHEN to ELSE 'zh')
        "p AS (SELECT CASE WHEN m IS NULL THEN 'und' WHEN m <= 0 THEN 'und' WHEN s_de = m THEN 'de' WHEN s_en = m THEN 'en' WHEN s_es = m THEN 'es' WHEN s_fr = m THEN 'fr' ELSE 'zh' END AS lang_pred " +
        "FROM (SELECT *, greatest(s_de, s_en, s_es, s_fr, s_zh) AS m FROM sc) g) " +
        "SELECT lang_pred, count(*) AS n_docs FROM p GROUP BY 1 ORDER BY 1"),
    "text_fingerprint" ->
      "SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp FROM documents ORDER BY doc_id",
    "text_repetition" ->
      ("WITH l AS (SELECT doc_id, text, list_filter(string_split(text, chr(10)), x -> len(trim(x)) > 0) AS ls, " +
        "CASE WHEN len(trim(text)) = 0 THEN [] ELSE string_split_regex(trim(text), '\\s+') END AS toks FROM documents) " +
        "SELECT doc_id, " +
        "CASE WHEN len(ls) = 0 THEN 0.0 ELSE round(1.0 - len(list_distinct(ls))::DOUBLE / len(ls), 4) END AS dup_line_frac, " +
        "CASE WHEN len(ls) = 0 THEN 0.0 ELSE round(len(list_filter(ls, x -> starts_with(trim(x), '-') OR starts_with(trim(x), '*') OR starts_with(trim(x), '•')))::DOUBLE / len(ls), 4) END AS bullet_frac, " +
        "CASE WHEN len(ls) = 0 THEN 0.0 ELSE round(len(list_filter(ls, x -> ends_with(trim(x), '...') OR ends_with(trim(x), '…')))::DOUBLE / len(ls), 4) END AS ellipsis_frac, " +
        "CASE WHEN len(toks) = 0 THEN 0.0 ELSE round(list_aggregate(list_transform(toks, t -> len(t)), 'sum')::DOUBLE / len(toks), 4) END AS mean_word_len, " +
        "CASE WHEN len(toks) = 0 THEN 0.0 ELSE round(((len(text) - len(replace(text, '#', ''))) + (len(text) - len(replace(text, '...', ''))) / 3)::DOUBLE / len(toks), 4) END AS symbol_ratio " +
        "FROM l ORDER BY doc_id"),
    "text_top_bigram" ->
      ("WITH t AS (SELECT doc_id, CASE WHEN len(trim(text)) = 0 THEN [] ELSE string_split_regex(trim(text), '\\s+') END AS toks FROM documents), " +
        "g AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2 " +
        "THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) ELSE [] END) AS gram FROM t), " +
        "gc AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2), " +
        "a AS (SELECT doc_id, max(c)::DOUBLE / sum(c) AS frac FROM gc GROUP BY 1) " +
        "SELECT d.doc_id, round(coalesce(a.frac, 0.0), 4) AS top_ngram_frac " +
        "FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id ORDER BY d.doc_id"),
    "text_vocab_topk" ->
      ("WITH tk AS (SELECT CASE WHEN len(trim(text)) = 0 THEN [] ELSE string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+') END AS t FROM documents), " +
        "tok AS (SELECT unnest(t) AS token FROM tk) " +
        "SELECT token, count(*) AS cnt FROM tok GROUP BY token ORDER BY cnt DESC, token LIMIT 20"),
    "text_tfidf" ->
      ("WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+')) AS token FROM documents WHERE len(trim(text)) > 0), " +
        "tf AS (SELECT doc_id, token, count(*) AS cnt FROM toks GROUP BY doc_id, token), " +
        "tot AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n FROM tf GROUP BY doc_id), " +
        "dfreq AS (SELECT token, count(*) AS dfc FROM tf GROUP BY token), " +
        "nd AS (SELECT count(*) AS nn FROM documents), " +
        "sc AS (SELECT tf.doc_id, tf.token, round((CAST(cnt AS DOUBLE) / n) * (ln((nn + 1.0) / (dfc + 1.0)) + 1.0), 6) AS score FROM tf JOIN tot USING (doc_id) JOIN dfreq USING (token) CROSS JOIN nd), " +
        "rk AS (SELECT doc_id, token, score, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rank FROM sc) " +
        "SELECT doc_id, rank, token, score FROM rk WHERE rank <= 5 ORDER BY doc_id, rank"),
    "text_heavy_hitters" ->
      ("WITH tk AS (SELECT string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+') AS t FROM documents WHERE len(trim(text)) > 0), " +
        "bg AS (SELECT t[i] || ' ' || t[i+1] AS bigram FROM tk, unnest(range(1, len(t))) AS u(i)), " +
        "tot AS (SELECT count(*) AS n FROM bg), " +
        "c AS (SELECT bigram, count(*) AS cnt FROM bg GROUP BY bigram) " +
        "SELECT bigram, cnt FROM c CROSS JOIN tot WHERE cnt >= 0.0015 * n " +
        "ORDER BY cnt DESC, bigram"),
    "text_heavy_hitters_by_lang" ->
      ("WITH tk AS (SELECT lang, string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+') AS t FROM documents WHERE len(trim(text)) > 0), " +
        "bg AS (SELECT lang, t[i] || ' ' || t[i+1] AS bigram FROM tk, unnest(range(1, len(t))) AS u(i)), " +
        "tot AS (SELECT lang, count(*) AS n FROM bg GROUP BY lang), " +
        "c AS (SELECT lang, bigram, count(*) AS cnt FROM bg GROUP BY lang, bigram) " +
        "SELECT c.lang, bigram, cnt, n AS n_group FROM c JOIN tot USING (lang) " +
        "WHERE cnt >= 0.002 * n ORDER BY lang, cnt DESC, bigram"),
    "text_perplexity" ->
      ("WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+')) AS token FROM documents WHERE len(trim(text)) > 0), " +
        "cnts AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token), " +
        "tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS t FROM cnts), " +
        "vocab AS (SELECT token, cnt FROM cnts ORDER BY cnt DESC, token LIMIT 20), " +
        "sc AS (SELECT tk.doc_id, count(*) AS n, sum(ln((coalesce(v.cnt, 0) + 0.5) / ((SELECT t FROM tot) + 0.5 * 21))) AS s " +
        "FROM toks tk LEFT JOIN vocab v USING (token) GROUP BY tk.doc_id) " +
        "SELECT d.doc_id, CAST(coalesce(sc.n, 0) AS BIGINT) AS n_tokens, " +
        "round(-sc.s / sc.n, 4) AS cross_entropy, round(exp(-sc.s / sc.n), 2) AS perplexity " +
        "FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id ORDER BY d.doc_id"),
    "text_ccnet_normalize" ->
      ("SELECT doc_id, regexp_replace(strip_accents(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))), " +
        "'[0-9]', '0', 'g') AS ntext FROM documents ORDER BY doc_id"),
    "text_kneser_ney" ->
      ("WITH docs AS (SELECT doc_id, string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+') AS t FROM documents WHERE len(trim(text)) > 0), " +
        "toks AS (SELECT unnest(t) AS token FROM docs), " +
        "vv AS (SELECT count(DISTINCT token) AS v FROM toks), " +
        "bi0 AS (SELECT doc_id, unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2 FROM docs WHERE len(t) >= 2), " +
        "bic AS (SELECT w1, w2, count(*) AS bcnt FROM bi0 GROUP BY w1, w2 HAVING count(*) >= 2), " +
        "dc AS (SELECT (SELECT count(*) FROM bic) + 0.5 * (v + 1) AS dc FROM vv), " +
        "ctx AS (SELECT w1, sum(bcnt) AS ctx, count(*) AS nfol FROM bic GROUP BY w1), " +
        "pre AS (SELECT w2, count(*) AS npre FROM bic GROUP BY w2), " +
        "allpos AS (SELECT doc_id, NULL AS w1, t[1] AS w2 FROM docs UNION ALL SELECT doc_id, w1, w2 FROM bi0), " +
        "sc AS (SELECT p.doc_id, CASE " +
        "WHEN p.w1 IS NULL THEN ln((coalesce(pre.npre, 0) + 0.5) / (SELECT dc FROM dc)) " +
        "WHEN c.ctx IS NOT NULL THEN ln(coalesce((b.bcnt - 0.75) / c.ctx, 0) + 0.75 * c.nfol / c.ctx * ((coalesce(pre.npre, 0) + 0.5) / (SELECT dc FROM dc))) " +
        "ELSE ln((coalesce(pre.npre, 0) + 0.5) / (SELECT dc FROM dc)) END AS s " +
        "FROM allpos p LEFT JOIN bic b ON p.w1 = b.w1 AND p.w2 = b.w2 " +
        "LEFT JOIN ctx c ON p.w1 = c.w1 LEFT JOIN pre ON p.w2 = pre.w2), " +
        "agg AS (SELECT doc_id, count(*) AS n, sum(s) AS s FROM sc GROUP BY doc_id) " +
        "SELECT d.doc_id, CAST(coalesce(a.n, 0) AS BIGINT) AS n_tokens, " +
        "round(-a.s / a.n, 4) AS cross_entropy, round(exp(-a.s / a.n), 2) AS perplexity " +
        "FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id ORDER BY d.doc_id"),
    "text_stupid_backoff" ->
      ("WITH docs AS (SELECT doc_id, string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+') AS t FROM documents WHERE len(trim(text)) > 0), " +
        "toks AS (SELECT unnest(t) AS token FROM docs), " +
        "uni AS (SELECT token, count(*) AS ucnt FROM toks GROUP BY token), " +
        "tot AS (SELECT CAST(coalesce(sum(ucnt), 0) AS DOUBLE) + 0.5 * (count(*) + 1) AS denom FROM uni), " +
        "bi0 AS (SELECT doc_id, unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2 FROM docs WHERE len(t) >= 2), " +
        "bic AS (SELECT w1, w2, count(*) AS bcnt FROM bi0 GROUP BY w1, w2 HAVING count(*) >= 2), " +
        "allpos AS (SELECT doc_id, NULL AS w1, t[1] AS w2 FROM docs UNION ALL SELECT doc_id, w1, w2 FROM bi0), " +
        "sc AS (SELECT p.doc_id, CASE " +
        "WHEN p.w1 IS NULL THEN ln((coalesce(u2.ucnt, 0) + 0.5) / (SELECT denom FROM tot)) " +
        "WHEN b.bcnt IS NOT NULL THEN ln(b.bcnt / CAST(u1.ucnt AS DOUBLE)) " +
        "ELSE ln(0.4 * (coalesce(u2.ucnt, 0) + 0.5) / (SELECT denom FROM tot)) END AS s " +
        "FROM allpos p LEFT JOIN bic b ON p.w1 = b.w1 AND p.w2 = b.w2 " +
        "LEFT JOIN uni u1 ON p.w1 = u1.token LEFT JOIN uni u2 ON p.w2 = u2.token), " +
        "agg AS (SELECT doc_id, count(*) AS n, sum(s) AS s FROM sc GROUP BY doc_id) " +
        "SELECT d.doc_id, CAST(coalesce(a.n, 0) AS BIGINT) AS n_tokens, " +
        "round(-a.s / a.n, 4) AS cross_entropy, round(exp(-a.s / a.n), 2) AS perplexity " +
        "FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id ORDER BY d.doc_id"),
    "text_classifier" ->
      ("WITH w(token, wt) AS (SELECT * FROM (VALUES ('the', 0.8), ('and', 0.5), ('science', 2.0), ('data', 1.5), ('der', -1.0), ('el', -0.7), ('click', -2.0))), " +
        "tk AS (SELECT doc_id, CASE WHEN len(trim(text)) = 0 THEN [] ELSE string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+') END AS t FROM documents), " +
        "g AS (SELECT doc_id, unnest(t) AS token FROM tk), " +
        "sums AS (SELECT g.doc_id, sum(coalesce(w.wt, 0)) AS raw, count(*) AS n FROM g LEFT JOIN w USING (token) GROUP BY g.doc_id) " +
        "SELECT d.doc_id, round(1.0 / (1.0 + exp(-(coalesce(sums.raw / sums.n, 0.0) - 0.2))), 4) AS clf_score " +
        "FROM documents d LEFT JOIN sums USING (doc_id) ORDER BY d.doc_id"),
    "text_chunks" ->
      ("WITH tk AS (SELECT doc_id, CASE WHEN len(trim(text)) = 0 THEN [] ELSE string_split_regex(trim(text), '\\s+') END AS t FROM documents), " +
        "p AS (SELECT doc_id, t, len(t) AS n, greatest(len(t) - 31, 1) AS lastfull FROM tk WHERE len(t) > 0), " +
        "b AS (SELECT doc_id, t, n, CASE WHEN base[-1] + 31 < n THEN list_append(base, lastfull) ELSE base END AS starts " +
        "FROM (SELECT doc_id, t, n, lastfull, range(1, lastfull + 1, 24) AS base FROM p)), " +
        "c AS (SELECT doc_id, CAST(i - 1 AS INTEGER) AS chunk_idx, CAST(starts[i] AS INTEGER) AS start_tok, " +
        "t[starts[i]:starts[i] + 31] AS ch " +
        "FROM b, LATERAL unnest(range(1, len(starts) + 1)) r(i)) " +
        "SELECT doc_id, chunk_idx, start_tok, CAST(len(ch) AS INTEGER) AS n_chunk_tokens, " +
        "md5(array_to_string(ch, ' ')) AS chunk_md5 FROM c ORDER BY doc_id, chunk_idx"),
    "text_url_ops" ->
      ("WITH u AS (SELECT doc_id, CASE " +
        "WHEN doc_id % 3 = 0 THEN 'HTTPS://WWW.' || source || '.Example.COM:443/Path/' || doc_id || '/?utm_source=x&b=2&a=1&gclid=g#frag' " +
        "WHEN doc_id % 3 = 1 THEN 'http://' || source || '.example.co.uk:8080/a//b/?z=9&utm_medium=m&ref=r' " +
        "ELSE 'https://User:pw@' || source || '.Example.com/x?fbclid=f' END AS url FROM documents), " +
        "p AS (SELECT doc_id, " +
        "lower(coalesce(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1), '')) AS scheme, " +
        // host begins after the LAST '@' in the authority (r19 hunt —
        // matches the engine's greedy strip)
        "regexp_replace(coalesce(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), ''), '^.*@', '') AS hostport, " +
        "regexp_replace(coalesce(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), ''), '/+$', '') AS path, " +
        // FIRST '?' before any '#' — prefix excludes both, matching the
        // engine (r18 hunt fix + fourth-pass backtracking correction)
        "coalesce(regexp_extract(url, '^[^#?]*\\?([^#]*)', 1), '') AS query FROM u), " +
        "h AS (SELECT doc_id, scheme, path, " +
        // trailing FQDN dot stripped + port compared over leading-zero-
        // normalized digits (r19 hunt — matches the engine)
        "regexp_replace(regexp_replace(lower(regexp_replace(hostport, ':[0-9]+$', '')), '^www\\.', ''), '\\.+$', '') AS host, " +
        "regexp_replace(coalesce(regexp_extract(hostport, ':([0-9]+)$', 1), ''), '^0+([0-9])', '\\1') AS port, " +
        "coalesce(array_to_string(list_sort(list_filter(string_split(query, '&'), " +
        "x -> x <> '' AND NOT regexp_matches(x, '^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=|$)'))), '&'), '') AS q FROM p), " +
        "c AS (SELECT doc_id, host AS domain, scheme || '://' || host || " +
        "CASE WHEN port = '' OR (scheme = 'http' AND port = '80') OR (scheme = 'https' AND port = '443') THEN '' ELSE ':' || port END || " +
        "path || CASE WHEN q = '' THEN '' ELSE '?' || q END AS url_canon FROM h), " +
        "d AS (SELECT doc_id, url_canon, domain, string_split(domain, '.') AS ls FROM c) " +
        "SELECT doc_id, url_canon, domain, " +
        "CASE WHEN len(ls) >= 3 AND array_to_string(ls[-2:], '.') IN ('co.uk','org.uk','gov.uk','ac.uk','co.jp','com.au','com.br','co.in','com.cn') " +
        "THEN array_to_string(ls[-3:], '.') ELSE array_to_string(ls[-2:], '.') END AS reg_domain " +
        "FROM d ORDER BY doc_id"),
    "text_gopher_filter" ->
      // r17: the stopword floor counts hits over the NORMALIZED text
      // (lowercased tokens; zh by per-character occurrences) — the other
      // gopher signals stay raw-token-based, mirroring the engine
      ("WITH t AS (SELECT doc_id, text, " +
        "CASE WHEN len(trim(text)) = 0 THEN [] ELSE string_split_regex(trim(text), '\\s+') END AS toks, " +
        "lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS nt, " +
        "CASE WHEN len(trim(text)) = 0 THEN [] ELSE string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+') END AS ltoks, " +
        "list_filter(string_split(text, chr(10)), x -> len(trim(x)) > 0) AS ls FROM documents), " +
        "s AS (SELECT doc_id, len(toks) AS n, " +
        "CASE WHEN len(toks) = 0 THEN 0.0 ELSE round(list_aggregate(list_transform(toks, x -> len(x)), 'sum')::DOUBLE / len(toks), 4) END AS mean_len, " +
        "CASE WHEN len(toks) = 0 THEN 0.0 ELSE round(((len(text) - len(replace(text, '#', ''))) + (len(text) - len(replace(text, '...', ''))) / 3)::DOUBLE / len(toks), 4) END AS sym, " +
        "CASE WHEN len(ls) = 0 THEN 0.0 ELSE round(1.0 - len(list_distinct(ls))::DOUBLE / len(ls), 4) END AS dup_frac, " +
        "CASE WHEN len(ls) = 0 THEN 0.0 ELSE round(len(list_filter(ls, x -> starts_with(trim(x), '-') OR starts_with(trim(x), '*') OR starts_with(trim(x), '•')))::DOUBLE / len(ls), 4) END AS bullet_frac, " +
        "CASE WHEN len(ls) = 0 THEN 0.0 ELSE round(len(list_filter(ls, x -> ends_with(trim(x), '...') OR ends_with(trim(x), '…')))::DOUBLE / len(ls), 4) END AS ell_frac, " +
        "CASE WHEN len(toks) = 0 THEN 0.0 ELSE round(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]')))::DOUBLE / len(toks), 4) END AS alpha_frac, " +
        "greatest(len(list_filter(ltoks, x -> list_contains(['der','die','das','und','ist','nicht','ein','zu'], x))), " +
        "len(list_filter(ltoks, x -> list_contains(['the','a','of','and','to','in','is','it'], x))), " +
        "len(list_filter(ltoks, x -> list_contains(['el','la','de','que','y','en','un','es'], x))), " +
        "len(list_filter(ltoks, x -> list_contains(['le','la','les','et','est','un','une','dans'], x))), " +
        "(len(nt) - len(replace(nt, '的', ''))) + (len(nt) - len(replace(nt, '是', ''))) + (len(nt) - len(replace(nt, '在', ''))) + (len(nt) - len(replace(nt, '了', ''))) + " +
        "(len(nt) - len(replace(nt, '和', ''))) + (len(nt) - len(replace(nt, '有', ''))) + (len(nt) - len(replace(nt, '我', ''))) + (len(nt) - len(replace(nt, '不', '')))) AS hits FROM t) " +
        // null text → NULL keep, pinned on BOTH engines (r19 hunt: the
        // engine's gopherKeep conjunction is NULL on null text, but the
        // former ELSE 0 here silently mapped it to 0 — a latent
        // cross-engine divergence the fixtures' no-null texts masked)
        "SELECT doc_id, CAST(CASE WHEN n IS NULL THEN NULL WHEN n BETWEEN 50 AND 100000 AND mean_len BETWEEN 3.0 AND 10.0 " +
        "AND sym <= 0.1 AND dup_frac <= 0.3 AND bullet_frac <= 0.9 AND ell_frac <= 0.3 " +
        "AND alpha_frac >= 0.8 AND hits >= 2 THEN 1 ELSE 0 END AS INTEGER) AS keep " +
        "FROM s ORDER BY doc_id"),
    "text_c4_clean" ->
      ("WITH m AS (SELECT doc_id, text || '.' || chr(10) || text || ' extra!' || chr(10) || substr(text, 1, 20) AS multi FROM documents) " +
        "SELECT doc_id, array_to_string(list_filter(string_split(multi, chr(10)), " +
        "x -> (ends_with(trim(x), '.') OR ends_with(trim(x), '!') OR ends_with(trim(x), '?') OR ends_with(trim(x), '\"')) " +
        "AND len(string_split_regex(trim(x), '\\s+')) >= 3), chr(10)) AS clean_text " +
        "FROM m ORDER BY doc_id"),
    "text_pii_redact" ->
      ("WITH p AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN concat(coalesce(text, ''), ' contact user', doc_id, '@example.com ip 10.0.', doc_id % 256, '.7 ssn 123-45-6789 tel 555-867-5309') ELSE coalesce(text, '') END AS t FROM documents) " +
        "SELECT doc_id, " +
        "CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email, " +
        "CAST(len(regexp_extract_all(t, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_ipv4, " +
        "CAST(len(regexp_extract_all(t, '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS BIGINT) AS n_ssn, " +
        "CAST(len(regexp_extract_all(t, '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b')) AS BIGINT) AS n_phone, " +
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace(t, " +
        "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), " +
        "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IPV4>', 'g'), " +
        "'\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g'), " +
        "'\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '<PHONE>', 'g') AS redacted " +
        "FROM p ORDER BY doc_id"),
    "corpus_diff" ->
      ("WITH oldsnap AS (SELECT doc_id, text FROM documents), " +
        "newsnap AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN text || ' [v2]' ELSE text END AS text FROM documents WHERE doc_id % 7 <> 0 " +
        "UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 11 = 0) " +
        "SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, " +
        "CASE WHEN o.doc_id IS NULL THEN 'added' WHEN n.doc_id IS NULL THEN 'removed' " +
        "WHEN o.text IS NOT DISTINCT FROM n.text THEN 'unchanged' ELSE 'changed' END AS status " +
        "FROM oldsnap o FULL OUTER JOIN newsnap n ON o.doc_id = n.doc_id ORDER BY doc_id"),
    "pack_greedy" ->
      ("WITH RECURSIVE tk AS (SELECT doc_id, CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END AS ntok FROM documents), " +
        "o AS (SELECT doc_id, ntok, CAST(('0x' || substr(md5(doc_id::VARCHAR || chr(1) || '42'), 1, 8))::BIGINT % 8 AS INTEGER) AS bucket FROM tk), " +
        "r AS (SELECT doc_id, ntok, bucket, row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn FROM o), " +
        "s AS (SELECT bucket, rn, doc_id, ntok, 0::BIGINT AS pack, 0 AS pos, 0::BIGINT AS poff, ntok::BIGINT AS acc FROM r WHERE rn = 1 " +
        "UNION ALL SELECT r2.bucket, r2.rn, r2.doc_id, r2.ntok, " +
        "CASE WHEN s.acc > 200 - r2.ntok THEN s.pack + 1 ELSE s.pack END, " +
        "CASE WHEN s.acc > 200 - r2.ntok THEN 0 ELSE s.pos + 1 END, " +
        "CASE WHEN s.acc > 200 - r2.ntok THEN 0::BIGINT ELSE s.acc END, " +
        "CASE WHEN s.acc > 200 - r2.ntok THEN r2.ntok::BIGINT ELSE s.acc + r2.ntok END " +
        "FROM s JOIN r r2 ON r2.bucket = s.bucket AND r2.rn = s.rn + 1) " +
        "SELECT doc_id, bucket, pack, pos AS pack_pos, poff AS pack_offset FROM s ORDER BY doc_id"),
    "pack_sequences" ->
      ("WITH tk AS (SELECT doc_id, CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END AS ntok FROM documents), " +
        "o AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(ntok AS BIGINT) AS ntok, CAST(COALESCE(sum(ntok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off FROM tk WHERE ntok > 0), " +
        "s AS (SELECT doc_id, ntok, off, unnest(range(off // 512, (off + ntok - 1) // 512 + 1)) AS seq_id FROM o) " +
        "SELECT doc_id, CAST(seq_id AS BIGINT) AS seq_id, CAST(greatest(seq_id * 512 - off, 0) AS BIGINT) AS doc_start, CAST(least(ntok, (seq_id + 1) * 512 - off) AS BIGINT) AS doc_end, CAST(greatest(off - seq_id * 512, 0) AS BIGINT) AS seq_start FROM s ORDER BY doc_id, seq_id"),
  )
}
