package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.checks.{Check, ColumnCheck}
import graft.errors.ValidationResult
import graft.hypothesis.Hypothesis
import graft.inference.InferSchema
import graft.schema._

/** extension gates: similarity search / ANN stores, clustering, entity resolution, multimodal plumbing.
  *
  * One slice of the driver-contract gate registry (r16-verdict #6: the
  * registry was one 4.9k-line object; the split is purely mechanical —
  * every gate body and oracle is verbatim, combined unchanged in
  * [[SparkEntry.queries]]/[[SparkEntry.oracleSql]]). */
private[graft] object GatesSim {
  import GateSupport._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cluster_kmeans" -> ((s, d) =>
      // round-7: distributed Lloyd's over the full embedding table —
      // fixed-point centroid accumulation makes the fit bit-deterministic
      // under any partitioning (oracle: golden pin, 8 rows)
      ext.Clustering.kMeansSummary(t(s, d, "embeddings"), "vec_id", "embedding",
        k = 8, iters = 5, seed = 42).orderBy("cluster")),
    "er_fuzzy_dedup" -> ((s, d) =>
      // round-8: blocked fuzzy entity resolution — Jaro-Winkler (native
      // codegen'd expression, semantics pinned to DuckDB's
      // jaro_winkler_similarity so the oracle is a true cross-engine
      // check) inside nation-key blocks; the full cross product never
      // materializes and over-popular blocks are guarded by maxBlockPairs
      ext.EntityResolution.fuzzyDedup(t(s, d, "customer"), "c_custkey",
        "c_name", col("c_nationkey"), threshold = 0.97)
        .orderBy("id_a", "id_b")),
    "sim_topk_brute" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      ext.Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queries, "qid", "qv", k = 5).orderBy("query_id", "rank")
    }),
    "sim_topk_lsh" -> ((s, d) => {
      // oracle: golden pin; recall-vs-brute asserted in ExtSpec
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      ext.Similarity.lshTopK(emb, "vec_id", "embedding",
        queries, "qid", "qv", k = 5, bits = 16, bands = 8)
        .orderBy("query_id", "rank")
    }),
    "sim_topk_lsh_multiprobe" -> ((s, d) => {
      // oracle: golden pin; multi-probe ≥ single-probe recall asserted in
      // ExtSpec (probing all Hamming-1 buckets per band widens candidates
      // on the broadcast query side only — zero extra corpus work)
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      ext.Similarity.lshTopK(emb, "vec_id", "embedding",
        queries, "qid", "qv", k = 5, bits = 16, bands = 8, multiProbe = true)
        .orderBy("query_id", "rank")
    }),
    "sim_topk_ivf" -> ((s, d) => {
      // oracle: golden pin; recall + determinism asserted in ExtSpec
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      ext.Similarity.ivfTopK(emb, "vec_id", "embedding",
        queries, "qid", "qv", k = 5, nCentroids = 16, nProbe = 4)
        .orderBy("query_id", "rank")
    }),
    "sim_topk_ivf_pruned" -> ((s, d) => {
      // round-8: the IVF (raw-vector cells) counterpart of the pruned
      // IVF-PQ serve — partition pruning skips whole files of full-width
      // embeddings here, not just code bytes. Same pin as sim_topk_ivf.
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-ivf-part").toString
      val idx = ext.Similarity.trainIvf(emb, "vec_id", "embedding", nCentroids = 16)
      ext.Similarity.encodeAndWritePartitioned(emb, "vec_id", "embedding",
        idx, s"$tmp/codes")
      ext.Similarity.ivfTopKIndexed(s.read.parquet(s"$tmp/codes"),
        queries, "qid", "qv", idx, k = 5, nProbe = 4, pruneCells = true)
        .orderBy("query_id", "rank")
    }),
    "sim_text_hash_ann" -> ((s, d) => {
      // round-5: model-free text ANN — feature-hashed token vectors feed
      // the same brute top-k used for embeddings. Exact-duplicate docs in
      // the corpus must surface at cosine 1.0. oracle: golden pin; vector
      // algebra verified in ExtSpec.
      val docs = t(s, d, "documents")
        .select(col("doc_id"), ext.TextAnalysis.hashVector(col("text"), 64).as("hv"))
      val queries = docs.filter(col("doc_id") < 5)
        .select(col("doc_id").as("qid"), col("hv").as("qv"))
      ext.Similarity.bruteForceTopK(docs, "doc_id", "hv", queries, "qid", "qv", k = 3)
        .orderBy("query_id", "rank")
    }),
    "sim_topk_ivfpq" -> ((s, d) => {
      // round-7: IVF coarse quantizer + residual PQ codes — the composed
      // 100 TB ANN deployment shape (verdict r6 #7). oracle: golden pin;
      // recall >= standalone PQ asserted in ExtSpec
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      ext.Similarity.ivfPqTopK(emb, "vec_id", "embedding",
        queries, "qid", "qv", k = 5, nCentroids = 16, nProbe = 12,
        m = 8, ksub = 16, refineFactor = 4)
        .orderBy("query_id", "rank")
    }),
    "sim_topk_ivfpq_persisted" -> ((s, d) => {
      // round-8: train-once/encode-once/serve-many (r7 verdict #1) — the
      // quantizers train ONCE, persist as JSON (AnnIndex.save/load), the
      // corpus codes materialize ONCE to parquet, and the query batch runs
      // against the stored codes. Must be HASH-IDENTICAL to the one-shot
      // sim_topk_ivfpq — the oracle is the same golden pin.
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-ann-gate").toString
      val idx = ext.Similarity.trainIvfPq(emb, "vec_id", "embedding",
        nCentroids = 16, m = 8, ksub = 16)
      idx.save(s"$tmp/index.json")
      val loaded = ext.AnnIndex.load(s"$tmp/index.json")
      ext.Similarity.encode(emb, "vec_id", "embedding", loaded)
        .write.mode("overwrite").parquet(s"$tmp/codes.parquet")
      val codes = s.read.parquet(s"$tmp/codes.parquet")
      ext.Similarity.ivfPqTopKIndexed(codes, emb, "vec_id", "embedding",
        queries, "qid", "qv", loaded, k = 5, nProbe = 12, refineFactor = 4)
        .orderBy("query_id", "rank")
    }),
    "sim_topk_ivfpq_pruned" -> ((s, d) => {
      // round-8: cell-partitioned code storage + partition-pruned serving —
      // codes write partitionBy(cell); the serve collects the query
      // batch's probe cells (bounded: |queries|·nProbe ints) and
      // pre-filters, so parquet PARTITION PRUNING skips every non-probed
      // cell's files (at deployment params that is ~99.6% of the stored
      // bytes). Hash-identical to sim_topk_ivfpq — same golden pin;
      // PartitionFilters asserted in AnnIndexSpec.
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-ann-part").toString
      val idx = ext.Similarity.trainIvfPq(emb, "vec_id", "embedding",
        nCentroids = 16, m = 8, ksub = 16)
      ext.Similarity.encodeAndWritePartitioned(emb, "vec_id", "embedding",
        idx, s"$tmp/codes")
      val codes = s.read.parquet(s"$tmp/codes")
      ext.Similarity.ivfPqTopKIndexed(codes, emb, "vec_id", "embedding",
        queries, "qid", "qv", idx, k = 5, nProbe = 12, refineFactor = 4,
        pruneCells = true)
        .orderBy("query_id", "rank")
    }),
    "sim_topk_ivfpq_append" -> ((s, d) => {
      // round-8: INCREMENTAL ingest into the cell-partitioned code store —
      // encode half the corpus, append the other half against the same
      // frozen index, serve pruned over the union. Hash-identical to the
      // one-shot path: appending encode output is pure file addition.
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-ann-app").toString
      val idx = ext.Similarity.trainIvfPq(emb, "vec_id", "embedding",
        nCentroids = 16, m = 8, ksub = 16)
      ext.Similarity.encodeAndWritePartitioned(
        emb.filter(pmod(col("vec_id"), lit(2)) === 0), "vec_id", "embedding",
        idx, s"$tmp/codes")
      ext.Similarity.encodeAndWritePartitioned(
        emb.filter(pmod(col("vec_id"), lit(2)) === 1), "vec_id", "embedding",
        idx, s"$tmp/codes", mode = "append")
      val codes = s.read.parquet(s"$tmp/codes")
      ext.Similarity.ivfPqTopKIndexed(codes, emb, "vec_id", "embedding",
        queries, "qid", "qv", idx, k = 5, nProbe = 12, refineFactor = 4,
        pruneCells = true)
        .orderBy("query_id", "rank")
    }),
    "sim_encode_stream" -> ((s, d) => {
      // round-8: streaming encode sink — micro-batch replay through the
      // stateless encode projection appended to the cell-partitioned
      // store must be row-identical to the one-shot batch encode
      val emb = t(s, d, "embeddings")
      val idx = ext.Similarity.trainIvfPq(emb, "vec_id", "embedding",
        nCentroids = 16, m = 8, ksub = 16)
      val streamed = ext.Similarity.encodeReplay(emb, "vec_id", "embedding", idx)
      val batch = ext.Similarity.encode(emb, "vec_id", "embedding", idx)
      val nDiff = streamed.exceptAll(batch).count() +
        batch.exceptAll(streamed).count()
      val nRows = streamed.count()
      s.range(1).select(lit(nDiff).as("n_diff"), lit(nRows).as("n_rows"))
    }),
    "sim_topk_pq" -> ((s, d) => {
      // round-5: product-quantization ADC + exact re-rank. oracle: golden
      // pin; recall-vs-brute and compression shape asserted in ExtSpec
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      ext.Similarity.pqTopK(emb, "vec_id", "embedding",
        queries, "qid", "qv", k = 5, m = 8, ksub = 16, refineFactor = 4)
        .orderBy("query_id", "rank")
    }),
    "sim_ann_recall" -> ((s, d) => {
      // round-8 (r7 verdict #5): determinism was pinned but recall was not —
      // a probe-parameter regression (e.g. nProbe default too low) would
      // pass every golden gate while silently degrading answer quality.
      // Recall@5 vs bruteForceTopK is computed IN-GATE for each ANN family
      // at gate params and asserted against a floor; the oracle then pins
      // the measured values, so any change is visible, not just a collapse.
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select("query_id", "corpus_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = pairs(ext.Similarity.bruteForceTopK(
        emb, "vec_id", "embedding", queries, "qid", "qv", k = 5))
      // r12 (verdict #2): cells and probes derive from corpus density —
      // at the sf0.001/sf0.01 gate (500 vectors) autoNCentroids resolves
      // to the historical 16 and the probe counts to 4/12, keeping every
      // golden pin; at 10× density both scale together (constant
      // nProbe/nCentroids coverage), so the quality floors hold instead
      // of firing on parameters frozen at gate density.
      val nVec = emb.count()
      val nc = ext.Similarity.autoNCentroids(nVec)
      val npIvf = math.max(2, 4 * nc / 16)
      val npPq = math.max(4, 12 * nc / 16)
      // the exact-rerank shortlist must stay a constant FRACTION of the
      // candidates, not a constant count — a fixed k·4 shortlist out of a
      // 4×-denser candidate pool is where PQ recall actually leaks
      val rf = math.max(4, (4L * nVec / 500L).toInt)
      val methods: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
        "ivf" -> ext.Similarity.ivfTopK(emb, "vec_id", "embedding",
          queries, "qid", "qv", k = 5, nCentroids = nc, nProbe = npIvf),
        "ivfpq" -> ext.Similarity.ivfPqTopK(emb, "vec_id", "embedding",
          queries, "qid", "qv", k = 5, nCentroids = nc, nProbe = npPq,
          m = 8, ksub = 16, refineFactor = rf),
        "lsh" -> ext.Similarity.lshTopK(emb, "vec_id", "embedding",
          queries, "qid", "qv", k = 5, bits = 16, bands = 8),
        "pq" -> ext.Similarity.pqTopK(emb, "vec_id", "embedding",
          queries, "qid", "qv", k = 5, m = 8, ksub = 16, refineFactor = rf))
      // Floors are per-method: the cell-probing families must clear 0.6;
      // standalone PQ at gate params (m=8, ksub=16, k=5) honestly measures
      // ~0.5 — its floor documents that, and the golden pin catches ANY
      // drift either way. (IVF-PQ > PQ is separately asserted in ExtSpec.)
      val floors = Map("ivf" -> 0.6, "ivfpq" -> 0.6, "lsh" -> 0.6, "pq" -> 0.4)
      val measured = methods.map { case (name, df) =>
        val r = (brute intersect pairs(df)).size.toDouble / brute.size
        require(r >= floors(name),
          s"ANN recall regression: $name recall@5 $r < ${floors(name)}")
        (name, math.round(r * 10000).toDouble / 10000.0)
      }
      import s.implicits._
      measured.toDF("method", "recall_at_5").orderBy("method")
    }),
    "sim_ann_lifecycle" -> ((s, d) => {
      // round-9 (r8 verdict #3): index LIFECYCLE — build-time recall
      // asserts say nothing about a persisted store after corpus drift.
      // Construct the drifted shape directly: quantizers trained on a
      // 32-vector sliver, the FULL corpus encoded against them
      // (production after heavy drift). The recall probe must flag the
      // degradation; migrate() re-trains on the full corpus, re-encodes
      // as v2 alongside v1 and atomically flips the pointer; the healed
      // serve must improve recall AND be hash-identical to the one-shot
      // golden pin (same trained index by determinism).
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val dir = java.nio.file.Files.createTempDirectory("graft-ann-life").toString
      // r12 (verdict #2): same corpus-density parameterization as
      // sim_ann_recall — 16/12 at gate density (pins unchanged), scaled
      // together at 10× so the heal floor measures quality, not a
      // frozen parameter. The STALE index keeps nCentroids=16 (it is
      // deliberately trained on a 32-vector sliver).
      val nVec = emb.count()
      val nc = ext.Similarity.autoNCentroids(nVec)
      val np = math.max(4, 12 * nc / 16)
      val rf = math.max(4, (4L * nVec / 500L).toInt)
      val stale = ext.Similarity.trainIvfPq(emb.filter(col("vec_id") < 32),
        "vec_id", "embedding", nCentroids = 16, m = 8, ksub = 16)
      ext.AnnStore.create(emb, "vec_id", "embedding", stale, dir)
      val probeQs = emb.filter(pmod(col("vec_id"), lit(7)) === 3).limit(40)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val rStale = ext.AnnStore.recallProbe(dir, emb, "vec_id", "embedding",
        probeQs, "qid", "qv", k = 5, nProbe = np, refineFactor = rf)
      val good = ext.Similarity.trainIvfPq(emb, "vec_id", "embedding",
        nCentroids = nc, m = 8, ksub = 16)
      require(ext.AnnStore.migrate(emb, "vec_id", "embedding", good, dir) == 2)
      val rHealed = ext.AnnStore.recallProbe(dir, emb, "vec_id", "embedding",
        probeQs, "qid", "qv", k = 5, nProbe = np, refineFactor = rf)
      require(rHealed > rStale && rHealed >= 0.55,
        f"migration did not heal recall: stale=$rStale%.4f healed=$rHealed%.4f")
      ext.AnnStore.serve(dir, emb, "vec_id", "embedding", queries,
        "qid", "qv", k = 5, nProbe = np, refineFactor = rf)
        .orderBy("query_id", "rank")
    }),
    "sim_ann_delete" -> ((s, d) => {
      // r14: the takedown path (retention policy / right-to-be-forgotten)
      // — tombstone-delete a deterministic id set from a persisted store,
      // serve, then compact (the physical-erasure point) and assert the
      // serve is unchanged and the tombstones retired. The serve probes
      // ALL cells (nProbe = nCentroids makes IVF exact brute force), so
      // the oracle is plain SQL over the live subset — a real data-derived
      // oracle, not a golden pin.
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val dir = java.nio.file.Files.createTempDirectory("graft-ann-del").toString
      val idx = ext.Similarity.trainIvf(emb, "vec_id", "embedding",
        nCentroids = 16)
      ext.AnnStore.create(emb, "vec_id", "embedding", idx, dir)
      val nDel = ext.AnnStore.delete(
        emb.filter(pmod(col("vec_id"), lit(7)) === 3).select("vec_id"),
        "vec_id", dir)
      require(nDel > 0L, "takedown set empty — gate precondition broken")
      def serveNow() = ext.AnnStore.serve(dir, emb, "vec_id", "embedding",
        queries, "qid", "qv", k = 5, nProbe = 16)
      val masked = serveNow().orderBy("query_id", "rank").collect().toSeq
      ext.AnnStore.compactCodes(s, dir)
      require(ext.AnnStore.tombstoneCount(s, dir) == 0L,
        "compaction must retire the tombstones")
      val compacted = serveNow()
      require(compacted.orderBy("query_id", "rank").collect().toSeq == masked,
        "post-compaction serve must equal the tombstone-masked serve")
      compacted.orderBy("query_id", "rank")
    }),
    "sim_embedding_norm" -> ((s, d) =>
      t(s, d, "embeddings").select(col("vec_id"),
        round(ext.Similarity.l2Norm(col("embedding")), 4).as("norm"))
        .orderBy("vec_id")),

    // ---- extensions: multimodal plumbing (stub decode) ----
    "mm_meta" -> ((s, d) => {
      val withBin = ext.Multimodal.withBinaryPayload(t(s, d, "documents"), "text", "payload")
      ext.Multimodal.extractMeta(withBin, "doc_id", "payload").orderBy("id")
    }),
    "mm_frames" -> ((s, d) => {
      val withBin = ext.Multimodal.withBinaryPayload(t(s, d, "documents"), "text", "payload")
      ext.Multimodal.sampleFrameIndices(withBin, "doc_id", "payload", frames = 4)
        .orderBy("id", "frame_offset")
    }),
    "mm_features" -> ((s, d) => {
      val withBin = ext.Multimodal.withBinaryPayload(t(s, d, "documents"), "text", "payload")
      ext.Multimodal.extractFeatures(withBin, "doc_id", "payload", dim = 8)
        .select(col("id"),
          round(element_at(col("feature"), 1).cast("double"), 4).as("f0"),
          round(element_at(col("feature"), 2).cast("double"), 4).as("f1"),
          round(element_at(col("feature"), 8).cast("double"), 4).as("f7"))
        .orderBy("id")
    }),
    "mm_resize" -> ((s, d) => {
      val withBin = ext.Multimodal.withBinaryPayload(t(s, d, "documents"), "text", "payload")
      ext.Multimodal.resizePayload(withBin, "doc_id", "payload", bound = 128)
        .select("id", "n_bytes", "width", "height").orderBy("id")
    }),

    // ---- extensions: multimodal with the REAL image codec (javax.imageio)
    //      over deterministic synthetic PNGs whose decoded properties are
    //      closed-form in doc_id (so DuckDB pins the codec round trip) ----
    "mm_image_meta" -> ((s, d) => {
      val imgs = ext.Multimodal.syntheticPngs(t(s, d, "documents"), "doc_id")
      ext.Multimodal.extractMeta(imgs, "id", "payload", ext.ImageIODecoder)
        .select("id", "width", "height", "channels", "format").orderBy("id")
    }),
    "mm_image_resize" -> ((s, d) => {
      val imgs = ext.Multimodal.syntheticPngs(t(s, d, "documents"), "doc_id")
      ext.Multimodal.resizePayload(imgs, "id", "payload", 16, ext.ImageIODecoder)
        .select("id", "width", "height").orderBy("id")
    }),
    "mm_image_features" -> ((s, d) => {
      val imgs = ext.Multimodal.syntheticPngs(t(s, d, "documents"), "doc_id")
      ext.Multimodal.extractFeatures(imgs, "id", "payload", dim = 3,
          ext.ImageIODecoder)
        .select(col("id"),
          round(element_at(col("feature"), 1).cast("double"), 4).as("f_r"),
          round(element_at(col("feature"), 2).cast("double"), 4).as("f_g"),
          round(element_at(col("feature"), 3).cast("double"), 4).as("f_b"))
        .orderBy("id")
    }),

    "mm_audio_meta" -> ((s, d) => {
      val wavs = ext.Multimodal.syntheticWavs(t(s, d, "documents"), "doc_id")
      ext.Multimodal.extractMeta(wavs, "id", "payload", ext.WavDecoder)
        .select(col("id"), col("width").as("sample_rate"),
          col("height").as("n_frames"), col("channels"), col("format"))
        .orderBy("id")
    }),
    "mm_audio_features" -> ((s, d) => {
      val wavs = ext.Multimodal.syntheticWavs(t(s, d, "documents"), "doc_id")
      ext.Multimodal.extractFeatures(wavs, "id", "payload", dim = 4,
          ext.WavDecoder)
        .select(col("id"),
          round(element_at(col("feature"), 1).cast("double"), 4).as("rms_1"),
          round(element_at(col("feature"), 4).cast("double"), 4).as("rms_4"))
        .orderBy("id")
    }),
    "mm_audio_resize" -> ((s, d) => {
      val wavs = ext.Multimodal.syntheticWavs(t(s, d, "documents"), "doc_id")
      ext.Multimodal.resizePayload(wavs, "id", "payload", 512, ext.WavDecoder)
        .select(col("id"), col("width").as("sample_rate"),
          col("height").as("n_frames"))
        .orderBy("id")
    }),

    // ---- §2.A custom vectorized check (api/checks.py:21-124) ----
  )

  def oracleSql: Map[String, String] = Map(
    "er_fuzzy_dedup" ->
      ("SELECT a.c_custkey AS id_a, b.c_custkey AS id_b, " +
        "round(jaro_winkler_similarity(a.c_name, b.c_name), 6) AS similarity " +
        "FROM customer a JOIN customer b ON a.c_nationkey = b.c_nationkey " +
        "AND a.c_custkey < b.c_custkey " +
        "WHERE round(jaro_winkler_similarity(a.c_name, b.c_name), 6) >= 0.97 " +
        "ORDER BY id_a, id_b"),
    "sim_text_hash_ann" ->
      ("SELECT CAST(query_id AS BIGINT) AS query_id, CAST(corpus_id AS BIGINT) AS corpus_id, CAST(\"rank\" AS INTEGER) AS \"rank\", CAST(cosine AS DOUBLE) AS cosine FROM (" +
        "SELECT * FROM (VALUES (0, 0, 1, 1.0), (0, 82, 2, 0.9857), (0, 50, 3, 0.9837), (1, 1, 1, 1.0), (1, 6, 2, 0.8952), (1, 127, 3, 0.8414), (2, 2, 1, 1.0), (2, 450, 2, 0.8923), (2, 5, 3, 0.8852), (3, 3, 1, 1.0), (3, 332, 2, 0.8091), (3, 109, 3, 0.7916), (4, 4, 1, 1.0), (4, 110, 2, 0.7733), (4, 467, 3, 0.7715)) v(query_id, corpus_id, \"rank\", cosine) WHERE (SELECT count(*) FROM lineitem) < 10000 " +
        "UNION ALL SELECT * FROM (VALUES (0, 0, 1, 1.0), (0, 237, 2, 0.7183), (0, 445, 3, 0.7074), (1, 1, 1, 1.0), (1, 351, 2, 0.8488), (1, 125, 3, 0.8243), (2, 2, 1, 1.0), (2, 269, 2, 0.7941), (2, 379, 3, 0.7812), (3, 3, 1, 1.0), (3, 258, 2, 0.8442), (3, 91, 3, 0.7777), (4, 4, 1, 1.0), (4, 105, 2, 0.8379), (4, 81, 3, 0.8051)) v(query_id, corpus_id, \"rank\", cosine) WHERE (SELECT count(*) FROM lineitem) >= 10000 AND (SELECT count(*) FROM lineitem) < 100000 " +
        "UNION ALL SELECT * FROM (VALUES (0, 0, 1, 1.0), (0, 81, 2, 0.8393), (0, 1310, 3, 0.8322), (1, 1, 1, 1.0), (1, 1264, 2, 0.8322), (1, 4549, 3, 0.7316), (2, 2, 1, 1.0), (2, 2618, 2, 0.8669), (2, 189, 3, 0.8606), (3, 3, 1, 1.0), (3, 2591, 2, 0.865), (3, 35, 3, 0.8105), (4, 4, 1, 1.0), (4, 3140, 2, 0.8568), (4, 636, 3, 0.8474)) v(query_id, corpus_id, \"rank\", cosine) WHERE (SELECT count(*) FROM lineitem) >= 100000" +
        ") u ORDER BY query_id, \"rank\""),
    "cluster_kmeans" ->
      ("SELECT CAST(cluster AS INTEGER) AS cluster, CAST(n AS BIGINT) AS n, CAST(centroid_norm AS DOUBLE) AS centroid_norm FROM (" +
        "SELECT * FROM (VALUES (0, 80, 0.2544), (1, 67, 0.2625), (2, 63, 0.2597), (3, 55, 0.2832), (4, 52, 0.2919), (5, 62, 0.2562), (6, 61, 0.266), (7, 60, 0.2725)) v(cluster, n, centroid_norm) WHERE (SELECT count(*) FROM lineitem) < 10000 " +
        "UNION ALL SELECT * FROM (VALUES (0, 61, 0.261), (1, 70, 0.2404), (2, 76, 0.2512), (3, 64, 0.2679), (4, 64, 0.2563), (5, 59, 0.2935), (6, 49, 0.2888), (7, 57, 0.2888)) v(cluster, n, centroid_norm) WHERE (SELECT count(*) FROM lineitem) >= 10000 AND (SELECT count(*) FROM lineitem) < 100000 " +
        "UNION ALL SELECT * FROM (VALUES (0, 254, 0.2228), (1, 256, 0.2327), (2, 250, 0.2228), (3, 229, 0.2214), (4, 246, 0.2249), (5, 235, 0.2254), (6, 284, 0.206), (7, 246, 0.2334)) v(cluster, n, centroid_norm) WHERE (SELECT count(*) FROM lineitem) >= 100000" +
        ") u ORDER BY cluster"),
    "sim_ann_recall" ->
      ("SELECT method, CAST(recall_at_5 AS DOUBLE) AS recall_at_5 FROM (" +
        "SELECT * FROM (VALUES ('ivf', 0.88), ('ivfpq', 0.76), ('lsh', 0.96), ('pq', 0.48)) v(method, recall_at_5) WHERE (SELECT count(*) FROM lineitem) < 10000 " +
        "UNION ALL SELECT * FROM (VALUES ('ivf', 0.6), ('ivfpq', 0.76), ('lsh', 1.0), ('pq', 0.56)) v(method, recall_at_5) WHERE (SELECT count(*) FROM lineitem) >= 10000 AND (SELECT count(*) FROM lineitem) < 100000 " +
        "UNION ALL SELECT * FROM (VALUES ('ivf', 0.64), ('ivfpq', 0.64), ('lsh', 0.96), ('pq', 0.76)) v(method, recall_at_5) WHERE (SELECT count(*) FROM lineitem) >= 100000" +
        ") u ORDER BY method"),
    "sim_topk_ivfpq" -> ivfPqOracleSql,
    // persisted path is hash-identical to the one-shot by construction —
    // same golden pin (r8: train-once/encode-once/serve-many)
    "sim_topk_ivfpq_persisted" -> ivfPqOracleSql,
    // cell-partitioned + partition-pruned serve: also hash-identical
    "sim_topk_ivfpq_pruned" -> ivfPqOracleSql,
    // half-encode + append ingest serves identically to one-shot
    "sim_topk_ivfpq_append" -> ivfPqOracleSql,
    // migrated (re-train → re-encode v2 → atomic pointer flip) store
    // serves hash-identically to the one-shot — same golden pin; the
    // recall degradation/heal is required in-gate
    "sim_ann_lifecycle" -> lifecycleOracleSql,
    "sim_encode_stream" ->
      "SELECT CAST(0 AS BIGINT) AS n_diff, (SELECT count(*) FROM embeddings) AS n_rows",
    "sim_topk_pq" ->
      ("SELECT CAST(query_id AS BIGINT) AS query_id, CAST(corpus_id AS BIGINT) AS corpus_id, CAST(\"rank\" AS INTEGER) AS \"rank\", CAST(cosine AS DOUBLE) AS cosine FROM (" +
        "SELECT * FROM (VALUES (0, 0, 1, 1.0), (0, 17, 2, 0.3345), (0, 225, 3, 0.3151), (0, 260, 4, 0.2987), (0, 73, 5, 0.2972), (1, 1, 1, 1.0), (1, 129, 2, 0.3515), (1, 376, 3, 0.3048), (1, 440, 4, 0.2993), (1, 75, 5, 0.29), (2, 2, 1, 1.0), (2, 443, 2, 0.3576), (2, 441, 3, 0.254), (2, 309, 4, 0.2523), (2, 488, 5, 0.2386), (3, 3, 1, 1.0), (3, 223, 2, 0.3409), (3, 278, 3, 0.2694), (3, 32, 4, 0.2281), (3, 380, 5, 0.219), (4, 4, 1, 1.0), (4, 143, 2, 0.3297), (4, 62, 3, 0.2886), (4, 472, 4, 0.2663), (4, 413, 5, 0.2539)) v(query_id, corpus_id, \"rank\", cosine) WHERE (SELECT count(*) FROM lineitem) < 10000 " +
        "UNION ALL SELECT * FROM (VALUES (0, 0, 1, 1.0), (0, 423, 2, 0.2969), (0, 73, 3, 0.2954), (0, 7, 4, 0.2928), (0, 190, 5, 0.2818), (1, 1, 1, 1.0), (1, 386, 2, 0.3715), (1, 27, 3, 0.3482), (1, 124, 4, 0.3028), (1, 402, 5, 0.2923), (2, 2, 1, 1.0), (2, 117, 2, 0.3181), (2, 450, 3, 0.2663), (2, 145, 4, 0.2635), (2, 320, 5, 0.255), (3, 3, 1, 1.0), (3, 130, 2, 0.3999), (3, 207, 3, 0.2917), (3, 315, 4, 0.2852), (3, 463, 5, 0.2609), (4, 4, 1, 1.0), (4, 114, 2, 0.3985), (4, 496, 3, 0.3412), (4, 257, 4, 0.2724), (4, 384, 5, 0.2404)) v(query_id, corpus_id, \"rank\", cosine) WHERE (SELECT count(*) FROM lineitem) >= 10000 AND (SELECT count(*) FROM lineitem) < 100000 " +
        "UNION ALL SELECT * FROM (VALUES (0, 0, 1, 1.0), (0, 1020, 2, 0.376), (0, 1033, 3, 0.296), (0, 1724, 4, 0.2852), (0, 1308, 5, 0.2681), (1, 1, 1, 1.0), (1, 1711, 2, 0.3028), (1, 514, 3, 0.299), (1, 1760, 4, 0.282), (1, 823, 5, 0.2658), (2, 2, 1, 1.0), (2, 1303, 2, 0.394), (2, 953, 3, 0.3691), (2, 337, 4, 0.3574), (2, 1053, 5, 0.356), (3, 3, 1, 1.0), (3, 1701, 2, 0.388), (3, 1617, 3, 0.3028), (3, 777, 4, 0.2984), (3, 100, 5, 0.2962), (4, 4, 1, 1.0), (4, 524, 2, 0.4191), (4, 381, 3, 0.3065), (4, 1351, 4, 0.2897), (4, 1579, 5, 0.2609)) v(query_id, corpus_id, \"rank\", cosine) WHERE (SELECT count(*) FROM lineitem) >= 100000" +
        ") u ORDER BY query_id, \"rank\""),
    "sim_topk_lsh" ->
      ("SELECT CAST(query_id AS BIGINT) AS query_id, CAST(corpus_id AS BIGINT) AS corpus_id, CAST(\"rank\" AS INTEGER) AS \"rank\", CAST(cosine AS DOUBLE) AS cosine FROM (" +
        "SELECT * FROM (VALUES (0, 0, 1, 1.0), (0, 12, 4, 0.311), (0, 17, 2, 0.3345), (0, 225, 3, 0.3151), (0, 483, 5, 0.3005), (1, 1, 1, 1.0), (1, 129, 4, 0.3515), (1, 209, 3, 0.3815), (1, 257, 2, 0.3918), (1, 376, 5, 0.3048), (2, 2, 1, 1.0), (2, 62, 3, 0.29), (2, 91, 5, 0.2789), (2, 185, 4, 0.2829), (2, 443, 2, 0.3576), (3, 3, 1, 1.0), (3, 84, 4, 0.3197), (3, 205, 3, 0.3366), (3, 212, 5, 0.3197), (3, 223, 2, 0.3409), (4, 4, 1, 1.0), (4, 98, 3, 0.3398), (4, 143, 4, 0.3297), (4, 343, 5, 0.3124), (4, 345, 2, 0.3749)) v(query_id, corpus_id, \"rank\", cosine) WHERE (SELECT count(*) FROM lineitem) < 10000 " +
        "UNION ALL SELECT * FROM (VALUES (0, 0, 1, 1.0), (0, 334, 3, 0.3627), (0, 365, 2, 0.37), (0, 387, 4, 0.3311), (0, 423, 5, 0.2969), (1, 1, 1, 1.0), (1, 27, 3, 0.3482), (1, 195, 5, 0.3227), (1, 386, 2, 0.3715), (1, 407, 4, 0.327), (2, 2, 1, 1.0), (2, 117, 2, 0.3181), (2, 145, 4, 0.2635), (2, 188, 5, 0.2633), (2, 450, 3, 0.2663), (3, 3, 1, 1.0), (3, 130, 2, 0.3999), (3, 149, 3, 0.3299), (3, 174, 5, 0.3035), (3, 343, 4, 0.3085), (4, 4, 1, 1.0), (4, 114, 2, 0.3985), (4, 408, 4, 0.3228), (4, 482, 5, 0.3139), (4, 496, 3, 0.3412)) v(query_id, corpus_id, \"rank\", cosine) WHERE (SELECT count(*) FROM lineitem) >= 10000 AND (SELECT count(*) FROM lineitem) < 100000 " +
        "UNION ALL SELECT * FROM (VALUES (0, 0, 1, 1.0), (0, 1204, 2, 0.4065), (0, 291, 3, 0.3919), (0, 1020, 4, 0.376), (0, 510, 5, 0.3445), (1, 1, 1, 1.0), (1, 1950, 2, 0.3861), (1, 1175, 3, 0.3703), (1, 1580, 4, 0.3668), (1, 260, 5, 0.3467), (2, 2, 1, 1.0), (2, 1303, 2, 0.394), (2, 953, 3, 0.3691), (2, 337, 4, 0.3574), (2, 1912, 5, 0.3519), (3, 3, 1, 1.0), (3, 263, 2, 0.398), (3, 1701, 3, 0.388), (3, 720, 4, 0.3656), (3, 859, 5, 0.3628), (4, 4, 1, 1.0), (4, 524, 2, 0.4191), (4, 1166, 3, 0.3787), (4, 76, 4, 0.3595), (4, 995, 5, 0.3589)) v(query_id, corpus_id, \"rank\", cosine) WHERE (SELECT count(*) FROM lineitem) >= 100000" +
        ") u ORDER BY query_id, \"rank\""),
    "sim_topk_lsh_multiprobe" ->
      ("SELECT CAST(query_id AS BIGINT) AS query_id, CAST(corpus_id AS BIGINT) AS corpus_id, CAST(\"rank\" AS INTEGER) AS \"rank\", CAST(cosine AS DOUBLE) AS cosine FROM (" +
        "SELECT * FROM (VALUES (0, 0, 1, 1.0), (0, 17, 2, 0.3345), (0, 225, 3, 0.3151), (0, 12, 4, 0.311), (0, 483, 5, 0.3005), (1, 1, 1, 1.0), (1, 257, 2, 0.3918), (1, 209, 3, 0.3815), (1, 129, 4, 0.3515), (1, 376, 5, 0.3048), (2, 2, 1, 1.0), (2, 443, 2, 0.3576), (2, 62, 3, 0.29), (2, 246, 4, 0.2898), (2, 185, 5, 0.2829), (3, 3, 1, 1.0), (3, 223, 2, 0.3409), (3, 205, 3, 0.3366), (3, 84, 4, 0.3197), (3, 212, 5, 0.3197), (4, 4, 1, 1.0), (4, 345, 2, 0.3749), (4, 98, 3, 0.3398), (4, 143, 4, 0.3297), (4, 343, 5, 0.3124)) v(query_id, corpus_id, \"rank\", cosine) WHERE (SELECT count(*) FROM lineitem) < 10000 " +
        "UNION ALL SELECT * FROM (VALUES (0, 0, 1, 1.0), (0, 365, 2, 0.37), (0, 334, 3, 0.3627), (0, 387, 4, 0.3311), (0, 423, 5, 0.2969), (1, 1, 1, 1.0), (1, 386, 2, 0.3715), (1, 27, 3, 0.3482), (1, 407, 4, 0.327), (1, 195, 5, 0.3227), (2, 2, 1, 1.0), (2, 117, 2, 0.3181), (2, 450, 3, 0.2663), (2, 145, 4, 0.2635), (2, 188, 5, 0.2633), (3, 3, 1, 1.0), (3, 130, 2, 0.3999), (3, 149, 3, 0.3299), (3, 343, 4, 0.3085), (3, 174, 5, 0.3035), (4, 4, 1, 1.0), (4, 114, 2, 0.3985), (4, 496, 3, 0.3412), (4, 408, 4, 0.3228), (4, 482, 5, 0.3139)) v(query_id, corpus_id, \"rank\", cosine) WHERE (SELECT count(*) FROM lineitem) >= 10000 AND (SELECT count(*) FROM lineitem) < 100000 " +
        "UNION ALL SELECT * FROM (VALUES (0, 0, 1, 1.0), (0, 1204, 2, 0.4065), (0, 291, 3, 0.3919), (0, 1020, 4, 0.376), (0, 510, 5, 0.3445), (1, 1, 1, 1.0), (1, 1950, 2, 0.3861), (1, 1175, 3, 0.3703), (1, 1580, 4, 0.3668), (1, 260, 5, 0.3467), (2, 2, 1, 1.0), (2, 1303, 2, 0.394), (2, 953, 3, 0.3691), (2, 337, 4, 0.3574), (2, 1053, 5, 0.356), (3, 3, 1, 1.0), (3, 263, 2, 0.398), (3, 1701, 3, 0.388), (3, 720, 4, 0.3656), (3, 859, 5, 0.3628), (4, 4, 1, 1.0), (4, 524, 2, 0.4191), (4, 1166, 3, 0.3787), (4, 76, 4, 0.3595), (4, 995, 5, 0.3589)) v(query_id, corpus_id, \"rank\", cosine) WHERE (SELECT count(*) FROM lineitem) >= 100000" +
        ") u ORDER BY query_id, \"rank\""),
    "sim_topk_ivf" -> ivfOracleSql,
    "sim_topk_ivf_pruned" -> ivfOracleSql,
    "sim_topk_brute" ->
      ("WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5), " +
        "sc AS (SELECT b.vec_id AS query_id, a.vec_id AS corpus_id, " +
        s"round($cosineSql, 4) AS cosine FROM embeddings a, q b), " +
        "r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS INTEGER) AS rank FROM sc) " +
        "SELECT query_id, corpus_id, rank, cosine FROM r WHERE rank <= 5 ORDER BY query_id, rank"),
    "sim_ann_delete" ->
      // brute top-k over the LIVE corpus (the takedown set excluded) —
      // the gate's full-probe IVF serve is exactly this
      ("WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5), " +
        "c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 7 != 3), " +
        "sc AS (SELECT b.vec_id AS query_id, a.vec_id AS corpus_id, " +
        s"round($cosineSql, 4) AS cosine FROM c a, q b), " +
        "r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS INTEGER) AS rank FROM sc) " +
        "SELECT query_id, corpus_id, rank, cosine FROM r WHERE rank <= 5 ORDER BY query_id, rank"),
    "sim_embedding_norm" ->
      "SELECT vec_id, round(sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))), 4) AS norm FROM embeddings ORDER BY vec_id",
    "mm_meta" ->
      "SELECT doc_id AS id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, CAST(64 + octet_length(encode(text)) % 512 AS INTEGER) AS width, CAST(64 + (octet_length(encode(text)) * 7) % 512 AS INTEGER) AS height, CAST(3 AS INTEGER) AS channels, 'stub' AS format FROM documents ORDER BY id",
    "mm_frames" ->
      "SELECT doc_id AS id, CAST((f.fi * greatest(octet_length(encode(text)), 1)) // 4 AS BIGINT) AS frame_offset FROM documents CROSS JOIN (SELECT unnest(range(4)) AS fi) f ORDER BY id, frame_offset",
    "mm_features" ->
      ("WITH b AS (SELECT doc_id AS id, CAST(octet_length(encode(text)) AS BIGINT) AS n FROM documents) " +
        "SELECT id, round(CAST(CAST((n*1)%97 AS REAL)/CAST(97 AS REAL) AS DOUBLE), 4) AS f0, " +
        "round(CAST(CAST((n*2)%97 AS REAL)/CAST(97 AS REAL) AS DOUBLE), 4) AS f1, " +
        "round(CAST(CAST((n*8)%97 AS REAL)/CAST(97 AS REAL) AS DOUBLE), 4) AS f7 FROM b ORDER BY id"),
    "mm_resize" ->
      ("WITH b AS (SELECT doc_id AS id, CAST(least(octet_length(encode(text)), 128) AS BIGINT) AS nb FROM documents) " +
        "SELECT id, nb AS n_bytes, CAST(64 + nb % 512 AS INTEGER) AS width, " +
        "CAST(64 + (nb*7) % 512 AS INTEGER) AS height FROM b ORDER BY id"),
    "mm_image_meta" ->
      "SELECT doc_id AS id, CAST(8 + doc_id % 32 AS INTEGER) AS width, CAST(8 + (doc_id * 3) % 32 AS INTEGER) AS height, CAST(3 AS INTEGER) AS channels, 'png' AS format FROM documents ORDER BY id",
    "mm_audio_meta" ->
      "SELECT doc_id AS id, CAST(8000 AS INTEGER) AS sample_rate, CAST(800 + (doc_id * 3) % 160 AS INTEGER) AS n_frames, CAST(1 AS INTEGER) AS channels, 'wav' AS format FROM documents ORDER BY id",
    "mm_audio_features" ->
      ("SELECT doc_id AS id, " +
        "round(CAST(CAST(((doc_id * 37) % 1000 + 100) / 32768.0 AS REAL) AS DOUBLE), 4) AS rms_1, " +
        "round(CAST(CAST(((doc_id * 37) % 1000 + 100) / 32768.0 AS REAL) AS DOUBLE), 4) AS rms_4 " +
        "FROM documents ORDER BY id"),
    "mm_audio_resize" ->
      "SELECT doc_id AS id, CAST(8000 AS INTEGER) AS sample_rate, CAST(512 AS INTEGER) AS n_frames FROM documents ORDER BY id",
    "mm_image_resize" ->
      ("WITH b AS (SELECT doc_id AS id, CAST(8 + doc_id % 32 AS INTEGER) AS w0, CAST(8 + (doc_id * 3) % 32 AS INTEGER) AS h0 FROM documents) " +
        "SELECT id, " +
        "CASE WHEN greatest(w0, h0) <= 16 THEN w0 ELSE greatest(1, CAST(round(w0 * 16.0 / greatest(w0, h0)) AS INTEGER)) END AS width, " +
        "CASE WHEN greatest(w0, h0) <= 16 THEN h0 ELSE greatest(1, CAST(round(h0 * 16.0 / greatest(w0, h0)) AS INTEGER)) END AS height " +
        "FROM b ORDER BY id"),
    "mm_image_features" ->
      ("SELECT doc_id AS id, " +
        "round(CAST(CAST((doc_id % 256) / 255.0 AS REAL) AS DOUBLE), 4) AS f_r, " +
        "round(CAST(CAST(((doc_id * 7) % 256) / 255.0 AS REAL) AS DOUBLE), 4) AS f_g, " +
        "round(CAST(CAST(((doc_id * 13) % 256) / 255.0 AS REAL) AS DOUBLE), 4) AS f_b " +
        "FROM documents ORDER BY id"),
  )
}
