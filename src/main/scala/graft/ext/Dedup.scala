package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (beyond-reference
  * additions). Every variant is built from the same scale template:
  *
  *   signature (narrow, codegen'd per-row expressions)
  *     → candidate generation (ONE shuffle: explode band/bucket keys +
  *        self-join on the bucket key — never an O(n²) cross join)
  *     → exact verification (computed only on candidate pairs).
  *
  * At 100 TB the bucket join is the only wide operation, and its key-space
  * (band hash) is uniform by construction, so it partitions evenly.
  */
object Dedup {

  private def q(n: String): Column = col("`" + n.replace("`", "``") + "`")

  /** Candidate generation shared by every LSH-style pair generator: group
    * ids by bucket key with a HARD-CAPPED collect (BoundedCollectItems,
    * cap = maxBucketSize + 1), drop over-cap buckets, and explode each
    * surviving bucket's in-bucket pairs (sorted, id_a < id_b). ONE shuffle
    * does all three jobs — bucket formation, skew guard, pair emission:
    *
    *  - the (expensive) signature scan upstream is evaluated exactly once.
    *    Earlier formulations evaluated it 2-3×: once for a guard pass
    *    (round-3: per-row window count, +28% on dedup_minhash; round-4a:
    *    count-aggregate + broadcast anti join, better but still a pass)
    *    and once per self-join side;
    *  - skew is bounded at every hop: map-side partial aggregation caps a
    *    task's contribution to a hot key at cap+1 ids, so a degenerate
    *    bucket (mass-duplicated or empty documents) moves O(tasks × cap),
    *    never O(rows), and its group buffer is O(cap) — then the
    *    size filter drops it, standard LSH practice (oversized buckets
    *    carry little signal; collapse exact duplicates FIRST);
    *  - nothing heavier than (key, id) ever crosses the wire.
    *
    * Under the cap the collected membership is complete, so emitted pairs
    * are deterministic and identical to the self-join formulation's. */
  private[graft] def bucketedPairs(rows: DataFrame, keyCols: Seq[String], idCol: String,
      maxBucketSize: Long): DataFrame = {
    val cap = math.toIntExact(math.min(maxBucketSize, (Int.MaxValue - 2).toLong))
    rows.groupBy(keyCols.map(col): _*)
      .agg(graft.functions.BoundedCollectItems.of(col(idCol), cap + 1).as("__ids"))
      .filter(size(col("__ids")).between(2, cap))
      // pair emission is a native streaming Generator: sort once per
      // bucket, O(1) per pair, no m²-materialization. (A higher-order
      // `transform`/`flatten` formulation was measured ~4× slower than
      // even the old self-join — interpreted per-element lambdas.)
      .select(graft.functions.SortedPairs.of(col("__ids")))
      .dropDuplicates("id_a", "id_b")
  }

  /** Exact duplicate statistics on a key set: one hash-aggregate pass.
    * Returns a 1-row DataFrame (n_total, n_distinct, n_dup_rows). */
  def exactStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    // null flags ride the hash (r18 review: Spark's xxhash64 SKIPS null
    // children, so ('x', null) and (null, 'x') collided with probability
    // 1 and the stats disagreed with dropExact's tuple semantics — the
    // same class fixed in CorpusDiff and the streaming dedup fingerprint)
    val key = if (cols.size == 1) q(cols.head)
              else xxhash64(cols.flatMap(c => Seq(q(c).isNull, q(c))): _*)
    df.groupBy(key.as("k")).agg(count(lit(1)).as("c"))
      .agg(
        coalesce(sum(col("c")), lit(0L)).as("n_total"),
        count(lit(1)).as("n_distinct"),
        coalesce(sum(when(col("c") > 1, col("c") - 1)), lit(0L)).as("n_dup_rows"))
  }

  /** Exact dedup: keep one row per key (hash-groupBy semantics of
    * dropDuplicates — map-side partial aggregation, one shuffle). */
  def dropExact(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  /** Word k-shingles of a text column, distinct, space-joined. Native
    * Catalyst expression (graft.functions.WordShingles) over the codegen'd
    * tokenizer — one loop per row. */
  def shingles(text: Column, k: Int): Column =
    graft.functions.HashFunctions.wordShingles(TextAnalysis.tokens(text), k)

  /** MinHash signature: numHashes universal-hash permutations over a single
    * xxhash64 per shingle; sig[j] = min over shingles of a_j*h(s)+b_j.
    * Native Catalyst expression (graft.functions.MinHashSig) — the nested
    * higher-order-function formulation evaluated interpretively at ~10µs
    * per inner element and was ~1000× slower at equal output. Computed in
    * the scan, no UDF boxing, no shuffle. */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    graft.functions.HashFunctions.minhashSignature(shingleCol, numHashes)

  /** LSH band keys from a signature: bands × rowsPerBand = numHashes;
    * near-dup pairs agree on at least one full band whp. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        xxhash64(concat_ws(",",
          transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
            x => x.cast("string"))), b).as("bucket")))

  /** MinHash+LSH near-duplicate pairs.
    * shingle → minhash → band → bucket self-join → exact-Jaccard verify.
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7,
      maxBucketSize: Long = 10000L): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")
    val base = df.select(q(idCol).as("id"),
        shingles(q(textCol), shingleK).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    // Only (id, band, bucket) reaches the bucket-forming shuffle — the
    // (heavy) shingle arrays are re-attached to the deduped candidate
    // pairs afterwards. At scale this is the difference between shuffling
    // ids and shuffling whole documents.
    val banded = base
      .select(col("id"), explode(bandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    val candidates = bucketedPairs(banded, Seq("band", "bucket"), "id", maxBucketSize)
    verifyJaccard(base, candidates, threshold)
  }

  /** Exact-Jaccard verification of candidate pairs. The shingle re-attach
    * is pre-filtered with a LEFT SEMI join on the candidate id set:
    * Catalyst pushes the semi join below the shingle projection
    * (PushDownLeftSemiAntiJoin), so shingles are recomputed — and their
    * arrays shuffled — only for documents that appear in a candidate pair,
    * O(candidates) instead of O(corpus). At web scale candidates are a tiny
    * fraction of the corpus, and AQE broadcast-joins the id set. */
  /** Candidate-pruned value re-attach shared by the three verify stages
    * (r18 review: the union → semi-prune → double-join shape was
    * hand-copied in verifyJaccard / simhashPairs / embeddingCosinePairs):
    * prune `base` (id, valueCol) to ids appearing in `candidates`
    * (id_a, id_b) via one semi join, then attach the value to both sides
    * as `aName`/`bName` — O(candidates), never O(corpus); AQE
    * broadcast-joins the id set. */
  private def attachPrunedPair(base: DataFrame, candidates: DataFrame,
      valueCol: String, aName: String, bName: String): DataFrame = {
    val candIds = candidates.select(col("id_a").as("id"))
      .union(candidates.select(col("id_b").as("id"))).distinct()
    val pruned = base.join(candIds, Seq("id"), "left_semi")
    candidates
      .join(pruned.select(col("id").as("id_a"), col(valueCol).as(aName)), "id_a")
      .join(pruned.select(col("id").as("id_b"), col(valueCol).as(bName)), "id_b")
  }

  private def verifyJaccard(base: DataFrame, candidates: DataFrame,
      threshold: Double): DataFrame = {
    attachPrunedPair(base, candidates, "sh", "sh_a", "sh_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash of a text column: per-token hash bits vote ±1, sign of
    * each bit-sum becomes the bit. Native Catalyst expression
    * (graft.functions.SimHash64) — one tight loop per row. */
  def simhash64(text: Column): Column =
    graft.functions.HashFunctions.simhash64(TextAnalysis.tokens(text))

  /** SimHash near-dup pairs with Hamming distance <= maxHamming (< 4):
    * 4 × 16-bit chunk bucketing guarantees candidates share a chunk
    * (pigeonhole), then exact bit_count verify. */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucketSize: Long = 10000L): DataFrame = {
    require(maxHamming <= 3, "4-chunk bucketing covers hamming <= 3")
    val base = df.select(q(idCol).as("id"), simhash64(q(textCol)).as("sh"))
    val chunked = base.select(col("id"),
        explode(transform(sequence(lit(0), lit(3)),
          j => struct(j.as("cid"),
            call_function("shiftright", col("sh"), j * 16).bitwiseAND(0xFFFFL).as("ck")))).as("c"))
      .select(col("id"), col("c.cid").as("cid"), col("c.ck").as("ck"))
    val candidates = bucketedPairs(chunked, Seq("cid", "ck"), "id", maxBucketSize)
    // exact-hamming verify: re-attach the 8-byte fingerprints, pruned to
    // candidate ids first (the shared attachPrunedPair shape)
    attachPrunedPair(base, candidates, "sh", "sh_a", "sh_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** N-gram Jaccard similarity pairs via an inverted index (scale path):
    * explode shingles → drop shingles with document frequency > maxDf
    * (stop-shingles dominate the join otherwise) → join on shingle →
    * candidate pairs → exact Jaccard on full shingle sets.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      threshold: Double = 0.5,
      maxDf: Long = 1000L): DataFrame = {
    val base = df.select(q(idCol).as("id"), shingles(q(textCol), shingleK).as("sh"))
    // Candidate generation shuffles (id, xxhash64(shingle)) — 16 bytes/row
    // instead of the shingle text. A hash collision can only ADD a false
    // candidate pair, which the exact-Jaccard verify below removes, so the
    // result set is identical to joining on the strings.
    val inverted = base.select(col("id"), explode(col("sh")).as("s"))
      .select(xxhash64(col("s")).as("s"), col("id"))
    // one bucket-forming aggregation subsumes the document-frequency cut:
    // singleton shingles emit nothing (size < 2) and stop-shingles with
    // df > maxDf are dropped by the cap — the previous formulation spent
    // a df-count aggregate + a re-join + a self-join on the same semantics
    val cand = bucketedPairs(inverted, Seq("s"), "id", maxDf)
    verifyJaccard(base, cand, threshold)
  }

  /** Connected components over a near-duplicate pair list — the clustering
    * stage a dedup pipeline needs AFTER candidate pairs (minhashPairs /
    * simhashPairs / ngramJaccardPairs / embeddingCosinePairs all emit pair
    * lists; transitive closure turns them into groups). Returns
    * (id, cluster_id) for every node appearing in `pairs`, cluster_id being
    * the minimum node id of its component (deterministic representative).
    *
    * Algorithm: iterative min-label propagation WITH pointer doubling.
    * Each round is ONE action — the (node, label) table joins the
    * symmetric edge list (neighbor propagation) and itself (each node
    * adopts its label's label — path halving), then re-aggregates by
    * min — so O(E) bytes move per round and nothing lands on the driver
    * but the convergence sum (the same per-superstep action GraphX/Pregel
    * issues). The shortcut join bounds rounds at O(log diameter) — the
    * large-star/small-star guarantee — so even a pathological chain of
    * near-dups (diameter n) converges in ~log₂ n rounds; dense near-dup
    * clusters converge in 2-3. Lineage is cut with localCheckpoint each
    * round so the plan stays O(1) deep.
    */
  def clusterPairs(
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b",
      maxIterations: Int = 50): DataFrame = {
    // Block-manager hygiene (r14 verdict #2): every localCheckpoint below
    // persists its RDD (MEMORY_AND_DISK) and those blocks survive until
    // someone unpersists them — the pre-r15 loop left EVERY round's label
    // table resident, so a long-converging 10× corpus stacked
    // rounds×|labels| + |edges| + |pairs| of blocks and pressured the old
    // gen exactly when the join shuffles wanted memory (the r14 driver's
    // dedup_cluster_10x GC storm). Each checkpoint's persisted-RDD id is
    // read from that frame's OWN plan (a localCheckpoint returns a
    // Dataset over a LogicalRDD holding the persisted RDD) — never by
    // diffing the SparkContext-global persistent-RDD registry, which
    // would race a concurrent job's persists on the same context and
    // force-unpersist ITS unrecoverable checkpoint blocks (r15 review).
    // Blocks are freed at the FIRST point the data is provably
    // unreachable: the pair list once the symmetric edge list is built,
    // each round's labels once the next round's checkpoint holds, the
    // edge list once the loop converges. The RETURNED frame's own blocks
    // are never touched — a local checkpoint cannot be recomputed, so
    // freeing them would break the caller. An unexpected plan shape
    // yields no ids, degrading to the caller's session hygiene instead
    // of guessing.
    val sc = pairs.sparkSession.sparkContext
    def checkpointIds(df: DataFrame): Set[Int] =
      df.queryExecution.logical.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
      }.toSet
    def dropIds(ids: Set[Int]): Unit = sc.getPersistentRDDs
      .filter { case (id, _) => ids.contains(id) }
      .values.foreach(_.unpersist(blocking = true))
    // materialize the pair list FIRST: the symmetric union below references
    // it twice, and without this checkpoint the whole upstream candidate-
    // generation DAG (LSH agg + pair generator + verify joins) would run
    // twice — exchange reuse across union branches is not guaranteed
    val p = pairs.select(q(idA).as("u"), q(idB).as("v")).localCheckpoint()
    val edges = p.union(p.select(col("v").as("u"), col("u").as("v")))
      .dropDuplicates("u", "v")
      .localCheckpoint() // reused every round: materialize once, drop lineage
    val edgeIds = checkpointIds(edges)
    dropIds(checkpointIds(p)) // the symmetric edge list is the only reader of p
    // label(u) starts at min(u, min neighbor); every round each node takes
    // the min of its own label and its neighbors' labels.
    //
    // Convergence: the count of nodes whose label CHANGED this round,
    // computed in the same action that materializes the round's lazy
    // checkpoint (each round stays exactly ONE job). The previous label
    // rides the union — the `labels` branch carries its own label in an
    // `old` column, received/shortcut rows carry null, and max(old)
    // recovers it per id (every id is in `labels`, exactly once). Exact
    // for ANY id dtype (r18 review: the former decimal(38,0) label-sum
    // cast CRASHED under ANSI for string ids — and under non-ANSI
    // silently summed nulls to 0, "converging" after one round with
    // under-merged clusters — though every caller so far passed longs).
    var labels = edges.groupBy("u").agg(min(col("v")).as("mn"))
      .select(col("u").as("id"), least(col("u"), col("mn")).as("lbl"))
      .localCheckpoint(false)
    labels.count(): Unit // materialize the init checkpoint
    var labelIds = checkpointIds(labels)
    var converged = false
    var it = 0
    try {
      while (!converged && it < maxIterations) {
        // pointer-doubling shortcut (r6 verdict #6) FUSED into the
        // neighbor join (r19 optimization): every node also adopts its
        // LABEL's label — path halving on the label forest, which turns
        // the worst-case round count from O(diameter) into O(log diameter)
        // (the large-star/small-star bound; a pathological near-dup chain
        // previously hit the round cap). The shortcut is exactly neighbor
        // propagation over the label-forest edges (lbl(id) → id), so
        // unioning those per-round pointer edges into the join's probe
        // side delivers lbl(lbl(id)) to id through the SAME join — one
        // broadcast/join stage per round instead of the former two
        // (received + a second labels⋈labels join), with an identical
        // union-of-candidates set feeding the min. Correctness is
        // unchanged: labels are always node ids of the same component and
        // only decrease, so the changed-count fixed point still certifies
        // component minima.
        // r20 (r19 ADVICE): roots (lbl == id) contribute only a (id, id)
        // self-loop whose delivery — lbl(id) to id — is already the
        // `labels` union branch's own-label row; filtering them drops
        // ~|roots| probe rows per round with an identical candidate set
        val edges2 = edges
          .union(labels.filter(col("lbl") =!= col("id"))
            .select(col("lbl").as("u"), col("id").as("v")))
        // fresh aliases on the probe side: edges2 embeds a projection of
        // `labels`, so joining `labels` directly is an ambiguous self-join
        val lab = labels.select(col("id").as("__jid"), col("lbl").as("__jlbl"))
        val received = edges2.join(lab, col("u") === col("__jid"))
          .select(col("v").as("id"), col("__jlbl").as("lbl"))
        val next = labels.select(col("id"), col("lbl"), col("lbl").as("old"))
          .union(received.select(col("id"), col("lbl"),
            lit(null).cast(received.schema("lbl").dataType).as("old")))
          .groupBy("id").agg(min("lbl").as("lbl"), max("old").as("old"))
          .localCheckpoint(false)
        // materializes next's checkpoint blocks; null-safe so a missing
        // old (impossible by the invariant above, but belt) counts changed
        val changed = next.agg(coalesce(
          sum(when(!(col("lbl") <=> col("old")), 1L)), lit(0L))).head().getLong(0)
        dropIds(labelIds) // the previous round is now unreachable
        labelIds = checkpointIds(next)
        labels = next.select("id", "lbl")
        converged = changed == 0L
        it += 1
      }
      dropIds(edgeIds) // converged: the edge list has no further reader
      if (!converged)
        sys.error(s"clusterPairs: not converged after $maxIterations rounds " +
          "(component diameter exceeds the cap); raise maxIterations")
      labels.select(col("id"), col("lbl").as("cluster_id"))
    } catch {
      // hygiene on EVERY failure path (r18 review: the non-convergence
      // error and any mid-loop job failure used to strand the edge and/or
      // current label checkpoint blocks for the session's lifetime — the
      // exact pressure this function's block accounting exists to avoid);
      // dropIds is registry-filtered, so double-dropping is a no-op, and
      // the RETURNED frame's blocks are only dropped when nothing returns
      case t: Throwable =>
        dropIds(edgeIds); dropIds(labelIds)
        throw t
    }
  }

  /** Near-duplicate removal end-to-end: given a pair list, keep one
    * representative (the minimum id) per connected component and every row
    * that appears in no pair. The loser set is only as large as the number
    * of duplicate rows, and the final step is a left-anti hash join — no
    * full-table shuffle of `df` beyond that join. */
  def dropNearDuplicates(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b"): DataFrame = {
    val losers = clusterPairs(pairs, idA, idB)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as("__loser_id"))
    df.join(losers, q(idCol) === col("__loser_id"), "left_anti")
  }

  /** End-to-end near-duplicate removal pipeline — the composition a
    * training-data pipeline actually runs, in the order the skew guard's
    * own advice prescribes:
    *  1. exact collapse: keep min(id) per whitespace/case-normalized text
    *     (one hash aggregation) — mass-duplicated documents collapse to a
    *     single representative BEFORE LSH, so they can't flood buckets;
    *  2. near-dup candidate pairs among the survivors (n-gram Jaccard
    *     inverted index — exact pair semantics, oracle-verifiable);
    *  3. connected-component clustering + representative keep.
    * Returns the surviving rows of `df`. The exact-collapse key is the
    * normalized text itself (exact semantics); at extreme scale swap in
    * `TextAnalysis.fingerprint64` and accept the 2^-64 collision risk. */
  def nearDupPipeline(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      threshold: Double = 0.5,
      maxDf: Long = 1000L): DataFrame = {
    val reps = df
      .select(q(idCol).as("__nid"), TextAnalysis.normalized(q(textCol)).as("__fp"))
      .groupBy("__fp").agg(min(col("__nid")).as("__rep"))
      .select(col("__rep"))
    val survivors = df.join(reps, q(idCol) === col("__rep"), "left_semi")
    val pairs = ngramJaccardPairs(survivors, idCol, textCol, shingleK, threshold, maxDf)
    dropNearDuplicates(survivors, idCol, pairs)
  }

  /** Cross-document line-level dedup (the C4 / RefinedWeb corpus-cleaning
    * step): every non-blank line that occurs anywhere else in the corpus is
    * kept only at its FIRST occurrence — ordered by (id, line position) —
    * and each document is reassembled from its surviving lines in original
    * order. Documents whose lines are all removed (or all blank) drop out.
    *
    * Shape at 100 TB: lines are exploded in the scan; the winner per line
    * is one hash aggregation whose map-side partial `min(struct(id, pos))`
    * combines locally, so a boilerplate line duplicated a billion times
    * crosses the wire once per task — a window(row_number over line)
    * formulation would instead sort the full explosion and put the hot
    * line's every copy in one partition. Winners then left-semi join back
    * on (id, pos) — uniform keys — and reassembly is one aggregation by id.
    */
  def dedupLinesAcross(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // null ids refuse IN the plan (zero extra jobs — r18 review: a
    // null-id occurrence won the min(struct) winner election, the (id,
    // pos) equi-semi-join then matched nobody, and the shared line
    // silently vanished from EVERY document including the winner; the
    // takedown siblings refuse null ids loudly, this path corrupted)
    val idChecked = when(q(idCol).isNull, raise_error(lit(
        "dedupLinesAcross: null id — a null-keyed document cannot be " +
          "elected line winner (the (id,pos) semi-join cannot match it) " +
          "and its shared lines would vanish corpus-wide")))
      .otherwise(q(idCol))
    val lines = df
      .select(idChecked.as("__id"), posexplode(split(q(textCol), "\n")).as(Seq("__pos", "__line")))
      .filter(length(trim(col("__line"))) > 0)
    val winners = lines
      .groupBy(col("__line").as("__l"))
      .agg(min(struct(col("__id"), col("__pos"))).as("__w"))
      .select(col("__w.__id").as("__id"), col("__w.__pos").as("__pos"))
    lines.join(winners, Seq("__id", "__pos"), "left_semi")
      .groupBy(col("__id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
          s => s("__line")), "\n").as("__text"))
      .select(col("__id").as(idCol), col("__text").as(textCol))
  }

  /** Benchmark decontamination: ids of corpus documents sharing at least
    * one word n-gram with any benchmark text — the standard test-set-leak
    * scrub (WiMBD / GPT-3 appendix style, typically n = 13 on real
    * corpora). Benchmarks are MB-scale next to a 100 TB corpus, so the
    * benchmark's distinct gram hashes BROADCAST and the corpus side is
    * never shuffled for the membership probe: grams are generated in the
    * scan (WordShingles — distinct per document), hashed to 8 bytes, and
    * probed against the broadcast set map-side. The only shuffle is the
    * distinct on contaminated ids. Documents shorter than n tokens
    * contribute their whole text as a single gram (WordShingles semantics),
    * so tiny benchmark items still match verbatim copies. */
  def contaminatedIds(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, ngram: Int = 13): DataFrame = {
    val benchGrams = benchmark
      .select(explode(shingles(q(benchTextCol), ngram)).as("__g"))
      .select(xxhash64(col("__g")).as("__gh")).distinct()
    corpus
      .select(q(idCol).as("id"), explode(shingles(q(textCol), ngram)).as("__g"))
      .select(col("id"), xxhash64(col("__g")).as("__gh"))
      .join(broadcast(benchGrams), Seq("__gh"), "left_semi")
      .select("id").distinct()
  }

  /** Remove contaminated documents from the corpus (left-anti on the
    * contaminated id set — ids only through the join). */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, ngram: Int = 13): DataFrame = {
    val bad = contaminatedIds(corpus, idCol, textCol, benchmark, benchTextCol, ngram)
      .select(col("id").as("__bad_id"))
    corpus.join(bad, q(idCol) === col("__bad_id"), "left_anti")
  }

  /** Incremental EXACT dedup against an existing corpus: drop rows of
    * `incoming` whose whitespace-normalized lowercased text already appears
    * in `corpus` — the membership probe a continuously-ingesting pipeline
    * runs on every new crawl batch so the cleaned corpus never re-admits a
    * document it already holds.
    *
    * Both sides reduce to 8-byte fingerprints before the anti join, so the
    * shuffle moves hashes, never documents, and the corpus side is
    * pre-shrunk with a distinct (partial-agg: each corpus partition emits
    * its distinct fingerprints once). Between batches a pipeline would
    * persist the corpus fingerprint column and anti-join against that
    * table directly rather than re-fingerprinting 100 TB per batch. */
  def dropExistingExact(incoming: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String,
      corpusTextCol: String = ""): DataFrame = {
    val ctc = if (corpusTextCol.isEmpty) textCol else corpusTextCol
    val seen = corpus
      .select(TextAnalysis.fingerprint64(q(ctc)).as("__fp")).distinct()
    incoming.join(seen,
      TextAnalysis.fingerprint64(q(textCol)) === col("__fp"), "left_anti")
  }

  /** [[dropExistingExact]] with a Bloom-filter prefilter — the shape for
    * the common incremental case where `incoming` (one crawl batch) is
    * orders of magnitude smaller than `corpus` (the accumulated 100 TB).
    *
    * The plain anti join shuffles BOTH sides on the fingerprint — including
    * the full corpus fingerprint set, every batch. Here the corpus is
    * instead folded ONCE into a Bloom filter (`df.stat.bloomFilter`: a
    * per-partition sketch merged on the driver — one scan, no shuffle),
    * which splits `incoming` into definitely-new rows (bloom negative — no
    * false negatives, so they're exact) and maybe-seen candidates. Only the
    * candidates' fingerprints (a batch-bounded set) are verified: they
    * broadcast into a left-semi probe of the corpus — again one corpus scan
    * with NO corpus shuffle — and the confirmed hits broadcast back to
    * anti-filter `incoming`. Total: two corpus scans, zero corpus shuffles,
    * and at 1% fpp the verified candidate set is ≈ |true dups| + 1% of the
    * batch. Between batches a pipeline would persist the filter itself
    * (`BloomFilter.writeTo`) and skip the build scan entirely.
    *
    * Result is row-for-row identical to [[dropExistingExact]] (false
    * positives are exactly verified; false negatives don't exist).
    * `expectedItems` sizes the filter (defaults to a corpus count — one
    * cheap metadata-ish job); at 1% fpp the filter costs ~1.2 bytes/item,
    * so size it (or shard the corpus and use several filters) so it fits
    * comfortably in executor memory. The membership probe is a native
    * codegen'd expression ([[graft.functions.BloomMightContain]]) over
    * the broadcast filter — no ScalaUDF on the ingest scan. */
  def dropExistingExactBloom(incoming: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String,
      corpusTextCol: String = "", expectedItems: Long = 0L,
      fpp: Double = 0.01): DataFrame = {
    val ctc = if (corpusTextCol.isEmpty) textCol else corpusTextCol
    val bloom = corpusFingerprintBloom(corpus, ctc, expectedItems, fpp)
    dropExistingWithBloom(incoming, corpus, textCol, ctc, bloom)
  }

  /** Fold the corpus's normalized-text fingerprints into a Bloom filter —
    * one scan, no shuffle (per-partition sketches merge on the driver).
    * Build ONCE and reuse across incremental batches (e.g. every
    * micro-batch of a streaming ingest); persist with
    * `BloomFilter.writeTo` between runs to skip even the build scan. */
  def corpusFingerprintBloom(corpus: DataFrame, textCol: String,
      expectedItems: Long = 0L, fpp: Double = 0.01): org.apache.spark.util.sketch.BloomFilter = {
    val corpusFps = corpus.select(TextAnalysis.fingerprint64(q(textCol)).as("__fp"))
    val items = if (expectedItems > 0) expectedItems else math.max(corpus.count(), 1L)
    corpusFps.stat.bloomFilter("__fp", items, fpp)
  }

  /** The per-batch scrub behind [[dropExistingExactBloom]], taking a
    * prebuilt filter. Broadcasts the filter per call — for repeated
    * batches (streaming), broadcast once and use the `Broadcast`
    * overload so a multi-GB filter isn't re-shipped every micro-batch. */
  def dropExistingWithBloom(incoming: DataFrame, corpus: DataFrame,
      textCol: String, corpusTextCol: String,
      bloom: org.apache.spark.util.sketch.BloomFilter): DataFrame =
    dropExistingWithBloom(incoming, corpus, textCol, corpusTextCol,
      incoming.sparkSession.sparkContext.broadcast(bloom))

  /** [[dropExistingWithBloom]] with an already-broadcast filter. */
  def dropExistingWithBloom(incoming: DataFrame, corpus: DataFrame,
      textCol: String, corpusTextCol: String,
      bc: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter]): DataFrame = {
    val corpusFps = corpus.select(TextAnalysis.fingerprint64(q(corpusTextCol)).as("__fp"))
    val fpIn = TextAnalysis.fingerprint64(q(textCol))
    // batch-bounded candidate fingerprints; broadcast into a semi probe of
    // the corpus (no corpus shuffle), confirmed hits broadcast back. The
    // membership probe is a native codegen'd expression (r9) — no ScalaUDF
    // on the full-width ingest scan.
    val maybeFps = incoming
      .filter(graft.functions.BloomMightContain(bc, fpIn))
      .select(fpIn.as("__fp")).distinct()
    val confirmed = corpusFps
      .join(broadcast(maybeFps), Seq("__fp"), "left_semi").distinct()
    incoming.join(broadcast(confirmed), fpIn === col("__fp"), "left_anti")
  }

  /** Incremental NEAR-dup candidates: (incoming id, corpus id) pairs whose
    * minhash band signatures collide, verified by exact Jaccard — the
    * cross-set counterpart of [[minhashPairs]]. The corpus side's bucket
    * membership is formed with the same hard-capped collect as
    * [[bucketedPairs]] (skew guard rides the aggregation), then the
    * (typically much smaller) incoming batch joins it on the bucket key and
    * explodes corpus ids — incoming×corpus pairs only, never corpus×corpus.
    * Shuffles carry (band, bucket, id); shingles re-attach pruned to
    * candidates for the Jaccard verify. */
  /** (idAlias, sh, band, bucket) LSH band rows for one side — the shared
    * banding of the direct incremental path and the persisted store, so
    * "store ≡ direct" holds by construction. */
  private def bandedSide(df: DataFrame, idCol: String, textCol: String,
      idAlias: String, shingleK: Int, numHashes: Int, bands: Int): DataFrame = {
    // mirror minhashPairs' loud refusal (r18 review: the incremental side
    // silently truncated the signature when bands did not divide
    // numHashes — and banded NOTHING at all for bands > numHashes, so
    // scrubs dropped zero rows with no error)
    require(bands >= 1 && numHashes / bands * bands == numHashes,
      "bands must divide numHashes")
    df.select(q(idCol).as(idAlias), shingles(q(textCol), shingleK).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .select(col(idAlias), col("sh"),
        explode(bandKeys(col("sig"), bands, numHashes / bands)).as("bk"))
      .select(col(idAlias), col("sh"),
        col("bk.band").as("band"), col("bk.bucket").as("bucket"))
  }

  /** Exact-Jaccard verify of (id_new, id_corpus) candidates against
    * (id_new, sh_new) / (id_corpus, sh_corpus) shingle frames. round(_, 4)
    * BEFORE the threshold filter, same as verifyJaccard, so boundary pairs
    * classify identically on every incremental path. */
  private def crossJaccardVerify(cand: DataFrame, shNew: DataFrame,
      shCorpus: DataFrame, threshold: Double): DataFrame =
    cand
      .join(shNew, "id_new")
      .join(shCorpus, "id_corpus")
      .withColumn("inter", size(array_intersect(col("sh_new"), col("sh_corpus"))))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (size(col("sh_new")) + size(col("sh_corpus")) - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_new", "id_corpus", "jaccard")

  def minhashPairsAgainst(incoming: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8, maxBucketSize: Long = 10000L): DataFrame = {
    val cap = math.toIntExact(math.min(maxBucketSize, (Int.MaxValue - 2).toLong))
    val corpusBuckets =
      bandedSide(corpus, idCol, textCol, "id", shingleK, numHashes, bands)
        .groupBy(col("band"), col("bucket"))
        .agg(graft.functions.BoundedCollectItems.of(col("id"), cap + 1).as("__ids"))
        .filter(size(col("__ids")) <= cap)
    val cand =
      bandedSide(incoming, idCol, textCol, "id_new", shingleK, numHashes, bands)
        .select(col("id_new"), col("band"), col("bucket"))
        .join(corpusBuckets, Seq("band", "bucket"))
        .select(col("id_new"), explode(col("__ids")).as("id_corpus"))
        .dropDuplicates("id_new", "id_corpus")
    // exact Jaccard verify: shingle sets re-attached pruned to candidates
    def sh(df: DataFrame, side: String) = df
      .select(q(idCol).as(s"id_$side"), shingles(q(textCol), shingleK).as(s"sh_$side"))
      .join(cand.select(col(s"id_$side")).distinct(), Seq(s"id_$side"), "left_semi")
    crossJaccardVerify(cand, sh(incoming, "new"), sh(corpus, "corpus"), threshold)
  }

  /** Incremental near-dup dedup: drop incoming rows that near-duplicate
    * ANY existing corpus document (exact-or-near membership = anti join on
    * the matched incoming-id set). Compose after [[dropExistingExact]] for
    * the full incremental-ingest scrub. */
  def dropExistingNearDup(incoming: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8, maxBucketSize: Long = 10000L): DataFrame = {
    val matched = minhashPairsAgainst(incoming, corpus, idCol, textCol,
      shingleK, numHashes, bands, threshold, maxBucketSize)
      .select(col("id_new").as("__hit")).distinct()
    incoming.join(matched, q(idCol) === col("__hit"), "left_anti")
  }

  // ============ persisted MinHash signature store (round 8) ==============
  // The dedup counterpart of the AnnIndex encode-once deployment: a 100 TB
  // corpus's shingle sets and LSH band rows are computed ONCE, materialized
  // to parquet, and every subsequent crawl batch scrubs against the store
  // without touching corpus text again. Layout under `path`:
  //   shingles/      (id, sh)            — append-only, one row per doc
  //   rows/          (band, bucket, id)  — append-only LSH band rows
  //   bucket_counts/ (band, bucket, n)   — append-only COUNT DELTAS; serve
  //                  sums them (distinct-bucket-sized, ≪ corpus) so the
  //                  oversized-bucket skip never aggregates the rows table
  //   params.json    shingleK / numHashes / bands — serve-time validation
  // Appending a batch appends to all three and never rewrites history.

  /** One reader for the store's three append-only tables: recursive, so
    * flat legacy files (pre-r16 appends, post-compaction rewrites) and
    * the r16 streamed appends' `<tag>-b<id>` generation subdirs serve
    * together; hidden staging (`.stage-*`) stays invisible, exactly as
    * Spark's file index treats hidden paths. */
  private def readMinhashTable(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(dir)

  private def minhashStoreParams(spark: SparkSession,
      path: String): (Int, Int, Int) = {
    // Hadoop-FS read like every other store file (r18 review: java.nio
    // resolved s3a://... as a local relative path, so the store could
    // neither be built nor served on any non-local filesystem despite
    // the object-store framing of the surrounding docs)
    val jackson = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = jackson.readValue(
      StoreFiles.readUtf8(spark, s"$path/params.json"),
      classOf[java.util.Map[String, Any]])
    require(String.valueOf(root.get("format")) == "graft-minhash-store",
      s"not a MinHash store: $path")
    def num(k: String) = root.get(k).asInstanceOf[java.lang.Number].intValue()
    (num("shingle_k"), num("num_hashes"), num("bands"))
  }

  private def minhashStoreWrite(docs: DataFrame, idCol: String,
      textCol: String, path: String, shingleK: Int, numHashes: Int,
      bands: Int, mode: String): Unit = {
    val spark = docs.sparkSession
    // ids keep their ORIGINAL type (string url keys included) — a cast
    // would null them out and silently empty the store
    val shingled = docs.select(q(idCol).as("id"),
      shingles(q(textCol), shingleK).as("sh"))
    // the band-row source differs by mode (r18 review):
    //  - build (overwrite): write the corpus-scale shingles, then read the
    //    just-written parquet back — one extra compact-columnar scan
    //    instead of caching a corpus-sized frame;
    //  - append: derive from the BATCH's own persisted frame — the former
    //    readback + left-semi re-read the ENTIRE accumulated shingles
    //    table per incremental batch (O(store) I/O for a KB-scale
    //    append; the streamed twin already derives from its own
    //    generation only). shingles/minhash are deterministic in the
    //    text, so the persisted frame and the written parquet agree.
    def rowsOf(src: DataFrame): DataFrame = src
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .select(col("id"),
        explode(bandKeys(col("sig"), bands, numHashes / bands)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.bucket").as("bucket"), col("id"))
    if (mode == "append") {
      // r20 (r19 verdict #1b): the three per-batch writes are INDEPENDENT
      // Spark actions — rows/counts derive from the PERSISTED frames, not
      // from the written files — and a KB-scale append's cost is 3-4
      // sequential jobs' fixed scheduling+commit latency, not executor
      // work (~0.8 s CPU per 8-append bench section against ~9-12 s
      // wall). Overlap them (guide §2.6); the cached parents make the
      // shared compute run once, block-locked, whichever job gets there
      // first. Failure leaves the same partial-files window the
      // sequential form had (this legacy append has no crash contract —
      // the streamed twin below is the resumable path).
      val cached = shingled.persist()
      val rows = rowsOf(cached).persist()
      try {
        StoreFiles.runConcurrently(Seq(
          () => cached.write.mode(mode).parquet(s"$path/shingles"),
          () => rows.write.mode(mode).parquet(s"$path/rows"),
          () => rows.groupBy("band", "bucket").agg(count(lit(1)).as("n"))
            .write.mode(mode).parquet(s"$path/bucket_counts")))
      } finally {
        rows.unpersist()
        cached.unpersist(): Unit
      }
    } else {
      // build: write the corpus-scale shingles first (the rows derive
      // from the just-written parquet — one extra compact-columnar scan
      // instead of caching a corpus-sized frame), then the two
      // rows-derived writes overlap (both read the persisted band rows)
      shingled.write.mode(mode).parquet(s"$path/shingles")
      val rows = rowsOf(readMinhashTable(spark, s"$path/shingles")).persist()
      try {
        StoreFiles.runConcurrently(Seq(
          () => rows.write.mode(mode).parquet(s"$path/rows"),
          () => rows.groupBy("band", "bucket").agg(count(lit(1)).as("n"))
            .write.mode(mode).parquet(s"$path/bucket_counts")))
      } finally rows.unpersist(): Unit
    }
  }

  /** Bound a just-built store table's file count to the compaction
    * target (~128 MB/file — [[StoreFiles.targetFileCount]]): the spread
    * 10× build (r19) writes `shingles` at the INPUT's partitioning — one
    * file per input partition, 32 sub-MB files at bench scale — and
    * every downstream scrub/compact then pays per-file listing + footer
    * + open-cost overhead (the r19 verdict's store-read regression
    * cluster; per-table file counts in tools/R20Probe). The build-time
    * coalesce rewrite is a pure file-count rewrite of freshly written
    * compact columnar bytes and SKIPS itself once files approach the
    * target size — a 100 TB build whose scan tasks already emit
    * ~100 MB files rewrites nothing (scale-adaptive, no constant tuned
    * to local mode). Guide §6: small files hurt every later reader; fix
    * the layout where it is created. */
  private def boundStoreTableFiles(spark: SparkSession, dir: String): Unit = {
    val files = StoreFiles.dataFileCountRecursive(spark, dir)
    val tgt = StoreFiles.targetFileCount(StoreFiles.dataBytesRecursive(spark, dir))
    if (files > math.max(2 * tgt, 2)) {
      readMinhashTable(spark, dir)
        .coalesce(tgt).write.mode("overwrite").parquet(dir + ".compacting")
      StoreFiles.swapDir(spark, dir + ".compacting", dir)
    }
  }

  /** Build a persisted MinHash store from a corpus (one corpus scan plus
    * one scan of the materialized shingles). */
  def buildMinHashStore(corpus: DataFrame, idCol: String, textCol: String,
      path: String, shingleK: Int = 3, numHashes: Int = 64,
      bands: Int = 16): Unit = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    minhashStoreWrite(corpus, idCol, textCol, path, shingleK, numHashes,
      bands, "overwrite")
    // r20 (r19 verdict #1a): bound each table's file count at build time
    // (see boundStoreTableFiles — no-op once files are production-sized).
    // The three rewrites touch disjoint dirs, so they overlap (guide
    // §2.6); they must all run AFTER minhashStoreWrite returns — the
    // rows/counts jobs read the shingles files a concurrent shingles
    // swap would delete mid-scan.
    StoreFiles.runConcurrently(Seq("shingles", "rows", "bucket_counts")
      .map(t => () => boundStoreTableFiles(corpus.sparkSession, s"$path/$t")))
    val json = s"""{"format":"graft-minhash-store","shingle_k":$shingleK,"num_hashes":$numHashes,"bands":$bands}"""
    StoreFiles.writeUtf8Atomic(corpus.sparkSession, s"$path/params.json", json)
  }

  /** Append a new batch to an existing store — pure file additions under
    * the store's frozen parameters; ids must be new. */
  def appendToMinHashStore(batch: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    val (k, h, b) = minhashStoreParams(batch.sparkSession, path)
    minhashStoreWrite(batch, idCol, textCol, path, k, h, b, "append")
  }

  /** Per-tag high-water mark for the streamed append/retract — the store
    * is pre-manifest (plain dirs), so marks live beside `params.json` in
    * ONE FILE PER TAG (`marks-<tag>.json`, the pipeline staging dir's
    * layout; r17 advice). The r16 interim kept a single shared
    * `marks.json`, whose read-modify-write silently LOST one tag's mark
    * if an append stream and a takedown stream (each with its own tag,
    * as the API invites) ever committed concurrently — and a lost mark
    * re-opens redelivery double-commit once compaction flattens the
    * generation dirs (the visible-generation self-heal no longer
    * applies). Per-tag files make each stream's mark single-writer by
    * construction. Reads fall back to a legacy shared `marks.json`
    * (frozen — never written again); a per-tag file always wins, which
    * is monotone-safe because marks only advance. Absent everywhere =
    * no mark (a never-streamed or legacy store). Shared codec:
    * [[StoreFiles.readLongMarks]]. */
  private def minhashMark(spark: SparkSession, path: String,
      tag: String): Option[Long] =
    StoreFiles.readLongMarks(spark, s"$path/marks-$tag.json",
      "graft-minhash-marks").get(tag)
      .orElse(StoreFiles.readLongMarks(spark, s"$path/marks.json",
        "graft-minhash-marks").get(tag))

  private def writeMinhashMark(spark: SparkSession, path: String,
      tag: String, batchId: Long): Unit =
    StoreFiles.writeLongMarks(spark, s"$path/marks-$tag.json",
      "graft-minhash-marks", Map(tag -> batchId))

  /** The streaming twin of [[appendToMinHashStore]] (r16 — the missing
    * member of the BM25/ANN/fingerprint `appendBatch` family, required
    * for the nightly pipeline's cross-store crash-resume): `(streamTag,
    * batchId)` makes foreachBatch's at-least-once redeliveries
    * exactly-once. Returns false (no-op) at or below the tag's committed
    * high-water mark.
    *
    * Mechanics — the store is pre-manifest, so the batch lands as one
    * `<tag>-b<id>` generation SUBDIR per table (readers are recursive;
    * flat legacy files serve unchanged), each published by a hidden
    * stage → rename flip, in fixed order shingles → rows → bucket_counts,
    * and the mark advances LAST:
    *
    *  - a visible generation dir is COMPLETE by construction (the rename
    *    is the publish), so a resume skips it and fills in only the
    *    missing tables — on resume, band rows and count deltas re-derive
    *    DETERMINISTICALLY from the batch's persisted shingles generation,
    *    never from the caller's frame (which a retry may rebuild
    *    differently); a fresh attempt derives all three tables from ONE
    *    pinned (localCheckpoint) shingle frame, which is equivalent —
    *    the pinned blocks ARE what the shingles write writes, and losing
    *    them fails loudly into this same resume (r20b);
    *  - every crash window is correct-at-worst-superset for serves:
    *    shingles-without-rows are inert (no band rows → no candidates);
    *    rows-without-counts UNDERCOUNT a bucket, which only disables the
    *    oversized-bucket skip for it (more candidate work, same verified
    *    pairs) — and the window closes on resume;
    *  - a crash after all three flips but before the mark re-runs as a
    *    pure no-op (all dirs present) and then advances the mark.
    *
    * Single-writer contract, and resume-before-compact: a crashed batch
    * must be redelivered before the next [[compactMinHashStore]] (which
    * flattens generation dirs — standard crash-RESUME cadence, the same
    * contract the manifest stores' cooling windows assume). */
  def appendBatchToMinHashStore(batch: DataFrame, idCol: String,
      textCol: String, path: String, streamTag: String,
      batchId: Long): Boolean = {
    StoreFiles.requireStreamTag(streamTag)
    require(batchId >= 0, s"batchId >= 0, got $batchId")
    val spark = batch.sparkSession
    val (shingleK, numHashes, bands) = minhashStoreParams(spark, path)
    if (minhashMark(spark, path, streamTag).exists(batchId <= _))
      return false
    val gen = s"$streamTag-b$batchId"
    val f = StoreFiles.fs(spark, path)
    def visible(t: String): Boolean =
      f.exists(new org.apache.hadoop.fs.Path(s"$path/$t/$gen"))
    // r20b (r19 verdict #1b, second cut): ONE staging wave for all three
    // tables instead of two (shingles first, then rows+counts re-derived
    // from the written generation). The crash contract requires rows and
    // counts to agree bit-for-bit with the VISIBLE shingles generation
    // and never to re-trust the caller's frame, so the band-row source
    // depends on the attempt:
    //  - FRESH attempt (no shingles generation yet): the shingle frame
    //    is pinned with a lazy localCheckpoint — all three staging jobs
    //    read the SAME materialized blocks, and a lost block FAILS the
    //    job loudly (checkpoint blocks are not recomputable) instead of
    //    silently recomputing from a possibly nondeterministic caller
    //    frame. Deterministic-or-loud; the loud path's retry lands in
    //    this function's own resume branch.
    //  - RESUME (shingles generation visible): the source is the
    //    written generation, exactly as before — only the missing
    //    tables stage and publish.
    // Stage dirs are hidden, so the wider overlap stays invisible to
    // readers (guide §2.6). The PUBLISH renames keep the fixed
    // shingles → rows → bucket_counts order the crash contract
    // requires: counts-without-rows would overcount a bucket and
    // wrongly enable the oversized-bucket skip, rows-without-shingles
    // would emit candidates whose Jaccard verify finds no shingle set —
    // the kept order's windows are the documented
    // correct-at-worst-superset ones, unchanged.
    val shVisible = visible("shingles")
    val src =
      if (shVisible) spark.read.parquet(s"$path/shingles/$gen")
      else batch.select(q(idCol).as("id"),
        shingles(q(textCol), shingleK).as("sh")).localCheckpoint(false)
    try {
      val rows = src
        .withColumn("sig", minhashSignature(col("sh"), numHashes))
        .select(col("id"),
          explode(bandKeys(col("sig"), bands, numHashes / bands)).as("bk"))
        .select(col("bk.band").as("band"), col("bk.bucket").as("bucket"),
          col("id"))
      // a table whose generation is already visible (crash resume) is
      // neither staged nor re-published — publishDirOnce's skip, kept.
      // rows and counts each evaluate the signature+explode from the
      // pinned/parquet source independently (KB-scale per batch);
      // determinism holds because the source cannot diverge.
      val toStage = Seq(
        "shingles" -> (() => src),
        "rows" -> (() => rows),
        "bucket_counts" -> (() => rows.groupBy("band", "bucket")
          .agg(count(lit(1)).as("n"))))
        .filterNot { case (t, _) => visible(t) }
      StoreFiles.runConcurrently(toStage.map { case (t, df) =>
        () => df().write.mode("overwrite").parquet(s"$path/$t/.stage-$gen")
      })
      toStage.foreach { case (t, _) =>
        require(f.rename(
          new org.apache.hadoop.fs.Path(s"$path/$t/.stage-$gen"),
          new org.apache.hadoop.fs.Path(s"$path/$t/$gen")),
          s"appendBatchToMinHashStore: rename $path/$t/.stage-$gen -> " +
            s"$path/$t/$gen failed")
      }
    } finally if (!shVisible) dropCheckpointBlocks(src)
    // per-tag file: this stream is its only writer, no other tag's mark
    // rides in it
    writeMinhashMark(spark, path, streamTag, batchId)
    true
  }

  /** Free a localCheckpoint's persisted blocks once its last reader is
    * done — the registry-filtered unpersist clusterPairs uses, shared by
    * the streamed append's pinned shingle frame. Reads the RDD ids from
    * the frame's OWN plan (never by diffing the context-global persisted
    * set, which would race concurrent jobs); an unexpected plan shape
    * yields no ids and degrades to the context cleaner. */
  private def dropCheckpointBlocks(df: DataFrame): Unit = {
    val ids = df.queryExecution.logical.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }.toSet
    df.sparkSession.sparkContext.getPersistentRDDs
      .filter { case (id, _) => ids.contains(id) }
      .values.foreach(_.unpersist(blocking = false))
  }

  /** foreachBatch writer wrapping [[appendBatchToMinHashStore]] — the
    * sibling of `Retrieval.indexAppendWriter` / `AnnStore.appendWriter`:
    * attach to a crawl stream and the store ingests each micro-batch
    * exactly-once under the tag ↔ checkpoint contract. */
  def minhashAppendWriter(stream: DataFrame, idCol: String, textCol: String,
      path: String, streamTag: String):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    StoreFiles.requireStreamTag(streamTag) // fail at construction, not batch 0
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      appendBatchToMinHashStore(batch, idCol, textCol, path, streamTag, id): Unit
    }
  }

  /** The live retracted ids of a MinHash store as a one-column `id`
    * frame, or None when there are none. Broadcast-small by contract
    * (enforced at [[retractFromMinHashStore]]). */
  private def minhashTombstones(spark: SparkSession,
      path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tombs")
    if (!StoreFiles.fs(spark, path).exists(p)) None
    else if (StoreFiles.dataFileCountRecursive(spark, s"$path/tombs") == 0) None
    // recursiveFileLookup: retraction batches land as one generation DIR
    // each (r15 — the shared StoreFiles.commitTombstones layout); the
    // option also reads any pre-r15 flat files unchanged
    else Some(spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$path/tombs").select("id").distinct())
  }

  /** Number of live retracted ids (0 after [[compactMinHashStore]]
    * retires them) — the audit counter for retraction verification. */
  def minhashRetractionCount(spark: SparkSession, path: String): Long =
    minhashTombstones(spark, path).fold(0L)(_.count())

  /** Retract documents from a MinHash store by id — the takedown path
    * for NEAR-dup dedup (content removed from the training corpus must
    * stop suppressing future crawls of similar text). Ids land in an
    * append-mode `tombs/` side (the store's pre-manifest idiom: plain
    * dirs + swap-based compaction), and every serve anti-joins the
    * stored band rows against them, so retracted documents stop
    * generating candidate pairs immediately — with zero store bytes
    * rewritten. [[compactMinHashStore]] is the physical-erasure point:
    * rows/shingles scrub, the bucket-count snapshot recomputes from the
    * SCRUBBED rows, and the tombstones clear. Between retraction and
    * compaction the serve subtracts the retracted rows' bucket
    * membership from the stored count deltas before applying the
    * oversized-bucket cap (r15 — one extra tombstone-bounded semi-join
    * that exists only inside that window), so the cap decision matches
    * the live corpus exactly even when a bucket straddles it. A retraction masks its id store-wide until a
    * compaction retires it — retract→re-add must compact in between.
    * Unknown ids are fine; null ids refuse; the broadcast-small contract
    * is enforced via `graft.minhash.maxTombstones` (default 10M).
    * Single-writer contract, like appends. */
  def retractFromMinHashStore(ids: DataFrame, idCol: String,
      path: String): Long =
    commitMinhashRetraction(ids, idCol, path, None)

  /** The streaming twin of [[retractFromMinHashStore]] (r16 — the
    * takedown-side sibling of [[appendBatchToMinHashStore]], completing
    * the exactly-once family for crash-resumable takedown compositions):
    * `(streamTag, batchId)` names the tombstone generation `<tag>-b<id>`
    * and the store's per-tag mark (its own `marks-<tag>.json` — a tag is
    * 1:1 with one stream's checkpoint, so an append stream and a
    * takedown stream with distinct tags may commit concurrently without
    * racing each other's marks; r17 advice) makes redeliveries no-ops
    * (returns 0). The mark advances AFTER the
    * tombstone flip; a crash between them leaves the batch's generation
    * VISIBLE (already masking — the rename is the publish on this
    * directory-listed store) with a stale mark, and the resume detects
    * the visible generation and only advances the mark — it must NOT
    * re-run the commit, whose reclaim (delete-then-rename) would
    * transiently UNMASK the committed tombstones for concurrent
    * lock-free serves (r16 second-pass review; the manifest stores have
    * no such window because their readers never list directories). */
  def retractBatchFromMinHashStore(ids: DataFrame, idCol: String,
      path: String, streamTag: String, batchId: Long): Long = {
    StoreFiles.requireStreamTag(streamTag)
    require(batchId >= 0, s"batchId >= 0, got $batchId")
    val spark = ids.sparkSession
    minhashStoreParams(spark, path): Unit // sentinel: refuse non-store dirs
    if (minhashMark(spark, path, streamTag).exists(batchId <= _)) 0L
    else {
      val gen = s"$streamTag-b$batchId"
      val genRows =
        StoreFiles.parquetRowsWritten(spark, s"$path/tombs/$gen")
      if (genRows >= 0L) {
        // crash-before-mark window: the flip completed (a visible gen is
        // complete by construction), so the batch is already masking —
        // just advance the mark and report the committed rows
        writeMinhashMark(spark, path, streamTag, batchId)
        genRows
      } else {
        // the mark advances AFTER the commit returns (flip-then-mark
        // ordering) — an empty batch commits no generation but still
        // advances, so its redelivery stops retrying
        val n = commitMinhashRetraction(ids, idCol, path,
          Some((streamTag, batchId)))
        writeMinhashMark(spark, path, streamTag, batchId)
        n
      }
    }
  }

  /** foreachBatch writer for a takedown stream — each micro-batch of ids
    * retracts through [[retractBatchFromMinHashStore]] (the
    * `Retrieval.deleteWriter` shape). */
  def minhashRetractWriter(stream: DataFrame, idCol: String, path: String,
      streamTag: String):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    StoreFiles.requireStreamTag(streamTag) // fail at construction
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      retractBatchFromMinHashStore(batch, idCol, path, streamTag, id): Unit
    }
  }

  private def commitMinhashRetraction(ids: DataFrame, idCol: String,
      path: String, stream: Option[(String, Long)]): Long = {
    val spark = ids.sparkSession
    minhashStoreParams(spark, path): Unit // sentinel: refuse non-store dirs
    // this store is pre-manifest (plain dirs + swap compaction), so
    // commitTombstones' stage→rename flip IS the publish — readers list
    // tombs/ directly — and publish() is a no-op (the streamed caller
    // advances its mark AFTER this returns, from its entry read). The
    // live mass for the broadcast-small cap is everything a serve
    // actually reads: one recursive footer count over tombs/ covers both
    // the r15 generation dirs AND any pre-r15 flat append files (r15
    // review — counting only the dirs let a legacy flat-file mass bypass
    // the cap). A same-named visible generation never reaches here — the
    // streamed caller short-circuits on it (see above), so the cap math
    // needs no orphan subtraction. Shared mechanics otherwise — see
    // StoreFiles.commitTombstones (r15, verdict #5).
    val liveRows = math.max(0L,
      StoreFiles.parquetRowsWritten(spark, s"$path/tombs"))
    StoreFiles.commitTombstones(ids.select(q(idCol).as("id")), "id",
      s"$path/tombs", Nil, stream.map { case (tag, id) => s"$tag-b$id" },
      "graft.minhash.maxTombstones",
      "retractFromMinHashStore", "compactMinHashStore",
      extraLiveRows = liveRows)(_ => ())
  }

  /** [[minhashPairsAgainst]] served from a persisted store: corpus text is
    * never read — band rows join the incoming batch's band keys, the
    * oversized-bucket skip reads only the summed count deltas, and the
    * exact-Jaccard verify joins the stored shingle sets. Row-identical to
    * the direct path (spec-asserted). Retracted ids
    * ([[retractFromMinHashStore]]) never generate candidates. */
  def minhashPairsAgainstStore(incoming: DataFrame, idCol: String,
      textCol: String, path: String, threshold: Double = 0.8,
      maxBucketSize: Long = 10000L): DataFrame = {
    val spark = incoming.sparkSession
    val (shingleK, numHashes, bands) = minhashStoreParams(spark, path)
    val cap = math.toIntExact(math.min(maxBucketSize, (Int.MaxValue - 2).toLong))
    val banded =
      bandedSide(incoming, idCol, textCol, "id_new", shingleK, numHashes, bands)
        .select(col("id_new"), col("band"), col("bucket"))
    // r20 (guide §3.2 / §2.3): only buckets the BATCH probes can ever
    // generate candidates — a bucket absent from `probed` cannot match
    // the (band, bucket) equi-join below, whatever its cap status — so
    // the cap decision's two aggregations (the count-delta sum and, in
    // the retraction window, the retracted-membership count) are
    // semi-join-pruned to the batch's distinct bucket keys BEFORE they
    // aggregate. Without the pruning every scrub re-aggregated the FULL
    // bucket_counts table — distinct-bucket-sized ≈ bands × |corpus
    // docs|, corpus-scale at 100 TB — to decide caps for buckets the
    // batch never probes. AQE broadcasts the probed key set when the
    // batch is small (the scrub contract's common case) and degrades to
    // a partitioned semi join — no worse than the old full aggregation —
    // when it is not.
    val probed = banded.select("band", "bucket").distinct()
    // the bounded set is the OVER-cap buckets (rare by design: skew/
    // boilerplate keys) — broadcast those and anti-join; the under-cap set
    // is ~bands·|corpus| for a mostly-unique corpus and must never be a
    // broadcast side
    val tomb = minhashTombstones(spark, path)
    val counts = readMinhashTable(spark, s"$path/bucket_counts")
      .join(probed, Seq("band", "bucket"), "left_semi")
      .groupBy("band", "bucket").agg(sum("n").as("n"))
    val overCap = tomb match {
      case None => counts.filter(col("n") > cap).select("band", "bucket")
      case Some(t) =>
        // between a retraction and its compaction the stored count deltas
        // still include retracted rows, so the raw sums would skip a
        // bucket whose LIVE size is under the cap — subtract the
        // retracted rows' bucket membership (tombstones are
        // broadcast-small; the extra semi-join scan of rows/ exists only
        // inside the retract→compact window) so the cap decision matches
        // the direct path over the live corpus exactly (r14 ADVICE — the
        // serve ≡ direct row-identity the spec asserts holds even when a
        // bucket straddles the cap)
        val retracted = readMinhashTable(spark, s"$path/rows")
          .join(probed, Seq("band", "bucket"), "left_semi")
          .join(broadcast(t), Seq("id"), "left_semi")
          .groupBy("band", "bucket").agg(count(lit(1)).as("rn"))
        counts.join(retracted, Seq("band", "bucket"), "left")
          .filter(col("n") - coalesce(col("rn"), lit(0L)) > cap)
          .select("band", "bucket")
    }
    val corpusRows0 = readMinhashTable(spark, s"$path/rows")
      .join(broadcast(overCap), Seq("band", "bucket"), "left_anti")
    val corpusRows = tomb.fold(corpusRows0) { t =>
      corpusRows0.join(broadcast(t), Seq("id"), "left_anti") }
    val cand = banded
        .join(corpusRows, Seq("band", "bucket"))
        .select(col("id_new"), col("id").as("id_corpus"))
        .dropDuplicates("id_new", "id_corpus")
    val shNew = incoming
      .select(q(idCol).as("id_new"), shingles(q(textCol), shingleK).as("sh_new"))
      .join(cand.select("id_new").distinct(), Seq("id_new"), "left_semi")
    val shCorpus = readMinhashTable(spark, s"$path/shingles")
      .select(col("id").as("id_corpus"), col("sh").as("sh_corpus"))
      .join(cand.select("id_corpus").distinct(), Seq("id_corpus"), "left_semi")
    crossJaccardVerify(cand, shNew, shCorpus, threshold)
  }

  /** Compact a MinHash store after N appends: the per-append
    * `bucket_counts` COUNT DELTAS collapse into one summed snapshot
    * (distinct-bucket-sized), and `rows/` / `shingles/` rewrite into
    * size-targeted files (default ~128 MB). Served results are UNCHANGED —
    * the serve already sums the deltas and unions the row files, so
    * compaction only removes the per-file LIST/GET overhead that
    * accumulates with crawl appends (the object-store small-files killer).
    * Hash-identity vs the uncompacted store is gate-asserted.
    *
    * Crash safety: the three directory swaps are independent and each
    * replaces content with an EQUIVALENT re-aggregation, so a crash
    * BETWEEN swaps leaves a mixed — but still correct — store; a crash
    * INSIDE a swap leaves that one directory missing (serves fail loudly,
    * never wrong) and the healDir pass at the top of the next compact run
    * restores it. Re-running compact always completes the job. */
  def compactMinHashStore(spark: SparkSession, path: String,
      targetFiles: Int = 0): Unit = {
    minhashStoreParams(spark, path) // sentinel: refuse non-store directories
    Seq("bucket_counts", "rows", "shingles")
      .foreach(d => StoreFiles.healDir(spark, s"$path/$d"))
    def target(dir: String): Int =
      if (targetFiles > 0) targetFiles
      else StoreFiles.targetFileCount(StoreFiles.dataBytesRecursive(spark, dir))
    // retraction healing (r14): retracted ids drop from the rewritten
    // rows/shingles, and the count snapshot recomputes from the SCRUBBED
    // rows instead of the delta sum — compaction is the physical-erasure
    // point. Crash ordering stays correct at every window: the tombs dir
    // clears LAST, so a crash mid-compaction leaves the serve-side
    // anti-join masking whatever a swapped dir still holds, and a re-run
    // completes the job.
    val tomb = minhashTombstones(spark, path)
    def scrub(df: DataFrame): DataFrame =
      tomb.fold(df)(t => df.join(broadcast(t), Seq("id"), "left_anti"))
    // 1. count deltas -> one summed snapshot (semantically what every
    //    serve computes on the fly). repartition, NOT coalesce: coalesce
    //    would fold the sum's reduce side down to the output file count
    //    (1 for most stores) — the extra shuffle moves only the summed
    //    output, which is distinct-bucket-sized
    val bcDir = s"$path/bucket_counts"
    val counts = tomb match {
      case None => readMinhashTable(spark, bcDir)
        .groupBy("band", "bucket").agg(sum("n").as("n"))
      case Some(_) => scrub(readMinhashTable(spark, s"$path/rows"))
        .groupBy("band", "bucket").agg(count(lit(1)).as("n"))
    }
    counts
      .repartition(target(bcDir)).write.mode("overwrite")
      .parquet(bcDir + ".compacting")
    StoreFiles.swapDir(spark, bcDir + ".compacting", bcDir)
    // 2-3. band rows and shingles: pure file-count rewrites. coalesce is
    //    right here — no aggregation to starve, and the task count
    //    (bytes/128 MB) scales with store size, so big stores keep their
    //    read parallelism. r20: the two rewrite+swap chains touch
    //    DISJOINT directories (each reads and swaps only its own), so
    //    they overlap (guide §2.6); the counts snapshot above must stay
    //    sequential — in the retraction branch it reads rows/, which the
    //    rows swap would delete mid-scan. Crash windows are unchanged:
    //    the swaps were already order-independent ("a crash BETWEEN
    //    swaps leaves a mixed but correct store"), any chain that dies
    //    inside its swap leaves that one dir missing for healDir, and
    //    tombs still clear LAST.
    StoreFiles.runConcurrently(Seq(s"$path/rows", s"$path/shingles")
      .map(dir => () => {
        scrub(readMinhashTable(spark, dir))
          .coalesce(target(dir)).write.mode("overwrite")
          .parquet(dir + ".compacting")
        StoreFiles.swapDir(spark, dir + ".compacting", dir)
      }))
    // retractions are now physical — retire the tombstones (last, so any
    // crash above leaves them still masking)
    if (tomb.nonEmpty)
      StoreFiles.fs(spark, path)
        .delete(new org.apache.hadoop.fs.Path(s"$path/tombs"), true): Unit
  }

  /** Live visible data files across the store's tables (tombstones
    * included — every serve lists and anti-joins them), the quantity the
    * compaction cadence bounds. */
  def minhashStoreFileCount(spark: SparkSession, path: String): Int =
    Seq("shingles", "rows", "bucket_counts", "tombs")
      .map(t => StoreFiles.dataFileCountRecursive(spark, s"$path/$t")).sum

  /** Threshold-driven compaction cadence for crawl loops (r16, r15-verdict
    * #2 — the long-soak contract): call after every append/takedown;
    * compacts only when the store's visible file count exceeds `maxFiles`,
    * so hundreds of interleaved append/takedown cycles keep the file
    * count sawtoothing under the threshold (and serve latency flat)
    * instead of degrading into the object-store small-files regime.
    * Returns true when a compaction ran. ScaleProbe's `soak` leg drives
    * ~100 cycles and records both curves (BASELINE.md §r16). */
  def compactMinHashStoreIfNeeded(spark: SparkSession, path: String,
      maxFiles: Int = 64, targetFiles: Int = 0): Boolean = {
    if (minhashStoreFileCount(spark, path) <= maxFiles) false
    else { compactMinHashStore(spark, path, targetFiles); true }
  }

  /** [[dropExistingNearDup]] against a persisted store. */
  def dropExistingNearDupStore(incoming: DataFrame, idCol: String,
      textCol: String, path: String, threshold: Double = 0.8,
      maxBucketSize: Long = 10000L): DataFrame = {
    val matched = minhashPairsAgainstStore(incoming, idCol, textCol, path,
      threshold, maxBucketSize)
      .select(col("id_new").as("__hit")).distinct()
    incoming.join(matched, q(idCol) === col("__hit"), "left_anti")
  }

  /** (id, pos, span-hash) for every k-token span of every document — the
    * shared scan of the span-dedup family, via the native
    * [[graft.functions.SpanHashes]] loop (tokenize once per row, O(k)
    * per span). The obvious formulations are quadratic traps: aliasing the
    * token array in a projection below the explode lets CollapseProject
    * inline the split into the per-span slice, and referencing the token
    * EXPRESSION inside a per-span lambda re-evaluates it per element —
    * both re-split the whole document per span, O(tokens²·regex) per doc
    * (measured ~25 µs/span on the 10× corpus before this shape). */
  private def spanOcc(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    df.select(q(idCol).as("id"), posexplode(
        graft.functions.HashFunctions.spanHashes(
          TextAnalysis.tokens(q(textCol)), k)).as(Seq("__p0", "__h")))
      .select(col("id"), (col("__p0") + 1).as("pos"), col("__h"))

  /** Span-level cross-document duplicate detection — the hash-based
    * re-expression of suffix-array substring dedup (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better"): every
    * occurrence of a k-token span whose text appears in at least `minDocs`
    * DISTINCT documents. Returns (idCol, pos, n_docs), pos the 1-based
    * token position of the span start; documents shorter than k tokens
    * emit nothing; a span repeated only within one document is NOT flagged
    * (that is [[TextAnalysis.duplicateLineFraction]]'s job).
    *
    * Shape at 100 TB: spans are hashed to 8 bytes in the scan, so the two
    * wide ops — the distinct-doc count per span hash and the hash join
    * marking occurrences — move (hash, id, pos) ≈ 24 bytes per token,
    * never span text. Both aggregate partially map-side; the span-hash key
    * space is uniform (xxhash64) so neither shuffle skews. */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, minDocs: Long = 2L): DataFrame = {
    require(k >= 1, "k >= 1")
    require(minDocs >= 2, "minDocs >= 2")
    val occ = spanOcc(df, idCol, textCol, k)
    val dup = occ.groupBy("__h")
      .agg(count_distinct(col("id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
    occ.join(dup, Seq("__h"))
      .select(col("id").as(idCol), col("pos"), col("n_docs"))
  }

  /** [[duplicatedSpans]] collapsed to per-document token ranges: merge
    * overlapping/adjacent duplicated spans into (idCol, start_pos,
    * end_pos) — end_pos inclusive, in tokens — the "cut these ranges"
    * output a span-dedup pass feeds to the rewrite step. Gaps-and-islands
    * over a window PARTITIONED BY DOCUMENT (per-partition data is bounded
    * by document length, so the window is skew-safe at any corpus size). */
  def duplicatedSpanRanges(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, minDocs: Long = 2L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spans = duplicatedSpans(df, idCol, textCol, k, minDocs)
    val byDoc = Window.partitionBy(q(idCol)).orderBy(col("pos"))
    spans
      .withColumn("__new", when(
        col("pos") > coalesce(lag(col("pos"), 1).over(byDoc), lit(Int.MinValue))
          + k, 1).otherwise(0))
      .withColumn("__island", sum(col("__new")).over(byDoc))
      .groupBy(q(idCol), col("__island"))
      .agg(min(col("pos")).as("start_pos"),
        (max(col("pos")) + k - 1).as("end_pos"))
      .select(q(idCol), col("start_pos"), col("end_pos"))
  }

  /** The REWRITE step of suffix-array substring dedup (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better" — the
    * ExactSubstr pass their released tool applies after detection): every
    * duplicated k-token span keeps exactly ONE occurrence corpus-wide (the
    * lexicographically first (id, pos) — deterministic) and all other
    * occurrences are cut from their documents. Returns one row per input
    * row: (idCol, tokens_removed, textCol), textCol rewritten with the cut
    * tokens removed (single-space re-joined — whitespace normalizes only
    * in documents that were actually cut; untouched documents pass through
    * byte-identical, tokens_removed = 0).
    *
    * Shape at 100 TB, on top of [[duplicatedSpans]]' hash-only wide ops:
    * the canonical occurrence rides the SAME span-hash aggregate
    * (min(struct(id, pos)) next to the distinct-doc count — no extra job);
    * cut positions collapse to merged ranges per document (gaps-and-
    * islands over the per-document window, skew-safe because a partition
    * is one document); the corpus joins the tiny (id, ranges) side once on
    * id, and the rewrite itself is a pure codegen'd array expression —
    * token text never shuffles. */
  def cutDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, minDocs: Long = 2L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, "k >= 1")
    require(minDocs >= 2, "minDocs >= 2")
    val occ = spanOcc(df, idCol, textCol, k)
    val dup = occ.groupBy("__h")
      .agg(count_distinct(col("id")).as("n_docs"),
        min(struct(col("id").as("id"), col("pos").as("pos"))).as("__first"))
      .filter(col("n_docs") >= minDocs)
    val cuts = occ.join(dup, Seq("__h"))
      .filter(struct(col("id").as("id"), col("pos").as("pos")) =!= col("__first"))
      .select(col("id"), col("pos"))
    val byDoc = Window.partitionBy(col("id")).orderBy(col("pos"))
    val ranges = cuts
      .withColumn("__new", when(
        col("pos") > coalesce(lag(col("pos"), 1).over(byDoc), lit(Int.MinValue))
          + k, 1).otherwise(0))
      .withColumn("__island", sum(col("__new")).over(byDoc))
      .groupBy(col("id"), col("__island"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + k - 1).as("e"))
      .groupBy(col("id"))
      .agg(collect_list(struct(col("s").as("s"), col("e").as("e"))).as("__rng"))
      // reserved-name the join key: if the caller's idCol is literally
      // "id", a bare col("id") in the join condition is ambiguous between
      // the two sides and the analyzer rejects it
      .withColumnRenamed("id", "__cut_id")
    val joined = df.join(ranges, q(idCol) === col("__cut_id"), "left")
      .drop("__cut_id")
    val toks = TextAnalysis.tokens(q(textCol))
    val withIdx = transform(toks, (t, i) => struct(t.as("t"), (i + 1).as("i")))
    val keptToks = transform(
      filter(withIdx, p => !exists(col("__rng"),
        r => p.getField("i") >= r.getField("s") && p.getField("i") <= r.getField("e"))),
      p => p.getField("t"))
    joined.select(
      q(idCol),
      when(col("__rng").isNotNull, size(toks) - size(keptToks))
        .otherwise(lit(0)).cast("int").as("tokens_removed"),
      when(col("__rng").isNotNull, concat_ws(" ", keptToks))
        .otherwise(q(textCol)).as(textCol))
  }

  /** Embedding near-duplicate pairs: cosine >= threshold.
    * Baseline: block-nested cross join (only for bounded corpora).
    * Scale path: BANDED random-hyperplane LSH — `lshBands` independent
    * `lshBits`-bit signatures (slices of one `lshBits·lshBands`-bit
    * signature), candidates = pairs agreeing on at least one full band,
    * then exact cosine verify. Banding is the standard OR-amplification:
    * per-pair recall 1−(1−p^bits)^bands for hyperplane agreement
    * probability p = 1−θ/π, so near-dups (p→1) are found whp while random
    * pairs (p≈0.5) collide at ~bands/2^bits — the knob that keeps the
    * candidate set linear at 100 TB. A single unbanded signature (the
    * round-3 formulation) had recall p^bits, which decays to ~0 for any
    * pair that is near but not identical.
    */
  def embeddingCosinePairs(
      df: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double = 0.95,
      useLsh: Boolean = true,
      lshBits: Int = 12,
      maxBucketSize: Long = 10000L,
      lshBands: Int = 4): DataFrame = {
    require(lshBits >= 1 && lshBands >= 1 && lshBits * lshBands <= 63,
      "lshBits*lshBands must fit a long signature")
    val base = df.select(q(idCol).as("id"), q(embCol).as("v"))
    val pairs =
      if (useLsh) {
        // candidates from (band, bucket, id) only — embedding vectors never
        // enter the bucket shuffle; they re-attach below, pruned to
        // candidates
        val mask = (1L << lshBits) - 1
        val sigd = base
          .select(col("id"),
            Similarity.hyperplaneSignature(col("v"), lshBits * lshBands).as("__sig"))
          .select(col("id"), explode(transform(sequence(lit(0), lit(lshBands - 1)),
            b => struct(b.as("band"),
              call_function("shiftright", col("__sig"), b * lshBits)
                .bitwiseAND(lit(mask)).as("bucket")))).as("bk"))
          .select(col("id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
        val cand = bucketedPairs(sigd, Seq("band", "bucket"), "id", maxBucketSize)
        attachPrunedPair(base, cand, "v", "va", "vb")
      } else {
        base.as("a").crossJoin(base.as("b"))
          .filter(col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
            col("a.v").as("va"), col("b.v").as("vb"))
      }
    pairs
      .withColumn("cosine", round(Similarity.cosine(col("va"), col("vb")), 4))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** SemDeDup-style semantic dedup over an embedding column: cosine
    * near-dup pairs ([[embeddingCosinePairs]], LSH-bucketed on the scale
    * path) → connected components → keep the minimum-id representative per
    * component. Returns the surviving rows of `df`. Same template as the
    * text [[nearDupPipeline]], with the embedding space as the similarity
    * signal. */
  def semanticDedup(
      df: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double = 0.95,
      useLsh: Boolean = true,
      lshBits: Int = 12,
      maxBucketSize: Long = 10000L,
      lshBands: Int = 4): DataFrame = {
    val pairs = embeddingCosinePairs(df, idCol, embCol, threshold, useLsh,
      lshBits, maxBucketSize, lshBands)
    dropNearDuplicates(df, idCol, pairs)
  }

  /** [[semanticDedup]] over RAW TEXT with no trained model: documents are
    * vectorized by the feature-hashing trick
    * ([[TextAnalysis.hashVector]] — signed hashed token counts, whose dot
    * products estimate true token-count inner products), then deduped in
    * embedding space. Catches bag-of-words near-duplicates (reordered /
    * lightly edited copies) that exact fingerprints miss, without the
    * shingle machinery — one extra column in the scan, the pair stage is
    * the same LSH-bucketed path as embedding dedup. */
  def semanticDedupText(
      df: DataFrame,
      idCol: String,
      textCol: String,
      dim: Int = 256,
      threshold: Double = 0.9,
      useLsh: Boolean = true): DataFrame = {
    // collision-proof temp column: never clobber (then silently drop) a
    // caller column that happens to be named like our scratch vector
    val hv = Iterator.from(0).map(i => s"__graft_hv$i")
      .find(n => !df.columns.contains(n)).get
    val withVec = df.withColumn(hv, TextAnalysis.hashVector(q(textCol), dim))
    semanticDedup(withVec, idCol, hv, threshold, useLsh).drop(hv)
  }
}
