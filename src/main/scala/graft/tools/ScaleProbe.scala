package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off 100× / skew scale probe for the dedup pipeline (r7 verdict #8):
  * the per-round Bench 10× probes established linearity; this pins the two
  * behaviors that only show up PAST 10× —
  *
  *  1. **100× volume**: pairs-vs-wall growth for `minhashPairs` +
  *     `clusterPairs` on a corpus replicated 100× (per-replica vowel
  *     rotation, so near-dup structure is preserved within a replica and
  *     shingles diverge across replicas — pair volume must grow ~linearly
  *     with rows, never quadratically).
  *  2. **Adversarial skew**: one text owning 10% of all rows (the
  *     pathological crawl case — boilerplate pages). Without the
  *     `maxBucketSize` cap this is a |cluster|² pair explosion
  *     (50k rows → 2.5e9 pairs); with the cap, pair output stays bounded
  *     and the wall-clock sane. The probe also reports the
  *     pointer-doubling round count for the giant star-shaped cluster
  *     (must stay O(log diameter), here ≤ a handful of rounds).
  *
  * Results are recorded in BASELINE.md; this main is NOT part of the
  * driver's Bench contract (it is a one-off evidence run, rerunnable).
  */
object ScaleProbe {

  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }

  /** The `k`-th permutation of "aeiou" in lexicographic (factorial number
    * system) order — 120 DISTINCT vowel substitutions, k ∈ [0, 120). */
  private def vowelPerm(k: Int): String = {
    val pool = scala.collection.mutable.ArrayBuffer('a', 'e', 'i', 'o', 'u')
    var n = k
    val out = new StringBuilder
    for (d <- 4 to 0 by -1) {
      val f = (1 to d).product
      out += pool.remove(n / f)
      n %= f
    }
    out.toString
  }

  /** documents × n with a DISTINCT vowel permutation per replica (replica
    * 0 = identity) — same construction as Bench's 10× probe. Distinctness
    * matters: an early version cycled 10 rotations with a one-token salt,
    * and rotation-equal replicas cross-matched (one prepended token barely
    * moves Jaccard on a long doc), which measures the synthetic corpus's
    * duplicate density, not the engine. 5! = 120 permutations bound n. */
  private def replicate(docs: DataFrame, n: Int): DataFrame = {
    require(n <= 120, "at most 120 distinct vowel permutations")
    val rotations = (0 until n).map(vowelPerm)
    docs
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), lit(n - 1))).as("rep"))
      // translate with a per-row replacement column (rotation picked by
      // array lookup — no n-deep CASE WHEN chain)
      .withColumn("rot",
        element_at(array(rotations.map(lit): _*), col("rep") + 1))
      .select((col("doc_id") * 128 + col("rep")).as("doc_id"),
        expr("translate(text, 'aeiou', rot)").as("text"))
  }

  /** Nearest-nProbe-centroid cell set for a collected query batch — the
    * same rule AnnStore.serve's partition pruning applies. Shared by the
    * annserve leg and the ANN soak (r17 review: the two inline copies
    * had already diverged on the listing side). */
  private def probedCells(qVecs: Array[Array[Double]],
      centers: Array[Array[Double]], nProbe: Int): Set[Int] =
    qVecs.flatMap { v =>
      centers.zipWithIndex.map { case (c, i) =>
        var s = 0.0; var t = 0
        while (t < v.length) { val d = v(t) - c(t); s += d * d; t += 1 }
        (s, i)
      }.sortBy(_._1).take(nProbe).map(_._2)
    }.toSet

  /** (probed bytes, total bytes) over the store's LIVE code generations
    * — manifest-listed via [[graft.ext.AnnStore.liveCodeGenPaths]], so
    * post-compaction cooling generations (on disk but invisible to
    * serves) are excluded (r17 review). */
  private def annListedBytes(spark: SparkSession, dir: String,
      probed: Set[Int]): (Long, Long) = {
    val f = graft.ext.StoreFiles.fs(spark, dir)
    var (kb, tb) = (0L, 0L)
    for (genPath <- graft.ext.AnnStore.liveCodeGenPaths(spark, dir);
         part <- f.listStatus(new org.apache.hadoop.fs.Path(genPath));
         if part.isDirectory) {
      val nm = part.getPath.getName
      val bytes = graft.ext.StoreFiles.dataBytesRecursive(spark,
        part.getPath.toString)
      tb += bytes
      if (nm.startsWith("cell=") &&
          probed.contains(nm.stripPrefix("cell=").toInt)) kb += bytes
    }
    (kb, tb)
  }

  def main(args: Array[String]): Unit = {
    // optional args: leg names to run ("dedup", "pack", "backoff", "er",
    // "joins", "saltedjoin", "saltedjoin_dup", "bm25store", "annserve",
    // "ledger", "takedown"; plus "ledgerpieces", a one-off P=1000 increment
    // decomposition, "cluster10x", the Bench dedup_cluster_10x shape
    // with GC/heap telemetry for constrained-heap reproduction, and
    // "soak", the ~100-cycle append/takedown/compact store soak — those
    // three run ONLY when named explicitly) — empty runs the standard set
    val only: String => Boolean =
      if (args.isEmpty)
        k => k != "ledgerpieces" && k != "cluster10x" && k != "soak" &&
          k != "staging" && k != "validate" && k != "pipeline"
      else args.toSet.contains
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n1 = docs.count()

    def probe(name: String, d: DataFrame): Unit = {
      val rows = d.count()
      val (tp, pairs) = time(
        graft.ext.Dedup.minhashPairs(d, "doc_id", "text", 3, 64, 16, 0.8).count())
      val (tc, clusters) = time {
        val p = graft.ext.Dedup.minhashPairs(d, "doc_id", "text", 3, 64, 16, 0.8)
        graft.ext.Dedup.clusterPairs(p).select("cluster_id").distinct().count()
      }
      println(f"PROBE $name rows=$rows pairs=$pairs pairs_per_row=${pairs.toDouble / rows}%.2f " +
        f"minhash_sec=$tp%.1f cluster_sec=$tc%.1f clusters=$clusters")
    }

    if (only("dedup")) {
      probe("1x", docs)
      probe("10x", replicate(docs, 10))
      probe("100x", replicate(docs, 100))
    }

    // adversarial skew: ~10% of a 10× corpus is ONE boilerplate text (the
    // pathological crawl case). Two behaviors to pin:
    //  (a) the raw LSH path with a bucket cap below the skew cluster size
    //      stays BOUNDED — the over-cap bucket is skipped (documented
    //      maxBucketSize semantics), so wall-clock does not explode and
    //      pair volume stays ~base-corpus-sized (a |cluster|² emission
    //      here would be ~n1²/2 pairs);
    //  (b) the production path (nearDupPipeline shape) collapses exact
    //      duplicates BEFORE minhash — the boilerplate mass reduces to ONE
    //      representative in one hash-aggregate pass, so the LSH stage
    //      never sees the skew at all.
    if (only("dedup")) {
    val base10 = replicate(docs, 9)
    val boiler = docs
      .select((col("doc_id") * 128 + lit(100)).as("doc_id"),
        lit("the quick brown fox jumps over the lazy dog " * 8).as("text"))
    val skewed = base10.unionAll(boiler)
    val rows = skewed.count()
    val (ts, pairsSkew) = time(
      graft.ext.Dedup.minhashPairs(skewed, "doc_id", "text", 3, 64, 16, 0.8,
        maxBucketSize = 100L).count())
    val (te, collapsed) = time(
      graft.ext.Dedup.dropExact(skewed, Seq("text")).count())
    println(f"PROBE skew10pct rows=$rows boiler_rows=$n1 " +
      f"capped_pairs=$pairsSkew minhash_sec=$ts%.1f " +
      f"exact_collapse_rows=$collapsed exact_sec=$te%.1f " +
      f"quadratic_would_be=${n1 * (n1 - 1) / 2}")
    }

    // round-8 additions: packing prefix-sum and stupid-backoff at 1×/10×/
    // 100× — wall must track rows ~linearly (the prefix sum's driver state
    // is O(buckets), the LM model is count-table-sized)
    def probePack(name: String, d: DataFrame): Unit = {
      val slim = d.select(col("doc_id"),
        graft.ext.TextAnalysis.tokenCount(col("text")).as("ntok")).persist()
      slim.count()
      val (tp, spans) = time(
        graft.ext.Packing.packSequences(slim, "doc_id", "ntok", seqLen = 2048).count())
      slim.unpersist()
      println(f"PROBE pack_$name spans=$spans pack_sec=$tp%.1f")
    }
    def probeBackoff(name: String, d: DataFrame): Unit = {
      val (tb, toks) = time(
        graft.ext.TextAnalysis.stupidBackoff(d, "doc_id", "text", minBigramCount = 2)
          .agg(sum("n_tokens")).head().getLong(0))
      println(f"PROBE backoff_$name tokens=$toks backoff_sec=$tb%.1f")
    }
    if (only("pack")) {
      probePack("1x", docs); probePack("10x", replicate(docs, 10))
      probePack("100x", replicate(docs, 100))
    }
    if (only("backoff")) {
      probeBackoff("1x", docs); probeBackoff("10x", replicate(docs, 10))
      probeBackoff("100x", replicate(docs, 100))
    }

    // round-8b: fuzzy-ER hot-block guard — one blocking key owning 10% of
    // a replicated corpus (an "unknown city" key). Unguarded, that block
    // alone is n²≈25M Jaro-Winkler evaluations; with maxBlockPairs the
    // block drops whole after two count aggregations, so wall tracks the
    // well-blocked mass only. Also the unguarded run for the honest
    // comparison (it must still finish — JW is codegen'd — just pay the
    // quadratic block).
    if (only("er")) {
    val names = docs.select(col("doc_id"),
      concat(lit("name "), col("doc_id")).as("name"),
      (col("doc_id") % 500).as("blk"))
    val base = names.unionAll(
      docs.select((col("doc_id") + 1000000).as("doc_id"),
        concat(lit("hot dweller "), col("doc_id")).as("name"),
        lit(9999L).as("blk")))
    val erCorpus = (0 until 10).map(i =>
        base.select((col("doc_id") * 16 + i).as("doc_id"), col("name"), col("blk")))
      .reduce(_ unionAll _)
    val (tg, guardedPairs) = time(
      graft.ext.EntityResolution.fuzzyDedup(erCorpus, "doc_id", "name",
        col("blk"), threshold = 0.9, maxBlockPairs = 40000L).count())
    val (tu, unguardedPairs) = time(
      graft.ext.EntityResolution.fuzzyDedup(erCorpus, "doc_id", "name",
        col("blk"), threshold = 0.9, maxBlockPairs = Long.MaxValue >> 8).count())
    println(f"PROBE er_hotblock rows=${erCorpus.count()} " +
      f"guarded_pairs=$guardedPairs guarded_sec=$tg%.1f " +
      f"unguarded_pairs=$unguardedPairs unguarded_sec=$tu%.1f")
    }

    // round-8c: as-of + range join growth — replicate the event log with
    // shifted user ids (key space grows with the data, per-key history
    // constant, the realistic crawl shape). Both plans are single-shuffle;
    // wall must track rows ~linearly.
    if (only("joins")) {
    val events = spark.read.parquet(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01") +
        "/events.parquet")
    def evRep(k: Int): DataFrame =
      (0 until k).map(i => events.select(
        (col("event_id") * 128 + i).as("event_id"),
        (col("user_id") + i * 1000000L).as("user_id"),
        col("event_type"), col("ts"), col("value")))
        .reduce(_ unionAll _)
    for ((name, k) <- Seq(("1x", 1), ("10x", 10), ("100x", 100))) {
      val ev = evRep(k)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"))
      val (ta, nA) = time(graft.ext.AsOfJoin.asOfJoin(
        clicks, views, Seq("user_id"), "ts", "ts", Seq("value")).count())
      def usec(c: org.apache.spark.sql.Column) = unix_micros(c.cast("timestamp"))
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"), usec(col("ts")).as("pts"))
      val iv = clicks.select(col("event_id").as("cid"),
        col("user_id").as("cu"), usec(col("ts")).as("lo"),
        (usec(col("ts")) + lit(3600000000L)).as("hi"))
      val (tr, nR) = time(graft.ext.RangeJoin.pointInInterval(
        purch, "pts", iv, "lo", "hi", Seq("user_id" -> "cu"),
        binWidth = 3600000000L).count())
      println(f"PROBE joins_$name rows=${ev.count()} asof_rows=$nA asof_sec=$ta%.1f " +
        f"range_pairs=$nR range_sec=$tr%.1f")
    }
    }

    // round-8d: salted-join skew probe — one key owns 50% of a 5M-row
    // left; the right is a 100k-key dimension treated as too big to
    // broadcast (merge hints on the plain comparator). The plain
    // sort-merge join co-locates the hot key's 2.5M rows on ONE reducer;
    // saltedJoin spreads them over 32 salt buckets while replicating only
    // the hot key's single right row 32 ways. Outputs must be identical.
    if (only("saltedjoin")) {
      val leftSkew = spark.range(5000000L).select(
        when(col("id") % 2 === 0, lit(77L))
          .otherwise(col("id") % 100000L).as("k"),
        col("id").as("v"))
      val rightDim = spark.range(100000L)
        .select(col("id").as("rk"), (col("id") * 2).as("payload"))
      val (tplain, nPlain) = time(
        leftSkew.hint("merge").join(rightDim.hint("merge"),
          col("k") === col("rk")).count())
      val (tsalt, nSalt) = time(
        graft.ext.Salting.saltedJoin(leftSkew, rightDim, Seq("k"), Seq("rk"),
          saltFactor = 32, hotKeyThreshold = 100000L).count())
      require(nPlain == nSalt, s"salted join changed rows: $nPlain vs $nSalt")
      println(f"PROBE salted_join rows=5000000 hot_share=0.5 " +
        f"plain_sec=$tplain%.1f salted_sec=$tsalt%.1f matches=$nPlain")
    }

    // round-11 (r10 verdict #6): BM25 store serve-read flatness — build
    // the postings index at 1×/10×/100×, serve the SAME narrow query
    // batch from each, and report the files/bytes the bucket-pruned serve
    // LISTS (its token buckets' partitions) vs the store total. The
    // listing fraction must track #query-buckets/#buckets — i.e. the
    // serve's reads scale with the query batch, not the corpus; absolute
    // listed bytes grow only because each bucket holds more of the
    // corpus, which is the irreducible posting mass for those tokens.
    if (only("bm25store")) {
      val nBuckets = 64
      val queries = docs.filter(col("doc_id") === 100)
        .select(col("doc_id").as("qid"), concat_ws(" ",
          slice(graft.ext.TextAnalysis.tokens(col("text")), 1, 3)).as("qtext"))
      val buckets = queries
        .select(explode(graft.ext.TextAnalysis.tokens(col("qtext"))).as("token"))
        .distinct()
        .select(pmod(xxhash64(col("token")), lit(nBuckets.toLong)).cast("int").as("b"))
        .distinct().collect().map(_.getInt(0)).toSet
      def bucketFootprint(root: String): (Long, Long, Long, Long) = {
        // (keptFiles, totalFiles, keptBytes, totalBytes) over the
        // tbucket=N partition dirs of every generation under root
        val f = graft.ext.StoreFiles.fs(spark, root)
        val p = new org.apache.hadoop.fs.Path(root)
        if (!f.exists(p)) return (0L, 0L, 0L, 0L)
        var (kf, tf, kb, tb) = (0L, 0L, 0L, 0L)
        for (gen <- f.listStatus(p); if gen.isDirectory;
             part <- f.listStatus(gen.getPath); if part.isDirectory) {
          val nm = part.getPath.getName
          val files = graft.ext.StoreFiles.dataFileCountRecursive(
            spark, part.getPath.toString).toLong
          val bytes = graft.ext.StoreFiles.dataBytesRecursive(
            spark, part.getPath.toString)
          tf += files; tb += bytes
          if (nm.startsWith("tbucket=") &&
              buckets.contains(nm.stripPrefix("tbucket=").toInt)) {
            kf += files; kb += bytes
          }
        }
        (kf, tf, kb, tb)
      }
      for ((name, k) <- Seq(("1x", 1), ("10x", 10), ("100x", 100))) {
        val corpus = if (k == 1) docs else replicate(docs, k)
        val rows = corpus.count()
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft-bm25probe-$name").toString + "/idx"
        val (tb0, _) = time(graft.ext.Retrieval.buildIndex(
          corpus, "doc_id", "text", dir, nBuckets = nBuckets))
        val (ts0, nServe) = time(graft.ext.Retrieval.bm25TopKFromIndex(
          spark, dir, queries, "qid", "qtext", k = 10).count())
        val (pf, ptf, pb, ptb) = bucketFootprint(s"$dir/postings")
        val (df0, dtf, db0, dtb) = bucketFootprint(s"$dir/dfd")
        val (kf, tf2, kb, tb2) = (pf + df0, ptf + dtf, pb + db0, ptb + dtb)
        // r16 (r15-verdict #6): third decade for the masked-serve claim —
        // tombstone 10% of the corpus and serve again; the broadcast
        // anti-join's cost must stay within noise of the base serve at
        // 100× exactly as measured at 1×/10× (takedown leg)
        val (tdel, nDel) = time(graft.ext.Retrieval.deleteDocs(
          corpus.filter(col("doc_id") % 10 === 3).select("doc_id"),
          "doc_id", dir))
        val (tsM, _) = time(graft.ext.Retrieval.bm25TopKFromIndex(
          spark, dir, queries, "qid", "qtext", k = 10).count())
        println(f"PROBE bm25store_$name rows=$rows n_buckets=$nBuckets " +
          f"query_buckets=${buckets.size} build_sec=$tb0%.1f " +
          f"serve_sec=$ts0%.1f served=$nServe " +
          f"listed_files=$kf/$tf2 listed_bytes=$kb/$tb2 " +
          f"listed_frac=${kb.toDouble / tb2}%.4f " +
          f"deleted=$nDel delete_sec=$tdel%.1f serve_masked_sec=$tsM%.1f")
      }
    }

    // round-15 (r14 verdict #6): the 100 TB thesis's third point for the
    // ANN serve — a pruned ivfPqTopKIndexed serve must scale with the
    // QUERY batch, not the corpus. Build the persisted AnnStore (IVF-PQ,
    // cell-partitioned codes) at 1×/10×/100× of the embeddings table
    // (sf0.1 base → 2k/20k/200k vectors), serve the SAME 16-query batch
    // from each, and report the code bytes the serve's partition pruning
    // LISTS (its probed cells) vs the store total. The listed fraction
    // must track nProbe·|queries|-ish cells / nCentroids; serve wall may
    // drift only with the probed cells' irreducible posting mass and the
    // re-rank's corpus-side hash join, never with a full-code scan.
    if (only("annserve")) {
      val embBase = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select("vec_id", "embedding")
      val dim = embBase.select(size(col("embedding"))).head().getInt(0)
      // norm-preserving per-replica variant: rotate left by (rep mod d),
      // negate when rep >= d — every replica is a DISTINCT direction, so
      // the vector space grows with the corpus instead of stacking copies
      // on the same points (which would measure tie handling, not scale)
      def replicateEmb(n: Int): DataFrame = {
        require(n <= 2 * dim, s"at most ${2 * dim} distinct rotate/negate variants")
        embBase
          .select(col("vec_id"), col("embedding"),
            explode(sequence(lit(0), lit(n - 1))).as("rep"))
          .withColumn("r", col("rep") % dim)
          .withColumn("rot", concat(
            expr(s"slice(embedding, r + 1, $dim - r)"),
            expr("slice(embedding, 1, r)")))
          .select((col("vec_id") * 128 + col("rep")).as("vec_id"),
            when(col("rep") >= dim, transform(col("rot"), x => -x))
              .otherwise(col("rot")).as("embedding"))
      }
      val qv = embBase.filter(col("vec_id") < 16)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val qVecs = qv.collect().map(_.getSeq[Float](1).toArray.map(_.toDouble))
      val nProbe = 8
      for ((name, k) <- Seq(("1x", 1), ("10x", 10), ("100x", 100))) {
        val corpus = (if (k == 1) embBase else replicateEmb(k))
          .persist() // the store build + re-rank side read it repeatedly
        val rows = corpus.count()
        val nc = graft.ext.Similarity.autoNCentroids(rows)
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft-annserve-$name").toString + "/store"
        val (tb0, _) = time {
          val idx = graft.ext.Similarity.trainIvfPq(
            corpus, "vec_id", "embedding", nCentroids = nc)
          graft.ext.AnnStore.create(corpus, "vec_id", "embedding", idx, dir)
        }
        val (ts0, nServe) = time(graft.ext.AnnStore.serve(dir, corpus,
          "vec_id", "embedding", qv, "qid", "qv", k = 10,
          nProbe = nProbe).count())
        // the probed cell set (same nearest-nProbe-centroids rule the
        // serve applies) → which cell=N partition dirs its listing keeps
        val idx = graft.ext.AnnStore.loadIndex(spark, dir)
        val probed = probedCells(qVecs, idx.centers, nProbe)
        val (kb, tb) = annListedBytes(spark, dir, probed)
        // r16 (r15-verdict #6): tombstoned serve at every decade — the
        // masked-serve ≈ baseline claim gets its 200k-vector point
        val (tdel, nDel) = time(graft.ext.AnnStore.delete(
          corpus.filter(col("vec_id") % 10 === 3).select("vec_id"),
          "vec_id", dir))
        val (tsM, _) = time(graft.ext.AnnStore.serve(dir, corpus,
          "vec_id", "embedding", qv, "qid", "qv", k = 10,
          nProbe = nProbe).count())
        corpus.unpersist()
        println(f"PROBE annserve_$name rows=$rows n_centroids=$nc " +
          f"probed_cells=${probed.size} build_sec=$tb0%.1f " +
          f"serve_sec=$ts0%.1f served=$nServe " +
          f"listed_bytes=$kb/$tb listed_frac=${kb.toDouble / tb}%.4f " +
          f"deleted=$nDel delete_sec=$tdel%.1f serve_masked_sec=$tsM%.1f")
      }
    }

    // round-15 (r14 verdict #2): the Bench dedup_cluster_10x shape, run
    // standalone with GC + peak-heap telemetry — rerun under a constrained
    // -Xmx (SPARK_DRIVER_MEM) to reproduce / bound the driver's 49 s GC
    // storm. Reads the sfDir documents table like Bench does (point
    // SPARK_GRAFT_SF_DIR at sf0.1 for the exact bench shape).
    if (only("cluster10x")) {
      import scala.jdk.CollectionConverters._
      def gcMs(): Long = java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.asScala
        .map(b => math.max(b.getCollectionTime, 0L)).sum
      val pools = java.lang.management.ManagementFactory
        .getMemoryPoolMXBeans.asScala
        .filter(_.getType == java.lang.management.MemoryType.HEAP)
      val docs10 = graft.Bench.replicate10(docs)
      for (round <- 1 to 2) { // round 1 warms JIT/codegen; round 2 is the reading
        pools.foreach(_.resetPeakUsage())
        val g0 = gcMs()
        val (t, n) = time {
          val pairs = graft.ext.Dedup.minhashPairs(
            docs10, "doc_id", "text", 3, 64, 16, 0.8)
          graft.ext.Dedup.clusterPairs(pairs).count()
        }
        val peakMb = pools.map(p => math.max(p.getPeakUsage.getUsed, 0L)).sum >> 20
        println(f"PROBE cluster10x round=$round rows=$n wall_sec=$t%.1f " +
          f"gc_ms=${gcMs() - g0} heap_peak_mb=$peakMb " +
          f"xmx_mb=${Runtime.getRuntime.maxMemory() >> 20}")
      }
    }

    // round-9 (r8 verdict #4): the same skew shape but the hot key's rows
    // are BYTE-IDENTICAL — the crawl-dedup case where a content-only salt
    // silently collapses to one bucket. The per-row-ordinal salt must
    // still spread them (spread asserted directly on the salt expression)
    // and keep the wall-clock win over the plain co-located join.
    if (only("saltedjoin_dup")) {
      val leftDup = spark.range(5000000L).select(
        when(col("id") % 2 === 0, lit(77L))
          .otherwise(col("id") % 100000L).as("k"),
        when(col("id") % 2 === 0, lit(0L)).otherwise(col("id")).as("v"))
      val rightDim = spark.range(100000L)
        .select(col("id").as("rk"), (col("id") * 2).as("payload"))
      val (tplain, nPlain) = time(
        leftDup.hint("merge").join(rightDim.hint("merge"),
          col("k") === col("rk")).count())
      val (tsalt, nSalt) = time(
        graft.ext.Salting.saltedJoin(leftDup, rightDim, Seq("k"), Seq("rk"),
          saltFactor = 32, hotKeyThreshold = 100000L).count())
      require(nPlain == nSalt, s"salted join changed rows: $nPlain vs $nSalt")
      // the spread itself: saltedJoin's salt expression over the 2.5M
      // byte-identical hot rows must hit (nearly) all 32 buckets
      val spread = leftDup.filter(col("k") === 77L)
        .withColumn("__rh", xxhash64(col("k"), col("v")))
        .sortWithinPartitions("__rh")
        .select(pmod(xxhash64(col("__rh"), monotonically_increasing_id(),
          lit(0x5a17e)), lit(32L)).as("s"))
        .distinct().count()
      require(spread >= 24, s"duplicate hot rows hit only $spread/32 salt buckets")
      println(f"PROBE salted_join_dup rows=5000000 hot_share=0.5 dup_rows=true " +
        f"plain_sec=$tplain%.1f salted_sec=$tsalt%.1f salt_buckets=$spread matches=$nPlain")
    }
    if (only("ledgerpieces")) {
      // decomposition of the P=1000 nightly increment (one-off diagnosis)
      import graft.schema.{ColumnSchema, DataFrameSchema}
      import org.apache.spark.sql.types.{LongType, StringType}
      val p = 1000
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-pieces$p").toString
      val dataDir = s"$root/data"
      spark.range(p * 2000L).select(
          concat(lit("d"), col("id") % p).as("ds"), col("id").as("v"))
        .write.partitionBy("ds").parquet(dataDir)
      spark.range(2000L).select(lit("dnew").as("ds"), col("id").as("v"))
        .write.mode("append").partitionBy("ds").parquet(dataDir)
      val sch = DataFrameSchema(
        "ds" -> ColumnSchema.of(StringType),
        "v" -> ColumnSchema.of(LongType, graft.checks.Check.ge(0L)))
      val (tRead, data) = time(spark.read.parquet(dataDir))
      val (tAnalyze, _) = time(data.schema)
      val (tDistinct, nd) = time(
        data.select(col("ds"), col("ds").cast("string")).distinct().count())
      val (tDistinct2, _) = time(
        data.select(col("ds"), col("ds").cast("string")).distinct().count())
      val (tSchemaOnly, _) = time(graft.backend.Validator.validate(
        sch, data, depth = graft.errors.GraftConfig.SchemaOnly))
      val (tGrouped, _) = time(
        data.filter(col("ds") === "dnew")
          .groupBy(col("ds").cast("string").as("partition"))
          .agg(count(lit(1)).as("n_rows"),
            sum(when(!(col("v") >= 0L), 1L)).as("f")).collect())
      val (tCount, _) = time(data.count())
      val (tDs, _) = time(data.select("ds").distinct().count())
      val (tV, _) = time(data.select("v").distinct().count())
      val (tGb, _) = time(data.groupBy("ds").count().count())
      println(f"PIECES read=$tRead%.2f analyze=$tAnalyze%.2f " +
        f"distinct=$tDistinct%.2f($nd) distinct2=$tDistinct2%.2f " +
        f"schemaOnly=$tSchemaOnly%.2f grouped=$tGrouped%.2f " +
        f"count=$tCount%.2f dsOnly=$tDs%.2f vOnly=$tV%.2f gb=$tGb%.2f")
    }
    if (only("ledger")) {
      // r13: the validation ledger's 100 TB contract — the RECURRING
      // nightly increment (one new partition of fixed size arrives over a
      // disk-partitioned corpus of P already-ledgered partitions) must
      // cost ~the new partition's scan, FLAT in P: the skip-set comes
      // from a KB-sized ledger read + a directory-metadata distinct, and
      // the grouped fused pass partition-prunes to the one new dir.
      import graft.ext.ValidationLedger
      import graft.schema.{ColumnSchema, DataFrameSchema}
      import org.apache.spark.sql.types.{LongType, StringType}
      val sch = DataFrameSchema(
        "ds" -> ColumnSchema.of(StringType),
        "v" -> ColumnSchema.of(LongType, graft.checks.Check.ge(0L)))
      for (p <- Seq(10, 100, 1000)) {
        val root = java.nio.file.Files
          .createTempDirectory(s"graft-probe-led$p").toString
        val dataDir = s"$root/data"
        spark.range(p * 2000L).select(
            concat(lit("d"), col("id") % p).as("ds"), col("id").as("v"))
          .write.partitionBy("ds").parquet(dataDir)
        val ledDir = s"$root/ledger"
        val (tb, _) = time(ValidationLedger.validateIncrement(
          sch, spark.read.parquet(dataDir), "ds", ledDir, "hist").count())
        // tonight: ONE new fixed-size partition lands in the corpus
        spark.range(2000L).select(lit("dnew").as("ds"), col("id").as("v"))
          .write.mode("append").partitionBy("ds").parquet(dataDir)
        val (ti, inc) = time {
          val r = ValidationLedger.validateIncrement(
            sch, spark.read.parquet(dataDir), "ds", ledDir, "night")
          r.count()
        }
        require(inc == 1L, s"nightly increment validated $inc partitions")
        // candidates shape: the ingest KNOWS tonight's partition key —
        // zero discovery scan, must stay flat in P
        spark.range(2000L).select(lit("dnew2").as("ds"), col("id").as("v"))
          .write.mode("append").partitionBy("ds").parquet(dataDir)
        val (tc, inc2) = time {
          val r = ValidationLedger.validateIncrement(
            sch, spark.read.parquet(dataDir), "ds", ledDir, "night2",
            candidates = Some(Seq("dnew2")))
          r.count()
        }
        require(inc2 == 1L, s"candidate increment validated $inc2 partitions")
        val (ts, _) = time(
          ValidationLedger.statusSummary(spark, ledDir).count())
        println(f"PROBE ledger parts=$p rows=${p * 2000L} " +
          f"backfill_sec=$tb%.1f discovery_increment_sec=$ti%.2f " +
          f"candidate_increment_sec=$tc%.2f status_sec=$ts%.2f")
      }
    }

    // r14: takedown serve overhead — the tombstone anti-join must stay a
    // broadcast map-side probe, so a masked serve (10% of the corpus
    // tombstoned) should cost ≈ the baseline serve at any scale, and the
    // healing compaction stays a one-generation rewrite. Probed for the
    // BM25 postings store and the ANN store at 1×/10×.
    if (only("takedown")) {
      val nBuckets = 64
      val queries = docs.filter(col("doc_id") % 100 === 0)
        .select(col("doc_id").as("qid"), concat_ws(" ",
          slice(graft.ext.TextAnalysis.tokens(col("text")), 1, 3)).as("qtext"))
      for ((name, k) <- Seq(("1x", 1), ("10x", 10))) {
        val corpus = (if (k == 1) docs else replicate(docs, k))
        val rows = corpus.count()
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft-takedown-bm-$name").toString + "/idx"
        graft.ext.Retrieval.buildIndex(corpus, "doc_id", "text", dir,
          nBuckets = nBuckets)
        def serve(): Long = graft.ext.Retrieval.bm25TopKFromIndex(
          spark, dir, queries, "qid", "qtext", k = 10).count()
        val (ts0, _) = time(serve())
        val (td, nDel) = time(graft.ext.Retrieval.deleteDocs(
          corpus.filter(col("doc_id") % 10 === 3).select("doc_id"),
          "doc_id", dir))
        val (ts1, _) = time(serve())
        val (tc, _) = time(graft.ext.Retrieval.compactIndex(spark, dir))
        val (ts2, _) = time(serve())
        println(f"PROBE takedown_bm25_$name rows=$rows deleted=$nDel " +
          f"delete_sec=$td%.2f serve_base_sec=$ts0%.2f " +
          f"serve_masked_sec=$ts1%.2f compact_sec=$tc%.2f " +
          f"serve_healed_sec=$ts2%.2f")
      }
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val qv = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      for ((name, k) <- Seq(("1x", 1), ("10x", 10))) {
        val corpus = (0 until k).map(i => emb.select(
            (col("vec_id") + i * 10000000L).as("vec_id"), col("embedding")))
          .reduce(_.unionByName(_))
        val rows = corpus.count()
        val nc = graft.ext.Similarity.autoNCentroids(rows)
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft-takedown-ann-$name").toString + "/store"
        graft.ext.AnnStore.create(corpus, "vec_id", "embedding",
          graft.ext.Similarity.trainIvf(corpus, "vec_id", "embedding", nc), dir)
        def serve(): Long = graft.ext.AnnStore.serve(dir, corpus, "vec_id",
          "embedding", qv, "qid", "qv", k = 10, nProbe = 8).count()
        val (ts0, _) = time(serve())
        val (td, nDel) = time(graft.ext.AnnStore.delete(
          corpus.filter(col("vec_id") % 10 === 3).select("vec_id"),
          "vec_id", dir))
        val (ts1, _) = time(serve())
        val (tc, _) = time(graft.ext.AnnStore.compactCodes(spark, dir))
        val (ts2, _) = time(serve())
        println(f"PROBE takedown_ann_$name rows=$rows n_centroids=$nc " +
          f"deleted=$nDel delete_sec=$td%.2f serve_base_sec=$ts0%.2f " +
          f"serve_masked_sec=$ts1%.2f compact_sec=$tc%.2f " +
          f"serve_healed_sec=$ts2%.2f")
      }
    }
    // r16 (r15-verdict #2): LONG-SOAK fragmentation — real crawl cadence
    // is hundreds of appends interleaved with takedowns, not the 8 appends
    // the dedup_store_append_8 gate covers. Drive ~100 cycles against ONE
    // MinHash store: streamed append every cycle, a takedown every 10th,
    // compactMinHashStoreIfNeeded every cycle (threshold 64 files).
    // Record live-file count and serve latency per cycle — the claim is
    // both stay BOUNDED: files sawtooth under the threshold, serve tracks
    // corpus size (which grows ~2%/cycle by construction), never file
    // count. A no-cadence CONTROL run shows the counterfactual drift.
    // Runs only when named explicitly (it is a minutes-long loop).
    if (only("soak")) {
      val cycles = sys.env.getOrElse("SPARK_GRAFT_SOAK_CYCLES", "100").toInt
      val controlCycles =
        sys.env.getOrElse("SPARK_GRAFT_SOAK_CONTROL", "40").toInt
      def batchOf(i: Int): DataFrame = docs
        .filter(col("doc_id") % 50 === (i % 50))
        // reverse(): utterly different shingle sets than the base corpus,
        // so the fixed probe's pair count stays constant across cycles
        // and serve time isolates store mechanics, not result growth
        .select((col("doc_id") + i * 10000000L).as("doc_id"),
          concat(reverse(col("text")), lit(s" soak batch $i")).as("text"))
      val probe = docs.filter(col("doc_id") % 37 === 0)
        .select((col("doc_id") + 900000000L).as("doc_id"),
          concat(col("text"), lit(" probe suffix")).as("text"))
        .persist()
      probe.count(): Unit
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      /** ONE soak protocol for all four crawl-appended store families
        * (r17 third-pass review: the per-store loop copies had begun to
        * drift). Per cycle: append batch i; every 10th cycle, take down
        * a third of the batch appended 5 cycles earlier; run the
        * store's compaction cadence; time the fixed-probe serve. `extra`
        * appends leg-specific fields to the per-decade line (e.g. the
        * ANN pruned fraction). */
      def runStoreSoak(name: String, n: Int,
          append: Int => Unit, retract: Int => Unit,
          cadenceCheck: () => Boolean, files: () => Long,
          serve: () => Long, extra: () => String = () => ""): Unit = {
        var compactions = 0
        val serveS = collection.mutable.ArrayBuffer.empty[Double]
        val filesS = collection.mutable.ArrayBuffer.empty[Long]
        for (i <- 1 to n) {
          append(i)
          if (i % 10 == 0) retract(i - 5)
          if (cadenceCheck()) compactions += 1
          val nf = files()
          val (ts, served) = time(serve())
          serveS += ts; filesS += nf
          if (i % 10 == 0 || i == n)
            println(f"PROBE soak_$name cycle=$i files=$nf " +
              f"serve_sec=$ts%.2f served=$served${extra()} " +
              f"compactions=$compactions")
        }
        println(f"PROBE soak_${name}_summary cycles=$n " +
          f"files_max=${filesS.max} files_last=${filesS.last} " +
          f"compactions=$compactions " +
          f"serve_first10_med=${med(serveS.take(10).toSeq)}%.2f " +
          f"serve_last10_med=${med(serveS.takeRight(10).toSeq)}%.2f")
      }
      def mhSoak(name: String, n: Int, cadence: Boolean): Unit = {
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft-soak-$name").toString + "/mh"
        graft.ext.Dedup.buildMinHashStore(docs, "doc_id", "text", dir)
        runStoreSoak(name, n,
          append = i => graft.ext.Dedup.appendBatchToMinHashStore(
            batchOf(i), "doc_id", "text", dir, "soak", i.toLong): Unit,
          retract = v => graft.ext.Dedup.retractFromMinHashStore(
            batchOf(v).filter(col("doc_id") % 3 === 0).select("doc_id"),
            "doc_id", dir): Unit,
          cadenceCheck = () => cadence && graft.ext.Dedup
            .compactMinHashStoreIfNeeded(spark, dir, maxFiles = 64),
          files = () =>
            graft.ext.Dedup.minhashStoreFileCount(spark, dir).toLong,
          serve = () => graft.ext.Dedup.minhashPairsAgainstStore(
            probe, "doc_id", "text", dir).count())
      }
      // each sub-soak is skippable via its env knob (0 = skip)
      if (cycles > 0) mhSoak("cadence", cycles, cadence = true)
      if (controlCycles > 0) mhSoak("control", controlCycles, cadence = false)

      // the BM25 store's soak — same cadence contract, different
      // mechanics (manifest generations + compactIndexIfNeeded's
      // gens/files/tombstone-deadline thresholds): streamed append every
      // cycle, a takedown every 10th, cadence check every cycle with
      // maxTombstoneRows=0 so each threshold compaction also heals
      val bmCycles = sys.env.getOrElse("SPARK_GRAFT_SOAK_BM", "60").toInt
      if (bmCycles > 0) {
        val bmDir = java.nio.file.Files
          .createTempDirectory("graft-soak-bm").toString + "/idx"
        graft.ext.Retrieval.buildIndex(docs, "doc_id", "text", bmDir)
        val qs = docs.filter(col("doc_id") % 37 === 0)
          .select(col("doc_id").as("qid"), concat_ws(" ",
            slice(graft.ext.TextAnalysis.tokens(col("text")), 1, 3))
              .as("qtext"))
          .persist()
        qs.count(): Unit
        runStoreSoak("bm25", bmCycles,
          append = i => graft.ext.Retrieval.appendBatchToIndex(batchOf(i),
            "doc_id", "text", bmDir, "soak", i.toLong): Unit,
          retract = v => graft.ext.Retrieval.deleteDocsBatch(
            batchOf(v).filter(col("doc_id") % 3 === 0).select("doc_id"),
            "doc_id", bmDir, "soaktd", v.toLong): Unit,
          cadenceCheck = () => graft.ext.Retrieval.compactIndexIfNeeded(
            spark, bmDir, maxGens = 16, maxTombstoneRows = 0L),
          files = () => graft.ext.Retrieval.liveFileCount(spark, bmDir),
          serve = () => graft.ext.Retrieval.bm25TopKFromIndex(
            spark, bmDir, qs, "qid", "qtext", k = 5).count())
        qs.unpersist(): Unit
      }

      // r17: the fingerprint store's soak — the FOURTH crawl-appended
      // store family (cadence: compactIfNeeded, same thresholds shape as
      // BM25/ANN): streamed appendBatch every cycle, a retraction every
      // 10th, cadence check every cycle with maxTombstoneRows=0 so each
      // threshold compaction also physically erases. Serve = scrub of a
      // FIXED probe batch (membership constant by construction).
      val fpCycles = sys.env.getOrElse("SPARK_GRAFT_SOAK_FP", "60").toInt
      if (fpCycles > 0) {
        val fpDir = java.nio.file.Files
          .createTempDirectory("graft-soak-fp").toString + "/store"
        graft.ext.FingerprintStore.build(docs, "text", fpDir)
        val fpProbe = docs.filter(col("doc_id") % 37 === 0)
          .select((col("doc_id") + 900000000L).as("doc_id"),
            concat(col("text"), lit(" fp probe suffix")).as("text"))
          .persist()
        val nProbeRows = fpProbe.count()
        runStoreSoak("fp", fpCycles,
          append = i => graft.ext.FingerprintStore.appendBatch(batchOf(i),
            "text", fpDir, "soak", i.toLong): Unit,
          retract = v => graft.ext.FingerprintStore.retractBatch(
            batchOf(v).filter(col("doc_id") % 3 === 0),
            "text", fpDir, "soaktd", v.toLong): Unit,
          cadenceCheck = () => graft.ext.FingerprintStore.compactIfNeeded(
            spark, fpDir, maxGens = 16, maxTombstoneRows = 0L),
          files = () =>
            graft.ext.FingerprintStore.liveFileCount(spark, fpDir),
          serve = () => {
            val served = graft.ext.FingerprintStore.scrub(
              fpProbe, "text", fpDir).count()
            require(served == nProbeRows,
              s"fp soak probe must stay membership-constant ($served)")
            served
          })
        fpProbe.unpersist(): Unit
      }

      // r17 (r16-verdict #2): the ANN store's soak — completes the soak
      // family across the three crawl-appended stores (MinHash 100
      // cycles, BM25 60, now ANN under `compactCodesIfNeeded`). Streamed
      // appendBatch every cycle, streamed deleteBatch every 10th, cadence
      // check every cycle (maxGens=16, maxTombstoneRows=0 so each
      // threshold compaction also physically erases the tombstoned
      // rows). Recorded per cycle: live code files (the fragmentation
      // sawtooth), serve wall on a FIXED 16-query batch, and the
      // listed-bytes fraction that batch's partition pruning reads —
      // fragmentation must not erode the pruning.
      val annCycles = sys.env.getOrElse("SPARK_GRAFT_SOAK_ANN", "60").toInt
      if (annCycles > 0) {
        val embBase = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select("vec_id", "embedding").persist()
        val rows = embBase.count()
        val annDir = java.nio.file.Files
          .createTempDirectory("graft-soak-ann").toString + "/store"
        graft.ext.AnnStore.create(embBase, "vec_id", "embedding",
          graft.ext.Similarity.trainIvf(embBase, "vec_id", "embedding",
            graft.ext.Similarity.autoNCentroids(rows)), annDir)
        // query count tunable: at small SFs 16 queries × nProbe 8 probe
        // EVERY cell (frac 1.0 by construction); a narrow batch (e.g. 2)
        // makes the pruned fraction a real signal across cycles
        val nQ = sys.env.getOrElse("SPARK_GRAFT_SOAK_ANN_QUERIES", "16").toInt
        val qv = embBase.filter(col("vec_id") < nQ)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
          .persist()
        val qVecs = qv.collect()
          .map(_.getSeq[Float](1).toArray.map(_.toDouble))
        val nProbe = 8
        // probed cells are FIXED (same queries, centroids never retrain
        // in this soak) — compute once, re-list bytes per cycle over the
        // MANIFEST's live generations (a raw dir listing would count
        // post-compaction cooling generations serves never read)
        val annIdx = graft.ext.AnnStore.loadIndex(spark, annDir)
        val probed = probedCells(qVecs, annIdx.centers, nProbe)
        def listedFrac(): Double = {
          val (kb, tb) = annListedBytes(spark, annDir, probed)
          if (tb == 0) 0.0 else kb.toDouble / tb
        }
        // appended vectors are negated base vectors under disjoint ids:
        // distinct directions (the store genuinely grows) that stay far
        // from the fixed probe batch, so serve time isolates store
        // mechanics, not result churn
        def annBatch(i: Int): DataFrame = embBase
          .filter(col("vec_id") % 50 === (i % 50))
          .select((col("vec_id") + i * 10000000L).as("vec_id"),
            transform(col("embedding"), x => -x).as("embedding"))
        def annLeg(name: String, n: Int, dir: String, cadence: Boolean,
            extra: () => String): Unit =
          runStoreSoak(name, n,
            append = i => graft.ext.AnnStore.appendBatch(annBatch(i),
              "vec_id", "embedding", dir, "soak", i.toLong): Unit,
            retract = v => graft.ext.AnnStore.deleteBatch(
              annBatch(v).filter(col("vec_id") % 3 === 0)
                .select("vec_id"), "vec_id", dir, "soaktd", v.toLong): Unit,
            cadenceCheck = () => cadence &&
              graft.ext.AnnStore.compactCodesIfNeeded(spark, dir,
                maxGens = 16, maxTombstoneRows = 0L),
            files = () => graft.ext.AnnStore.liveCodeFileCount(spark, dir),
            serve = () => graft.ext.AnnStore.serve(dir, embBase, "vec_id",
              "embedding", qv, "qid", "qv", k = 10,
              nProbe = nProbe).count(),
            extra = extra)
        annLeg("ann", annCycles, annDir, cadence = true,
          extra = () => f" listed_frac=${listedFrac()}%.4f")
        // no-cadence CONTROL: same cycle shape, compaction never runs —
        // the counterfactual the cadence prevents (files grow without
        // bound; serve drifts with the listing)
        val annControl =
          sys.env.getOrElse("SPARK_GRAFT_SOAK_ANN_CONTROL", "30").toInt
        if (annControl > 0) {
          val cDir = java.nio.file.Files
            .createTempDirectory("graft-soak-annctl").toString + "/store"
          graft.ext.AnnStore.create(embBase, "vec_id", "embedding",
            graft.ext.Similarity.trainIvf(embBase, "vec_id", "embedding",
              graft.ext.Similarity.autoNCentroids(rows)), cDir)
          annLeg("ann_control", annControl, cDir, cadence = false,
            extra = () => "")
        }
        qv.unpersist(); embBase.unpersist(): Unit
      }
    }

    // r17 (r16-verdict #5): the STAGING TAX — the write-ahead staging
    // step (Pipeline.stageBatch) adds one batch-sized parquet round-trip
    // per nightly batch; this measures it against the raw composition
    // (derive → persist → appends, no durable stage) on fresh stores per
    // rep, end-to-end: derivation + all four store appends + the ledger
    // increment. The staged path's claimed advantage is RESUME cost and
    // correctness, not happy-path speed — this pins the happy-path delta
    // as a number. Runs only when named explicitly.
    if (only("staging")) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text")
      val hist = docs.filter(pmod(col("doc_id"), lit(3)) =!= 1)
      val idBase = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
      def batch = docs.filter(pmod(col("doc_id"), lit(3)) === 1)
        .select((col("doc_id") + idBase).as("doc_id"), col("text"))
        .unionByName(docs.filter(pmod(col("doc_id"), lit(6)) === 0)
          .select((col("doc_id") + 2L * idBase).as("doc_id"), col("text")))
        .unionByName(docs.filter(pmod(col("doc_id"), lit(6)) === 2)
          .select((col("doc_id") + 3L * idBase).as("doc_id"),
            concat(col("text"), lit(" staging probe suffix")).as("text")))
      def embed(df: DataFrame) = df.select(col("doc_id"),
        graft.ext.TextAnalysis.hashVector(col("text"), 64).as("emb"))
      import graft.schema.{ColumnSchema, DataFrameSchema}
      import org.apache.spark.sql.types.{LongType, StringType}
      val ledSch = DataFrameSchema(
        "doc_id" -> ColumnSchema(Some(LongType), Nil, nullable = false),
        "text" -> ColumnSchema(Some(StringType), Nil, nullable = false),
        "ds" -> ColumnSchema.of(StringType))
      for (rep <- 1 to 3; mode <- Seq("staged", "raw")) {
        val root = java.nio.file.Files
          .createTempDirectory(s"graft-staging-$mode").toString
        val (fp, mh, bm, ann, led, sd) = (s"$root/fp", s"$root/mh",
          s"$root/bm", s"$root/ann", s"$root/led", s"$root/staged")
        graft.ext.FingerprintStore.build(hist, "text", fp)
        graft.ext.Dedup.buildMinHashStore(hist, "doc_id", "text", mh)
        graft.ext.Retrieval.buildIndex(hist, "doc_id", "text", bm)
        val he = embed(hist)
        graft.ext.AnnStore.create(he, "doc_id", "emb",
          graft.ext.Similarity.trainIvf(he, "doc_id", "emb",
            nCentroids = 8), ann)
        graft.ext.ValidationLedger.validateIncrement(ledSch,
          hist.withColumn("ds", lit("hist")), "ds", led, "hist"): Unit
        def derive = graft.ext.Dedup.dropExistingNearDupStore(
          graft.ext.FingerprintStore.scrub(batch, "text", fp),
          "doc_id", "text", mh)
        var tStage = 0.0
        val (tTotal, _) = time {
          val (ts, survivors) = time {
            if (mode == "staged")
              graft.ext.Pipeline.stageBatch(spark, sd, "night", 1L)(derive)
            else { val d = derive.persist(); d.count(): Unit; d }
          }
          tStage = ts
          graft.ext.FingerprintStore.appendBatch(survivors, "text", fp,
            "night", 1L): Unit
          graft.ext.Dedup.appendBatchToMinHashStore(survivors, "doc_id",
            "text", mh, "night", 1L): Unit
          graft.ext.Retrieval.appendBatchToIndex(survivors, "doc_id",
            "text", bm, "night", 1L): Unit
          graft.ext.AnnStore.appendBatch(embed(survivors), "doc_id",
            "emb", ann, "night", 1L): Unit
          graft.ext.ValidationLedger.validateIncrementBatch(ledSch,
            survivors.withColumn("ds", lit("night1")), "ds", led,
            "night1", "night", 1L, candidates = Some(Seq("night1"))): Unit
          if (mode == "staged")
            graft.ext.Pipeline.retireStaged(spark, sd, "night", 1L)
          else survivors.unpersist(): Unit
        }
        println(f"PROBE staging mode=$mode rep=$rep " +
          f"derive_sec=$tStage%.2f total_sec=$tTotal%.2f")
      }
    }

    // r19 (r18-verdict #4): the composed nightly-crawl pipeline's own
    // store decade — the per-leg curves exist (bm25store, annserve, the
    // dedup stores), but the COMPOSITION (the pipeline_crawl_batch gate
    // + bench section) only had 1×/10× trend points. This measures the
    // end-to-end recurring batch against stores built from 1×/10×/100×
    // historical corpora. The batch is the SAME in all three legs (built
    // from the 1× corpus, the bench gate's shape: fresh + exact
    // re-crawls + near-dup re-crawls + blanks + corrupt lines), so the
    // pin is BATCH-DOMINATED wall: the exact scrub (bloom prefilter),
    // near-dup scrub (banded LSH bucket join), BM25/ANN appends
    // (token-bucket / cell layouts) and the PSI profile serve must stay
    // near-flat while the stores grow 100×. Replica texts are
    // vowel-permuted, so the batch's duplicate structure against the
    // store is decade-invariant — the per-leg bad/survivor/psi counts
    // pin that invariance. Explicit-only leg (the 100× store builds
    // write ~GBs of temp data).
    if (only("pipeline")) {
      import graft.schema.{ColumnSchema, DataFrameSchema}
      import org.apache.spark.sql.types.{LongType, StringType}
      val crawlSchema = DataFrameSchema(
        "id" -> ColumnSchema(Some(LongType), Nil, nullable = false),
        "text" -> ColumnSchema(Some(StringType),
          Seq(graft.checks.ColumnCheck("text_nonblank",
            c => length(trim(c)) > 0)), nullable = false))
        .copy(dropInvalidRows = true)
      val docsT = docs.select("doc_id", "text")
      val jdir0 = {
        val bA = docsT.filter(pmod(col("doc_id"), lit(3)) === 1)
          .select((col("doc_id") + 1000000).as("id"), col("text"),
            (pmod(col("doc_id"), lit(30)) === 1).as("corrupt"))
        val bB = docsT.filter(pmod(col("doc_id"), lit(6)) === 0)
          .select((col("doc_id") + 2000000).as("id"), col("text"),
            lit(false).as("corrupt"))
        val bC = docsT.filter(pmod(col("doc_id"), lit(6)) === 2)
          .select((col("doc_id") + 3000000).as("id"),
            concat(col("text"), lit(" r19 probe suffix")).as("text"),
            lit(false).as("corrupt"))
        val bD = docsT.filter(pmod(col("doc_id"), lit(6)) === 3)
          .select((col("doc_id") + 4000000).as("id"), lit("   ").as("text"),
            lit(false).as("corrupt"))
        val j = java.nio.file.Files
          .createTempDirectory("graft-sp-pipe-json").toString
        bA.unionByName(bB).unionByName(bC).unionByName(bD)
          .select(when(col("corrupt"), concat(lit("{\"id\": "), col("id"),
              lit(", \"text\": \"broken")))
            .otherwise(to_json(struct(col("id"), col("text")))).as("value"))
          .coalesce(1).write.text(s"$j/data")
        j
      }
      def embed(df: DataFrame, id: org.apache.spark.sql.Column) = df.select(
        id.as("doc_id"),
        graft.ext.TextAnalysis.hashVector(col("text"), 64).as("emb"))
      for ((name, k) <- Seq(("1x", 1), ("10x", 10), ("100x", 100))) {
        val hist = if (k == 1) docsT else replicate(docsT, k)
        val histRows = hist.count()
        def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
        val fp = tmp(s"graft-sp-pipe-fp-$name")
        graft.ext.FingerprintStore.build(hist, "text", fp)
        val mh = tmp(s"graft-sp-pipe-mh-$name")
        graft.ext.Dedup.buildMinHashStore(hist, "doc_id", "text", mh)
        val bm = tmp(s"graft-sp-pipe-bm-$name")
        graft.ext.Retrieval.buildIndex(hist, "doc_id", "text", bm)
        val he = embed(hist, col("doc_id"))
        val ann = tmp(s"graft-sp-pipe-ann-$name")
        graft.ext.AnnStore.create(he, "doc_id", "emb",
          graft.ext.Similarity.trainIvf(he, "doc_id", "emb",
            nCentroids = 8), ann)
        val prof = tmp(s"graft-sp-pipe-prof-$name") + "/profile.json"
        graft.ext.DriftProfile.fit(
          hist.select(graft.ext.TextAnalysis.tokenCount(col("text"))
            .cast("double").as("tok_cnt")),
          numericCols = Seq("tok_cnt"), bins = 5).save(prof)
        // plan-cache isolation (the r18 lesson): each leg reads a
        // private byte-identical copy of the batch — readQuarantined
        // persists its raw scan keyed on the input PATH
        val j = tmp(s"graft-sp-pipe-in-$name")
        graft.Bench.copyDirForced(java.nio.file.Paths.get(s"$jdir0/data"),
          java.nio.file.Paths.get(s"$j/data"))
        val (t, counts) = time {
          val (res, bad) = graft.io.ValidatedIO.readQuarantined(spark,
            crawlSchema, s"$j/data", "json")
          val valid = res.data.select(col("id"), col("text"))
          val afterExact = graft.ext.FingerprintStore.scrub(valid, "text", fp)
          val survivors = graft.ext.Dedup.dropExistingNearDupStore(
            afterExact, "id", "text", mh).localCheckpoint(true)
          graft.ext.Retrieval.appendToIndex(survivors, "id", "text", bm)
          graft.ext.AnnStore.append(embed(survivors, col("id")),
            "doc_id", "emb", ann)
          val np = graft.ext.DriftProfile.load(prof).numericFor("tok_cnt")
          val psiRows = graft.ext.Drift.psiAgainstProfile(
            survivors.select(graft.ext.TextAnalysis.tokenCount(col("text"))
              .cast("double").as("tok_cnt")),
            "tok_cnt", np.edges, np.fracs).count()
          (bad.count(), survivors.count(), psiRows)
        }
        println(f"PROBE pipeline_$name hist_rows=$histRows wall_sec=$t%.2f " +
          f"bad=${counts._1} survivors=${counts._2} psi_rows=${counts._3}")
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        Seq(fp, mh, bm, ann, j).foreach(d =>
          graft.Bench.deleteDirRec(java.nio.file.Paths.get(d)))
      }
      graft.Bench.deleteDirRec(java.nio.file.Paths.get(jdir0))
    }

    // round-18 (r17 verdict #4): the validation SPINE's own decade — the
    // one §2-core family without a recorded 100× point. validate_full's
    // fused pass (the full 20-check lineitem contract incl. the joint-
    // unique shuffle) over DISK-BACKED parquet at 1×/10×/100× the sf
    // rows, replicas offsetting l_orderkey so the (l_orderkey,
    // l_linenumber) key stays genuinely unique and the uniqueness
    // aggregation pays its honest shuffle. Pins: the Spark JOB count is
    // FLAT across decades (the fused engine's one-scan + one-uniqueness
    // plan is row-count-independent — at 100 TB, jobs ∝ checks would be
    // the scale killer) and the error-kind count is constant (dirty rows
    // replicate proportionally but the same 3 checks fail). Explicit-only
    // leg: the 100× replica writes ~GBs of temp parquet.
    if (only("validate")) {
      val jobCounter = new java.util.concurrent.atomic.AtomicInteger(0)
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            jobCounter.incrementAndGet(): Unit
        })
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val schema = graft.Bench.lineitemSchema
      // sign-PRESERVING per-replica offset (r19 verdict #7): positive
      // keys shift up, non-positive keys shift down — the former
      // unconditional +1e9·rep healed the sf's 6 dirty l_orderkey≤0
      // rows in every replica but the first, so failed-row counts
      // weren't exactly ×k per decade and the table needed a footnote.
      // Both maps are injective into disjoint per-replica bands, so the
      // (l_orderkey, l_linenumber) key stays genuinely unique and the
      // uniqueness aggregation pays its honest shuffle.
      def replicateLi(n: Int): DataFrame =
        if (n == 1) li
        else li
          .select(col("*"), explode(sequence(lit(0), lit(n - 1))).as("rep"))
          .withColumn("l_orderkey",
            when(col("l_orderkey") <= 0,
              col("l_orderkey") - col("rep") * 1000000000L)
            .otherwise(col("l_orderkey") + col("rep") * 1000000000L))
          .drop("rep")
      // warm the fused path's codegen once so decade 1 isn't charged JIT
      schema.validate(li.limit(1000)): Unit
      for ((name, k) <- Seq(("1x", 1), ("10x", 10), ("100x", 100))) {
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft-sp-val-$name").toString
        replicateLi(k).write.mode("overwrite").parquet(dir)
        val d = spark.read.parquet(dir)
        val rows = d.count()
        jobCounter.set(0)
        val (tv, res) = time(schema.validate(d))
        val jobs = jobCounter.get()
        println(f"PROBE validate_$name rows=$rows validate_sec=$tv%.2f " +
          f"jobs=$jobs error_kinds=${res.errors.size} " +
          f"failed_rows=${res.errors.map(_.failureCount).sum}")
        graft.Bench.deleteDirRec(java.nio.file.Paths.get(dir))
      }
    }
    spark.stop()
  }
}
