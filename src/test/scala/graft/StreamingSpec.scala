package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types._
import graft.checks.Check
import graft.schema._
import graft.streaming.StreamingValidation

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val schema = DataFrameSchema(
    "id" -> ColumnSchema(Some(LongType), Seq(Check.ge(0L))),
    "v" -> ColumnSchema(Some(DoubleType), Seq(Check.inRange(0.0, 100.0))))

  test("foreachBatch validation reuses the batch engine per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val stream = mem.toDF().toDF("id", "v")

    val reports = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean, Long)]
    val q = StreamingValidation.validatedWriter(stream, schema) { (data, id, res) =>
      reports += ((id, res.passed, data.count()))
    }.start()
    try {
      mem.addData((1L, 5.0), (2L, 7.5))
      q.processAllAvailable()
      mem.addData((3L, -4.0)) // fails in_range
      q.processAllAvailable()
    } finally q.stop()

    assert(reports.size == 2)
    assert(reports(0) == ((0L, true, 2L)))
    assert(reports(1)._2 == false)
  }

  test("quarantine writer splits valid and invalid rows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val stream = mem.toDF().toDF("id", "v")

    val valid = scala.collection.mutable.ArrayBuffer.empty[Long]
    val invalid = scala.collection.mutable.ArrayBuffer.empty[Long]
    val invalidPlans = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = StreamingValidation.quarantineWriter(stream, schema) { (df, _) =>
      valid ++= df.select("id").collect().map(_.getLong(0))
    } { (df, _) =>
      invalidPlans += df.queryExecution.optimizedPlan.toString
      invalid ++= df.select("id").collect().map(_.getLong(0))
    }.start()
    try {
      mem.addData((1L, 5.0), (2L, 200.0), (3L, 50.0))
      q.processAllAvailable()
    } finally q.stop()

    assert(valid.sorted == Seq(1L, 3L))
    assert(invalid.sorted == Seq(2L))
    // r3 verdict wrong #1: the invalid side must be a pure filter — no
    // exceptAll (aggregation-based set difference shuffling the batch)
    invalidPlans.foreach { p =>
      assert(!p.contains("Except") && !p.contains("Aggregate"),
        s"invalid-side plan must be shuffle-free:\n$p")
    }
  }

  test("incremental scrub writer drops corpus-known texts every batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val corpus = Seq(
      (100L, "a known corpus document about rivers"),
      (101L, "another known corpus document about mountains")
    ).toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")

    val arrived = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamingValidation.incrementalScrubWriter(stream, corpus, "text") {
      (df, _) => arrived ++= df.select("doc_id").collect().map(_.getLong(0))
    }.start()
    try {
      mem.addData((1L, "A known  corpus document about rivers"), // dup mod case/ws
        (2L, "a brand new document"))
      q.processAllAvailable()
      mem.addData((3L, "another known corpus document about mountains"), // dup
        (4L, "yet another new document"))
      q.processAllAvailable()
    } finally q.stop()
    assert(arrived.sorted == Seq(2L, 4L))
  }

  test("streaming exact dedup drops repeat keys within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)] // (ts nanos, user, event)
    val stream = mem.toDF().toDF("ts", "user_id", "event_type")
    val deduped = StreamingValidation.dedupStream(
      stream, Seq("user_id", "event_type"), "ts", watermark = "1 hour")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      val h = 3600L * 1000 * 1000 * 1000 // one hour of nanos
      mem.addData((0L, 1L, "click"), (1000L, 1L, "click"), (2000L, 2L, "click"))
      q.processAllAvailable()
      mem.addData((h / 2, 1L, "click"), (h / 2, 1L, "view")) // dup inside horizon + new key
      q.processAllAvailable()
      val got = spark.sql("SELECT user_id, event_type FROM dedup_out").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted
      assert(got.toSeq == Seq((1L, "click"), (1L, "view"), (2L, "click")))
    } finally q.stop()
  }

  test("streaming dedup fingerprint opt-in behaves like the raw-key path") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val stream = mem.toDF().toDF("ts", "user_id", "event_type")
    val deduped = StreamingValidation.dedupStream(
      stream, Seq("user_id", "event_type"), "ts", watermark = "1 hour",
      fingerprintKeys = true)
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_fp_out").start()
    try {
      mem.addData((0L, 1L, "click"), (1000L, 1L, "click"), (2000L, 2L, "click"))
      q.processAllAvailable()
      val got = spark.sql("SELECT user_id, event_type FROM dedup_fp_out").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted
      assert(got.toSeq == Seq((1L, "click"), (2L, "click")))
    } finally q.stop()
  }

  test("fingerprint dedup keeps key tuples whose nulls sit in different positions (r17 review)") {
    // Spark's xxhash64 SKIPS null children, so (123, null) and (null,
    // 123) hash identically unless the null positions ride along — the
    // fixed fingerprint hashes the per-column null flags too. These two
    // events are DISTINCT keys and must both survive.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.lang.Long, java.lang.Long)]
    val stream = mem.toDF().toDF("ts", "user_id", "device_id")
    val deduped = StreamingValidation.dedupStream(
      stream, Seq("user_id", "device_id"), "ts", watermark = "1 hour",
      fingerprintKeys = true)
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_fp_null_out").start()
    try {
      mem.addData((0L, 123L, null), (1000L, null, 123L), (2000L, 123L, null))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT user_id, device_id FROM dedup_fp_null_out").collect()
        .map(r => (Option(r.get(0)), Option(r.get(1)))).toSeq.sortBy(_.toString)
      assert(got == Seq((None, Some(123L)), (Some(123L), None)),
        s"distinct null-position tuples must both survive, got $got")
    } finally q.stop()
  }

  test("dedupStream/nearDedupStream refuse reserved internal column names (r17 review)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val stream = mem.toDF().toDF("ts", "__ets", "text")
    intercept[IllegalArgumentException](StreamingValidation.dedupStream(
      stream, Seq("__ets"), "ts", "1 hour"))
    intercept[IllegalArgumentException](StreamingValidation.nearDedupStream(
      stream, "text", "ts", "1 hour"))
  }

  test("streaming near-dedup collapses reordered copies via simhash state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)] // (ts nanos, text)
    val stream = mem.toDF().toDF("ts", "text")
    val deduped = StreamingValidation.nearDedupStream(
      stream, "text", "ts", watermark = "1 hour")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("neardedup_out").start()
    try {
      mem.addData(
        (0L, "the quick brown fox jumps over the lazy dog"),
        // reordered copy — token-vote simhash is order-independent
        (1000L, "over the lazy dog jumps the quick brown fox"),
        (2000L, "a completely different document about spark engines"))
      q.processAllAvailable()
      val got = spark.sql("SELECT text FROM neardedup_out").collect().map(_.getString(0))
      assert(got.length == 2, s"expected reordered copy dropped, got ${got.toSeq}")
      assert(got.exists(_.contains("different document")))
    } finally q.stop()
  }

  test("sessionization matches between batch mode and streaming mode") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .limit(300)
    val batch = graft.ext.Sessions.sessionize(events, "user_id", "ts", "value")
    assert(batch.count() > 0)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val stream = mem.toDF().toDF("user_id", "ts", "value")
    // epoch-nanos longs for the stream side — EventTime resolves both the
    // parquet timestamp (batch) and the long (stream) to the same instant
    val rows = events.select(org.apache.spark.sql.functions.col("user_id"),
        (graft.functions.EventTime.eventMicros(events, "ts") * 1000L).as("ts"),
        org.apache.spark.sql.functions.col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val q = graft.ext.Sessions.sessionize(stream, "user_id", "ts", "value",
      watermark = Some("12 hours"))
      .writeStream.outputMode("complete").format("memory").queryName("sessions").start()
    try {
      mem.addData(rows.toIndexedSeq: _*)
      q.processAllAvailable()
      def fmt(r: org.apache.spark.sql.Row) =
        s"${r.getLong(0)}|${r.getLong(1)}|${r.getLong(2)}|${r.getLong(3)}|${r.getDouble(4)}"
      val streamed = spark.sql("SELECT * FROM sessions").collect().map(fmt).sorted
      val batched = batch.collect().map(fmt).sorted
      assert(streamed.sameElements(batched))
    } finally q.stop()
  }

  test("windowed PSI matches between batch mode and streaming mode") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val (edges, fracs) =
      graft.ext.Drift.referenceNumericProfile(events, "value", bins = 5)
    val batch = StreamingValidation.windowedPsi(events, "ts", "value",
      edges, fracs, windowDur = "1 hour", watermark = None)
    assert(batch.count() > 0)
    // every window's psi_total is finite and bins are complete
    assert(batch.groupBy("window_start").count().filter(org.apache.spark.sql.functions.col("count") =!= 5).count() == 0)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val stream = mem.toDF().toDF("ts", "value")
    val rows = events.select(
        (graft.functions.EventTime.eventMicros(events, "ts") * 1000L).as("ts"),
        org.apache.spark.sql.functions.col("value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val q = StreamingValidation.windowedPsi(stream, "ts", "value",
      edges, fracs, windowDur = "1 hour", watermark = Some("2 hours"))
      .writeStream.outputMode("complete").format("memory").queryName("wpsi").start()
    try {
      mem.addData(rows.toIndexedSeq: _*)
      q.processAllAvailable()
      def fmt(r: org.apache.spark.sql.Row) =
        s"${r.getString(0)}|${r.getInt(1)}|${r.getDouble(2)}|${r.getDouble(3)}|${r.getDouble(4)}|${r.getDouble(5)}"
      val streamed = spark.sql("SELECT * FROM wpsi").collect().map(fmt).sorted
      val batched = batch.collect().map(fmt).sorted
      assert(streamed.sameElements(batched))
    } finally q.stop()
  }

  test("windowed Wasserstein-1 matches between batch mode and streaming mode (r12)") {
    // the drift trio's third face: same one-stateful-agg shape as
    // windowedPsi — bin counters in the windowed aggregate, the cross-bin
    // cumsum unrolled row-locally over the bounded cells
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val (edges, fracs) =
      graft.ext.Drift.referenceNumericProfile(events, "value", bins = 5)
    val batch = StreamingValidation.windowedWasserstein1(events, "ts", "value",
      edges, fracs, windowDur = "1 hour", watermark = None)
    assert(batch.count() > 0)
    assert(batch.groupBy("window_start").count()
      .filter(org.apache.spark.sql.functions.col("count") =!= 5).count() == 0)
    // w1_stat is finite and in value units (bounded by the edge span)
    val span = edges.last - edges.head
    assert(batch.select("w1_stat").collect()
      .forall(r => r.getDouble(0) >= 0 && r.getDouble(0) <= span))
    // review finding (r12): the windowed form must agree EXACTLY with the
    // batch Drift.wasserstein1 it is the counterpart of — same raw-sum
    // integral, rounded once at the end. Check one window's slice.
    import org.apache.spark.sql.functions.{col, date_format, date_trunc}
    val ws0 = batch.select("window_start").head().getString(0)
    val sliced = events.filter(date_format(date_trunc("hour",
      graft.functions.EventTime.eventTime(events, "ts")),
      "yyyy-MM-dd HH:mm:ss") === ws0)
    val batchStat = graft.ext.Drift.wasserstein1(events, sliced, "value",
      bins = 5).select("w1_stat").head().getDouble(0)
    val windowedStat = batch.filter(col("window_start") === ws0)
      .select("w1_stat").head().getDouble(0)
    assert(windowedStat == batchStat,
      s"windowed $windowedStat != batch $batchStat for window $ws0")

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val stream = mem.toDF().toDF("ts", "value")
    val rows = events.select(
        (graft.functions.EventTime.eventMicros(events, "ts") * 1000L).as("ts"),
        org.apache.spark.sql.functions.col("value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val q = StreamingValidation.windowedWasserstein1(stream, "ts", "value",
      edges, fracs, windowDur = "1 hour", watermark = Some("2 hours"))
      .writeStream.outputMode("complete").format("memory").queryName("ww1").start()
    try {
      mem.addData(rows.toIndexedSeq: _*)
      q.processAllAvailable()
      def fmt(r: org.apache.spark.sql.Row) =
        (0 until r.length).map(i => String.valueOf(r.get(i))).mkString("|")
      val streamed = spark.sql("SELECT * FROM ww1").collect().map(fmt).sorted
      val batched = batch.collect().map(fmt).sorted
      assert(streamed.sameElements(batched))
    } finally q.stop()
  }

  test("windowed categorical PSI matches between batch mode and streaming mode") {
    // r8 (r7 verdict #6): the categorical sibling of windowedPsi — top-K
    // cells + __other__ as conditional-sum counters in ONE stateful agg
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val (cells, fracs) =
      graft.ext.Drift.referenceCategoricalProfile(events, "event_type", maxCategories = 2)
    assert(cells.length == 2 && fracs.length == 3)
    assert(math.abs(fracs.sum - 1.0) < 1e-9) // fractions partition the data
    val batch = StreamingValidation.windowedPsiCategorical(events, "ts",
      "event_type", cells, fracs, windowDur = "1 hour", watermark = None)
    assert(batch.count() > 0)
    // every window has exactly topK+1 cells
    assert(batch.groupBy("window_start").count()
      .filter(org.apache.spark.sql.functions.col("count") =!= 3).count() == 0)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("ts", "event_type")
    val rows = events.select(
        (graft.functions.EventTime.eventMicros(events, "ts") * 1000L).as("ts"),
        org.apache.spark.sql.functions.col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val q = StreamingValidation.windowedPsiCategorical(stream, "ts",
      "event_type", cells, fracs, windowDur = "1 hour", watermark = Some("2 hours"))
      .writeStream.outputMode("complete").format("memory").queryName("wpsicat").start()
    try {
      mem.addData(rows.toIndexedSeq: _*)
      q.processAllAvailable()
      def fmt(r: org.apache.spark.sql.Row) =
        s"${r.getString(0)}|${r.getString(1)}|${r.getDouble(2)}|${r.getDouble(3)}|${r.getDouble(4)}|${r.getDouble(5)}"
      val streamed = spark.sql("SELECT * FROM wpsicat").collect().map(fmt).sorted
      val batched = batch.collect().map(fmt).sorted
      assert(streamed.sameElements(batched))
    } finally q.stop()
  }

  test("hourly rollup matches between batch mode and streaming mode") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val batch = StreamingValidation.hourlyRollup(events, "ts", watermark = None)
    assert(batch.count() > 0)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Double)]
    val stream = mem.toDF().toDF("ts", "event_type", "value")
    val rows = events.select(
        (graft.functions.EventTime.eventMicros(events, "ts") * 1000L).as("ts"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = StreamingValidation.hourlyRollup(stream, "ts", watermark = Some("2 hours"))
      .writeStream.outputMode("complete").format("memory").queryName("rollup").start()
    try {
      mem.addData(rows.toIndexedSeq: _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM rollup").collect()
        .map(r => s"${r.getString(0)}|${r.getString(1)}|${r.getLong(2)}|${r.getDouble(3)}").sorted
      val batched = batch.collect()
        .map(r => s"${r.getString(0)}|${r.getString(1)}|${r.getLong(2)}|${r.getDouble(3)}").sorted
      assert(streamed.sameElements(batched))
    } finally q.stop()
  }

  test("windowed heavy hitters: streaming candidates sandwich the batch-exact set") {
    // the streaming form has no exact-recount pass, so its contract is a
    // two-sided bound (MG estimates are lower bounds; the emit cut keeps
    // everything within N/(cap+1) of the threshold):
    //   guaranteed rows ⊆ exact heavy hitters ⊆ emitted candidates
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val phi = 0.03
    val exact = graft.ext.HeavyHitters
      .frequentItemsByWindow(events, "ts", "user_id", phi, "1 day")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(exact.nonEmpty)
    val exactSet = exact.map(t => (t._1, t._2)).toSet

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val stream = mem.toDF().toDF("ts", "user_id")
    val rows = events.select(
        (graft.functions.EventTime.eventMicros(events, "ts") * 1000L).as("ts"),
        org.apache.spark.sql.functions.col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val q = StreamingValidation.windowedHeavyHitters(stream, "ts", "user_id",
        phi, "1 day", watermark = Some("2 days"))
      .writeStream.outputMode("complete").format("memory").queryName("whh").start()
    try {
      // several micro-batches so sketch MERGE paths (not just update) run
      rows.grouped(math.max(rows.length / 7, 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
      }
      val cand = spark.sql("SELECT * FROM whh").collect()
      val candSet = cand.map(r => (r.getString(0), r.getLong(1))).toSet
      val guaranteed = cand.filter(_.getBoolean(5))
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(exactSet.subsetOf(candSet),
        s"missed heavy hitters: ${(exactSet -- candSet).take(5)}")
      assert(guaranteed.subsetOf(exactSet),
        s"false guarantees: ${(guaranteed -- exactSet).take(5)}")
      // and per-row MG bounds hold against the exact counts
      val exactCnt = exact.map(t => (t._1, t._2) -> t._3).toMap
      cand.foreach { r =>
        val k = (r.getString(0), r.getLong(1))
        exactCnt.get(k).foreach { c =>
          assert(r.getLong(2) <= c && c <= r.getDouble(3) + 1e-9,
            s"$k: est_min=${r.getLong(2)} est_max=${r.getDouble(3)} true=$c")
        }
      }
    } finally q.stop()
  }

  test("quarantine replay equals the batch predicate split") {
    import org.apache.spark.sql.functions.lit
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_tax")
    val sch = DataFrameSchema(
      "l_quantity" -> ColumnSchema(Some(DoubleType), Seq(Check.inRange(5.0, 45.0))),
      "l_tax" -> ColumnSchema(Some(DoubleType), Seq(Check.le(0.05))))
    val streamed = StreamingValidation.quarantineReplay(li, sch)
    val (v, q) = graft.backend.Validator.splitByRowChecks(sch, li)
    val batch = v.withColumn("side", lit("valid"))
      .unionByName(q.withColumn("side", lit("quarantined")))
    assert(streamed.count() == li.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("scrub replay equals the batch bloom anti-join") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    // half the corpus re-crawled (must all drop) + shifted ids with new
    // text (must all survive)
    val incoming = docs.filter(col("doc_id") % 2 === 0)
      .unionByName(docs.filter(col("doc_id") % 2 === 1)
        .select((col("doc_id") + 5000000L).as("doc_id"),
          concat(col("text"), lit(" novel suffix")).as("text")))
    val streamed = StreamingValidation.scrubReplay(incoming, docs, "text")
    val batch = graft.ext.Dedup.dropExistingExactBloom(incoming, docs, "doc_id", "text")
    assert(streamed.count() == batch.count())
    assert(streamed.select("doc_id").exceptAll(batch.select("doc_id")).isEmpty)
    assert(batch.select("doc_id").exceptAll(streamed.select("doc_id")).isEmpty)
  }

  test("dedup replay emits exactly the distinct key set") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select("user_id", "event_type", "ts")
    val got = StreamingValidation.dedupReplay(ev, Seq("user_id", "event_type"), "ts")
    val want = ev.select("user_id", "event_type").distinct()
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("replay harnesses honor a caller-owned output root (r17 advice)") {
    // with outputRoot set, the invocation's dirs land under it and the
    // caller may delete them eagerly after materializing the result — a
    // long-lived session no longer accumulates a table copy per call
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select("user_id", "event_type", "ts").limit(200)
    val root = java.nio.file.Files.createTempDirectory("graft-owned-root").toString
    val got = StreamingValidation.dedupReplay(ev, Seq("user_id"), "ts",
      outputRoot = root).count()
    assert(got == ev.select("user_id").distinct().count())
    val children = new java.io.File(root).listFiles()
    assert(children != null && children.nonEmpty,
      "the replay working dir must live under the owned root")
    // eager caller-side cleanup works (result already materialized above)
    children.foreach(c =>
      graft.ext.StoreFiles.deleteLocalDirRec(c.toPath))
    assert(new java.io.File(root).listFiles().isEmpty)
    java.nio.file.Files.delete(java.nio.file.Paths.get(root))
  }
}
