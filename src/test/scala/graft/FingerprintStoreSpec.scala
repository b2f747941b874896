package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, FingerprintStore}

class FingerprintStoreSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox"), (2L, "jumped over the dog"),
    (3L, "  The  QUICK brown fox "), // normalizes equal to doc 1
    (4L, "completely different")).toDF("doc_id", "text")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-fpstore").toString

  test("scrub from store equals the rebuild-per-call bloom path row-for-row") {
    val dir = tmp()
    FingerprintStore.build(corpus, "text", dir)
    val incoming = Seq(
      (10L, "the quick brown fox"),     // exact re-crawl
      (11L, "THE QUICK  BROWN FOX"),    // normalized re-crawl
      (12L, "genuinely new content"),
      (13L, "completely different")).toDF("doc_id", "text")
    val fromStore = FingerprintStore.scrub(incoming, "text", dir)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val direct = Dedup.dropExistingExactBloom(incoming, corpus, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(fromStore.toSeq == Seq(12L))
    assert(fromStore.toSeq == direct.toSeq)
  }

  test("append extends membership; re-scrub of appended content drops it") {
    val dir = tmp()
    FingerprintStore.build(corpus, "text", dir)
    val batch = Seq((20L, "second crawl content"), (21L, "the quick brown fox"))
      .toDF("doc_id", "text")
    FingerprintStore.append(batch, "text", dir)
    val next = Seq(
      (30L, "second crawl content"),    // seen in the appended batch
      (31L, "jumped over the dog"),     // seen in the original corpus
      (32L, "third crawl content")).toDF("doc_id", "text")
    val got = FingerprintStore.scrub(next, "text", dir)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(32L))
    // append-once ≡ build-over-union membership (fps parquet is the truth)
    val dir2 = tmp()
    FingerprintStore.build(corpus.unionByName(batch), "text", dir2)
    val alt = FingerprintStore.scrub(next, "text", dir2)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == alt.toSeq)
  }

  test("bloom false positives cannot drop fresh docs (exact confirmation)") {
    // a filter sized for 1 item at high fpp saturates instantly — every
    // candidate prefilters through, and the fps-parquet confirmation must
    // still keep every genuinely new doc
    val dir = tmp()
    FingerprintStore.build(corpus, "text", dir, expectedItems = 1L, fpp = 0.5)
    val incoming = (100L to 140L).map(i => (i, s"new doc number $i"))
      .toDF("doc_id", "text")
    val kept = FingerprintStore.scrub(incoming, "text", dir).count()
    assert(kept == 41L)
  }

  test("incoming frame with its own `fp` column scrubs without ambiguity") {
    val dir = tmp()
    FingerprintStore.build(corpus, "text", dir)
    val incoming = Seq((10L, "the quick brown fox", 111L),
      (11L, "brand new content", 222L)).toDF("doc_id", "text", "fp")
    val got = FingerprintStore.scrub(incoming, "text", dir)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(11L))
  }

  test("scrub prefilter is a native expression: no ScalaUDF anywhere in the plan") {
    // r9: the bloom probe sits on the full-width ingest scan; a ScalaUDF
    // there breaks whole-stage codegen on exactly the scan the prefilter
    // exists to keep cheap. Both the store scrub and the direct bloom
    // path must plan UDF-free.
    val dir = tmp()
    FingerprintStore.build(corpus, "text", dir)
    // parquet-backed incoming: a LocalRelation would fold the filter at
    // optimize time and the probe would never reach the physical plan
    val incomingDir = tmp()
    Seq((10L, "the quick brown fox"), (11L, "new content"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(incomingDir)
    val incoming = spark.read.parquet(incomingDir)
    val storePlan = FingerprintStore.scrub(incoming, "text", dir)
      .queryExecution.executedPlan.toString
    assert(!storePlan.contains("ScalaUDF"), s"store scrub plan has a UDF:\n$storePlan")
    assert(storePlan.contains("graft_bloom_might_contain"),
      s"native bloom probe missing from plan:\n$storePlan")
    val directPlan = Dedup.dropExistingExactBloom(incoming, corpus, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!directPlan.contains("ScalaUDF"), s"direct bloom plan has a UDF:\n$directPlan")
  }

  test("compaction collapses fps files and rebuilds the filter; scrub row-identical; re-size works") {
    val dir = tmp()
    FingerprintStore.build(corpus, "text", dir)
    for (b <- 1 to 3)
      FingerprintStore.append(
        Seq((100L + b, s"crawl batch $b content"), (200L + b, s"more batch $b text"))
          .toDF("doc_id", "text"), "text", dir)
    val incoming = Seq(
      (300L, "the quick brown fox"),   // original corpus
      (301L, "crawl batch 2 content"), // appended batch
      (302L, "never seen before")).toDF("doc_id", "text")
    def scrubbed() = FingerprintStore.scrub(incoming, "text", dir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val before = scrubbed()
    assert(before == Seq(302L))
    val filesBefore = graft.ext.StoreFiles.dataFileCount(spark, s"$dir/fps")
    FingerprintStore.compact(spark, dir)
    assert(scrubbed() == before)
    assert(graft.ext.StoreFiles.dataFileCount(spark, s"$dir/fps") < filesBefore,
      "compaction did not collapse fps files")
    // appends after compaction still merge into the rebuilt filter
    FingerprintStore.append(Seq((400L, "post compact batch")).toDF("doc_id", "text"),
      "text", dir)
    val inc2 = Seq((500L, "post compact batch"), (501L, "still new")).toDF("doc_id", "text")
    assert(FingerprintStore.scrub(inc2, "text", dir)
      .select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(501L))
    // geometry re-size on compact: meta updated, membership intact
    FingerprintStore.compact(spark, dir, expectedItems = 50000L, fpp = 0.001)
    assert(scrubbed() == before)
    FingerprintStore.append(Seq((600L, "resized geometry append")).toDF("doc_id", "text"),
      "text", dir) // mergeInPlace at the NEW geometry must not throw
    assert(FingerprintStore.scrub(
      Seq((700L, "resized geometry append")).toDF("doc_id", "text"), "text", dir)
      .count() == 0L)
  }

  test("healDir: a crash between the two swap renames is repaired by re-running compact") {
    val dir = tmp()
    FingerprintStore.build(corpus, "text", dir)
    FingerprintStore.append(
      Seq((50L, "pre-crash append")).toDF("doc_id", "text"), "text", dir)
    val incoming = Seq((60L, "the quick brown fox"), (61L, "fresh post-crash doc"))
      .toDF("doc_id", "text")
    val want = FingerprintStore.scrub(incoming, "text", dir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // simulate the exact crash window: live renamed aside, replacement
    // never landed — serves would fail with path-not-found here
    java.nio.file.Files.move(java.nio.file.Paths.get(s"$dir/fps"),
      java.nio.file.Paths.get(s"$dir/fps.old"))
    intercept[Exception] {
      FingerprintStore.scrub(incoming, "text", dir).count()
    }
    // re-running compact heals (healDir restores the old data) and then
    // completes the compaction; membership is unchanged
    FingerprintStore.compact(spark, dir)
    val got = FingerprintStore.scrub(incoming, "text", dir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want && want == Seq(61L))
  }

  test("meta sentinel: a non-store directory is refused on append") {
    val dir = tmp()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/meta.json"),
      """{"format": "something-else"}""".getBytes("UTF-8"))
    intercept[IllegalArgumentException] {
      FingerprintStore.append(corpus, "text", dir)
    }
  }
}
