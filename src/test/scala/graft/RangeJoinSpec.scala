package graft

import org.apache.spark.sql.functions._
import graft.ext.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("point-in-interval equals brute force across bin widths, incl. boundaries and negatives") {
    val rnd = new scala.util.Random(13)
    val points = (1 to 400).map(i =>
      (i.toLong, s"k${rnd.nextInt(4)}", rnd.nextInt(2000).toLong - 500))
    val ivs = (1 to 120).map { i =>
      val lo = rnd.nextInt(2000).toLong - 500
      (i.toLong, s"k${rnd.nextInt(4)}", lo, lo + rnd.nextInt(120))
    }
    val want = (for {
      (pid, pk, x) <- points; (iid, ik, lo, hi) <- ivs
      if pk == ik && x >= lo && x <= hi
    } yield (pid, iid)).sorted
    for (bin <- Seq(7L, 64L, 1000L)) {
      val got = RangeJoin.pointInInterval(
          points.toDF("pid", "k", "x"),
          "x", ivs.toDF("iid", "ik", "lo", "hi"), "lo", "hi",
          Seq("k" -> "ik"), binWidth = bin)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == want, s"binWidth=$bin")
    }
  }

  test("interval overlap equals brute force across bin widths; exactly-once despite shared buckets") {
    val rnd = new scala.util.Random(29)
    val as = (1 to 150).map { i =>
      val lo = rnd.nextInt(2000).toLong - 500
      (i.toLong, s"k${rnd.nextInt(3)}", lo, lo + rnd.nextInt(300))
    }
    val bs = (1 to 150).map { i =>
      val lo = rnd.nextInt(2000).toLong - 500
      (i.toLong, s"k${rnd.nextInt(3)}", lo, lo + rnd.nextInt(300))
    }
    val want = (for {
      (aid, ak, alo, ahi) <- as; (bid, bk, blo, bhi) <- bs
      if ak == bk && alo <= bhi && blo <= ahi
    } yield (aid, bid)).sorted
    // bin widths far smaller than interval length force MANY shared
    // buckets per pair — the canonical-bucket condition must still emit
    // each pair exactly once (a multiset compare would catch duplicates)
    for (bin <- Seq(11L, 128L, 5000L)) {
      val got = RangeJoin.intervalOverlap(
          as.toDF("aid", "ak", "alo", "ahi"), "alo", "ahi",
          bs.toDF("bid", "bk", "blo", "bhi"), "blo", "bhi",
          Seq("ak" -> "bk"), binWidth = bin)
        .select("aid", "bid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == want, s"binWidth=$bin: got ${got.length} want ${want.length}")
    }
    // inclusive touch at a single shared point counts as overlap
    val touch = RangeJoin.intervalOverlap(
        Seq((1L, 0L, 10L)).toDF("aid", "alo", "ahi"), "alo", "ahi",
        Seq((2L, 10L, 20L)).toDF("bid", "blo", "bhi"), "blo", "bhi",
        Nil, binWidth = 4L)
      .count()
    assert(touch == 1L)
    // degenerate guard fires on either side
    val e = intercept[Exception] {
      RangeJoin.intervalOverlap(
        Seq((1L, 0L, Long.MaxValue / 2)).toDF("aid", "alo", "ahi"), "alo", "ahi",
        Seq((2L, 10L, 20L)).toDF("bid", "blo", "bhi"), "blo", "bhi",
        Nil, binWidth = 4L).count()
    }
    assert(e.getMessage.contains("intervalOverlap") ||
      e.getCause != null && String.valueOf(e.getCause.getMessage).contains("intervalOverlap"),
      e.toString)
    // plan: hash equi-join on bucket, never a nested loop
    val plan = RangeJoin.intervalOverlap(
        as.toDF("aid", "ak", "alo", "ahi"), "alo", "ahi",
        bs.toDF("bid", "bk", "blo", "bhi"), "blo", "bhi",
        Seq("ak" -> "bk"), binWidth = 128L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("Long-overflowing bin counts raise instead of silently dropping the interval (r9 review)") {
    // binWidth=1 over a span > Long.MaxValue: nBins overflows negative —
    // before the fix the `>= 1` filter silently removed the interval
    val iv = Seq((1L, -5000000000000000000L, 5000000000000000000L))
      .toDF("iid", "lo", "hi")
    val p = Seq((1L, 0L)).toDF("pid", "x")
    // under ANSI (the session default) the subtraction itself raises
    // ARITHMETIC_OVERFLOW before the guard; under non-ANSI the wrapped
    // negative bin count hits the `nBins < 1` raise — either way the
    // interval must FAIL the query, never vanish from the output
    def failsLoudly(msg: String)(f: => Long): Unit = {
      val e = intercept[Exception](f)
      val all = e.toString + String.valueOf(e.getCause)
      assert(all.contains(msg) || all.contains("ARITHMETIC_OVERFLOW"), e.toString)
    }
    failsLoudly("pointInInterval") {
      RangeJoin.pointInInterval(p, "x", iv, "lo", "hi", Nil, binWidth = 1L).count()
    }
    failsLoudly("intervalOverlap") {
      RangeJoin.intervalOverlap(iv, "lo", "hi",
        Seq((2L, 0L, 1L)).toDF("bid", "blo", "bhi"), "blo", "bhi",
        Nil, binWidth = 1L).count()
    }
  }

  test("inclusive boundaries, null axis values never match") {
    val p = Seq((1L, Some(10L)), (2L, Some(20L)), (3L, None))
      .toDF("pid", "x")
    val iv = Seq((100L, Some(10L), Some(20L)), (200L, None, Some(50L)))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(p, "x", iv, "lo", "hi", Nil, 16L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 100L), (2L, 100L)))
  }

  test("degenerate whole-axis interval is refused FAST, not exploded") {
    val p = Seq((1L, 5L)).toDF("pid", "x")
    // 1e12 bins: materializing this interval's bucket array would OOM/
    // overflow long before a post-explode guard could run — the raise must
    // fire below the generator, per row, in O(1)
    val iv = Seq((9L, 0L, 10000000000000L)).toDF("iid", "lo", "hi")
    val t0 = System.nanoTime()
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(p, "x", iv, "lo", "hi", Nil,
        binWidth = 10L, maxBinsPerInterval = 100).count()
    }
    assert((System.nanoTime() - t0) / 1e9 < 30.0, "refusal was not fast")
    assert(e.getMessage.contains("pointInInterval") ||
      Option(e.getCause).exists(_.getMessage.contains("pointInInterval")), e.getMessage)
  }

  test("axis values beyond 2^53 bucket exactly (integer div, no double rounding)") {
    // two points one apart straddling a bucket boundary near 2^62; a
    // double-rounded bucket id would collapse or shift them
    val big = 4611686018427387904L // 2^62
    val p = Seq((1L, big - 1L), (2L, big)).toDF("pid", "x")
    val iv = Seq((10L, big - 1000L, big - 1L), (20L, big, big + 999L))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(p, "x", iv, "lo", "hi", Nil,
        binWidth = 1000L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 20L)))
  }

  test("plan shape: hash equi-join on bucket, no nested loop / cartesian") {
    val p = spark.range(100).select(col("id").as("pid"), (col("id") * 3).as("x"))
    val iv = spark.range(30).select(col("id").as("iid"),
      (col("id") * 10).as("lo"), (col("id") * 10 + 5).as("hi"))
    val plan = RangeJoin.pointInInterval(p, "x", iv, "lo", "hi", Nil, 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
