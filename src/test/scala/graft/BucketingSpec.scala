package graft

import org.apache.spark.sql.functions._
import graft.ext.Bucketing

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("co-located join: zero exchanges, rows equal the plain join") {
    val facts = (1 to 2000).map(i => (i.toLong % 97, i.toLong, i * 1.5))
      .toDF("k", "fact_id", "amount")
    val dims = (0 to 96).map(i => (i.toLong, s"dim_$i")).toDF("dk", "label")
    val dir = tmp("graft-bkt-spec")
    Bucketing.writeBucketed(facts, "bspec_facts", s"$dir/facts", Seq("k"), 4)
    Bucketing.writeBucketed(dims, "bspec_dims", s"$dir/dims", Seq("dk"), 4)

    val joined = Bucketing.colocatedJoin(spark, "bspec_facts", "bspec_dims",
      Seq("k"), Seq("dk"))
    assert(Bucketing.shuffleExchangeCount(joined) == 0,
      joined.queryExecution.executedPlan.toString)
    assert(Bucketing.isShuffleFree(joined),
      joined.queryExecution.executedPlan.toString)

    val got = joined.select("fact_id", "label").as[(Long, String)]
      .collect().sorted
    val want = facts.join(dims, $"k" === $"dk")
      .select("fact_id", "label").as[(Long, String)].collect().sorted
    assert(got.toSeq == want.toSeq && got.length == 2000)
  }

  test("negative control: the same join unbucketed DOES shuffle") {
    val facts = (1 to 500).map(i => (i.toLong % 7, i.toLong)).toDF("k", "v")
    val dims = (0 to 6).map(i => (i.toLong, s"d$i")).toDF("dk", "label")
    val plain = facts.hint("merge").join(dims.hint("merge"), $"k" === $"dk")
    assert(Bucketing.shuffleExchangeCount(plain) >= 2,
      plain.queryExecution.executedPlan.toString)
  }

  test("groupBy on the bucket key is also exchange-free") {
    val facts = (1 to 1000).map(i => (i.toLong % 31, i.toLong)).toDF("k", "v")
    val dir = tmp("graft-bkt-agg")
    Bucketing.writeBucketed(facts, "bspec_agg", s"$dir/facts", Seq("k"), 4)
    val agg = spark.table("bspec_agg").groupBy("k")
      .agg(sum("v").as("sv"), count(lit(1)).as("n"))
    assert(Bucketing.shuffleExchangeCount(agg) == 0,
      agg.queryExecution.executedPlan.toString)
    val got = agg.as[(Long, Long, Long)].collect().sortBy(_._1)
    val want = facts.groupBy("k").agg(sum("v"), count(lit(1)))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("single-file buckets + legacy ordering flag elide the join Sorts entirely") {
    val facts = (1 to 2000).map(i => (i.toLong % 97, i.toLong)).toDF("k", "v")
    val dims = (0 to 96).map(i => (i.toLong, s"d$i")).toDF("dk", "label")
    val dir = tmp("graft-bkt-sorted")
    Bucketing.writeBucketed(facts, "bspec_sf", s"$dir/f", Seq("k"), 4)
    Bucketing.writeBucketed(dims, "bspec_sd", s"$dir/d", Seq("dk"), 4)
    // writeBucketed's pre-write repartition guarantees ONE file per bucket
    assert(new java.io.File(s"$dir/f").listFiles()
      .count(_.getName.endsWith(".parquet")) == 4)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val j = Bucketing.colocatedJoin(spark, "bspec_sf", "bspec_sd",
        Seq("k"), Seq("dk"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Sort ["), plan) // zip-merge: no Sort nodes
      assert(Bucketing.shuffleExchangeCount(j) == 0, plan)
      // and the sorted-scan fast path must still produce the right rows
      assert(j.count() == 2000)
    } finally
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
  }

  test("writeBucketed replaces a previous registration") {
    val dir = tmp("graft-bkt-re")
    Bucketing.writeBucketed(Seq((1L, "a")).toDF("k", "s"),
      "bspec_re", s"$dir/v1", Seq("k"), 2)
    Bucketing.writeBucketed(Seq((2L, "b"), (3L, "c")).toDF("k", "s"),
      "bspec_re", s"$dir/v2", Seq("k"), 2)
    assert(spark.table("bspec_re").count() == 2)
  }
}
