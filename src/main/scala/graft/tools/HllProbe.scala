package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: pin DataSketches HLL estimate-vs-exact ratios on the
  * fixture tables at both SFs (decides the stats gate's oracle shape). */
object HllProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val ev = spark.read.parquet(s"/root/testdata/$sf/events.parquet")
      val r = ev.groupBy("event_type").agg(
        countDistinct("user_id").as("exact"),
        hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(14))).as("est"))
        .orderBy("event_type").collect()
      r.foreach(x => println(s"$sf ${x.get(0)} exact=${x.get(1)} est=${x.get(2)}"))
      val a = ev.filter(col("event_id") % 2 === 0)
        .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
      val b = ev.filter(col("event_id") % 2 === 1)
        .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
      val un = a.unionAll(b)
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))))
        .head().getLong(0)
      val os = ev.agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(14))))
        .head().getLong(0)
      println(s"$sf union=$un oneshot=$os equal=${un == os}")
      // token-level (high cardinality) on documents
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      val toks = docs.select(explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
      val tr = toks.agg(countDistinct("t"),
        hll_sketch_estimate(hll_sketch_agg(col("t"), lit(14)))).head()
      println(s"$sf tokens exact=${tr.get(0)} est=${tr.get(1)}")
    }
    spark.stop()
  }
}
