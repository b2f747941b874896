package graft

import org.apache.spark.sql.functions._
import graft.ext.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zorder: interleave matches hand-computed Morton codes") {
    // x=5 (101b), y=3 (011b), 3 bits: x-bits land at even positions,
    // y-bits at odd -> z = 0b011011 = 27
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.interleave(Seq(col("x"), col("y")), 3).as("z"))
      .head().getLong(0)
    assert(z == 27L)
    // identity for a single column
    val one = Seq((1234L)).toDF("x")
      .select(ZOrder.interleave(Seq(col("x")), 11)).head().getLong(0)
    assert(one == 1234L)
    // three columns: bit i of col j at position 3i+j; x=1,y=1,z=1 -> 0b111
    val three = Seq((1L, 1L, 1L)).toDF("a", "b", "c")
      .select(ZOrder.interleave(Seq(col("a"), col("b"), col("c")), 1))
      .head().getLong(0)
    assert(three == 7L)
  }

  test("zorder: boundedRank scales, clamps, and stays monotone") {
    val d = Seq(-10L, 0L, 50L, 100L, 250L).toDF("x")
      .select(ZOrder.boundedRank(col("x"), 0L, 100L, 4).as("r"))
      .collect().map(_.getLong(0))
    assert(d.toSeq == Seq(0L, 0L, 7L, 15L, 15L)) // clamp below/above, 50*15/100=7
    assert(d.sameElements(d.sorted))
  }

  test("zorder: monotone bijection on the aligned grid") {
    // every (x, y) on the 32x32 grid gets a distinct z in [0, 1023]
    val zs = spark.range(1024)
      .select((col("id") % 32).as("x"), (col("id") / 32).cast("long").as("y"))
      .select(ZOrder.interleave(Seq(col("x"), col("y")), 5).as("z"))
      .collect().map(_.getLong(0)).sorted
    assert(zs.toSeq == (0L until 1024L))
  }

  test("zorder: clustered layout prunes files on the NON-leading column where a linear sort cannot") {
    // 64x64 grid; query y in [8,15] (the column a linear x-sort spreads
    // over every file). Emulate parquet min/max file stats: a file is
    // "read" iff its [min,max] y-interval overlaps the predicate.
    val grid = spark.range(4096)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val nFiles = 16
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    ZOrder.clusterBy(grid, Seq(("x", 0L, 63L), ("y", 0L, 63L)), bits = 6,
        numPartitions = nFiles)
      .write.mode("overwrite").parquet(s"$dir/z")
    grid.repartitionByRange(nFiles, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$dir/linear")
    def filesTouched(path: String): (Int, Int) = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      val touched = files.count { f =>
        val r = spark.read.parquet(f).agg(min("y"), max("y")).head()
        r.getLong(0) <= 15L && r.getLong(1) >= 8L
      }
      (touched, files.length)
    }
    val (zTouched, zTotal) = filesTouched(s"$dir/z")
    val (linTouched, linTotal) = filesTouched(s"$dir/linear")
    assert(zTotal == nFiles && linTotal == nFiles)
    // linear x-sort: y is uniform inside every file -> all files overlap
    assert(linTouched == nFiles)
    // z-cluster: contiguous z-intervals are compact in y -> most files skip
    assert(zTouched <= nFiles / 2,
      s"z-order should prune at least half the files, touched $zTouched/$zTotal")
    // correctness: the layouts hold identical data
    val a = spark.read.parquet(s"$dir/z").orderBy("x", "y").collect()
    val b = spark.read.parquet(s"$dir/linear").orderBy("x", "y").collect()
    assert(a.sameElements(b))
  }

  test("zorder: z-value stays inside whole-stage codegen") {
    val plan = spark.range(10)
      .select(ZOrder.interleave(Seq(col("id"), col("id")), 8).as("z"))
      .queryExecution.executedPlan.toString
    // "*(1)" is the WholeStageCodegen stage marker in the compact plan dump
    assert(plan.contains("*(1) Project"), plan)
  }
}
