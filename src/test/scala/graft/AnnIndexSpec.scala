package graft

import org.apache.spark.sql.functions._
import graft.ext.{AnnIndex, Similarity}

/** Train-once / encode-once / serve-many: the persisted ANN path must be
  * HASH-IDENTICAL to the one-shot operators (r7 verdict #1). */
class AnnIndexSpec extends SparkSpec {

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private def queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("embedding").as("qv"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq

  test("AnnIndex JSON round-trip is exact (bit-identical doubles)") {
    val idx = Similarity.trainIvfPq(emb, "vec_id", "embedding",
      nCentroids = 16, m = 8, ksub = 16)
    val back = AnnIndex.fromJson(idx.toJson)
    assert(back.kind == "ivfpq" && back.dim == idx.dim &&
      back.nCentroids == 16 && back.m == 8 && back.ksub == 16 &&
      back.seed == idx.seed)
    assert(back.centers.length == idx.centers.length)
    idx.centers.zip(back.centers).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
    assert(back.codebooks.length == idx.codebooks.length)
    idx.codebooks.zip(back.codebooks).foreach { case (ba, bb) =>
      ba.zip(bb).foreach { case (a, b) => assert(java.util.Arrays.equals(a, b)) }
    }
  }

  test("ivfpq: save → load → encode → parquet → serve ≡ one-shot ivfPqTopK") {
    val oneShot = rows(Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      queries, "qid", "qv", k = 5, nCentroids = 16, nProbe = 12,
      m = 8, ksub = 16, refineFactor = 4))

    val tmp = java.nio.file.Files.createTempDirectory("graft-ann").toString
    val idx = Similarity.trainIvfPq(emb, "vec_id", "embedding",
      nCentroids = 16, m = 8, ksub = 16)
    idx.save(s"$tmp/index.json")
    val loaded = AnnIndex.load(s"$tmp/index.json")
    Similarity.encode(emb, "vec_id", "embedding", loaded)
      .write.mode("overwrite").parquet(s"$tmp/codes.parquet")
    val codes = spark.read.parquet(s"$tmp/codes.parquet")
    val served = rows(Similarity.ivfPqTopKIndexed(codes,
      emb, "vec_id", "embedding", queries, "qid", "qv",
      loaded, k = 5, nProbe = 12, refineFactor = 4))
    assert(served == oneShot)
  }

  test("ivf + pq: persisted serve ≡ one-shot") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ann2").toString

    val ivfOne = rows(Similarity.ivfTopK(emb, "vec_id", "embedding",
      queries, "qid", "qv", k = 5, nCentroids = 16, nProbe = 4))
    val ivfIdx = AnnIndex.fromJson(
      Similarity.trainIvf(emb, "vec_id", "embedding", nCentroids = 16).toJson)
    Similarity.encode(emb, "vec_id", "embedding", ivfIdx)
      .write.mode("overwrite").parquet(s"$tmp/ivf.parquet")
    assert(rows(Similarity.ivfTopKIndexed(spark.read.parquet(s"$tmp/ivf.parquet"),
      queries, "qid", "qv", ivfIdx, k = 5, nProbe = 4)) == ivfOne)

    val pqOne = rows(Similarity.pqTopK(emb, "vec_id", "embedding",
      queries, "qid", "qv", k = 5, m = 8, ksub = 16, refineFactor = 4))
    val pqIdx = AnnIndex.fromJson(
      Similarity.trainPq(emb, "vec_id", "embedding", m = 8, ksub = 16).toJson)
    Similarity.encode(emb, "vec_id", "embedding", pqIdx)
      .write.mode("overwrite").parquet(s"$tmp/pq.parquet")
    assert(rows(Similarity.pqTopKIndexed(spark.read.parquet(s"$tmp/pq.parquet"),
      emb, "vec_id", "embedding", queries, "qid", "qv",
      pqIdx, k = 5, refineFactor = 4)) == pqOne)
  }

  test("indexed serve plan: codes scan is column-pruned, window-free, broadcast-joined") {
    // the 100 TB contract of encode-once serving: the ADC stage reads ONLY
    // (corpus_id, cell, codes) from the materialized parquet — raw vectors
    // are touched by the (broadcast-pruned) re-rank join alone
    val tmp = java.nio.file.Files.createTempDirectory("graft-ann3").toString
    val idx = Similarity.trainIvfPq(emb, "vec_id", "embedding",
      nCentroids = 16, m = 8, ksub = 16)
    Similarity.encode(emb, "vec_id", "embedding", idx)
      .write.mode("overwrite").parquet(s"$tmp/codes.parquet")
    val codes = spark.read.parquet(s"$tmp/codes.parquet")
    val served = Similarity.ivfPqTopKIndexed(codes, emb, "vec_id", "embedding",
      queries, "qid", "qv", idx, k = 5, nProbe = 12, refineFactor = 4)
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in serve plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"no broadcast join in serve plan:\n$plan")
    // the codes-file scan must not read an embedding column
    val codeScans = plan.linesIterator.filter(l =>
      l.contains("codes.parquet") && l.contains("ReadSchema")).toSeq
    assert(codeScans.nonEmpty, s"no codes scan found:\n$plan")
    assert(codeScans.forall(!_.contains("embedding")),
      s"codes scan reads raw vectors:\n${codeScans.mkString("\n")}")
  }

  test("cell-partitioned store: pruned serve ≡ unpruned, PartitionFilters in scan") {
    // r8: partitionBy(cell) storage + probe-cell isin pre-filter — parquet
    // must skip non-probed cells at the FILE level, with identical results
    val tmp = java.nio.file.Files.createTempDirectory("graft-ann4").toString
    val idx = Similarity.trainIvfPq(emb, "vec_id", "embedding",
      nCentroids = 16, m = 8, ksub = 16)
    Similarity.encodeAndWritePartitioned(emb, "vec_id", "embedding", idx, s"$tmp/codes")
    val codes = spark.read.parquet(s"$tmp/codes")
    val unpruned = rows(Similarity.ivfPqTopKIndexed(codes, emb, "vec_id", "embedding",
      queries, "qid", "qv", idx, k = 5, nProbe = 4, refineFactor = 4))
    val prunedDf = Similarity.ivfPqTopKIndexed(codes, emb, "vec_id", "embedding",
      queries, "qid", "qv", idx, k = 5, nProbe = 4, refineFactor = 4,
      pruneCells = true)
    assert(rows(prunedDf) == unpruned)
    val scan = prunedDf.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains(s"codes") && l.contains("PartitionFilters")).toSeq
    assert(scan.exists(_.matches(".*PartitionFilters: \\[.*cell.*IN.*\\].*")),
      s"no pushed partition filter on cell:\n${scan.mkString("\n")}")
  }

  test("streaming encode replay ≡ batch encode for a pq index (no cell partitioning)") {
    val idx = Similarity.trainPq(emb, "vec_id", "embedding", m = 8, ksub = 16)
    val streamed = Similarity.encodeReplay(emb, "vec_id", "embedding", idx)
    val batch = Similarity.encode(emb, "vec_id", "embedding", idx)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("kind mismatch and malformed documents are rejected") {
    val idx = Similarity.trainIvf(emb, "vec_id", "embedding", nCentroids = 8)
    intercept[IllegalArgumentException] {
      Similarity.ivfPqTopKIndexed(emb, emb, "vec_id", "embedding",
        queries, "qid", "qv", idx, k = 5)
    }
    intercept[IllegalArgumentException] { AnnIndex.fromJson("{\"format\": \"nope\"}") }
  }
}
