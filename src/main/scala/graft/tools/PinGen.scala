package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway golden-pin generator for the sim_topk_* oracle VALUES lists. */
object PinGen {
  /** SQL double literal: exact decimal expansion, always with a dot so
    * engines type it DOUBLE, loud on non-finite (BigDecimal would throw
    * an opaque NumberFormatException on NaN/Inf — a pinned gate emitting
    * one means the pin itself is wrong). */
  private def fmtD(x: Double): String = {
    require(!x.isNaN && !x.isInfinite, s"non-finite pin value: $x")
    val s0 = BigDecimal(x).underlying.stripTrailingZeros.toPlainString
    if (s0.contains('.')) s0 else s0 + ".0"
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("pingen").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // io_pandera_emit pin (SF-independent): the emitted document's lines
    locally {
      import graft.schema._
      import org.apache.spark.sql.types._
      val schema = DataFrameSchema(
        "l_orderkey" -> ColumnSchema(Some(LongType),
          Seq(graft.checks.Check.greaterThan(0L)), nullable = false, unique = false),
        "l_quantity" -> ColumnSchema(Some(DoubleType),
          Seq(graft.checks.Check.inRange(1.0, 50.0)), nullable = true),
        "l_returnflag" -> ColumnSchema(Some(StringType),
          Seq(graft.checks.Check.isin(Seq("A", "N", "R"))), nullable = false))
        .copy(name = Some("lineitem_contract"), strict = Strict.Filter,
          unique = Seq("l_orderkey"))
      val y = graft.io.SchemaIO.toPanderaYaml(schema)
      val rows = y.split("\n", -1).zipWithIndex
        .map { case (l, i) => s"($i, '${l.replace("'", "''")}')" }
      println("PIN panderaemit " + rows.mkString(", "))
    }
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val d = s"/root/testdata/$sf"
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      def fmt(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
        val rows = df.orderBy("query_id", "rank").collect().map { r =>
          s"(${r.getLong(0)}, ${r.getLong(1)}, ${r.getInt(2)}, ${fmtD(r.getDouble(3))})"
        }
        println(s"PIN $name $sf " + rows.mkString(", "))
      }
      fmt("ivf", graft.ext.Similarity.ivfTopK(emb, "vec_id", "embedding",
        queries, "qid", "qv", k = 5, nCentroids = 16, nProbe = 4))
      fmt("pq", graft.ext.Similarity.pqTopK(emb, "vec_id", "embedding",
        queries, "qid", "qv", k = 5, m = 8, ksub = 16, refineFactor = 4))
      fmt("ivfpq", graft.ext.Similarity.ivfPqTopK(emb, "vec_id", "embedding",
        queries, "qid", "qv", k = 5, nCentroids = 16, nProbe = 12,
        m = 8, ksub = 16, refineFactor = 4))
      // cluster_kmeans pin: (cluster, n, centroid_norm) rows
      val km = graft.ext.Clustering.kMeansSummary(emb, "vec_id", "embedding",
        k = 8, iters = 5, seed = 42).orderBy("cluster").collect().map { r =>
        s"(${r.getInt(0)}, ${r.getLong(1)}, ${fmtD(r.getDouble(2))})"
      }
      println(s"PIN kmeans $sf " + km.mkString(", "))
      // dedup_semantic_kmeans pin: removed vec_ids
      val kept = graft.ext.Clustering.semanticDedupKMeans(emb, "vec_id",
        "embedding", k = 8, threshold = 0.45, iters = 5, seed = 42)
      val removed = emb.join(kept.select("vec_id"), Seq("vec_id"), "left_anti")
        .select("vec_id").orderBy("vec_id").collect().map(r => s"(${r.getLong(0)})")
      println(s"PIN semkm $sf " + removed.mkString(", "))
      // text_classifier_train pin: (pos, weight, train_accuracy)
      val docs = spark.read.parquet(s"$d/documents.parquet")
      val tr = graft.ext.ClassifierTrain.trainReport(docs, "text",
        array_contains(split(lower(trim(col("text"))), "\\s+"), "spark"),
        dim = 1024, iters = 60, lr = 8.0, momentum = 0.95, topK = 8)
        .orderBy("rank").collect().map { r =>
        s"(${r.getInt(0)}, ${r.getInt(1)}, ${fmtD(r.getDouble(2))}, ${fmtD(r.getDouble(3))})"
      }
      println(s"PIN clstrain $sf " + tr.mkString(", "))
      // text_bpe_train_64 pin: (merge_rank, lhs, rhs) — SQL-escape quotes
      def sq(x: String) = "'" + x.replace("'", "''") + "'"
      val m64 = graft.ext.BpeTrain.learnMerges(docs, "text", numMerges = 64)
        .zipWithIndex.map { case ((a, b), i) => s"($i, ${sq(a)}, ${sq(b)})" }
      println(s"PIN bpe64 $sf " + m64.mkString(", "))
      // sim_ann_recall pin: (method, recall_at_5)
      val recall = graft.SparkEntry.queries("sim_ann_recall")(spark, d)
        .collect().map(r => s"('${r.getString(0)}', ${r.getDouble(1)})")
      println(s"PIN annrecall $sf " + recall.mkString(", "))
    }

    // r14: sf0.1 pins for the whole golden-pin family — generated from the
    // GATE OUTPUTS themselves (the oracle compares engine output vs oracle
    // rows verbatim, so a full-output VALUES branch is a valid pin for any
    // deterministic gate). Emitted as complete >=100000-guarded UNION ALL
    // branches; tools/patch scripts splice them into SparkEntry's oracle
    // strings. lineitem counts: sf0.001≈6k, sf0.01≈60k, sf0.1≈600k.
    locally {
      val d = "/root/testdata/sf0.1"
      def sqlLit(v: Any): String = v match {
        case null => "NULL"
        case s0: String => "'" + s0.replace("'", "''") + "'"
        case dd: java.lang.Double => fmtD(dd)
        case f: java.lang.Float => fmtD(f.toDouble)
        case b: java.lang.Boolean => if (b) "TRUE" else "FALSE"
        case x => String.valueOf(x)
      }
      val pinned = Seq("sim_topk_ivf", "sim_topk_pq", "sim_topk_ivfpq",
        "sim_topk_lsh", "sim_topk_lsh_multiprobe", "sim_text_hash_ann",
        "sim_ann_recall", "sim_ann_lifecycle", "cluster_kmeans",
        "dedup_semantic_kmeans", "dedup_semantic_text", "dedup_simhash",
        "text_bpe", "text_bpe_train", "text_bpe_train_64",
        "text_classifier_train")
      for (n <- pinned) {
        val df = graft.SparkEntry.queries(n)(spark, d)
        val rows = df.collect()
          .map(r => "(" + r.toSeq.map(sqlLit).mkString(", ") + ")")
        val cols = df.columns
          .map(c => if (c == "rank") "\"rank\"" else c).mkString(", ")
        println(s"PIN01\t$n\tSELECT * FROM (VALUES " + rows.mkString(", ") +
          s") v($cols) WHERE (SELECT count(*) FROM lineitem) >= 100000")
      }
    }
    spark.stop()
  }
}
