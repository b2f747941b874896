package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed training for the fasttext-shaped quality/domain classifier
  * ([[TextAnalysis.linearClassifierScore]] is the SCORING half; this is
  * where its weights come from): logistic regression over feature-hashed
  * bag-of-words vectors ([[TextAnalysis.hashVector]]), full-batch gradient
  * descent. The everyday pipeline use: label a seed set (wiki = 1, crawl
  * = 0 — the GPT-3/LLaMA quality-filter recipe), train here, score the
  * 100 TB corpus with the returned weights in one scan.
  *
  * Scale shape: ONE distributed job per GD iteration — the margin w·x is a
  * codegen'd expression over the literal weight vector (no model object,
  * no ML transform), and the gradient is ONE fused
  * [[graft.functions.VectorWeightedSumFixedPoint]] aggregate over the
  * feature arrays (rows never explode; map-side partial vectors merge
  * cell-wise). Only dim+1 cells reach the driver per iteration. Full
  * batch (not minibatch SGD) because on a cluster the whole corpus costs
  * one scan anyway — the classic tradeoff inverts at scale.
  *
  * Determinism (the golden-pin contract, cf. [[Clustering]]): each row's
  * gradient contribution is quantized to the 10⁻⁶ grid and summed as
  * longs — exact, order-independent — so the trained weights are
  * bit-identical under any partitioning. Features are L2-normalized per
  * row, so each row's |contribution| ≤ 1 and the long sum holds ~9·10¹²
  * rows of headroom.
  */
object ClassifierTrain {

  private def q(n: String): Column = col("`" + n.replace("`", "``") + "`")
  private val Scale = 1e6

  /** L2-normalized hashed feature vector with a trailing bias-1 component
    * (index `dim`); all-zero vectors (empty/blank text) stay zero and
    * contribute only through the bias. One native O(dim) loop
    * ([[graft.functions.VectorL2NormalizeBias]]) — the interpreted
    * higher-order-function formulation cost ~1 ms/row at dim=1024. */
  private def features(text: Column, dim: Int): Column =
    graft.functions.VectorL2NormalizeBias.of(
      TextAnalysis.hashVector(text, dim).cast("array<double>"))

  /** Train and return the dim+1 weights (bias last). `label` must evaluate
    * to 0/1 (boolean columns cast cleanly); rows with a null label are
    * excluded (unlabeled corpus mixed into the seed frame).
    *
    * `momentum` is classic heavy-ball: `w' = w − lr·g + β(w − w_prev)`.
    * The velocity lives on the DRIVER (two dim+1 double arrays), so it
    * costs nothing distributed and keeps determinism — the only
    * cross-partition arithmetic is still the fixed-point gradient sum.
    * Worth it because each GD iteration is a whole cluster scan job:
    * β=0.95 reaches the accuracy of ~5× more plain-GD iterations. */
  def trainLogistic(df: DataFrame, textCol: String, label: Column,
      dim: Int = 256, iters: Int = 10, lr: Double = 2.0,
      momentum: Double = 0.0): Array[Double] = {
    require(dim >= 1, "dim >= 1")
    require(iters >= 1, "iters >= 1")
    require(lr > 0, "lr > 0")
    require(momentum >= 0 && momentum < 1, "momentum in [0, 1)")
    // featurize once and keep it hot across the `iters` scans (each row is
    // dim+1 doubles + the label — far smaller than the raw text it came
    // from; MEMORY_AND_DISK so a corpus bigger than cluster memory spills
    // instead of failing)
    val base = df
      .select(features(q(textCol), dim).as("f"),
        label.cast("int").cast("double").as("y"))
      .filter(col("y").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = base.count()
      require(n > 0, "trainLogistic: no labeled rows")
      var w = Array.fill(dim + 1)(0.0)
      var wPrev = Array.fill(dim + 1)(0.0)
      for (_ <- 1 to iters) {
        // native O(dim) dot against the literal weights — per-iteration
        // margin cost is what distributed GD wall-clock is made of
        val margin = graft.functions.VectorDotLiteral.of(col("f"), w)
        val p = lit(1.0) / (lit(1.0) + exp(-margin))
        // one job: the whole-gradient vector Σ (p − y)·x as ONE fixed-point
        // array aggregate — rows stay intact (no explode, no per-element
        // margin re-evaluation), dim+1 cells to the driver
        val g = base
          .agg(graft.functions.VectorWeightedSumFixedPoint.of(
            p - col("y"), col("f"), Scale).as("g"))
          .head().getSeq[Long](0)
        val next = new Array[Double](w.length)
        var i = 0
        while (i < w.length) {
          next(i) = w(i) - lr * (g(i).toDouble / Scale) / n +
            momentum * (w(i) - wPrev(i))
          i += 1
        }
        wPrev = w
        w = next
      }
      w
    } finally base.unpersist()
  }

  /** Score a text column with trained weights: sigmoid(w · features). The
    * weight vector rides as a literal — scoring is one codegen'd scan,
    * composable with every other text operator. `dim` must match
    * training. */
  def score(text: Column, weights: Array[Double]): Column = {
    require(weights.length >= 2, "weights = dim features + bias")
    val dim = weights.length - 1
    val margin = graft.functions.VectorDotLiteral.of(features(text, dim), weights)
    lit(1.0) / (lit(1.0) + exp(-margin))
  }

  /** Train + report, the gate surface: the `topK` heaviest weight
    * components by |weight| (rank asc; pos = hashed dimension, pos = dim
    * is the bias), weight rounded to 6 dp, plus the training-set accuracy
    * of the final model in every row (the sanity number a pipeline alerts
    * on). Top-K rather than all dim+1 rows so the report stays
    * eyeball-sized at any feature dimension. */
  def trainReport(df: DataFrame, textCol: String, label: Column,
      dim: Int = 256, iters: Int = 10, lr: Double = 2.0,
      momentum: Double = 0.0, topK: Int = 8): DataFrame = {
    val w = trainLogistic(df, textCol, label, dim, iters, lr, momentum)
    val acc = df.select(score(q(textCol), w).as("p"),
        label.cast("int").cast("double").as("y"))
      .filter(col("y").isNotNull)
      .agg(avg(when((col("p") >= 0.5).cast("int").cast("double") === col("y"),
        1.0).otherwise(0.0)))
      .head().getDouble(0)
    val spark0 = df.sparkSession
    import spark0.implicits._
    w.zipWithIndex
      .sortBy { case (wi, i) => (-math.abs(wi), i) }
      .take(topK).zipWithIndex
      .map { case ((wi, i), r) =>
        (r + 1, i, math.rint(wi * Scale) / Scale, math.rint(acc * 1e4) / 1e4)
      }.toSeq.toDF("rank", "pos", "weight", "train_accuracy")
  }
}
