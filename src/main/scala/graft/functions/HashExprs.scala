package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the sketch/hash hot paths of the dedup
  * and similarity operators.
  *
  * Rationale (measured, see Dedup scaladoc): the same sketches written as
  * nested higher-order functions (`transform` inside `transform`) are
  * evaluated interpretively at ~10µs per lambda element — a 64-hash MinHash
  * over 5e3 short documents took >20s. These expressions do the identical
  * per-row work in one tight JVM loop (hash each array element ONCE, then
  * cheap integer mixing per hash function), which is 2-3 orders of magnitude
  * faster and keeps the whole operator inside a single scan. They are
  * deterministic and partition-independent: safe at any parallelism.
  *
  * CodegenFallback is deliberate: the per-row loop IS the tight code; what
  * matters is not splitting the array into per-element expression evals.
  */
object Hashing {
  /** splitmix64 finalizer — standard public-domain mixing constants. */
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
}

/** MinHash signature of a string array (shingle set): for each of
  * `numHashes` universal-hash permutations h_j(x) = a_j * xx64(x) + b_j,
  * the minimum over the array. Output: array<bigint> of length numHashes.
  *
  * One xxhash64 per element total (not per hash function) — the permutation
  * family rides on 64-bit multiply-add, the standard MinHash construction.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  private lazy val aCoef: Array[Long] =
    Array.tabulate(numHashes)(j => Hashing.splitmix64(0xA0761D6478BD642FL + j) | 1L)
  private lazy val bCoef: Array[Long] =
    Array.tabulate(numHashes)(j => Hashing.splitmix64(0xE7037ED1A0B428DBL + j))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var j = 0
        while (j < numHashes) {
          val v = aCoef(j) * h + bCoef(j)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array: each token's xxhash64 votes ±1 on every
  * bit; the sign of the per-bit vote sum becomes the bit. Bit-for-bit
  * equivalent to the reference HOF formulation (per-token xxhash64 with
  * Spark's default seed 42, bit set iff vote sum > 0).
  */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Random-hyperplane LSH signature of a float/double array: bit `b` is set
  * iff dot(v, plane_b) > 0, where plane components are derived
  * deterministically from xxhash64(bit, dim) folded into [-1, 1] — no
  * trained model, every executor recomputes identical planes. Bit-for-bit
  * equivalent to the HOF formulation it replaces (Similarity.scala).
  */
case class HyperplaneSig(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {
  require(bits >= 1 && bits <= 64, "bits must be in [1, 64]")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_sig"

  private lazy val elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def plane(bit: Int, dim: Int): Double = {
    // pmod(xxhash64(bit, dim), 2000001) mapped to [-1, 1]; xxhash64 of two
    // int columns = seed-chained hashes with Spark's default seed 42.
    val h = XxHash64Function.hash(dim, IntegerType,
      XxHash64Function.hash(bit, IntegerType, 42L))
    val m = 2000001L
    val r = h % m
    val p = if (r < 0) r + m else r
    (p.toDouble - 1000000.0) / 1000000.0
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var sig = 0L
    var b = 0
    while (b < bits) {
      var dot = 0.0
      var d = 0
      while (d < n) {
        if (!arr.isNullAt(d)) {
          val x = if (elemIsFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
          dot += x * plane(b, d)
        }
        d += 1
      }
      if (dot > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

/** Distinct word k-shingles of a token array, space-joined: output element
  * i is tokens[i..i+k-1] joined by " "; arrays shorter than k collapse to
  * one shingle of all tokens (so empty/short docs still get a signature).
  * Matches the SQL formulation `concat_ws(' ', slice(toks, i+1, k))` +
  * array_distinct exactly, in one loop (the HOF version interpreted ~30µs
  * per shingle — the dominant cost of the dedup scan after MinHashSig).
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, "k must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    def tok(i: Int): UTF8String =
      if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (n >= k) {
      var i = 0
      while (i <= n - k) {
        val parts = new Array[UTF8String](k)
        var j = 0
        while (j < k) { parts(j) = tok(i + j); j += 1 }
        out.add(UTF8String.concatWs(space, parts: _*))
        i += 1
      }
    } else {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = tok(j); j += 1 }
      out.add(UTF8String.concatWs(space, parts: _*))
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Every n-gram of a token array IN ORDER WITH REPEATS: output element i
  * is `concat_ws(' ', tokens[i..i+n-1])`; arrays shorter than n yield an
  * EMPTY array (explode then drops the row). The counting counterpart of
  * [[WordShingles]] (which dedups for set-similarity signatures) — n-gram
  * FREQUENCY pipelines (heavy hitters, LM statistics) need the multiset.
  * One native O(tokens) loop per row; the HOF formulation
  * `transform(sequence(...), i -> concat_ws(' ', slice(toks, i, n)))`
  * re-evaluates the token split per ELEMENT once CollapseProject inlines
  * the alias (O(tokens²·regex) per doc — measured 76 s of the 146 s
  * heavy_hitters_10x bench section before this expression existed; same
  * trap as [[SpanHashes]]). */
case class TokenNgrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "n must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_token_ngrams"

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val cnt = arr.numElements()
    if (cnt < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](cnt)
    var i = 0
    while (i < cnt) {
      toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](cnt - n + 1)
    i = 0
    while (i <= cnt - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks(i + j); j += 1 }
      out(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenNgrams =
    copy(child = newChild)
}

/** xx64 hash of every k-token span of a token array: output element i is
  * `xxhash64(concat_ws(' ', tokens[i..i+k-1]))` (seed 42, identical bytes
  * and seed to the SQL formulation, so results are interchangeable with
  * it); arrays shorter than k yield an EMPTY array — span semantics, NOT
  * [[WordShingles]]' collapse-to-one-shingle, because a position-addressed
  * span must not invent a span that covers fewer than k tokens. One native
  * loop per row; positions recover as `posexplode` index + 1. Replaces the
  * lambda formulation in the span-dedup scan, where per-element
  * interpreted dispatch (and, before that, a CollapseProject-induced
  * re-split of the document per span) dominated the corpus scan. */
case class SpanHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, "k must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_span_hashes"

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](n - k + 1)
    i = 0
    while (i <= n - k) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = toks(i + j); j += 1 }
      out(i) = XxHash64Function.hash(
        UTF8String.concatWs(space, parts: _*), StringType, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SpanHashes =
    copy(child = newChild)
}

/** Feature-hashing vectorizer (the "hashing trick", Weinberger et al.
  * 2009): a token array becomes a dense `dim`-float vector where each
  * token adds ±1 at index xx64(token) mod dim, the sign drawn from an
  * independent hash bit (debiases collisions, so E[<v(a), v(b)>] equals
  * the true token-count dot product). Bridges raw text into the
  * embedding-column operators — cosine similarity, LSH/IVF/PQ ANN and
  * semantic dedup run on hashed vectors with no trained model, which is
  * exactly what a first-pass 100 TB near-dup sweep wants. One tight loop
  * per row, no shuffle; output: array<float> of length `dim`. */
case class FeatureHashVector(child: Expression, dim: Int)
    extends UnaryExpression with CodegenFallback {
  require(dim > 0, "dim > 0")
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_feature_hash_vector"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val v = new Array[Float](dim)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        val idx = java.lang.Math.floorMod(h, dim.toLong).toInt
        // sign from a SECOND mix of the hash: floorMod over a non-power-
        // of-two dim consumes all bits of h, so any raw bit of h would
        // correlate sign with bucket and bias the dot-product estimate
        if ((Hashing.splitmix64(h) >>> 63) == 1L) v(idx) += 1f else v(idx) -= 1f
      }
      i += 1
    }
    new GenericArrayData(v.map(Float.box).asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): FeatureHashVector =
    copy(child = newChild)
}

/** Column-level entry points for the native sketch expressions. */
object HashFunctions {
  private def expr(c: Column): Expression = Bridge.expression(c)

  def minhashSignature(shingles: Column, numHashes: Int): Column =
    Bridge.column(MinHashSig(expr(shingles), numHashes))

  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(expr(tokens)))

  def hyperplaneSignature(v: Column, bits: Int): Column =
    Bridge.column(HyperplaneSig(expr(v), bits))

  def wordShingles(tokens: Column, k: Int): Column =
    Bridge.column(WordShingles(expr(tokens), k))

  def tokenNgrams(tokens: Column, n: Int): Column =
    Bridge.column(TokenNgrams(expr(tokens), n))

  def spanHashes(tokens: Column, k: Int): Column =
    Bridge.column(SpanHashes(expr(tokens), k))

  def featureHashVector(tokens: Column, dim: Int): Column =
    Bridge.column(FeatureHashVector(expr(tokens), dim))
}
