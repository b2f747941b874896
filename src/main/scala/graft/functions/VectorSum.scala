package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Shared buffer semantics of the fixed-point vector-sum aggregates: an
  * `Array[Long]` of scaled component sums, sized lazily from the first
  * row. The two concrete aggregates differ ONLY in the per-row scaled
  * contribution; merge/eval/wire-format live here once so the
  * bit-determinism contract cannot silently diverge between them. */
private[functions] trait FixedPointArrayAggregate
    extends TypedImperativeAggregate[Array[Long]] {

  def scale: Double

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  /** Accumulate one row's vector, each component pre-multiplied by
    * `factor` (1.0 for the unweighted sum). `rint` then a finite check:
    * a ±Infinity component, an infinite×0 NaN product, or a product past
    * Long range would otherwise saturate/wrap the buffer cell
    * bit-deterministically wrong — fail loudly instead, same contract as
    * the NaN rejection. */
  protected final def accumulate(buffer: Array[Long], arr: ArrayData,
      factor: Double): Array[Long] = {
    val n = arr.numElements()
    if (n == 0) return buffer
    val buf = if (buffer.length == 0) new Array[Long](n) else buffer
    require(buf.length == n,
      s"$prettyName: ragged vector column (${buf.length} vs $n elements)")
    var i = 0
    while (i < n) {
      val p = math.rint(factor * arr.getDouble(i) * scale)
      require(java.lang.Double.isFinite(p) && math.abs(p) <= MaxExact,
        s"$prettyName: non-finite or out-of-range scaled component at index $i")
      buf(i) += p.toLong
      i += 1
    }
    buf
  }
  private val MaxExact = Long.MaxValue.toDouble

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.length == 0) return buffer
    if (buffer.length == 0) return other
    require(buffer.length == other.length,
      s"$prettyName: ragged vector column (${buffer.length} vs ${other.length})")
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    new GenericArrayData(buffer.map(java.lang.Long.valueOf).toArray[Any])

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.length)
    buffer.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }
}

/** Element-wise sum of an `array<double>` column in FIXED-POINT: each
  * component contributes round(x·scale) as a long, and long addition is
  * exact and order-independent, so the aggregate is bit-deterministic
  * under any partitioning / merge order — the accumulation primitive
  * behind the deterministic distributed trainers
  * ([[graft.ext.Clustering]] Lloyd's updates, [[graft.ext.ClassifierTrain]]
  * gradient sums).
  *
  * Why not `posexplode` + `groupBy(pos)` + `sum`: exploding multiplies the
  * row count by dim, and every expression in the projection above the
  * generator is re-evaluated per OUTPUT row — a per-row O(dim) margin
  * computation silently becomes O(dim²). This aggregate keeps rows intact:
  * one O(dim) buffer per partition, map-side partials, dim cells moved at
  * the exchange regardless of row count.
  *
  * Output: `array<long>` of the scaled sums (caller divides by `scale`);
  * null/empty input arrays are skipped; ragged lengths are an error (a
  * vector column must be rectangular). NaN/±Infinity components are an
  * error rather than a silent 0 or a saturated Long.MaxValue (either
  * would quietly corrupt the sum).
  */
case class VectorSumFixedPoint(
    child: Expression,
    scale: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends FixedPointArrayAggregate
    with UnaryLike[Expression] {

  require(scale > 0, "scale must be > 0")

  override def prettyName: String = "graft_vector_sum_fixed_point"

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    accumulate(buffer, v.asInstanceOf[ArrayData], 1.0)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumFixedPoint =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumFixedPoint =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSumFixedPoint =
    copy(child = newChild)
}

object VectorSumFixedPoint {
  /** Element-wise fixed-point sum of an array<double> column; returns
    * array<long> of round(x·scale) sums. */
  def of(c: Column, scale: Double = 1e6): Column =
    Bridge.column(VectorSumFixedPoint(Bridge.expression(c), scale)
      .toAggregateExpression())
}

/** Σ weight·vec — [[VectorSumFixedPoint]] with a per-row scalar
  * multiplier: each row contributes round(weight·vec(i)·scale) per
  * component. The point of taking `weight` as a SEPARATE child (rather
  * than `transform(vec, x => w * x)` in the caller): a lambda body is
  * re-evaluated per ELEMENT, so an O(dim) weight expression (a logistic
  * margin, a distance) would silently cost O(dim²) per row — here it is
  * evaluated exactly once per row. Rows with a null/NaN weight or null
  * vector are skipped (consistent with SQL aggregate null semantics); an
  * infinite weight, like an infinite component, is an error (its products
  * are ±Inf or NaN — either silently corrupts the fixed-point buffer). */
case class VectorWeightedSumFixedPoint(
    weight: Expression,
    vec: Expression,
    scale: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends FixedPointArrayAggregate {

  require(scale > 0, "scale must be > 0")

  override def children: Seq[Expression] = Seq(weight, vec)
  override def prettyName: String = "graft_vector_weighted_sum_fixed_point"

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val wv = weight.eval(input)
    val v = vec.eval(input)
    if (wv == null || v == null) return buffer
    val w = wv.asInstanceOf[Double]
    if (w.isNaN) return buffer
    accumulate(buffer, v.asInstanceOf[ArrayData], w)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorWeightedSumFixedPoint =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorWeightedSumFixedPoint =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorWeightedSumFixedPoint =
    copy(weight = newChildren(0), vec = newChildren(1))
}

object VectorWeightedSumFixedPoint {
  /** Element-wise fixed-point sum of weight·vec; returns array<long> of
    * round(w·x·scale) sums. */
  def of(weight: Column, vec: Column, scale: Double = 1e6): Column =
    Bridge.column(VectorWeightedSumFixedPoint(
      Bridge.expression(weight), Bridge.expression(vec), scale)
      .toAggregateExpression())
}

/** x / ‖x‖₂ with a trailing bias-1 component — the featurization step of
  * [[graft.ext.ClassifierTrain]] as ONE native O(dim) loop. The
  * `aggregate`/`transform` higher-order-function formulation it replaces
  * is evaluated interpreted (HOFs are CodegenFallback) with a lambda
  * dispatch per ELEMENT — ~1 ms/row at dim=1024, which multiplied by rows
  * × GD iterations dominated training wall-clock. Sum-of-squares
  * accumulates left-to-right exactly like the old fold, so results are
  * bit-identical and golden pins survive. All-zero input stays zero
  * (bias-only row); expects `array<double>` (cast upstream). */
case class VectorL2NormalizeBias(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_vector_l2_normalize_bias"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Double](n + 1)
    var ss = 0.0
    var i = 0
    while (i < n) { val x = arr.getDouble(i); ss += x * x; i += 1 }
    if (ss > 0) {
      val nrm = math.sqrt(ss)
      i = 0
      while (i < n) { out(i) = arr.getDouble(i) / nrm; i += 1 }
    }
    out(n) = 1.0
    new GenericArrayData(out.map(java.lang.Double.valueOf).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): VectorL2NormalizeBias =
    copy(child = newChild)
}

object VectorL2NormalizeBias {
  def of(vec: Column): Column =
    Bridge.column(VectorL2NormalizeBias(Bridge.expression(vec)))
}

/** w · x against a LITERAL weight vector in one native O(dim) loop —
  * the margin evaluation of [[graft.ext.ClassifierTrain]] (and any
  * scoring scan with a trained model riding as a literal). Replaces the
  * interpreted `aggregate(zip_with(...))` formulation for the same reason
  * as [[VectorL2NormalizeBias]]; accumulation order is the same
  * left-to-right fold, so scores are bit-identical. Input length must
  * equal the weight length (a model/feature dim mismatch is a bug —
  * fail loudly, not a silent truncation). */
case class VectorDotLiteral(child: Expression, weights: Array[Double])
    extends UnaryExpression with CodegenFallback {
  require(weights.nonEmpty, "weights must be non-empty")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_vector_dot_literal"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    require(n == weights.length,
      s"$prettyName: vector length $n != weights length ${weights.length}")
    var acc = 0.0
    var i = 0
    while (i < n) { acc += arr.getDouble(i) * weights(i); i += 1 }
    acc
  }

  override protected def withNewChildInternal(newChild: Expression): VectorDotLiteral =
    copy(child = newChild)
}

object VectorDotLiteral {
  def of(vec: Column, weights: Array[Double]): Column =
    Bridge.column(VectorDotLiteral(Bridge.expression(vec), weights.clone()))
}

/** Index of the squared-L2-nearest centroid in a LITERAL centroid table —
  * the assignment step of Lloyd's ([[graft.ext.Clustering]]) and the
  * cell/code assignment of IVF and PQ ([[graft.ext.Similarity]]) as one
  * native k×dim loop per row. The `transform(cents, c =>
  * aggregate(zip_with(v, c, ...)))` + `array_position(array_min)`
  * formulation it replaces pays an interpreted lambda dispatch per CELL
  * of the k×dim distance computation — the dominant per-row cost of every
  * corpus-side quantizer at scale. Parity with the HOF shape: distances
  * accumulate left-to-right in double (float inputs upcast per element),
  * strict `<` keeps the FIRST index on exact ties — identical argmin,
  * golden pins survive. Null elements read as 0.0 (embedding columns are
  * rectangular non-null; this mirrors the hyperplane-signature
  * convention). */
case class NearestCentroid(child: Expression, centers: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {
  require(centers.nonEmpty, "centers must be non-empty")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_nearest_centroid"

  @transient private lazy val elemIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var best = Double.PositiveInfinity
    var bestI = 0
    var c = 0
    while (c < centers.length) {
      val cent = centers(c)
      require(cent.length == n,
        s"$prettyName: vector length $n != centroid length ${cent.length}")
      var d = 0.0
      var i = 0
      while (i < n) {
        val x =
          if (arr.isNullAt(i)) 0.0
          else if (elemIsFloat) arr.getFloat(i).toDouble
          else arr.getDouble(i)
        val diff = x - cent(i)
        d += diff * diff
        i += 1
      }
      if (d < best) { best = d; bestI = c }
      c += 1
    }
    bestI
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  def of(vec: Column, centers: Array[Array[Double]]): Column =
    Bridge.column(NearestCentroid(Bridge.expression(vec), centers.map(_.clone())))
}
