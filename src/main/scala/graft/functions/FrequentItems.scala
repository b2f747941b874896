package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Misra–Gries frequent-items sketch as a mergeable aggregate: a bounded
  * map of at most `capacity` (item → undercounted count) entries with the
  * classic guarantee — after seeing N items, every item with true
  * frequency > N/(capacity+1) is IN the summary, and each kept count
  * undercounts by at most N/(capacity+1).
  *
  * Why not `groupBy(item).count()`: on web-scale text the distinct-token
  * set (billions of entries) doesn't fit anywhere, and the full count
  * shuffles the entire vocabulary. This sketch keeps every task's state at
  * O(capacity); partial summaries merge pointwise (Agarwal et al.,
  * "Mergeable Summaries", PODS'12: pointwise add + compact preserves the
  * MG error bound), so ONE aggregation job moves only
  * O(tasks · capacity) entries regardless of corpus size or vocabulary.
  *
  * Amortized-O(1) updates: instead of the textbook decrement-all on every
  * miss (O(capacity) per unseen item — ruinous on long-tailed input), the
  * buffer grows to 2·capacity and then compacts: subtract the
  * (capacity+1)-th largest count from every entry and drop the non-positive
  * ones. Each compaction halves the buffer, so the per-item cost is O(1)
  * amortized and the subtracted mass telescopes into the same
  * N/(capacity+1) bound.
  *
  * Output: array<struct<item T, est bigint>> sorted (est desc, item asc).
  * Estimates are LOWER bounds on true counts — callers wanting exact
  * heavy-hitter counts re-count the (≤ capacity) candidates in a second
  * exact pass (see [[graft.ext.HeavyHitters]]).
  */
case class MisraGriesSketch(
    item: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[Any, Long]]
    with UnaryLike[Expression] {

  require(capacity > 0, "capacity must be > 0")

  override def child: Expression = item
  override def prettyName: String = "graft_misra_gries"

  private lazy val itemOrdering =
    TypeUtils.getInterpretedOrdering(item.dataType)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", item.dataType, nullable = true),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty

  /** Shrink to ≤ `capacity` entries: subtract the (capacity+1)-th largest
    * count from all, drop the non-positive. No-op when already small. */
  private def compact(buf: mutable.HashMap[Any, Long]): Unit = {
    if (buf.size > capacity) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - capacity - 1) // (capacity+1)-th largest
      buf.filterInPlace((_, c) => c > sub)
      buf.mapValuesInPlace((_, c) => c - sub)
    }
  }

  override def update(buf: mutable.HashMap[Any, Long],
                      input: InternalRow): mutable.HashMap[Any, Long] = {
    val v = item.eval(input)
    if (v != null) {
      buf.get(v) match {
        case Some(c) => buf.update(v, c + 1L)
        case None =>
          buf.update(InternalRow.copyValue(v), 1L) // v may alias reused buffers
          if (buf.size >= 2 * capacity) compact(buf)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[Any, Long],
                     other: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    other.foreach { case (v, c) =>
      buf.update(v, buf.getOrElse(v, 0L) + c)
    }
    compact(buf)
    buf
  }

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    val entries = buf.toArray.sortWith { (a, b) =>
      if (a._2 != b._2) a._2 > b._2 else itemOrdering.compare(a._1, b._1) < 0
    }
    new GenericArrayData(entries.map { case (v, c) =>
      InternalRow(v, c)
    }.toArray[Any])
  }

  private lazy val pairType = StructType(Seq(
    StructField("item", item.dataType), StructField("est", LongType)))
  private lazy val proj = UnsafeProjection.create(pairType)

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (v, c) =>
      val bytes = proj.apply(InternalRow(v, c)).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val row = new UnsafeRow(2)
      row.pointTo(b, len)
      buf.update(row.get(0, item.dataType), row.getLong(1))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesSketch =
    copy(item = newChild)
}

object MisraGriesSketch {
  /** Frequent-item candidates as array<struct<item, est>>, (est desc,
    * item asc). Every item with frequency > n/(capacity+1) is present. */
  def of(item: Column, capacity: Int): Column =
    Bridge.column(MisraGriesSketch(Bridge.expression(item), capacity)
      .toAggregateExpression())
}
