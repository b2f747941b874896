package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aggregate that collects AT MOST `limit` non-null string values.
  *
  * Unlike `slice(collect_list(x), 1, n)` — which accumulates EVERY matching
  * value before truncating and therefore can blow up executor memory when a
  * check fails on billions of rows — the buffer here is hard-capped at
  * `limit` elements on the update path, so memory is O(limit) per partition
  * regardless of data size. This is what makes it safe to fetch
  * n_failure_cases samples inside an aggregation over 100 TB.
  *
  * Which values are kept is partition-order dependent (it is a *sample* of
  * failure cases, mirroring the reference's head-of-failures semantics,
  * backends/pandas/checks.py:203-236).
  */
case class BoundedCollect(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[UTF8String]]
    with UnaryLike[Expression] {

  require(limit >= 0, "limit must be >= 0")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bounded_collect"

  override def createAggregationBuffer(): ArrayBuffer[UTF8String] =
    ArrayBuffer.empty[UTF8String]

  override def update(buffer: ArrayBuffer[UTF8String], input: InternalRow): ArrayBuffer[UTF8String] = {
    if (buffer.size < limit) {
      val v = child.eval(input)
      if (v != null) buffer += v.asInstanceOf[UTF8String].clone()
    }
    buffer
  }

  override def merge(buffer: ArrayBuffer[UTF8String], other: ArrayBuffer[UTF8String]): ArrayBuffer[UTF8String] = {
    val need = limit - buffer.size
    if (need > 0) buffer ++= other.take(need)
    buffer
  }

  override def eval(buffer: ArrayBuffer[UTF8String]): Any =
    new GenericArrayData(buffer.toArray[Any])

  override def serialize(buffer: ArrayBuffer[UTF8String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { s =>
      val b = s.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[UTF8String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf += UTF8String.fromBytes(b)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollect =
    copy(child = newChild)
}

object BoundedCollect {
  /** Collect up to `limit` non-null values of `c` (as strings). */
  def of(c: Column, limit: Int): Column =
    Bridge.column(BoundedCollect(Bridge.expression(c), limit).toAggregateExpression())
}

/** `BoundedCollect` for ANY child dtype: collects AT MOST `limit` non-null
  * values with an O(limit) buffer on both the update and merge paths.
  *
  * This is the LSH bucket former (Dedup.bucketedPairs): collecting
  * `maxBucketSize + 1` ids per bucket key detects an oversized bucket in
  * the SAME aggregation that forms buckets — the skew guard stops being a
  * separate pass, and the signature scan feeding the aggregation is
  * evaluated exactly once. Map-side partial aggregation caps what any task
  * contributes to a hot key at `limit` entries, so a key duplicated a
  * billion times still moves O(tasks × limit), not O(rows), through the
  * shuffle.
  *
  * Which values survive an over-limit collect is partition-order dependent,
  * so callers must treat a full buffer as "too big" (filter size > cap),
  * never as a sample to use — under the cap, contents are the complete,
  * deterministic membership.
  */
case class BoundedCollectItems(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[Any]]
    with UnaryLike[Expression] {

  require(limit >= 0, "limit must be >= 0")

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bounded_collect_items"

  override def createAggregationBuffer(): ArrayBuffer[Any] = ArrayBuffer.empty[Any]

  override def update(buffer: ArrayBuffer[Any], input: InternalRow): ArrayBuffer[Any] = {
    if (buffer.size < limit) {
      val v = child.eval(input)
      if (v != null) buffer += InternalRow.copyValue(v) // may point into reused buffers
    }
    buffer
  }

  override def merge(buffer: ArrayBuffer[Any], other: ArrayBuffer[Any]): ArrayBuffer[Any] = {
    val need = limit - buffer.size
    if (need > 0) buffer ++= other.take(need)
    buffer
  }

  override def eval(buffer: ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toArray)

  private lazy val rowType = StructType(Seq(StructField("v", child.dataType)))
  private lazy val proj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(rowType)

  override def serialize(buffer: ArrayBuffer[Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { v =>
      val bytes = proj.apply(InternalRow(v)).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Any] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val row = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(1)
      row.pointTo(b, len)
      buf += row.get(0, child.dataType)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollectItems =
    copy(child = newChild)
}

object BoundedCollectItems {
  /** Collect up to `limit` non-null values of `c`, typed as `c`'s dtype. */
  def of(c: Column, limit: Int): Column =
    Bridge.column(BoundedCollectItems(Bridge.expression(c), limit).toAggregateExpression())
}
