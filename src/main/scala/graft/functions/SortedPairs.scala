package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, RowOrdering, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Generator that sorts an id array once and STREAMS its m·(m−1)/2 ordered
  * pairs (id_a < id_b) as output rows.
  *
  * This is the pair-emission stage of `Dedup.bucketedPairs`. The
  * higher-order-function formulation
  * (`explode(flatten(transform(...transform(slice(...)))))`) has two costs
  * this avoids: the nested lambdas are interpreted per ELEMENT
  * (measured ~4× slower than the codegen'd self-join it replaced), and
  * `flatten` materializes the whole m² pair array per bucket before explode
  * streams it. Here the sort is O(m log m) once per bucket, each pair is an
  * O(1) iterator step, and peak memory per bucket is the O(m) sorted id
  * array — callers have already capped m at `maxBucketSize`.
  *
  * Output rows are deterministic (sorted order) so downstream
  * `dropDuplicates` and golden pins are stable regardless of partition
  * order upstream.
  */
case class SortedPairs(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  private lazy val elementType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(elementType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if RowOrdering.isOrderable(et) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"sorted_pairs requires an array of an orderable type, got ${child.dataType.sql}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("id_a", elementType, nullable = true),
    StructField("id_b", elementType, nullable = true)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Nil
    val m = arr.numElements()
    val items = new Array[Any](m)
    var i = 0
    var n = 0
    while (i < m) { // drop nulls: a null id cannot form an ordered pair
      val v = arr.get(i, elementType)
      if (v != null) { items(n) = v; n += 1 }
      i += 1
    }
    if (n < 2) return Nil
    java.util.Arrays.sort(items.asInstanceOf[Array[AnyRef]], 0, n,
      ordering.asInstanceOf[Ordering[AnyRef]])
    // Compact equal runs: a duplicate id in one bucket array (possible when
    // two distinct shingles of a document hash-collide into the same bucket)
    // must not emit an id==id self-pair or a repeated pair.
    var w = 1
    i = 1
    while (i < n) {
      if (ordering.compare(items(i), items(w - 1)) != 0) { items(w) = items(i); w += 1 }
      i += 1
    }
    val nd = w
    if (nd < 2) return Nil
    new Iterator[InternalRow] {
      private var a = 0
      private var b = 1
      override def hasNext: Boolean = a < nd - 1
      override def next(): InternalRow = {
        val row = new GenericInternalRow(Array[Any](items(a), items(b)))
        b += 1
        if (b >= nd) { a += 1; b = a + 1 }
        row
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): SortedPairs =
    copy(child = newChild)
}

object SortedPairs {
  /** All ordered pairs (id_a < id_b) of the sorted elements of array column
    * `c`, as a two-column generator (use inside `select`). */
  def of(c: Column): Column = Bridge.column(SortedPairs(Bridge.expression(c)))
}
