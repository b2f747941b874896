package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sum of per-token weights from a trained vocabulary — the inner product
  * of a linear text classifier (ext.TextAnalysis.linearClassifierScore).
  *
  * A `typedlit(Map)` + `element_at` formulation evaluates Catalyst's
  * GetMapValue per token, which is a LINEAR key scan over the map literal —
  * O(vocab) per token, ruinous at the documented 10⁴-10⁵-entry vocabulary
  * scale. This expression keys a per-executor HashMap by UTF8String
  * (built once, looked up O(1), zero per-row conversions), the same
  * pattern as BpeEncode's rank map. Out-of-vocabulary tokens contribute
  * 0; null array elements are skipped. */
case class TokenWeightSum(child: Expression, weights: Map[String, Double])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_token_weight_sum"

  @transient private lazy val table: java.util.HashMap[UTF8String, java.lang.Double] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Double](weights.size * 2)
    weights.foreach { case (k, v) => m.put(UTF8String.fromString(k), Double.box(v)) }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = table.get(arr.getUTF8String(i))
        if (w != null) sum += w.doubleValue()
      }
      i += 1
    }
    sum
  }

  override protected def withNewChildInternal(newChild: Expression): TokenWeightSum =
    copy(child = newChild)
}

object TokenWeightSum {
  def of(tokens: Column, weights: Map[String, Double]): Column =
    Bridge.column(TokenWeightSum(Bridge.expression(tokens), weights))
}
