package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Cosine similarity of two float/double array columns as a single native
  * expression with whole-stage codegen (`doGenCode` emits one fused loop
  * computing dot product and both norms per row).
  *
  * Replaces the `aggregate(zip_with(...))` higher-order-function
  * formulation, which is evaluated interpretively per element — in the
  * brute-force top-k inner loop (|corpus| × |queries| pairs) that overhead
  * dominates the scan. Accumulation order (ascending index, elements upcast
  * to double before multiplying) is identical to the HOF version, so
  * results are bit-for-bit unchanged.
  *
  * Null/edge semantics: null if either array is null; zero-norm vectors
  * yield NaN exactly like the division in the HOF version. Divergence only
  * on malformed inputs (mismatched lengths or null elements, where the HOF
  * null-poisons to null): here the dot uses the common prefix and null
  * elements read as 0 — well-formed embedding columns are identical.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine_sim"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    val af = elemIsFloat(left); val bf = elemIsFloat(right)
    var dot = 0.0; var n2a = 0.0; var n2b = 0.0
    val n = math.min(na, nb)
    var i = 0
    while (i < n) {
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      i += 1
    }
    i = 0
    while (i < na) { val x = if (af) a.getFloat(i).toDouble else a.getDouble(i); n2a += x * x; i += 1 }
    i = 0
    while (i < nb) { val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i); n2b += y * y; i += 1 }
    // zero-norm vectors (e.g. a hashed empty document) define cosine 0,
    // not NaN — NaN compares ABOVE every double in Spark orderings, so a
    // single NaN row would rank first in every top-k and pass every
    // >= threshold filter, poisoning dedup with false clusters
    val denom = math.sqrt(n2a) * math.sqrt(n2b)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getA = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val getB = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot"); val n2a = ctx.freshName("n2a")
      val n2b = ctx.freshName("n2b"); val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      // loop-local accumulators must be freshName'd too: Java forbids
      // shadowing an enclosing local, so a bare `x` would fail to compile
      // if any enclosing whole-stage-codegen scope declares one
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |double $dot = 0.0; double $n2a = 0.0; double $n2b = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ((double) $a.$getA($i)) * ((double) $b.$getB($i));
         |}
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $x = (double) $a.$getA($i); $n2a += $x * $x;
         |}
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  double $y = (double) $b.$getB($i); $n2b += $y * $y;
         |}
         |double ${dot}_den = java.lang.Math.sqrt($n2a) * java.lang.Math.sqrt($n2b);
         |${ev.value} = ${dot}_den == 0.0 ? 0.0 : $dot / ${dot}_den;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))
}
