package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity (Jaro 1989; Winkler 1990) as a native
  * expression — the fuzzy-match scorer for entity resolution / record
  * linkage ([[graft.ext.EntityResolution]]).
  *
  * Semantics are pinned to DuckDB's `jaro_winkler_similarity` (empirically
  * probed, asserted in StringSimSpec) so the oracle is a genuine
  * cross-engine check:
  *   - either side empty → 0.0 (including both empty);
  *   - match window = max(⌊max(|s|,|t|)/2⌋ − 1, 0);
  *   - transpositions counted over matched sequences, halved;
  *   - Winkler prefix boost (≤ 4 chars, weight 0.1) applied only when the
  *     Jaro score exceeds 0.7 (the classic boost threshold);
  *   - case-sensitive, over UTF-16 code units (≡ code points on the BMP).
  *
  * Codegen emits a static call into the companion ([[JaroWinkler.sim]]) —
  * the same shape Spark uses for Levenshtein — so the expression stays
  * inside whole-stage codegen; cost is O(|s|·window) per pair, driven at
  * corpus scale through blocked joins, never a full cross product. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.sim(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler$$.MODULE$$.sim($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))

  def sim(l: UTF8String, r: UTF8String): Double = {
    val s = l.toString
    val t = r.toString
    val n = s.length; val m = t.length
    if (n == 0 || m == 0) return 0.0
    if (s == t) return 1.0
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val sMatched = new Array[Boolean](n)
    val tMatched = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(i + window + 1, m)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!tMatched(j) && t.charAt(j) == s.charAt(i)) {
          sMatched(i) = true; tMatched(j) = true
          matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: walk both matched subsequences in order
    var transHalf = 0
    var k = 0
    i = 0
    while (i < n) {
      if (sMatched(i)) {
        while (!tMatched(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) transHalf += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    val trans = transHalf / 2
    val jaro = (mm / n + mm / m + (mm - trans) / mm) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(n, m))
    while (prefix < maxPrefix && s.charAt(prefix) == t.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}
