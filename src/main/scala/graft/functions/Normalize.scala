package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Accent-strip + digit-fold pass of CCNet-style text normalization
  * (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
  * Datasets from Web Crawl Data" — their dedup hashes normalized text:
  * lowercased, accents removed, digits folded). This expression does the
  * Unicode-aware half in one tight per-row pass: NFD decomposition,
  * combining marks (category Mn) dropped, ASCII digits replaced by '0'.
  * Compose after [[graft.ext.TextAnalysis.normalized]] (trim + whitespace
  * collapse + lowercase) for the full CCNet shape.
  *
  * Semantics match DuckDB's utf8proc-based `strip_accents` (both are
  * NFD + strip-marks), so cross-engine fingerprints agree — the property
  * the correctness gate checks. Characters that don't decompose (ø, ß,
  * CJK) pass through unchanged on both engines.
  *
  * CodegenFallback for the same reason as the sketch expressions: the
  * per-row loop IS the tight code; java.text.Normalizer does the only
  * allocation-heavy step. */
case class CcnetStrip(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_ccnet_strip"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val d = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val ch = d.charAt(i)
      if (Character.getType(ch) != Character.NON_SPACING_MARK) {
        if (ch >= '0' && ch <= '9') sb.append('0') else sb.append(ch)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): CcnetStrip =
    copy(child = newChild)
}

object Normalize {
  /** Column wrapper for [[CcnetStrip]]. */
  def ccnetStrip(c: Column): Column = Bridge.column(CcnetStrip(Bridge.expression(c)))
}
