package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native `mightContainLong` probe over a BROADCAST Bloom filter — the
  * codegen'd replacement for the `udf((f: Long) => bc.value.mightContain…)`
  * escape hatch the fingerprint/minhash stores used through round 8.
  *
  * Why an expression and not a UDF: the probe sits on the FULL-WIDTH
  * ingest scan — the exact scan the prefilter exists to keep cheap — and a
  * ScalaUDF node breaks whole-stage codegen there, forcing an
  * InternalRow → Row conversion per input row. This expression stays
  * inside the generated loop: codegen emits one virtual call
  * (`broadcast.value().mightContainLong(fp)`) against a
  * reference-array-pinned broadcast handle, the same shape Spark's own
  * `InSet` uses for set literals.
  *
  * The expression holds the `Broadcast` HANDLE (an id plus block-manager
  * plumbing, bytes-small under plan serialization); the filter bits ship
  * to executors once via torrent broadcast, not per-task in the closure.
  * Deterministic, null-safe (null fingerprint → null, filtered as false).
  */
case class BloomMightContain(child: Expression, bc: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint fingerprint argument, got " +
        child.dataType.simpleString)

  override def nullSafeEval(v: Any): Any =
    bc.value.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // pin the broadcast handle in the codegen reference array — generated
    // code dereferences it per row (value() is a cached field read after
    // the first executor fetch, not an RPC)
    val bcRef = ctx.addReferenceObj("graftBloomBc", bc,
      classOf[Broadcast[BloomFilter]].getName)
    defineCodeGen(ctx, ev, c =>
      s"((org.apache.spark.util.sketch.BloomFilter) $bcRef.value()).mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {

  /** Column-API entry: `mightContain(bc, fpCol)`. */
  def apply(bc: Broadcast[BloomFilter], fp: Column): Column =
    Bridge.column(BloomMightContain(Bridge.expression(fp), bc))
}
