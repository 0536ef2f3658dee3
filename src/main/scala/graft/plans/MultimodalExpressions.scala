package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{coalesce, lit}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** The multimodal decode stub's 64-bit byte mix as a whole-stage-
  * codegen expression (guide §4: no Scala closures / row encoders on
  * the hot path).
  *
  * [[graft.operators.Multimodal.decodeStub]] derives width/height/
  * duration from ONE deterministic hash of the blob's first 4 KiB;
  * the old `decode` ran it inside a `mapPartitions` over external
  * `Row`s, which (a) deserialized and reserialized EVERY column of
  * every row across the object boundary and (b) made the node opaque —
  * Catalyst could not prune the untouched columns (uri, meta) out of
  * the scan, so the x1000 query paid for building map and string
  * columns the aggregate never read. As an expression the decode is a
  * projection: pruning and pushdown work again, and the width/height/
  * duration arithmetic (pure floorMod/shift math on the hash) lowers
  * to built-in Catalyst ops on top of this one kernel. MultimodalSpec
  * pins the expression-based decode row-identical to the stub.
  */
object MultimodalHash {

  /** Exactly decodeStub's mix: polynomial-31 over the first 4 KiB,
    * then the murmur-style finalizer. */
  def mix(bytes: Array[Byte]): Long = {
    var h = 1125899906842597L
    val n = math.min(bytes.length, 4096)
    var i = 0
    while (i < n) { h = h * 31L + bytes(i); i += 1 }
    h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL; h ^= (h >>> 33)
    h
  }

  /** Column form. decodeStub hashes a NULL blob like an empty one
    * (it still emits dimensions), so nulls are folded to empty here
    * rather than null-propagated by the expression. */
  def mixCol(bytes: Column): Column =
    column(DecodeMix(expression(
      coalesce(bytes, lit(Array.emptyByteArray)))))
}

/** `DecodeMix(bytes)`: LONG decode-stub hash of a binary column.
  * Codegen emits a call to the static mixing loop. */
case class DecodeMix(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"argument must be binary, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(bytes: Any): Any =
    MultimodalHash.mix(bytes.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.plans.MultimodalHash.mix($b);")

  override def toString: String = s"decode_mix($child)"

  override protected def withNewChildInternal(newChild: Expression): DecodeMix =
    copy(child = newChild)
}
