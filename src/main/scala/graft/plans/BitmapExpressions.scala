package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

/** `BitmapContains(key, words, min)`: true iff bit `key - min` is set
  * in the broadcast bitset `words` — the probe side of
  * [[graft.operators.Relational.bitmapSemiJoin]].
  *
  * Why this exists: a broadcast LEFT SEMI join on a long key pays a
  * SINGLE-THREADED driver-side HashedRelation build — measured 1.0 s
  * for 3 M keys (254 MB as UnsafeRows) at the 100× bench point, 60-75%
  * of the join's wall (`join_floor_profile`). When the key range is
  * dense enough for a bitset, existence-only semantics need none of
  * that: the same collected keys OR into a `long[]` in ~15 ms, the
  * broadcast payload shrinks to range/8 bytes, and the "join" becomes
  * this codegen filter fused into the fact scan — no join operator, no
  * build, O(1) branch-free probe per row.
  *
  * The broadcast HANDLE sits in the codegen references (bytes ship
  * once per executor via torrent broadcast, not per task); the
  * `long[]` is resolved once in the generated class's constructor.
  * Null keys yield null (a semi join never matches null), handled by
  * the standard null-propagating wrapper. */
case class BitmapContains(child: Expression,
                          words: Broadcast[Array[Long]],
                          min: Long)
    extends UnaryExpression with Predicate {

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(key: Any): Any = {
    val idx = key.asInstanceOf[Long] - min
    val w = words.value
    idx >= 0 && (idx >>> 6) < w.length &&
      ((w((idx >>> 6).toInt) >>> (idx & 63)) & 1L) == 1L
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bitmapBc", words,
      classOf[Broadcast[Array[Long]]].getName)
    val w = ctx.addMutableState("long[]", "bitmapWords",
      v => s"$v = (long[]) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, k => {
      val idx = ctx.freshName("idx")
      s"""
         |long $idx = $k - ${min}L;
         |${ev.value} = $idx >= 0 && ($idx >>> 6) < $w.length &&
         |  (($w[(int)($idx >>> 6)] >>> ($idx & 63)) & 1L) == 1L;
       """.stripMargin
    })
  }

  override def toString: String = s"bitmap_contains($child)"

  override protected def withNewChildInternal(newChild: Expression): BitmapContains =
    copy(child = newChild)
}
