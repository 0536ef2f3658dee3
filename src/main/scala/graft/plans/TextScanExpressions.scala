package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static per-row scan kernels for the text-sketch expressions below —
  * the r19 instalment of the r18 "codegen scan instead of UDF"
  * treatment (ContainsIgnoreCase, tokenHashes). Both kernels read the
  * UTF-8 buffer IN PLACE: the UDF forms paid a full UTF8String→String
  * decode-copy per row before doing any work — at the 17 GB sweep
  * point that boundary was ~all of lang_stopwords' 4.8 s (6.2×) and
  * the dominant residual of simhash's 3.9 s (95 % sketch scan per
  * `dedup_stage_floor`).
  *
  * LOCALE: non-ASCII fallbacks lower with Locale.ROOT, same contract
  * as [[graft.operators.Dedup.tokenHashes]] (r18 advisory) and the
  * [[ContainsIgnoreCase]] scaladoc.
  */
object TextScan {

  /** `\s` in Java regex is exactly [ \t\n\x0B\f\r] — all ASCII, and
    * UTF-8 continuation bytes are ≥ 0x80, so byte-level delimiting is
    * exact for EVERY input, not just ASCII text. */
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || (b >= 0x09 && b <= 0x0D)

  @inline private def foldB(b: Byte): Byte =
    if (b >= 'A' && b <= 'Z') (b + 32).toByte else b

  /** Count of whitespace-delimited tokens equal (case-folded) to one
    * of `set`'s needles. Exactly `text.toLowerCase.split("\\s+")` +
    * set-membership counting (the reference UDF semantics,
    * TextScanSpec fuzz-pins the equivalence): case mappings never
    * produce or consume whitespace, so lowering per-token equals
    * lowering the whole string first; ASCII tokens compare byte-folded
    * in place, any token containing a non-ASCII byte falls back to the
    * real `String.toLowerCase(Locale.ROOT)`. */
  def stopwordHits(s: UTF8String, set: StopwordSet): Int = {
    val n = s.numBytes()
    var i = 0
    var hits = 0
    while (i < n) {
      if (isWs(s.getByte(i))) i += 1
      else {
        val start = i
        var ascii = true
        while (i < n && !isWs(s.getByte(i))) {
          if ((s.getByte(i) & 0x80) != 0) ascii = false
          i += 1
        }
        val len = i - start
        if (ascii) {
          if (set.matchesAsciiFold(s, start, len)) hits += 1
        } else {
          // rare path: copy the token's bytes (UTF8String.substring is
          // CHAR-indexed — byte offsets need a manual slice)
          val tok = new Array[Byte](len)
          var j = 0
          while (j < len) { tok(j) = s.getByte(start + j); j += 1 }
          if (set.matchesLowered(
              new String(tok, java.nio.charset.StandardCharsets.UTF_8)))
            hits += 1
        }
      }
    }
    hits
  }

  /** 64-bit SimHash over word tokens, bit-identical to
    * [[graft.operators.Dedup.simhashUdf]] (per-bit ±1 majority of
    * finalized token hashes) with two structural changes that keep
    * the math the same:
    *   - the tokenizer runs directly on the UTF-8 bytes for all-ASCII
    *     rows (same scanner as Dedup.tokenHashes' fast path — ASCII
    *     chars ARE their bytes; non-ASCII rows fall back to the
    *     String pipeline verbatim);
    *   - the per-bit counters are BIT-SLICED: plane k holds bit k of
    *     all 64 ones-counters, and adding a token's 64-bit mask is an
    *     amortized-O(1) ripple-carry increment (~2 plane ops/token)
    *     instead of the 64-iteration per-token loop — the loop that
    *     was ~all of the sketch scan's CPU at x1000. Majority test:
    *     counts(b) = 2·ones(b) − total > 0 ⟺ 2·ones(b) > total.
    * TextScanSpec fuzz-pins expression == UDF on mixed corpora. */
  def simhash64(s: UTF8String): Long = {
    val planes = new Array[Long](33) // total < 2^31 tokens → ≤32 planes
    var total = 0L
    val n = s.numBytes()
    var ascii = true
    var i = 0
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    @inline def add(h0: Long): Unit = {
      // finalize (xorshift mix) so low bits are well distributed —
      // identical to the UDF's per-token mix
      var h = h0
      h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL; h ^= (h >>> 33)
      var carry = h
      var k = 0
      while (carry != 0L) {
        val old = planes(k); planes(k) = old ^ carry; carry = old & carry
        k += 1
      }
      total += 1L
    }
    if (ascii) {
      @inline def isStart(c: Byte): Boolean =
        (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      @inline def isCont(c: Byte): Boolean =
        isStart(c) || c == '-' || c == '_' || c == '/'
      i = 0
      while (i < n) {
        val c0 = foldB(s.getByte(i))
        if (isStart(c0) && i + 1 < n && isCont(foldB(s.getByte(i + 1)))) {
          var h = 1125899906842597L * 31L + c0
          i += 1
          var c = foldB(s.getByte(i))
          while (isCont(c)) {
            h = h * 31L + c
            i += 1
            c = if (i < n) foldB(s.getByte(i)) else ' '
          }
          add(h)
        } else i += 1
      }
    } else {
      val toks = graft.operators.Dedup.tokenHashes(s.toString)
      var t = 0
      while (t < toks.length) { add(toks(t)); t += 1 }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      var ones = 0L
      var k = 0
      while (k < 33) { ones |= ((planes(k) >>> b) & 1L) << k; k += 1 }
      if (2L * ones > total) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column forms. */
  def stopwordCount(text: Column, needles: Seq[String]): Column =
    toCol(StopwordCountExpr(expression(text), needles))
  def simhash(text: Column): Column = toCol(SimHash64Expr(expression(text)))
}

/** Prepared needle set shipped into codegen by reference: the byte
  * form for the in-place ASCII fold compare, the string form for the
  * non-ASCII-token fallback. Needles must be lower-case (they are
  * compared against folded/lowered tokens). */
final class StopwordSet(needles: Array[String]) extends Serializable {
  require(needles.nonEmpty, "StopwordSet: empty needle list")
  require(needles.forall(w => w == w.toLowerCase(java.util.Locale.ROOT)),
    "StopwordSet: needles must be lower-case (tokens compare folded)")
  private val bytes: Array[Array[Byte]] =
    needles.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  private val strSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    needles.foreach(s.add)
    s
  }
  private[plans] val asSeq: Seq[String] = needles.toIndexedSeq

  def matchesAsciiFold(s: UTF8String, start: Int, len: Int): Boolean = {
    var ni = 0
    while (ni < bytes.length) {
      val nb = bytes(ni)
      if (nb.length == len) {
        var j = 0
        var ok = true
        while (ok && j < len) {
          var c = s.getByte(start + j)
          if (c >= 'A' && c <= 'Z') c = (c + 32).toByte
          if (c != nb(j)) ok = false
          j += 1
        }
        if (ok) return true
      }
      ni += 1
    }
    false
  }

  def matchesLowered(token: String): Boolean =
    strSet.contains(token.toLowerCase(java.util.Locale.ROOT))
}

/** `StopwordCountExpr(text, needles)`: INT count of whitespace
  * tokens of `text` whose lower-cased form is in `needles`. Codegen
  * emits a call to the static in-place scanner — no per-row String
  * decode, no split array. */
case class StopwordCountExpr(child: Expression, needles: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"argument must be string, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val set = new StopwordSet(needles.toArray)

  override def nullSafeEval(str: Any): Any =
    TextScan.stopwordHits(str.asInstanceOf[UTF8String], set)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwordSet", set,
      classOf[StopwordSet].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.TextScan.stopwordHits($s, $ref);")
  }

  override def toString: String = s"stopword_count($child)"

  override protected def withNewChildInternal(newChild: Expression): StopwordCountExpr =
    copy(child = newChild)
}

/** `SimHash64Expr(text)`: LONG 64-bit SimHash sketch (see
  * [[TextScan.simhash64]]). */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"argument must be string, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(str: Any): Any =
    TextScan.simhash64(str.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.TextScan.simhash64($s);")

  override def toString: String = s"simhash64($child)"

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}
