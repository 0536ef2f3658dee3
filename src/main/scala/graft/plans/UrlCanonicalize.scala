package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass URL canonicalization (the CommonCrawl/CCNet dedup
  * pre-step: `url_canonical`). Semantically EQUAL — property-spec
  * asserted against the regex formulation on adversarial inputs — to
  * the 5-step regexp chain both engines originally ran:
  *
  *  1. `regexp_replace(url, "#.*$", "")`            (cut fragment)
  *  2. `regexp_replace(_, "[?&](utm_[a-z]+|gclid|fbclid)=[^&#]*", "")`
  *  3. `regexp_replace(_, "/$", "")`                (trailing slash)
  *  4. `lower(regexp_extract(_, "^[a-zA-Z]+://[^/]*", 0))` (scheme+host)
  *  5. `regexp_replace(_, "^https://www\\.", "https://") ++ rest`
  *
  * Why: five sequential `regexp_replace` projections materialize five
  * rewritten copies of every URL and walk five regex automata — the
  * interpreter-tax pattern this repo already killed twice (CountByte,
  * the PII scanner). r13 measured the chain at 9.9× DuckDB at the
  * x100 point. This expression does one forward scan over the UTF-8
  * bytes (all structural delimiters are ASCII, so byte-wise scanning
  * is codepoint-correct) plus one Unicode `toLowerCase` on the
  * scheme+host slice — the same `UTF8String.toLowerCase` Spark's own
  * `lower()` uses, so case folding stays identical.
  *
  * Newlines: like the regex chain (whose `.`/`$` are line-aware), the
  * comparison domain is real URLs — strings without `\n`. The chain
  * and this scan agree on that domain (property-spec pinned).
  */
object UrlCanonical {

  /** Column form: single-pass canonical URL. */
  def canonicalCol(url: Column): Column =
    ColumnBridge.column(UrlCanonicalize(ColumnBridge.expression(url)))

  private final val HTTPS_WWW = "https://www.".getBytes
  private final val UTM = "utm_".getBytes
  private final val GCLID = "gclid=".getBytes
  private final val FBCLID = "fbclid=".getBytes

  private def startsWith(b: Array[Byte], off: Int, end: Int,
                         pat: Array[Byte]): Boolean = {
    if (end - off < pat.length) return false
    var i = 0
    while (i < pat.length) {
      if (b(off + i) != pat(i)) return false
      i += 1
    }
    true
  }

  /** If a tracking param starts at `p` (the byte AFTER the `?`/`&`),
    * return the index of its value's first byte, else -1. */
  private def paramValueStart(b: Array[Byte], p: Int, end: Int): Int = {
    if (startsWith(b, p, end, UTM)) {
      var r = p + 4
      while (r < end && b(r) >= 'a' && b(r) <= 'z') r += 1
      if (r > p + 4 && r < end && b(r) == '=') r + 1 else -1
    } else if (startsWith(b, p, end, GCLID)) p + GCLID.length
    else if (startsWith(b, p, end, FBCLID)) p + FBCLID.length
    else -1
  }

  /** One-pass canonicalization over the UTF-8 bytes. */
  def canonicalize(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    val b = s.getBytes // may copy once; all further work is array-local
    // 1. cut at the first '#'
    var fragEnd = 0
    while (fragEnd < n && b(fragEnd) != '#') fragEnd += 1
    // 2. strip tracking params into out
    val out = new Array[Byte](fragEnd)
    var len = 0
    var i = 0
    while (i < fragEnd) {
      val c = b(i)
      if ((c == '?' || c == '&') && i + 1 < fragEnd) {
        val vs = paramValueStart(b, i + 1, fragEnd)
        if (vs >= 0) {
          var v = vs
          while (v < fragEnd && b(v) != '&' && b(v) != '#') v += 1
          i = v // the terminator is re-examined as a fresh match start
        } else { out(len) = c; len += 1; i += 1 }
      } else { out(len) = c; len += 1; i += 1 }
    }
    // 3. one trailing slash
    if (len > 0 && out(len - 1) == '/') len -= 1
    // 4+5. lowercase scheme://host, drop https:// www.
    var j = 0
    while (j < len &&
      ((out(j) >= 'a' && out(j) <= 'z') || (out(j) >= 'A' && out(j) <= 'Z')))
      j += 1
    val hasScheme = j > 0 && j + 2 < len &&
      out(j) == ':' && out(j + 1) == '/' && out(j + 2) == '/'
    if (!hasScheme) UTF8String.fromBytes(out, 0, len)
    else {
      var h = j + 3
      while (h < len && out(h) != '/') h += 1
      val lowered = UTF8String.fromBytes(out, 0, h).toLowerCase
      val lb = lowered.getBytes
      val dropWww = startsWith(lb, 0, lb.length, HTTPS_WWW)
      val headOff = if (dropWww) 4 else 0 // keep "https://", skip "www."
      val headLen = lb.length - headOff
      val res = new Array[Byte](headLen + (len - h))
      if (dropWww) {
        System.arraycopy(lb, 0, res, 0, 8) // "https://"
        System.arraycopy(lb, 12, res, 8, lb.length - 12)
      } else System.arraycopy(lb, 0, res, 0, lb.length)
      System.arraycopy(out, h, res, headLen, len - h)
      UTF8String.fromBytes(res)
    }
  }
}

/** `UrlCanonicalize(url)`: single-pass canonical URL (see
  * [[UrlCanonical.canonicalize]]). Codegen emits one static call —
  * stays inside whole-stage codegen, one projection in the plan where
  * the regex chain materialized five. */
case class UrlCanonicalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"argument must be string, got ${child.dataType}")

  override def nullSafeEval(url: Any): Any =
    UrlCanonical.canonicalize(url.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, u =>
      s"${ev.value} = graft.plans.UrlCanonical.canonicalize($u);")

  override def toString: String = s"url_canonical($child)"

  override protected def withNewChildInternal(newChild: Expression): UrlCanonicalize =
    copy(child = newChild)
}
