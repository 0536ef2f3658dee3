package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level scalar JSON field extraction (§2.8-json hot path).
  *
  * `get_json_object` is a `CodegenFallback` that builds a Jackson
  * parser per row — ~3 µs/row on flat event-props objects, 15–20×
  * DuckDB's vectorized json_extract_string on the same data (round-5
  * audit of `from_json_props`). The access pattern the engine needs is
  * one top-level key out of a small flat object, which a single
  * forward scan over the UTF-8 bytes answers in ~50 ns without
  * allocating a parser.
  *
  * Semantics (agreed with `get_json_object(col, '$.key')` and DuckDB
  * `json_extract_string(col, '$.key')` on valid JSON objects):
  *  - first match of `key` at top level wins; nested objects/arrays
  *    are skipped with a depth counter that is string-aware;
  *  - string values are returned unquoted and unescaped;
  *  - numeric / boolean literals are returned as their literal text;
  *  - a JSON `null` value, a missing key, or malformed input → NULL;
  *  - container values (object/array) are returned as their raw JSON
  *    slice, matching get_json_object.
  */
object JsonFast {

  /** Extract the value of top-level `key` from the JSON object
    * `json`; null when absent/null/malformed. Scans raw UTF-8 bytes —
    * multi-byte codepoints never collide with the structural ASCII
    * bytes the scanner branches on. */
  def getScalar(json: UTF8String, key: UTF8String): UTF8String = {
    if (json == null || key == null) return null
    val b = json.getBytes
    val k = key.getBytes
    val n = b.length
    var i = skipWs(b, 0, n)
    if (i >= n || b(i) != '{') return null
    i += 1
    var first = true
    while (i < n) {
      i = skipWs(b, i, n)
      if (i < n && b(i) == '}') return null // end of object, key absent
      if (!first) {
        if (i >= n || b(i) != ',') return null
        i = skipWs(b, i + 1, n)
      }
      first = false
      // --- key string ---
      if (i >= n || b(i) != '"') return null
      val keyStart = i + 1
      i = scanString(b, keyStart, n)
      if (i < 0) return null // unterminated
      val keyEnd = i // position of closing quote
      val matched = bytesEqualUnescaped(b, keyStart, keyEnd, k)
      i = skipWs(b, i + 1, n)
      if (i >= n || b(i) != ':') return null
      i = skipWs(b, i + 1, n)
      if (i >= n) return null
      // --- value ---
      b(i) match {
        case '"' =>
          val vs = i + 1
          i = scanString(b, vs, n)
          if (i < 0) return null
          if (matched) return unescape(b, vs, i)
          i += 1
        case '{' | '[' =>
          val vs = i
          i = skipContainer(b, i, n)
          if (i < 0) return null
          if (matched) return UTF8String.fromBytes(b, vs, i - vs)
        case _ =>
          val vs = i
          while (i < n && b(i) != ',' && b(i) != '}' && !isWs(b(i))) i += 1
          if (matched) {
            // literal null → SQL NULL (both get_json_object and the
            // DuckDB oracle's json_extract_string agree)
            if (i - vs == 4 && b(vs) == 'n' && b(vs + 1) == 'u' &&
                b(vs + 2) == 'l' && b(vs + 3) == 'l') return null
            return UTF8String.fromBytes(b, vs, i - vs)
          }
      }
    }
    null
  }

  private def isWs(c: Byte): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r'

  private def skipWs(b: Array[Byte], from: Int, n: Int): Int = {
    var i = from
    while (i < n && isWs(b(i))) i += 1
    i
  }

  /** From just after an opening quote, return the index of the closing
    * quote (escape-aware), or -1 if unterminated. */
  private def scanString(b: Array[Byte], from: Int, n: Int): Int = {
    var i = from
    while (i < n) {
      val c = b(i)
      if (c == '\\') i += 2
      else if (c == '"') return i
      else i += 1
    }
    -1
  }

  /** From an opening '{' or '[', return the index just past the
    * matching close bracket (string-aware), or -1 if unbalanced. */
  private def skipContainer(b: Array[Byte], from: Int, n: Int): Int = {
    var depth = 0
    var i = from
    while (i < n) {
      b(i) match {
        case '"' =>
          val e = scanString(b, i + 1, n)
          if (e < 0) return -1
          i = e
        case '{' | '[' => depth += 1
        case '}' | ']' =>
          depth -= 1
          if (depth == 0) return i + 1
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** Compare the raw (possibly escaped) key bytes [s, e) against the
    * query key. Escaped keys take the slow unescape path — never hit
    * by machine-written JSON but kept for correctness. */
  private def bytesEqualUnescaped(b: Array[Byte], s: Int, e: Int,
                                  k: Array[Byte]): Boolean = {
    var hasEscape = false
    var i = s
    while (i < e && !hasEscape) { if (b(i) == '\\') hasEscape = true; i += 1 }
    if (!hasEscape) {
      if (e - s != k.length) return false
      var j = 0
      while (j < k.length) { if (b(s + j) != k(j)) return false; j += 1 }
      true
    } else {
      val u = unescape(b, s, e)
      u != null && java.util.Arrays.equals(u.getBytes, k)
    }
  }

  /** JSON string unescape of bytes [s, e); fast path returns a slice
    * when no backslash is present. */
  private def unescape(b: Array[Byte], s: Int, e: Int): UTF8String = {
    var i = s
    var hasEscape = false
    while (i < e && !hasEscape) { if (b(i) == '\\') hasEscape = true; i += 1 }
    if (!hasEscape) return UTF8String.fromBytes(b, s, e - s)
    val sb = new java.lang.StringBuilder(e - s)
    i = s
    while (i < e) {
      val c = b(i)
      if (c == '\\' && i + 1 < e) {
        b(i + 1) match {
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '/' => sb.append('/'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'u' =>
            if (i + 5 < e + 1 && i + 6 <= e) {
              val hex = new String(b, i + 2, 4, java.nio.charset.StandardCharsets.US_ASCII)
              try { sb.append(Integer.parseInt(hex, 16).toChar); i += 6 }
              catch { case _: NumberFormatException => return null }
            } else return null
          case _ => return null // invalid escape → malformed
        }
      } else {
        // raw UTF-8 byte: buffer it through the codepoint-preserving
        // route (decode the remaining run of non-escape bytes at once)
        var j = i
        while (j < e && b(j) != '\\') j += 1
        sb.append(new String(b, i, j - i, java.nio.charset.StandardCharsets.UTF_8))
        i = j
      }
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `json_get_scalar(json, key)` — codegen expression over
  * [[JsonFast.getScalar]]. Stays inside whole-stage codegen (unlike
  * GetJsonObject's CodegenFallback), allocation-free on the match
  * path. */
case class JsonGetScalar(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"arguments must be string, got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(json: Any, key: Any): Any =
    JsonFast.getScalar(json.asInstanceOf[UTF8String], key.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (j, k) => {
      s"""
         |${ev.value} = graft.plans.JsonFast.getScalar($j, $k);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonGetScalar =
    copy(left = newLeft, right = newRight)
}
