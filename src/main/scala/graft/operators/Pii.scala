package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import java.util.regex.Pattern

/** PII detection and masking for training-data scrubbing: emails,
  * phone numbers, and URLs are counted and replaced with typed
  * placeholders before text enters a training mix. Built entirely
  * from codegen'd `regexp_extract_all` / `regexp_replace` — no UDF,
  * row-local, linear scale-out; the patterns are deliberately
  * RE2-compatible so the same strings run in other engines.
  * Ref: the reference strips markup/noise pre-embedding
  * (text_cleanup in its ingest path) but has no PII pass; this is
  * north-star pipeline surface. */
object Pii {

  /** Conservative RFC-5322-ish email shape (no quoted locals). */
  val emailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** International dashed phone shape: +CC-NN(N(N))-NNN(N)-NNNN. */
  val phoneRe: String = "\\+[0-9]{1,3}-[0-9]{2,4}-[0-9]{3,4}-[0-9]{4}"

  /** http(s) URL up to the next whitespace. */
  val urlRe: String = "https?://[^\\s]+"

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(emailRe), lit(0))).cast("bigint")
  def phoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(phoneRe), lit(0))).cast("bigint")
  def urlCount(text: Column): Column =
    size(regexp_extract_all(text, lit(urlRe), lit(0))).cast("bigint")

  /** Host part of an http(s) URL (up to the first `/ : ? #`), for
    * domain-level filtering against block/allow lists. */
  def domain(url: Column): Column =
    regexp_extract(url, "https?://([^/\\s:?#]+)", 1)

  /** Replace every match with a typed placeholder. URLs first so an
    * address inside a query string is not half-masked by the email
    * pass; each `regexp_replace` is global. Prefer [[scrub]] when
    * counts AND masked text are both needed: this form re-scans the
    * text once per pattern. */
  def mask(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, urlRe, "[URL]"),
        emailRe, "[EMAIL]"),
      phoneRe, "[PHONE]")

  /** One alternation pattern for the MASK pass; group number
    * identifies the placeholder. The URL branch is FIRST so an address
    * inside a query string resolves as part of its URL — the same
    * precedence [[mask]] gets from running the URL replace before the
    * email replace. */
  private val scrubPattern: Pattern =
    Pattern.compile(s"($urlRe)|($emailRe)|($phoneRe)")
  private val emailPattern: Pattern = Pattern.compile(emailRe)
  private val phonePattern: Pattern = Pattern.compile(phoneRe)
  private val urlPattern: Pattern = Pattern.compile(urlRe)

  /** Detect + mask every PII kind in one compiled UDF call, returning
    * struct<n_emails, n_phones, n_urls, masked>. EXACTLY equals the
    * per-kind count + [[mask]] composition (spec-asserted): counts are
    * raw-text match counts — so an email inside a URL query string
    * still counts as an email, as `regexp_extract_all` would — and the
    * mask is one alternation pass, URL branch first.
    *
    * ONE matcher sweep total (r5 audit item #6; the earlier form swept
    * the text four times and sat at ~3× DuckDB at the 10× point): the
    * alternation pass both builds the mask and counts by group id, and
    * raw-count parity for nested matches comes from re-scanning only
    * the MATCHED SPANS (a phone can only hide inside an email's local
    * part, an email or phone only inside a URL; span charsets make
    * straddling a span boundary impossible since none admit
    * whitespace). PII spans are sparse, so the sub-scans touch a few
    * dozen bytes per document, not the document. Row-local, linear
    * scale-out. */
  private val scrubUdf = udf((s: String) => {
    if (s == null) null
    else {
      // matches of `p` fully inside [from, to) — region bounds are
      // hard bounds, matching the raw sweep for the nesting cases
      // documented above
      def countIn(p: Pattern, from: Int, to: Int): Long = {
        val m = p.matcher(s).region(from, to); var n = 0L
        while (m.find()) n += 1L
        n
      }
      val m = scrubPattern.matcher(s)
      val sb = new java.lang.StringBuilder(s.length)
      var last = 0
      var emails = 0L; var phones = 0L; var urls = 0L
      while (m.find()) {
        sb.append(s, last, m.start())
        if (m.group(1) != null) {
          sb.append("[URL]"); urls += 1L
          emails += countIn(emailPattern, m.start(), m.end())
          phones += countIn(phonePattern, m.start(), m.end())
        } else if (m.group(2) != null) {
          sb.append("[EMAIL]"); emails += 1L
          phones += countIn(phonePattern, m.start(), m.end())
        } else {
          sb.append("[PHONE]"); phones += 1L
        }
        last = m.end()
      }
      sb.append(s, last, s.length)
      (emails, phones, urls, sb.toString)
    }
  })

  /** Single-pass PII scrub; see [[scrubUdf]]. Fields: `_1`=n_emails,
    * `_2`=n_phones, `_3`=n_urls, `_4`=masked text. */
  def scrub(text: Column): Column = scrubUdf(text)
}
