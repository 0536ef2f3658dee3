package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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
    * pass; each `regexp_replace` is global. */
  def mask(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, urlRe, "[URL]"),
        emailRe, "[EMAIL]"),
      phoneRe, "[PHONE]")
}
