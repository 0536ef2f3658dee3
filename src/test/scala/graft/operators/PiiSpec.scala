package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String): (Long, Long, Long, String) = {
    val r = Seq(Tuple1(text)).toDF("t")
      .select(Pii.emailCount(col("t")).as("e"), Pii.phoneCount(col("t")).as("p"),
        Pii.urlCount(col("t")).as("u"), Pii.mask(col("t")).as("m"))
      .as[(Long, Long, Long, String)].collect().head
    r
  }

  test("detects and masks each PII type with typed placeholders") {
    val (e, p, u, m) = one(
      "mail a.b+c@sub.example.co.kr or call +82-10-1234-5678, docs at " +
        "https://example.org/a?b=1 thanks")
    assert((e, p, u) == (1L, 1L, 1L))
    assert(m == "mail [EMAIL] or call [PHONE], docs at [URL] thanks")
  }

  test("counts multiple occurrences and leaves clean text untouched") {
    val (e, _, _, m) = one("x@y.io then z@w.ai")
    assert(e == 2L && m == "[EMAIL] then [EMAIL]")
    val clean = "no personal data in this perfectly ordinary sentence 12-34"
    assert(one(clean) == ((0L, 0L, 0L, clean)))
  }

  test("an email inside a URL query string masks as URL, not half-email") {
    val (_, _, u, m) = one("see https://t.co/q?mail=a@b.com end")
    assert(u == 1L)
    assert(m == "see [URL] end")
  }

  test("scanner matches java-regex semantics on adversarial shapes") {
    // each case targets a specific backtracking/restart behavior the
    // hand-rolled scanner must reproduce exactly
    val texts = Seq(
      "a@b.co-x@y.com",              // match ends mid-run; find() restarts inside the run
      "+82-10-1234-5678abc@x.com",   // email branch beats phone at the same '+' start
      "xhttps://a b",                // URL starting mid-local-run
      "a@@b.com",                    // empty domain -> no email anywhere
      "+123456-10-1234-5678",        // country-code digit run too long
      "a@b.com.x12",                 // TLD backtracks to the rightmost valid '.'
      "a@b.co-uk",                   // TLD run stops at '-'
      "++a@b.com",                   // '+' chars in the local part
      "%%@b.c",                      // 1-letter TLD -> no match
      "+82-10-1234-56789",           // phone match ends, trailing digit survives
      "h+1-22-333-4444",             // failed URL trigger then phone mid-run
      "+1-22-333-4444",              // phone flush at end of string
      "https://x.y/?a=1&b=%20#f g",  // URL eats every non-space char
      "tab\thttps://a.b\nnext +9-99-999-9999 a_b%c@d.ee end",
      "a.b@x.y.z.co! and (c@d.org),")
    val df = texts.toDF("t")
    val viaScrub = df.select(Pii.scrub(col("t")).as("s"))
      .select(col("s._1"), col("s._2"), col("s._3"), col("s._4"))
      .as[(Long, Long, Long, String)].collect().toSeq
    val viaParts = df.select(Pii.emailCount(col("t")), Pii.phoneCount(col("t")),
        Pii.urlCount(col("t")), Pii.mask(col("t")))
      .as[(Long, Long, Long, String)].collect().toSeq
    texts.indices.foreach { i =>
      assert(viaScrub(i) == viaParts(i),
        s"parity break on '${texts(i)}': scanner=${viaScrub(i)} regex=${viaParts(i)}")
    }
  }

  test("single-pass scrub equals the per-kind count + mask composition") {
    val texts = Seq(
      "mail a.b+c@sub.example.co.kr or call +82-10-1234-5678, docs at " +
        "https://example.org/a?b=1 thanks",
      "x@y.io then z@w.ai",
      "no personal data in this perfectly ordinary sentence 12-34",
      "see https://t.co/q?mail=a@b.com end",
      "+1-212-555-0100 and +82-2-123-4567 twice",
      "")
    val df = texts.toDF("t")
    val viaScrub = df.select(Pii.scrub(col("t")).as("s"))
      .select(col("s._1"), col("s._2"), col("s._3"), col("s._4"))
      .as[(Long, Long, Long, String)].collect().toSeq
    val viaParts = df.select(Pii.emailCount(col("t")), Pii.phoneCount(col("t")),
        Pii.urlCount(col("t")), Pii.mask(col("t")))
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(viaScrub == viaParts)
  }
}
