package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CountByte: the in-place token-count primitive must agree exactly
  * with the allocation-heavy length arithmetic it replaced, including
  * on multi-byte (Korean) text where byte- vs codepoint-counting
  * could diverge if the ASCII invariant were wrong. */
class StringCountSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "plain ascii words here",
    "", // empty
    "   ", // spaces only
    "no-spaces",
    "한국어 텍스트 with mixed ascii", // multi-byte + spaces
    "ends with space ",
    " leading", // leading space
    "tab\tand\nnewline stay uncounted",
    "한글만있는문자열") // multi-byte, no spaces

  test("countByte equals length(translate) arithmetic on every shape") {
    val df = texts.toDF("t")
    val rows = df.select(
      StringCount.countChar(col("t"), ' ').as("fast"),
      (length(col("t")) - length(translate(col("t"), " ", ""))).cast("long")
        .as("slow")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("interpreted eval matches codegen (null-safe)") {
    val df = (texts.map(Option(_)) :+ None).toDF("t")
    // filter forces a non-codegen interpreted path via eval on literals
    val fast = df.select(StringCount.countChar(col("t"), ' ').as("c")).collect()
    texts.zip(fast).foreach { case (t, r) =>
      assert(r.getLong(0) == t.count(_ == ' '), t)
    }
    assert(fast.last.isNullAt(0), "null input must yield null")
  }

  test("non-ASCII target char is rejected loudly") {
    intercept[IllegalArgumentException] {
      StringCount.countChar(col("t"), '한')
    }
  }
}
