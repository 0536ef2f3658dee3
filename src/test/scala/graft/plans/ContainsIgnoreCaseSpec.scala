package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The p6 keyword-filter expression: equivalence to
  * `contains(lower(text), needle)` (the materializing form it
  * replaces), including the two Unicode non-ASCII→ASCII lowercase
  * mappings the needle validator exists for (U+212A KELVIN → k,
  * U+0130 İ → i + combining dot). */
class ContainsIgnoreCaseSpec extends SparkSpec {
  import spark.implicits._

  private val needles = Seq("join", "window", "a", "zz")

  test("equals contains(lower(text)) on a fuzzed corpus incl. unicode") {
    val rnd = new scala.util.Random(42)
    val alphabet =
      "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ 01_ÄöüßΩλ한국語Kİ"
    val rows = (0 until 4000).map { i =>
      val n = rnd.nextInt(40)
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    } ++ Seq("", "JOIN", "jOiN", "WINdow", "prefix JOIN suffix", "wiNDOw",
      "JOİN", "WİNDOW", "KOIN", "joİn",
      "half joi", "oin window j", null)
    val df = rows.toDF("text")
    needles.foreach { kw =>
      val bad = df.select(
          ContainsIgnoreCase.column(col("text"), kw).as("fast"),
          lower(col("text")).contains(kw).as("slow"))
        .filter(coalesce(col("fast") =!= col("slow"), lit(false)) ||
          col("fast").isNull =!= col("slow").isNull)
      assert(bad.count() == 0, s"needle=$kw: " + bad.take(3).mkString("; "))
    }
  }

  test("interpreted eval path agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val cases = Seq("Prefix JOIN tail", "nope", "jOin", "", "JOİN")
    cases.foreach { s =>
      val e = ContainsIgnoreCaseExpr(
        Literal(UTF8String.fromString(s), org.apache.spark.sql.types.StringType),
        Literal("join"))
      assert(e.eval(null) == s.toLowerCase.contains("join"), s)
    }
  }

  test("needle validator rejects the unsound classes") {
    def fails(n: String): Boolean =
      try { ContainsIgnoreCase.column(lit("x"), n); false }
      catch { case _: IllegalArgumentException => true }
    assert(fails("Join"), "uppercase needle")
    assert(fails("kelvin"), "needle containing k")
    assert(fails("toki"), "needle ending in i")
    assert(fails("naïve"), "non-ascii needle")
    assert(!fails("join") && !fails("window") && !fails("i-med-ial"))
  }

  test("null text yields null, empty needle matches everything") {
    val out = Seq(("a", null: String), ("b", "xyz")).toDF("id", "text")
      .select(col("id"), ContainsIgnoreCase.column(col("text"), "x").as("m"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getBoolean(1))))
      .toMap
    assert(out("a").isEmpty && out("b").contains(true))
    assert(ContainsIgnoreCase.containsAsciiFold(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc"),
      org.apache.spark.unsafe.types.UTF8String.fromString("")))
  }
}
