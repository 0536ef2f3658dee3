package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def stats(text: String): Row =
    Seq(Tuple1(text)).toDF("text")
      .select(TextAnalysis.repetition(col("text")).as("r"))
      .select("r.*").collect().head

  test("clean text: all tokens distinct, no repeated n-grams") {
    val r = stats("alpha beta gamma delta epsilon")
    assert(r.getAs[Long]("n_tokens") == 5L)
    assert(r.getAs[Double]("distinct_ratio") == 1.0)
    assert(r.getAs[Double]("top2_frac") == 0.25) // 4 distinct 2-grams, top count 1
    assert(r.getAs[Double]("dup2_frac") == 0.0)
    assert(r.getAs[Double]("dup3_frac") == 0.0)
  }

  test("pure boilerplate: one phrase repeated") {
    // "spam ham spam ham spam ham": 2-grams = [sh, hs, sh, hs, sh] →
    // top "spam ham" 3/5, every occurrence repeated
    val r = stats("spam ham spam ham spam ham")
    assert(r.getAs[Long]("n_tokens") == 6L)
    assert(r.getAs[Double]("distinct_ratio") == 2.0 / 6)
    assert(r.getAs[Double]("top2_frac") == 3.0 / 5)
    assert(r.getAs[Double]("dup2_frac") == 1.0)
    assert(r.getAs[Double]("dup3_frac") == 1.0) // shs×2, hsh×2 of 4
  }

  test("degenerate inputs yield zeros, not nulls or NaN") {
    for (t <- Seq(null, "", "solo", "two tokens")) {
      val r = stats(t)
      assert(!r.anyNull, s"null field for input '$t'")
      assert(r.getAs[Double]("dup3_frac") == 0.0)
    }
  }

  test("repetitionKeep drops the boilerplate doc and keeps clean prose") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "buy now buy now buy now buy now buy now buy now")
    ).toDF("id", "text")
      .withColumn("r", TextAnalysis.repetition(col("text")))
      .filter(TextAnalysis.repetitionKeep(col("r")))
    assert(df.select("id").as[Long].collect().toSeq == Seq(1L))
  }
}
