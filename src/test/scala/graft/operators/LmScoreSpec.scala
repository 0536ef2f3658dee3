package graft.operators

import graft.SparkSpec

class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  private def assertApprox(a: Double, b: Double): Unit =
    assert(math.abs(a - b) < 1e-12, s"$a vs $b")

  test("common-word docs score above rare-word docs; probs sum correctly") {
    // corpus: "the" appears 6×, each rare word once → total 10 tokens
    val docs = Seq(
      (1L, "the the the the the the"),
      (2L, "aardvark quux zyzzyva wombat")).toDF("id", "text")
    val out = TextAnalysis.corpusLmScore(docs, "id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val Array((_, n1, s1), (_, n2, s2)) = out
    assert(n1 == 6L && n2 == 4L)
    assertApprox(s1, math.log(0.6))
    assertApprox(s2, math.log(0.1))
    assert(s1 > s2)
  }
}
