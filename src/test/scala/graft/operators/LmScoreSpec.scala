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

  test("row-local form equals the broadcast-join form at the query contract") {
    // r20: the kernel scorer accumulates Σ tf·ln(p) in its table
    // order; the old UDF used scala-HashMap order (which happened to
    // coincide with the join form's pair order, hence the former
    // bit-exact pin). All orders agree to reassociation ulps; the
    // DECLARED contract — the lm_score query and its DuckDB oracle —
    // rounds avg_logp to 4 decimals, so the pin here is: n_tokens
    // exact, avg_logp within 1e-12 absolute AND equal after round-4.
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_tokens", "avg_logp")
        .as[(Long, Long, Double)].collect().toSeq.sorted
    val joined = norm(TextAnalysis.corpusLmScore(docs, "doc_id", "text"))
    val local = norm(TextAnalysis.corpusLmScoreRowLocal(docs, "doc_id", "text"))
    assert(joined.nonEmpty && local.size == joined.size)
    local.zip(joined).foreach { case ((di, ni, ai), (dj, nj, aj)) =>
      assert(di == dj && ni == nj, s"doc $di")
      assert(math.abs(ai - aj) < 1e-12, s"doc $di: $ai vs $aj")
      assert(BigDecimal(ai).setScale(4, BigDecimal.RoundingMode.HALF_UP) ==
        BigDecimal(aj).setScale(4, BigDecimal.RoundingMode.HALF_UP),
        s"doc $di rounds apart: $ai vs $aj")
    }
  }

  test("row-local form drops empty-profile docs like the join form") {
    val docs = Seq((1L, "a b a"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val local = TextAnalysis.corpusLmScoreRowLocal(docs, "id", "text")
      .select("id").as[Long].collect().toSeq
    assert(local == Seq(1L))
  }

  test("row-local form fails loudly when the vocabulary exceeds the bound") {
    val docs = Seq((1L, "a b c d e f")).toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.corpusLmScoreRowLocal(docs, "id", "text", maxVocab = 2)
    }
    assert(e.getMessage.contains("vocabulary exceeds"))
  }
}
