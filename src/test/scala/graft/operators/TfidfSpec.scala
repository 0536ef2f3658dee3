package graft.operators

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class TfidfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")

  test("row-local top-k equals the window form exactly") {
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("rnk").cast("long"), col("tok"),
          col("tf").cast("long"), col("tfidf"))
        .as[(Long, Long, String, Long, Double)].collect().toSeq.sorted
    val win = norm(TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", 3))
    val loc = norm(TextAnalysis.tfidfTopTermsRowLocal(docs, "doc_id", "text", 3))
    assert(win.nonEmpty)
    assert(loc == win) // incl. bit-identical tfidf doubles and tie-breaks
  }

  test("row-local form fails loudly when the vocabulary exceeds the bound") {
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.tfidfTopTermsRowLocal(docs, "doc_id", "text", 3, maxVocab = 2)
        .collect()
    }
    assert(e.getMessage.contains("vocabulary exceeds"))
  }
}
