package graft.search

import graft.SparkSpec
import graft.fixtures.Fixtures
import graft.ingest.Ingest
import org.apache.spark.sql.functions._

/** SURVEY §7.2 minimum end-to-end slice: ingest the knowledge fixture,
  * query it, assert the retrieval pipeline's behavior. */
class SearchPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val index = {
    val k = Fixtures.knowledge(spark)
    val schema = Ingest.inferSchema(k.columns.toSeq)
    Ingest.buildIndex(k, schema, "knowledge", dim = 512).cache()
  }

  test("anchorsFromQuery: weak terms removed, domain synonyms expanded") {
    val a = SearchPipeline.anchorsFromQuery("Self-Attention이 뭐야?")
    assert(a.strong.contains("self-attention"))
    assert(a.strong.contains("셀프어텐션"))
    assert(a.strong.contains("attention")) // "attention" substring triggers too
    assert(!a.strong.contains("뭐야"))
    val b = SearchPipeline.anchorsFromQuery("RAG 기술을 설명해")
    assert(b.strong.contains("rag"))
    // suffix-glued form stays a plain token (unicode \\b, python parity)
    assert(SearchPipeline.anchorsFromQuery("RAG의 역할을").strong.contains("rag의"))
    assert(b.weak.contains("설명해") || !b.strong.contains("설명해"))
  }

  test("end-to-end: Self-Attention question retrieves the Self-Attention doc first") {
    val kept = SearchPipeline.search(index, "Self-Attention이 뭐야?",
      topK = 5, margin = 0.5, simFloor = 0.0, dim = 512)
    val rows = kept.select("marker", "oo").as[(String, String)].collect()
    assert(rows.nonEmpty)
    assert(rows.head._1 == "S1")
    assert(rows.head._2 == "Self-Attention")
    // anchor filter held: every kept doc mentions an anchor
    val contents = kept.select("content", "title").as[(String, String)].collect()
    assert(contents.forall { case (c, t) =>
      (c + t).toLowerCase.contains("attention") || (c + t).contains("어텐션")
    })
  }

  test("strong-anchor filter drops non-matching docs entirely") {
    val kept = SearchPipeline.search(index, "FAISS가 뭐야?",
      topK = 7, margin = 1.0, simFloor = 0.0, dim = 512)
    val oos = kept.select("oo").as[String].collect().toSet
    assert(oos.contains("FAISS"))
    // with margin 1.0 nothing is margin-cut, so the filter is what prunes:
    // every kept doc must contain "faiss"
    val contents = kept.select("content", "title").as[(String, String)].collect()
    assert(contents.forall { case (c, t) => (c + t).toLowerCase.contains("faiss") })
  }

  test("margin filter monotonicity: larger margin keeps a superset") {
    def ids(m: Double) = SearchPipeline.search(index, "임베딩이 뭐야?",
      topK = 10, margin = m, simFloor = 0.0, dim = 512)
      .select("chunk_id").as[Long].collect().toSet
    val small = ids(0.05)
    val large = ids(0.8)
    assert(small.subsetOf(large))
  }

  test("markedContext respects the char budget and 900-char snippet cap") {
    val kept = Seq(
      ("S1", "1", "t1", "OO1", 0.9, "a" * 1000),
      ("S2", "2", "t2", "OO2", 0.8, "b" * 1000),
      ("S3", "3", "t3", "OO3", 0.7, "c" * 1000))
    val ctx = SearchPipeline.markedContext(kept, maxContextChars = 1500)
    assert(ctx.startsWith("<CONTEXT>") && ctx.endsWith("</CONTEXT>"))
    assert(ctx.contains("《S1》") && ctx.contains("《S2》"))
    assert(!ctx.contains("《S3》")) // budget exhausted: 900 + 600
    assert(ctx.contains("…"))      // snippet-cap ellipsis
    val bBlock = ctx.split("《S2》")(1)
    assert(bBlock.count(_ == 'b') == 599) // 1500 - 901 (S1 incl. ellipsis) = 599
  }

  test("markers are deterministic on multi-partition input (repartition(8))") {
    // markers must come from the diversify rank, not physical row ids —
    // monotonically_increasing_id would reorder once the index has >1
    // partition (the round-2 review's named hazard)
    def run(idx: org.apache.spark.sql.DataFrame) =
      SearchPipeline.search(idx, "Self-Attention이 뭐야?",
        topK = 5, margin = 0.5, simFloor = 0.0, dim = 512)
        .select("marker", "chunk_id").as[(String, Long)].collect().toSeq
    val single = run(index)
    val multi = run(index.repartition(8))
    assert(single.nonEmpty)
    assert(single.sortBy(_._1) == multi.sortBy(_._1),
      s"marker assignment changed under repartition: $single vs $multi")
  }

  test("sources manifest carries marker/id/title/OO/rounded score") {
    // note: "Transformer란?" would glue into one token ("transformer란")
    // and anchor-miss every doc — reference behavior; use a standalone token
    val kept = SearchPipeline.search(index, "Transformer 구조를 설명해", topK = 3,
      margin = 0.5, simFloor = 0.0, dim = 512)
    val src = SearchPipeline.sources(kept).collect()
    assert(src.nonEmpty)
    assert(src.head.schema.fieldNames.toSeq ==
      Seq("marker", "id", "title", "oo", "score"))
  }
}
