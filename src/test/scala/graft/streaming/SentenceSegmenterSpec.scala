package graft.streaming

import graft.SparkSpec
import graft.fixtures.Fixtures
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class SentenceSegmenterSpec extends SparkSpec {

  test("feed emits completed sentences, buffers the remainder") {
    val (s1, b1) = SentenceSegmenter.feed("", "안녕하세요. 오늘")
    assert(s1 == Seq("안녕하세요.") && b1 == " 오늘")
    val (s2, b2) = SentenceSegmenter.feed(b1, "은 날씨가 좋습니다! 내일")
    assert(s2 == Seq("오늘은 날씨가 좋습니다!") && b2 == " 내일")
  }

  test("golden: fixture stream s1 segments as the reference algorithm") {
    val chunks = Fixtures.tokenStream.filter(_._1 == "s1").sortBy(_._2).map(_._3)
    val out = SentenceSegmenter.segmentAll(chunks)
    assert(out == Seq("안녕하세요.", "오늘은 날씨가 좋습니다!", "내일은 비가 온다고 합니다.",
      "우산을 챙기세요"))
  }

  test("prefix invariance: arbitrary chunking yields the same sentences (200 seeded cases)") {
    val text = "First. Second sentence! Third? 넷째 문장이다。 Fifth\nSixth tail"
    val whole = SentenceSegmenter.segmentAll(Seq(text))
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val cuts = (0 until rnd.nextInt(8)).map(_ => rnd.nextInt(text.length)).sorted
      val pieces = (Seq(0) ++ cuts ++ Seq(text.length)).distinct.sliding(2)
        .map { case Seq(a, b) => text.substring(a, b) }.toSeq
      assert(SentenceSegmenter.segmentAll(pieces) == whole,
        s"mismatch for cuts $cuts")
    }
  }

  test("ST3: feedWithPartial flushes and clears the buffer on trigger") {
    // long unterminated tail → partial emitted, buffer cleared
    val (s1, p1, b1) = SentenceSegmenter.feedWithPartial("",
      "Done. this tail is long enough to trigger a partial flush")
    assert(s1 == Seq("Done."))
    assert(p1.contains("this tail is long enough to trigger a partial flush"))
    assert(b1 == "")
    // short tail → no partial, buffer kept
    val (s2, p2, b2) = SentenceSegmenter.feedWithPartial("", "Hi. tail")
    assert(s2 == Seq("Hi.") && p2.isEmpty && b2 == " tail")
  }

  test("shouldFlushPartial: comma/semicolon endings and ≥20 chars trigger") {
    assert(SentenceSegmenter.shouldFlushPartial("short, "))
    assert(SentenceSegmenter.shouldFlushPartial("clause; "))
    assert(SentenceSegmenter.shouldFlushPartial("x" * 20))
    assert(!SentenceSegmenter.shouldFlushPartial("short"))
  }

  test("segmentStream: keyed state across micro-batches (ST2)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SentenceSegmenter.TokenChunk]
    val query = SentenceSegmenter.segmentStream(input.toDS())
      .writeStream.format("memory").queryName("seg_out")
      .outputMode("append").start()
    try {
      // batch 1: first two chunks of session s1 (sentence completes mid-chunk 2)
      input.addData(SentenceSegmenter.TokenChunk("s1", 0, "안녕하세요. 오늘"),
        SentenceSegmenter.TokenChunk("s1", 1, "은 날씨가 좋"))
      query.processAllAvailable()
      // batch 2: the rest
      input.addData(SentenceSegmenter.TokenChunk("s1", 2, "습니다! 내일은 비"),
        SentenceSegmenter.TokenChunk("s1", 3, "가 온다고 합니다."))
      query.processAllAvailable()
      val out = spark.table("seg_out").as[SentenceSegmenter.Sentence]
        .collect().sortBy(_.idx).map(_.sentence)
      assert(out.toSeq == Seq("안녕하세요.", "오늘은 날씨가 좋습니다!",
        "내일은 비가 온다고 합니다."))
    } finally query.stop()
  }
}
