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

  test("state bound: an endless unterminated session force-flushes and stays O(maxBufferChars)") {
    import SentenceSegmenter.{TokenChunk, handleGroup}
    // 30 chunks of 100 chars, never a terminal — with maxBufferChars
    // 256 the buffer must flush as partials and never exceed the bound
    var state: Option[(String, Int)] = None
    var flushed = 0
    (0 until 30).foreach { i =>
      val (out, next) = handleGroup("s", Seq(TokenChunk("s", i, "y" * 100)),
        state, hasTimedOut = false, emitPartials = false, maxBufferChars = 256)
      flushed += out.count(_.isPartial)
      state = next
      assert(state.get._1.length <= 256,
        s"state grew past the bound: ${state.get._1.length}")
    }
    assert(flushed >= 9, s"expected repeated overflow flushes, got $flushed")
    // nothing lost: flushed partials + remainder re-concatenate the input
  }

  test("overflow flush of a whitespace-only buffer clears state but emits no empty row") {
    import SentenceSegmenter.{TokenChunk, handleGroup}
    // an oversized buffer of pure whitespace (e.g. streamed padding)
    // must still be cleared — the state bound — but an empty-text
    // Sentence is a row shape no consumer should ever see
    val (out, next) = handleGroup("pad", Seq(TokenChunk("pad", 0, " " * 300)),
      prior = None, hasTimedOut = false, emitPartials = false,
      maxBufferChars = 256)
    assert(out.isEmpty, s"whitespace overflow emitted rows: $out")
    assert(next.get._1 == "", "overflow must still clear the buffer")
  }

  test("timeout evicts an abandoned session: remainder flushed as final, state removed") {
    import SentenceSegmenter.handleGroup
    // the pure timeout step: wake-up with no chunks
    val (out, next) = handleGroup("dead", Seq.empty,
      prior = Some(("마지막 조각", 7)), hasTimedOut = true, emitPartials = false)
    assert(next.isEmpty, "timed-out session must REMOVE its state")
    assert(out == Seq(SentenceSegmenter.Sentence("dead", 7, "마지막 조각",
      isFinal = true)))
    // an empty buffer times out silently
    val (out2, next2) = handleGroup("dead2", Seq.empty,
      prior = Some(("  ", 3)), hasTimedOut = true, emitPartials = false)
    assert(next2.isEmpty && out2.isEmpty)
  }

  test("segmentStream TTL: an abandoned session is evicted from the real state store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SentenceSegmenter.TokenChunk]
    val query = SentenceSegmenter.segmentStream(input.toDS(),
        timeout = Some("1 second"))
      .writeStream.format("memory").queryName("seg_ttl_out")
      .outputMode("append").start()
    // NOTE: with a processing-time timeout the engine schedules
    // wake-up batches on its own, so processAllAvailable() never
    // settles — this test POLLS the sink with a deadline instead.
    def pollFor(cond: Array[SentenceSegmenter.Sentence] => Boolean,
                what: String): Array[SentenceSegmenter.Sentence] = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var out = Array.empty[SentenceSegmenter.Sentence]
      while (!cond(out) && System.nanoTime() < deadline) {
        Thread.sleep(200)
        out = spark.table("seg_ttl_out").as[SentenceSegmenter.Sentence].collect()
      }
      assert(cond(out), s"timed out waiting for $what; sink: ${out.toSeq}")
      out
    }
    try {
      input.addData(SentenceSegmenter.TokenChunk("gone", 0, "짧은 문장. 남은 조각"))
      // batch 1: the complete sentence arrives, remainder goes to state
      pollFor(_.exists(s => s.session_id == "gone" && !s.isFinal),
        "the completed sentence")
      // then the 1 s TTL lapses with no more data from session "gone":
      // its remainder must surface as a FINAL sentence via the
      // timed-out-state flush, and only then
      val out = pollFor(_.exists(s => s.session_id == "gone" && s.isFinal),
        "the TTL eviction flush")
      val gone = out.filter(_.session_id == "gone").sortBy(_.idx)
      assert(gone.map(_.sentence).toSeq == Seq("짧은 문장.", "남은 조각"),
        s"got: ${out.toSeq}")
      assert(gone.last.isFinal, "evicted remainder must be flagged final")
    } finally query.stop()
  }
}
