package graft.streaming

import graft.SparkSpec
import graft.fixtures.Fixtures
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamFramingSpec extends SparkSpec {
  import spark.implicits._

  test("ST1: sseFrame wraps payloads") {
    val out = Seq("""{"x":1}""").toDF("p")
      .select(StreamFraming.sseFrame($"p")).as[String].head()
    assert(out == "data: {\"x\":1}\n\n")
  }

  test("ST4: rechunk splits text into n-char pieces covering the input") {
    val out = Seq(("a", "0123456789ABCDEFGHIJX")).toDF("id", "text")
    val chunks = StreamFraming.rechunk(out, $"text", 10)
      .select("chunk_idx", "chunk").as[(Int, String)].collect().sortBy(_._1)
    assert(chunks.map(_._2).toSeq == Seq("0123456789", "ABCDEFGHIJ", "X"))
  }

  test("ST5: progressEvents emits the staged table") {
    val df = StreamFraming.progressEvents(spark,
      Seq("검색 시작" -> 5, "수집" -> 50, "완료" -> 100))
    assert(df.select("pct").as[Int].collect().toSeq == Seq(5, 50, 100))
  }

  test("ST6: accumulate rebuilds per-session text in seq order") {
    val out = StreamFraming.accumulate(
      Fixtures.tokenStream.toDF("session_id", "seq", "chunk"),
      "session_id", "seq", "chunk")
      .as[(String, String)].collect().toMap
    assert(out("s1") == "안녕하세요. 오늘은 날씨가 좋습니다! 내일은 비가 온다고 합니다. 우산을 챙기세요")
    assert(out("s2").startsWith("First sentence here. Second one continues,"))
  }

  test("event-time tumbling window with watermark (engine capability beyond reference)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val windowed = input.toDS().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"), $"k")
      .agg(count(lit(1)).as("n"))
    val q = windowed.writeStream.format("memory").queryName("win_out")
      .outputMode("update").start()
    try {
      def t(m: Int) = java.sql.Timestamp.valueOf(f"2025-01-01 10:$m%02d:00")
      input.addData((t(1), "a"), (t(2), "a"), (t(7), "a"))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select($"window.start".cast("string"), $"n").as[(String, Long)]
        .collect().toMap
      assert(rows("2025-01-01 10:00:00") == 2L)
      assert(rows("2025-01-01 10:05:00") == 1L)
    } finally q.stop()
  }

  test("watermark drops too-late events (§2.9 late-data drop, st_watermark's streaming path)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val windowed = input.toDS().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = windowed.writeStream.format("memory").queryName("wm_drop")
      .outputMode("update").start()
    try {
      def t(m: Int) = java.sql.Timestamp.valueOf(f"2025-01-01 10:$m%02d:00")
      input.addData((t(1), "a"), (t(2), "a")) // window 10:00 → n=2
      q.processAllAvailable()
      input.addData((t(30), "a")) // advances watermark to 10:20
      q.processAllAvailable()
      input.addData((t(3), "a")) // late: its window closed at 10:05 ≤ 10:20
      q.processAllAvailable()
      val n = spark.table("wm_drop")
        .filter($"window.start".cast("string") === "2025-01-01 10:00:00")
        .agg(max($"n")).as[Long].head()
      assert(n == 2L, "late event must not reopen/increment a closed window")
    } finally q.stop()
  }
}
