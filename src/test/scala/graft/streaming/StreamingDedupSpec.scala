package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Real streaming path behind the st_dedup batch stand-in:
  * withWatermark + dropDuplicatesWithinWatermark keyed on event_id. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("re-delivered events dedup across micro-batches while state is live") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val deduped = input.toDS().toDF("event_id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      def t(m: Int) = java.sql.Timestamp.valueOf(f"2025-01-01 10:$m%02d:00")
      input.addData((1L, t(1)), (2L, t(2)))
      q.processAllAvailable()
      // batch 2 re-delivers event 1 inside the watermark horizon
      input.addData((1L, t(3)), (3L, t(4)))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("same dedup semantics on the RocksDB state-store provider") {
    // the 100 TB posture: heap HDFSBackedStateStore holds every live
    // key as JVM objects; RocksDB keeps state off-heap. The provider
    // is a per-query conf — semantics must be identical (the sustained
    // -rate evidence lives in the bench's streaming_state_sustained
    // block; this spec makes the provider swap durable in CI).
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val deduped = input.toDS().toDF("event_id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    // the provider is captured at query START — set it first
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    val q = deduped.writeStream.format("memory").queryName("dedup_out_rocks")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("rocks_ckpt").toString)
      .start()
    try {
      def t(m: Int) = java.sql.Timestamp.valueOf(f"2025-01-01 10:$m%02d:00")
      input.addData((1L, t(1)), (2L, t(2)))
      q.processAllAvailable()
      input.addData((1L, t(3)), (3L, t(4)))
      q.processAllAvailable()
      val ids = spark.table("dedup_out_rocks").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
      // prove the provider swap actually took: RocksDB stores report
      // provider-specific custom metrics absent from the heap provider
      val metrics = q.lastProgress.stateOperators.head
        .customMetrics.keySet().toArray.map(String.valueOf)
      assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
        s"expected RocksDB custom metrics, got ${metrics.mkString(",")}")
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }
  }
}
