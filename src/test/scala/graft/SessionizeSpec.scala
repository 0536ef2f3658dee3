package graft

import org.apache.spark.sql.functions._

/** Pins the r18 sessionize rewrite (lag/cumsum gaps-and-islands in
  * int64 micros) to the session_window form it replaced, on the real
  * sf0.001 events table AND on a synthetic stream that plants the
  * exact-30-minute boundary the two forms could disagree on (the lag
  * form starts a new session only on a STRICT > 30 min gap — the
  * oracle's rule; session_window closes at >=). */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  // the committed lag-form query loads its own sf0.001 events —
  // windowForm below takes the SAME Tables.load frame, so both sides
  // read one table (r18 advisory: a df parameter here was ignored,
  // silently comparing two independently-loaded datasets)
  private def lagForm() =
    SparkEntry.queries("sessionize")(spark, "/root/testdata/sf0.001")

  private def windowForm(df: org.apache.spark.sql.DataFrame) =
    df.filter(col("user_id") < 10)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum("n_events").cast("bigint").as("total_events"),
        max("n_events").as("max_session_events"))
      .orderBy("user_id")

  test("lag form equals session_window form on sf0.001 events") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val a = lagForm().collect().toSeq
    val b = windowForm(ev).collect().toSeq
    assert(a == b)
  }

  test("exact-30-minute gap stays one session (the oracle's strict-> rule)") {
    // user 1: gaps of exactly 30 min (same session under >), then a
    // 30 min + 1 us gap (new session under both rules)
    val us30 = 30L * 60 * 1000000
    val rows = Seq(
      (1L, 0L), (1L, us30), (1L, 2 * us30),          // one session of 3
      (1L, 3 * us30 + 1L),                           // strict break → second
      (2L, 0L), (2L, us30 * 10))                     // two singletons
    val ev = rows.toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
    // re-run the query body's lag logic on the probe rows
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("tsu")
    val got = ev.select(col("user_id"), unix_micros(col("ts")).as("tsu"))
      .withColumn("new_sess",
        when(col("tsu") - lag("tsu", 1).over(byUser) > lit(us30), 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum("new_sess").over(byUser))
      .groupBy("user_id", "sess_id").agg(count(lit(1)).as("n"))
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"),
        max("n").as("max_n"))
      .as[(Long, Long, Long)].collect().toMap2
    assert(got(1L) == ((2L, 3L)), s"user1: ${got(1L)}")
    assert(got(2L) == ((2L, 1L)))
  }

  private implicit class Triples(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long)] =
      rows.map { case (a, b, c) => a -> (b, c) }.toMap
  }
}
