package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TimeSeriesOps

/** Pins the r19 optimization-round query rewrites to the exact forms
  * they replaced, on the real sf0.001 tables (the committed registry
  * entry vs the pre-r19 form, row-for-row including order):
  *  - text_tokens: CountByte(+1) token count == size(split) count;
  *  - st_dedup: two hash aggregates == keyed row_number window;
  *  - date_functions: format-after-top-50 == format-before-top-50;
  *  - a9_longest_run / ratio_split: the subset-partitioning
  *    repartition is plan-only — results equal the unpartitioned form.
  */
class R19FormsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSeq

  test("text_tokens: countChar form equals size(split) form") {
    val got = rows(SparkEntry.queries("text_tokens")(spark, dir))
    val old = rows(Tables.load(spark, dir, "documents")
      .groupBy("lang")
      .agg(sum(size(split(col("text"), " "))).as("n_tokens"),
        count(lit(1)).as("n_docs"))
      .orderBy("lang"))
    assert(got == old)
  }

  test("st_dedup: aggregate form equals row_number window form") {
    val got = rows(SparkEntry.queries("st_dedup")(spark, dir))
    val e = Tables.load(spark, dir, "events").filter(col("user_id") < 8)
      .select(col("event_id"), col("user_id"))
    val arrivals = e.withColumn("_src", lit(0))
      .unionByName(e.filter(col("event_id") % 50 === 0)
        .withColumn("_src", lit(1)))
      .withColumn("_arr",
        (col("event_id") * 2654435761L) % 1000003L + col("_src") * 2000000L)
    val w = Window.partitionBy(col("event_id")).orderBy(col("_arr"))
    val old = rows(arrivals.withColumn("rn", row_number().over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_arrivals"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_unique"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dropped"))
      .coalesce(1).sortWithinPartitions("user_id"))
    assert(got == old)
  }

  test("date_functions: format-after-limit equals format-before-limit") {
    val got = rows(SparkEntry.queries("date_functions")(spark, dir))
    val old = rows(Tables.load(spark, dir, "events")
      .filter(col("user_id") === 3)
      .select(col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("iso"),
        date_add(TimeSeriesOps.utcDay(col("ts")), 1).as("next_day"),
        date_format(col("ts"), "HH:mm").as("hhmm"))
      .orderBy("event_id").limit(50))
    assert(got.nonEmpty && got == old)
  }

  test("a9_longest_run: pre-agg repartition is result-identical") {
    val got = rows(SparkEntry.queries("a9_longest_run")(spark, dir))
    val daily = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase" && col("user_id") < 50)
      .groupBy(col("user_id"), TimeSeriesOps.utcDay(col("ts")).as("day"))
      .agg(count(lit(1)).as("v"))
    val old = rows(
      TimeSeriesOps.longestConsecutiveRun(daily, Seq("user_id"), "day")
        .select("user_id", "run_len", "run_start")
        .coalesce(1).sortWithinPartitions("user_id"))
    assert(got == old)
  }

  test("ratio_split: pre-distinct repartition is result-identical") {
    val got = rows(SparkEntry.queries("ratio_split")(spark, dir))
    val daily = Tables.load(spark, dir, "events").filter(col("user_id") < 5)
      .select(col("user_id"), TimeSeriesOps.utcDay(col("ts")).as("day"))
      .distinct()
    val old = rows(
      TimeSeriesOps.ratioSplit(daily, Seq("user_id"), "day", (7, 2, 1))
        .groupBy("user_id", "split").agg(count(lit(1)).as("n_rows"))
        .coalesce(1).sortWithinPartitions("user_id", "split"))
    assert(got == old)
  }
}
