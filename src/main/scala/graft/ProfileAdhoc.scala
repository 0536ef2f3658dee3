package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TimeSeriesOps

/** Scratch micro-bench for plan-shape A/B runs during optimization
  * rounds. Each variant is timed with the same noop sink the suite
  * uses. Not part of any contract; kept out of the query registry.
  *
  * Current A/B (r19): the subset-partitioning fusion on
  * a9_longest_run / ratio_split. The `repartition(user_id)` BEFORE the
  * first aggregation drops one exchange (2 → 1) but moves map-side
  * combine post-shuffle — raw filtered rows ship instead of aggregated
  * (user, day) pairs. At sf0.1 the exchange count dominates; at
  * x100/x1000 the shipped-bytes term may flip the trade. Run on an
  * otherwise-idle box at each scale dir:
  *   SPARK_GRAFT_SF_DIR=/tmp/scale/x100 sbt "runMain graft.ProfileAdhoc"
  */
object ProfileAdhoc {
  private def time(name: String, reps: Int)(mk: => DataFrame): Unit = {
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      mk.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[adhoc] $name%-28s min=${ts.min}%.3f median=${ts.sorted.apply(reps / 2)}%.3f")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.range(100000).agg(sum("id")).collect()

    def evA9 = Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "purchase" && col("user_id") < 50)
    def a9Tail(daily: DataFrame) =
      TimeSeriesOps.longestConsecutiveRun(daily, Seq("user_id"), "day")
        .select("user_id", "run_len", "run_start")
        .coalesce(1).sortWithinPartitions("user_id")

    time("a9_agg_first (2 exch)", reps) {
      a9Tail(evA9
        .groupBy(col("user_id"), TimeSeriesOps.utcDay(col("ts")).as("day"))
        .agg(count(lit(1)).as("v")))
    }
    time("a9_repart_first (1 exch)", reps) {
      a9Tail(evA9.repartition(col("user_id"))
        .groupBy(col("user_id"), TimeSeriesOps.utcDay(col("ts")).as("day"))
        .agg(count(lit(1)).as("v")))
    }

    def evRs = Tables.load(spark, sfDir, "events").filter(col("user_id") < 5)
      .select(col("user_id"), TimeSeriesOps.utcDay(col("ts")).as("day"))
    def rsTail(daily: DataFrame) =
      TimeSeriesOps.ratioSplit(daily, Seq("user_id"), "day", (7, 2, 1))
        .groupBy("user_id", "split").agg(count(lit(1)).as("n_rows"))
        .coalesce(1).sortWithinPartitions("user_id", "split")

    time("rs_distinct_first (2 exch)", reps) {
      rsTail(evRs.distinct())
    }
    time("rs_repart_first (1 exch)", reps) {
      rsTail(evRs.repartition(col("user_id")).distinct())
    }

    spark.stop()
  }
}
