package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch micro-bench for plan-shape A/B runs during optimization
  * rounds. Each variant is timed with the same noop sink the suite
  * uses. Not part of any contract; kept out of the query registry.
  *
  * Current A/B: the range_join aggregate-pushdown — the enumerating
  * proximity join + count vs TemporalJoin.proximityCount on the same
  * corpus. Run on an otherwise-idle box:
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
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scale/x100")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.range(100000).agg(sum("id")).collect()
    val ev = Tables.load(spark, sfDir, "events")

    def purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"))
    def errors = ev.filter(col("event_type") === "error")
      .select(col("ts").as("e_ts"))

    time("range_join_enumerate", reps) {
      operators.TemporalJoin
        .proximity(purchases,
          ev.filter(col("event_type") === "error")
            .select(col("event_id").as("e_id"), col("ts").as("e_ts")),
          "p_ts", "e_ts", tolSec = 300L)
        .groupBy(to_date(col("p_ts")).as("day"))
        .agg(count(lit(1)).as("n_pairs"),
          count_distinct(col("p_id")).as("n_purchases"))
        .orderBy("day")
    }

    time("range_join_count_pushdown", reps) {
      operators.TemporalJoin
        .proximityCount(purchases, errors, "p_ts", "e_ts", tolSec = 300L)
        .filter(col("n_matches") > 0)
        .groupBy(to_date(col("p_ts")).as("day"))
        .agg(sum("n_matches").as("n_pairs"),
          count(col("p_id")).as("n_purchases"))
        .orderBy("day")
    }

    spark.stop()
  }
}
