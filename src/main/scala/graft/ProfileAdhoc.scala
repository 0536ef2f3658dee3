package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch micro-bench for plan-shape A/B runs during optimization
  * rounds. Each variant is timed with the same noop sink the suite
  * uses. Not part of any contract; kept out of the query registry. */
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
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "4").toInt
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.range(100000).agg(sum("id")).collect()
    val ev = Tables.load(spark, sfDir, "events")

    time("scan_agg_avg", reps)(ev.agg(avg("value")))
    time("scan_group_avg", reps)(ev.groupBy("event_type").agg(avg("value")))

    time("a13_current", reps) {
      val m = ev.groupBy("event_type").agg(avg("value").as("pred"))
      ev.join(broadcast(m), "event_type").agg(
        round(graft.operators.TimeSeriesOps.rmse(col("value"), col("pred")), 4).as("rmse"),
        round(graft.operators.TimeSeriesOps.r2Agg(col("value"), col("pred")), 6).as("r2"),
        round(graft.operators.TimeSeriesOps.smape(col("value"), col("pred")), 4).as("smape"))
    }

    time("a13_maplit", reps) {
      // collect the (bounded) group means and inline them as a literal
      // map: the second pass becomes a single scan+agg with no join
      val means = ev.groupBy("event_type").agg(avg("value").as("pred"))
        .limit(1001).collect()
      require(means.length <= 1000, "too many groups for map-literal path")
      val m = map(means.flatMap(r => Seq(lit(r.getString(0)), lit(r.getDouble(1)))): _*)
      val withPred = ev.select(col("value"), m(col("event_type")).as("pred"))
        .filter(col("pred").isNotNull)
      withPred.agg(
        round(graft.operators.TimeSeriesOps.rmse(col("value"), col("pred")), 4).as("rmse"),
        round(graft.operators.TimeSeriesOps.r2Agg(col("value"), col("pred")), 6).as("r2"),
        round(graft.operators.TimeSeriesOps.smape(col("value"), col("pred")), 4).as("smape"))
    }

    time("dedup_only", reps)(ev.select("event_type", "user_id").distinct())
    time("approx_only", reps)(ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users")))
    time("dedup_long_key", reps)(
      // pack the pair into one long via a hash of the type + the id:
      // only to measure how much of dedup cost is the string key
      ev.select((hash(col("event_type")).cast("long") * 2000000L + col("user_id")).as("k"))
        .distinct())
    time("approx_current", reps) {
      ev.groupBy("event_type")
        .agg(count_distinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
        .select(col("event_type"), col("exact_users"),
          when(abs(col("approx_users") - col("exact_users")) <=
            col("exact_users") * 0.05, 1L).otherwise(0L).as("within_5pct"))
        .orderBy("event_type")
    }

    time("approx_distinct_first", reps) {
      ev.select("event_type", "user_id").distinct()
        .groupBy("event_type")
        .agg(count(lit(1)).as("exact_users"),
          approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
        .select(col("event_type"), col("exact_users"),
          when(abs(col("approx_users") - col("exact_users")) <=
            col("exact_users") * 0.05, 1L).otherwise(0L).as("within_5pct"))
        .orderBy("event_type")
    }

    val li = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_extendedprice")
    val ord = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    def aggJoin(j: DataFrame): DataFrame =
      j.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("revenue"))
        .orderBy("o_orderpriority")
    time("join_plain", reps)(aggJoin(li.join(ord, Seq("l_orderkey"))))
    time("join_salted_hot8", reps) {
      val hot = li.sample(withReplacement = false, 0.05, 42L)
        .groupBy("l_orderkey").count()
        .orderBy(desc("count"), col("l_orderkey"))
        .limit(8).select("l_orderkey").collect().map(_.get(0)).toSeq
      aggJoin(graft.operators.Relational.skewJoin(li, ord, "l_orderkey", 4,
        hotKeys = Some(hot)))
    }
    time("join_salted_cached_hot", reps) {
      aggJoin(graft.operators.Relational.skewJoin(li, ord, "l_orderkey", 4,
        hotKeys = Some(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L))))
    }

    spark.stop()
  }
}
