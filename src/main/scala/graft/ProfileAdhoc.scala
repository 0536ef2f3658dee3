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

    // date_parts: two per-row calendar extractions (year + month each
    // convert epoch-days via LocalDate) + a two-long-column hash key,
    // vs ONE trunc-to-month conversion per row with a primitive int
    // (DateType) key and the y/m extraction moved to the ~84 groups.
    def liDp = Tables.load(spark, sfDir, "lineitem")
    time("dp_year_month_keys", reps) {
      liDp.groupBy(year(col("l_shipdate")).cast("bigint").as("y"),
          month(col("l_shipdate")).cast("bigint").as("m"))
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
        .coalesce(1).sortWithinPartitions("y", "m")
    }
    time("dp_trunc_month_key", reps) {
      liDp.groupBy(trunc(col("l_shipdate"), "month").as("_ms"))
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
        .select(year(col("_ms")).cast("bigint").as("y"),
          month(col("_ms")).cast("bigint").as("m"), col("n"), col("qty"))
        .coalesce(1).sortWithinPartitions("y", "m")
    }

    // bare-scan floors for the x1000 tail family: each is the
    // pushdown-pruned scan + a keyless agg over exactly the columns
    // the corresponding query reads — the physical floor its isolated
    // wall is certified against (guide §1.3: napkin math per query).
    def ev = Tables.load(spark, sfDir, "events")
    def docs = Tables.load(spark, sfDir, "documents")
    def ord = Tables.load(spark, sfDir, "orders")
    time("floor dp: li(shipdate,qty)", reps)(
      liDp.agg(count(lit(1)), sum("l_quantity"), max("l_shipdate")))
    time("floor sessionize: ev u<10 (uid,ts)", reps)(
      ev.filter(col("user_id") < 10).agg(count(lit(1)), max("ts")))
    time("floor date_functions: ev u=3 (eid,ts)", reps)(
      ev.filter(col("user_id") === 3).agg(count(lit(1)), max("event_id"), max("ts")))
    time("floor st_w/st_d: ev u<8 (eid,uid,ts)", reps)(
      ev.filter(col("user_id") < 8).agg(count(lit(1)), max("event_id"), max("ts")))
    time("floor w5: ev u<5 (uid,eid,value)", reps)(
      ev.filter(col("user_id") < 5).agg(count(lit(1)), max("event_id"), sum("value")))
    time("floor a13: ev (type,value) x2 pass", reps)(
      ev.agg(count(col("event_type")), sum("value")))
    time("floor approx_distinct: ev (type,uid)", reps)(
      ev.agg(count(col("event_type")), max("user_id")))
    time("floor sort_multikey: ord 3 cols", reps)(
      ord.agg(max("o_orderdate"), max("o_orderkey"), count(col("o_orderstatus"))))
    time("floor url/mm: docs (doc_id only)", reps)(
      docs.agg(count(lit(1)), max("doc_id")))
    time("floor text_tokens: docs (lang,text)", reps)(
      docs.agg(count(col("lang")), sum(length(col("text")))))

    // st_dedup arrival synthesis: UNION (two event scans) vs EXPLODE
    // (one scan, the re-delivery generated inline) feeding the same
    // two-aggregate count chain.
    def stTail(arrivals: DataFrame) =
      arrivals.groupBy("event_id", "user_id").agg(count(lit(1)).as("_cnt"))
        .groupBy("user_id")
        .agg(sum(col("_cnt")).as("n_arrivals"),
          count(lit(1)).as("n_unique"),
          sum(col("_cnt") - lit(1L)).as("n_dropped"))
        .coalesce(1).sortWithinPartitions("user_id")
    def e8 = ev.filter(col("user_id") < 8).select(col("event_id"), col("user_id"))
    time("st_dedup union (2 scans)", reps) {
      stTail(e8.withColumn("_src", lit(0))
        .unionByName(e8.filter(col("event_id") % 50 === 0)
          .withColumn("_src", lit(1))))
    }
    time("st_dedup explode (1 scan)", reps) {
      stTail(e8.select(col("event_id"), col("user_id"),
        explode(when(col("event_id") % 50 === 0, array(lit(0), lit(1)))
          .otherwise(array(lit(0)))).as("_src")))
    }

    spark.stop()
  }
}
