package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Scratch profiler for the x100 overhead tail (round-9 audit item
  * #3): runs the named registry queries sequentially, printing wall
  * seconds alongside the Spark job/stage/task counts the run
  * scheduled. A 1-s query that launches 4 jobs × 3 stages is a fixed-
  * cost shape problem, not an algorithm problem — the counts say
  * which. Not part of any contract; kept out of the query registry. */
object ProfileWeak {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scale/x100")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val jobs = new AtomicInteger(); val stages = new AtomicInteger()
    val tasks = new AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
    })
    spark.range(100000).agg(sum("id")).collect()
    SparkEntry.warmTableStats(spark, sfDir)

    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("salted_join", "q3_shipping", "j4_semijoin", "zscore",
        "ratio_split", "a8_interpolate", "a9_longest_run", "date_parts",
        "j1_equijoin", "a6_pricing_summary", "pii_scrub", "asof_join",
        "url_canonical", "date_functions", "text_quality",
        "langid_confusion", "st_dedup", "approx_distinct", "a13_metrics")

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm once (plan compile), then measure
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val samples = (1 to reps).map { _ =>
        Thread.sleep(50)
        jobs.set(0); stages.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        ((System.nanoTime() - t0) / 1e9, jobs.get(), stages.get(), tasks.get())
      }
      val best = samples.minBy(_._1)
      println(f"[weak] $name%-22s min=${best._1}%6.3f s  jobs=${best._2}%3d stages=${best._3}%3d tasks=${best._4}%5d")
    }
    spark.stop()
  }
}

/** A/B variants for the round-9 overhead pass. */
object ProfileWeakAB {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  private def time(name: String, reps: Int)(mk: => DataFrame): Unit = {
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      mk.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[ab] $name%-26s min=${ts.min}%6.3f median=${ts.sorted.apply(reps / 2)}%6.3f")
  }
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scale/x100")
    val s = Sessions.local("32")
    import org.apache.spark.sql.functions._
    s.range(100000).agg(sum("id")).collect()
    def t(tab: String) = Tables.load(s, d, tab)

    // salted_join vs the identical plain join (hot set empty either way)
    val big = t("lineitem").select("l_orderkey", "l_extendedprice")
    val small = t("orders").filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    time("salted_plain", 3)(
      big.join(small, Seq("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("revenue"))
        .orderBy("o_orderpriority"))

    // j4 variants
    val li = t("lineitem")
    def urgent = t("orders").filter(col("o_orderpriority") === "1-URGENT")
    time("j4_broadcast(current)", 3)(
      li.join(broadcast(urgent), li("l_orderkey") === urgent("o_orderkey"), "left_semi")
        .agg(count(lit(1)).as("n")))
    time("j4_nohint", 3)(
      li.join(urgent, li("l_orderkey") === urgent("o_orderkey"), "left_semi")
        .agg(count(lit(1)).as("n")))
    time("j4_shj_hint", 3)(
      li.join(urgent.hint("SHUFFLE_HASH"), li("l_orderkey") === urgent("o_orderkey"), "left_semi")
        .agg(count(lit(1)).as("n")))
    time("j4_keyonly_broadcast", 3)(
      li.join(broadcast(urgent.select("o_orderkey")),
          li("l_orderkey") === col("o_orderkey"), "left_semi")
        .agg(count(lit(1)).as("n")))

    // zscore variants
    val e = t("events").filter(col("value").isNotNull && !isnan(col("value")))
    time("zscore_join(current)", 3) {
      val stats = e.groupBy("event_type")
        .agg(avg("value").as("mu"), stddev_samp("value").as("sigma"))
      e.join(broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(round(max((col("value") - col("mu")) / col("sigma")), 4).as("max_z"),
          round(min((col("value") - col("mu")) / col("sigma")), 4).as("min_z"))
        .orderBy("event_type")
    }
    time("zscore_onepass", 3)(
      e.groupBy("event_type")
        .agg(avg("value").as("mu"), stddev_samp("value").as("sigma"),
          max("value").as("mx"), min("value").as("mn"))
        .select(col("event_type"),
          round((col("mx") - col("mu")) / col("sigma"), 4).as("max_z"),
          round((col("mn") - col("mu")) / col("sigma"), 4).as("min_z"))
        .orderBy("event_type"))

    // approx_distinct: current two-step vs select-first
    time("approx_current", 3)(
      t("events").select("event_type", "user_id").distinct()
        .groupBy("event_type")
        .agg(count(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
        .orderBy("event_type"))

    // j1: broadcast customer (serial 1.5M-row driver build) vs AQE choice
    val o = t("orders")
    def cust = t("customer")
    def j1agg(j: DataFrame) = j.groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue"))
      .orderBy("segment")
    time("j1_broadcast(current)", 3)(
      j1agg(o.join(broadcast(cust), o("o_custkey") === cust("c_custkey"))))
    time("j1_nohint", 3)(
      j1agg(o.join(cust, o("o_custkey") === cust("c_custkey"))))
    time("j1_preagg_bcast", 3) {
      val perCust = o.groupBy("o_custkey")
        .agg(count(lit(1)).as("_n"), sum("o_totalprice").as("_rev"))
      val c = cust
      perCust.join(broadcast(c), perCust("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(sum("_n").as("n_orders"), round(sum("_rev"), 2).as("revenue"))
        .orderBy("segment")
    }
    s.stop()
  }
}
