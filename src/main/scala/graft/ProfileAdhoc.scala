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
  // SPARK_GRAFT_ADHOC_ONLY=substr,substr: run only matching probes
  private val only: Option[Array[String]] =
    sys.env.get("SPARK_GRAFT_ADHOC_ONLY").map(_.split(",").map(_.trim)
      .filter(_.nonEmpty))
  private def time(name: String, reps: Int)(mk: => DataFrame): Unit = {
    if (only.exists(!_.exists(name.contains(_)))) return
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

    // r20: date_parts THIRD variant — two-level agg keyed on the RAW
    // int date (no per-row calendar conversion at all; y/m extracted
    // from the ~2.5k distinct dates post-agg).
    time("dp_raw_date_key_2level", reps) {
      liDp.groupBy(col("l_shipdate"))
        .agg(count(lit(1)).as("_n"), sum("l_quantity").as("_q"))
        .groupBy(year(col("l_shipdate")).cast("bigint").as("y"),
          month(col("l_shipdate")).cast("bigint").as("m"))
        .agg(sum("_n").as("n"), round(sum("_q"), 2).as("qty"))
        .coalesce(1).sortWithinPartitions("y", "m")
    }

    // r20: sessionize OLD (two full window passes + all-rows agg) vs
    // NEW (one window pass, boundary-rows-only tail) — the committed
    // query is the new form; the old chain is inlined here so the A/B
    // runs same-JVM, same scan.
    import org.apache.spark.sql.expressions.Window
    def sessTail(df: DataFrame) = df
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum("n_events").cast("bigint").as("total_events"),
        max("n_events").as("max_session_events"))
      .coalesce(1).sortWithinPartitions("user_id")
    val byUser = Window.partitionBy("user_id").orderBy("tsu")
    val gapUs = lit(30L * 60 * 1000000)
    def sessSrc = ev.filter(col("user_id") < 10)
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"))
    time("sessionize_old (2 windows)", reps) {
      sessTail(sessSrc
        .withColumn("new_sess",
          when(col("tsu") - lag("tsu", 1).over(byUser) > gapUs, 1L)
            .otherwise(0L))
        .withColumn("sess_id", sum("new_sess").over(byUser))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("n_events")))
    }
    time("sessionize_new (1 window)", reps) {
      val whole = byUser.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      sessSrc
        .select(col("user_id"), col("tsu"),
          lag("tsu", 1).over(byUser).as("_prev"),
          row_number().over(byUser).as("_rn"),
          count(lit(1)).over(whole).as("_cnt"))
        .filter(col("_rn") === 1 || (col("tsu") - col("_prev")) > gapUs)
        .withColumn("_next_rn",
          lead("_rn", 1).over(Window.partitionBy("user_id").orderBy("_rn")))
        .select(col("user_id"),
          (coalesce(col("_next_rn").cast("long"), col("_cnt") + 1L)
            - col("_rn")).as("n_events"))
        .transform(sessTail)
    }

    // r20: a8 interpolate neighbor windows — OLD withColumn chain
    // (3 WindowExecs) vs NEW single-select (1 WindowExec); committed
    // operator is the new form, old chain inlined for the A/B.
    def a8Spine = {
      val daily = ev
        .filter(col("event_type") === "purchase" && col("user_id") < 20)
        .repartition(col("user_id"))
        .groupBy(col("user_id"), TimeSeriesOps.utcDay(col("ts")).as("day"))
        .agg(count(lit(1)).cast("double").as("v"))
      TimeSeriesOps.toDailySpine(daily, Seq("user_id"), "day", "v")
    }
    def a8Tail(withNeighbors: DataFrame, maxGap: Int) = {
      val v = col("v")
      val dL = datediff(col("day"), col("_pd"))
      val dR = datediff(col("_nd"), col("day"))
      val inReach = (col("_pd").isNotNull && dL <= maxGap) ||
        (col("_nd").isNotNull && dR <= maxGap)
      val interp = col("_pv") +
        (col("_nv") - col("_pv")) * dL.cast("double") /
          datediff(col("_nd"), col("_pd")).cast("double")
      val filled = when(v.isNotNull, v)
        .when(!inReach, lit(null))
        .when(col("_pd").isNotNull && col("_nd").isNotNull, interp)
        .when(col("_nd").isNotNull, col("_nv"))
        .when(col("_pd").isNotNull, col("_pv"))
      withNeighbors.withColumn("v", filled)
        .select(col("user_id"), col("day"), round(col("v"), 4).as("v"))
        .coalesce(1).sortWithinPartitions("user_id", "day")
    }
    val a8w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val a8before = a8w.rowsBetween(Window.unboundedPreceding, 0)
    val a8after = a8w.rowsBetween(0, Window.unboundedFollowing)
    time("a8_withColumn (3 windows)", reps) {
      a8Tail(a8Spine
        .withColumn("_pv", last(col("v"), ignoreNulls = true).over(a8before))
        .withColumn("_pd", last(when(col("v").isNotNull, col("day")),
          ignoreNulls = true).over(a8before))
        .withColumn("_nv", first(col("v"), ignoreNulls = true).over(a8after))
        .withColumn("_nd", first(when(col("v").isNotNull, col("day")),
          ignoreNulls = true).over(a8after)), 3)
    }
    time("a8_one_select (1 window)", reps) {
      // the committed operator (single-select neighbor windows)
      TimeSeriesOps.interpolateGapLimited(a8Spine, Seq("user_id"),
          "day", "v", 3)
        .select(col("user_id"), col("day"), round(col("v"), 4).as("v"))
        .coalesce(1).sortWithinPartitions("user_id", "day")
    }

    // r20: pack_sequences plain (8-way window, 1 exchange) vs fused
    // two-level (1 reused exchange, shards×blocks-way window).
    def packDocs = docs.select(col("doc_id"),
      pmod(col("doc_id"), lit(8)).as("shard"),
      (graft.plans.StringCount.countChar(col("text"), ' ') + 1).as("toks"))
    def packTail(df: DataFrame) = df
      .groupBy("shard", "seq_id")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
      .coalesce(1).sortWithinPartitions("shard", "seq_id")
    time("pack_plain_window", reps) {
      packTail(graft.operators.Packing.packSequences(packDocs,
        col("shard"), col("doc_id"), col("toks"), 2048L))
    }
    time("pack_fused_2level", reps) {
      val df = packTail(graft.operators.Packing.packSequencesFused(packDocs,
        col("shard"), col("doc_id"), col("toks"), 2048L))
      if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("true"))
        println(df.queryExecution.executedPlan)
      df
    }

    // r20: pack_sequences stage decomposition (3.3 s over a ~0.8 s
    // scan floor — price each stage)
    time("pack_scan_only", reps)(packDocs.agg(sum("toks"), max("doc_id")))
    time("pack_scan_exchange", reps)(packDocs.repartition(col("shard")))
    time("pack_exchange_sort", reps)(packDocs.repartition(col("shard"))
      .sortWithinPartitions("shard", "doc_id"))
    val dp = spark.sparkContext.defaultParallelism
    time("pack_pin_exchange", reps)(packDocs.repartition(dp, col("shard")))
    time("pack_pin_exch_sort", reps)(packDocs.repartition(dp, col("shard"))
      .sortWithinPartitions("shard", "doc_id"))
    time("pack_pin_full_window", reps) {
      packTail(graft.operators.Packing.packSequences(
        packDocs.repartition(dp, col("shard")),
        col("shard"), col("doc_id"), col("toks"), 2048L))
    }
    spark.conf.set("spark.sql.windowExec.buffer.in.memory.threshold",
      (4 * 1024 * 1024).toString)
    time("pack_pin_window_bigbuf", reps) {
      packTail(graft.operators.Packing.packSequences(
        packDocs.repartition(dp, col("shard")),
        col("shard"), col("doc_id"), col("toks"), 2048L))
    }
    spark.conf.set("spark.sql.windowExec.buffer.in.memory.threshold", "4096")

    // r20: a13_metrics decomposition — the scoring pass re-scans with
    // a literal-map probe and a 5-function agg with POWER().
    def a13Scored = {
      val means = ev.filter(col("event_type").isNotNull)
        .groupBy("event_type").agg(avg("value").as("pred"))
        .collect().toSeq.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
        .flatMap(r => Seq(lit(r.getString(0)), lit(r.getDouble(1))))
      ev.filter(col("event_type").isNotNull)
        .select(col("value"), map(means: _*)(col("event_type")).as("pred"))
    }
    time("a13_attach_only", reps)(a13Scored.agg(sum("value"), sum("pred")))
    time("a13_full_pow", reps)(a13Scored.agg(
      round(TimeSeriesOps.rmse(col("value"), col("pred")), 4),
      round(TimeSeriesOps.r2Agg(col("value"), col("pred")), 6),
      round(TimeSeriesOps.smape(col("value"), col("pred")), 4)))

    // r20: tfidf_terms stage decomposition — where do the 11.5 s at
    // x1000 go? (count job | vocab fold | scoring UDF pass | full
    // query incl. checkpoint+sort)
    time("tfidf_count_job", reps)(docs.groupBy().count())
    time("tfidf_vocab_fold", reps) {
      docs.select(graft.operators.TextAnalysis
        .vocabFoldCol(col("text"), 1 << 20, weighted = false).as("m"))
        .select(size(col("m")).as("n"))
    }
    time("tfidf_vocab_kernel", reps) {
      docs.select(graft.operators.TextAnalysis
        .vocabKernelCol(col("text"), 1 << 20, weighted = false).as("m"))
        .select(size(col("m")).as("n"))
    }
    time("tfidf_full_rowlocal", reps) {
      graft.operators.TextAnalysis.tfidfTopTermsRowLocal(
        docs, "doc_id", "text", 3)
        .select(col("doc_id"), col("rnk").cast("bigint").as("rnk"),
          col("tok").as("term"), round(col("tfidf"), 4).as("tfidf"))
    }
    // lm_score stage decomposition
    time("lm_vocab_kernel_weighted", reps) {
      docs.select(graft.operators.TextAnalysis
        .vocabKernelCol(col("text"), 1 << 20, weighted = true).as("m"))
        .select(size(col("m")).as("n"))
    }
    time("lm_scoring_scan", reps) {
      val df = graft.operators.TextAnalysis
        .corpusLmScoreRowLocal(docs, "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"),
          round(col("avg_logp"), 4).as("avg_logp"))
      if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("true"))
        println(df.queryExecution.executedPlan)
      df
    }
    def lmScored = graft.operators.TextAnalysis
      .corpusLmScoreRowLocal(docs, "doc_id", "text")
      .select(col("doc_id"), col("n_tokens"),
        round(col("avg_logp"), 4).as("avg_logp"))
    time("lm_sort_checkpointed", reps) {
      lmScored.localCheckpoint().orderBy("doc_id")
    }
    time("lm_sort_recompute", reps) {
      lmScored.orderBy("doc_id")
    }
    // checkpoint-vs-recompute for the committed query's final global
    // sort: with the kernel the chain is cheap — does re-running it
    // for the range sampler beat materializing 15 M rows?
    def tfidfScored = graft.operators.TextAnalysis.tfidfTopTermsRowLocal(
      docs, "doc_id", "text", 3)
      .select(col("doc_id"), col("rnk").cast("bigint").as("rnk"),
        col("tok").as("term"), round(col("tfidf"), 4).as("tfidf"))
    time("tfidf_sort_checkpointed", reps) {
      tfidfScored.localCheckpoint().orderBy("doc_id", "rnk")
    }
    time("tfidf_sort_recompute", reps) {
      tfidfScored.orderBy("doc_id", "rnk")
    }

    spark.stop()
  }
}
