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

    val docs = Tables.loadParallel(spark, sfDir, "documents")
    time("docs_scan_only", reps)(docs.agg(sum(length(col("text")))))
    time("docs_split_builtin", reps)(
      docs.select(size(split(lower(col("text")), "\\s+")).as("n")).agg(sum("n")))
    val tfUdf = udf((text: String) => {
      if (text == null) Array.empty[(String, Long)]
      else {
        val toks = text.toLowerCase.split("\\s+")
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        var i = 0
        while (i < toks.length) {
          val t = toks(i)
          if (t.nonEmpty) m.update(t, m.getOrElse(t, 0L) + 1L)
          i += 1
        }
        m.toArray
      }
    })
    time("docs_tf_udf", reps)(
      docs.select(col("doc_id"), tfUdf(col("text")).as("tfs"))
        .agg(sum(size(col("tfs")))))
    time("docs_tf_udf_checkpoint", reps)(
      docs.select(col("doc_id"), tfUdf(col("text")).as("tfs"))
        .localCheckpoint().agg(sum(size(col("tfs")))))
    val tfScanUdf = udf((text: String) => {
      if (text == null) Array.empty[(String, Long)]
      else {
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        val n = text.length
        var i = 0
        while (i < n) {
          // skip java-\s whitespace (ASCII-only, regex-parity)
          var c = text.charAt(i)
          while (i < n && (c == ' ' || (c >= '\t' && c <= '\r'))) {
            i += 1; if (i < n) c = text.charAt(i)
          }
          if (i < n) {
            val start = i
            while (i < n && { val ch = text.charAt(i)
              !(ch == ' ' || (ch >= '\t' && ch <= '\r')) }) i += 1
            val tok = text.substring(start, i).toLowerCase
            m.update(tok, m.getOrElse(tok, 0L) + 1L)
          }
        }
        m.toArray
      }
    })
    time("docs_tf_scan_udf", reps)(
      docs.select(col("doc_id"), tfScanUdf(col("text")).as("tfs"))
        .agg(sum(size(col("tfs")))))
    time("lm_rowlocal_proto", reps) {
      val pairs = docs.select(col("doc_id"), explode(tfScanUdf(col("text"))).as("kv"))
        .select(col("kv._1").as("tok"), col("kv._2").as("tf"))
      val vocabRows = pairs.groupBy("tok").agg(sum("tf").as("cnt")).collect()
      val total = vocabRows.map(_.getLong(1)).sum.toDouble
      val logp = vocabRows.map(r => (r.getString(0),
        java.lang.StrictMath.log(r.getLong(1) / total))).toMap
      val score = udf((tfs: Seq[(String, Long)]) => {
        var n = 0L; var s = 0.0
        tfs.foreach { case (tok, tf) => n += tf; s += tf * logp(tok) }
        (n, if (n == 0) Double.NaN else s / n)
      })
      docs.select(col("doc_id"), score(tfScanUdf(col("text"))).as("r"))
        .select(col("doc_id"), col("r._1").as("n_tokens"),
          round(col("r._2"), 4).as("avg_logp"))
        .orderBy("doc_id")
    }
    time("lm_score_full", reps)(
      graft.operators.TextAnalysis.corpusLmScore(docs, "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"),
          round(col("avg_logp"), 4).as("avg_logp"))
        .orderBy("doc_id"))

    time("lm_rowlocal_real_noorder", reps)(
      graft.operators.TextAnalysis.corpusLmScoreRowLocal(docs, "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"),
          round(col("avg_logp"), 4).as("avg_logp")))
    locally {
      val vocabRows = docs
        .select(explode(graft.operators.TextAnalysis.tfPairsCol(col("text"))).as("kv"))
        .groupBy(col("kv._1").as("tok")).agg(sum(col("kv._2")).as("cnt")).collect()
      val total = vocabRows.iterator.map(_.getLong(1)).sum.toDouble
      val logp = vocabRows.map(r => (r.getString(0),
        java.lang.StrictMath.log(r.getLong(1) / total))).toMap
      val score = udf((tfs: Seq[(String, Long)]) => {
        var n = 0L; var s = 0.0
        tfs.foreach { case (tok, tf) => n += tf; s += tf * logp(tok) }
        (n, s / n)
      })
      def scored(src: DataFrame) =
        src.select(col("doc_id"),
            score(graft.operators.TextAnalysis.tfPairsCol(col("text"))).as("r"))
          .filter(col("r._1") > 0L)
          .select(col("doc_id"), col("r._1").as("n_tokens"),
            round(col("r._2"), 4).as("avg_logp"))
      time("lm_scorepass_noorder", reps)(scored(docs))
      time("lm_scorepass_postsort", reps)(scored(docs).orderBy("doc_id"))
      time("lm_scorepass_presort", reps)(scored(docs.orderBy("doc_id")))
    }
    time("lm_rowlocal_real", reps)(
      graft.operators.TextAnalysis.corpusLmScoreRowLocal(docs, "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"),
          round(col("avg_logp"), 4).as("avg_logp"))
        .orderBy("doc_id"))
    time("tfidf_rowlocal_real", reps)(
      graft.operators.TextAnalysis.tfidfTopTermsRowLocal(docs, "doc_id", "text", 3)
        .select(col("doc_id"), col("rnk").cast("bigint").as("rnk"),
          col("tok").as("term"), round(col("tfidf"), 4).as("tfidf"))
        .orderBy("doc_id", "rnk"))
    time("lm_vocab_pass_limit", reps)(
      docs.select(graft.operators.TextAnalysis.tfPairsCol(col("text")).as("tfs"))
        .select(explode(col("tfs")).as("kv"))
        .groupBy(col("kv._1").as("tok")).agg(sum(col("kv._2")).as("cnt"))
        .limit(1 << 20))
    time("docs_count_only", reps)(docs.groupBy().count())

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
