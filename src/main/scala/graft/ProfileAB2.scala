package graft
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
object ProfileAB2 {
  private def time(name: String, reps: Int)(mk: => DataFrame): Unit = {
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      mk.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[ab2] $name%-26s min=${ts.min}%6.3f median=${ts.sorted.apply(reps / 2)}%6.3f")
  }
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scale/x100")
    val s = Sessions.local("32")
    s.range(100000).agg(sum("id")).collect()
    def t(tab: String) = Tables.load(s, d, tab)
    def tp(tab: String) = Tables.load(s, d, tab)

    val docs = tp("documents")
    time("tq_regex", 4)(
      docs.groupBy("source")
        .agg(round(sum(length(regexp_replace(col("text"), " ", ""))).cast("double") /
            sum(size(split(col("text"), " "))).cast("double"), 6).as("mean_word_len"))
        .orderBy("source"))
    time("tq_translate", 4) {
      val nonSpace = length(translate(col("text"), " ", ""))
      val nTokens = length(col("text")) - nonSpace + 1
      docs.groupBy("source")
        .agg(round(sum(nonSpace).cast("double") / sum(nTokens).cast("double"), 6)
          .as("mean_word_len"))
        .orderBy("source")
    }
    val e = t("events").filter(col("value").isNotNull && !isnan(col("value")))
    def z1 = e.groupBy("event_type")
      .agg(avg("value").as("mu"), stddev_samp("value").as("sigma"),
        max("value").as("mx"), min("value").as("mn"))
      .select(col("event_type"),
        round((col("mx") - col("mu")) / col("sigma"), 4).as("max_z"),
        round((col("mn") - col("mu")) / col("sigma"), 4).as("min_z"))
    time("zscore_orderBy", 4)(z1.orderBy("event_type"))
    time("zscore_sortWithin", 4)(z1.coalesce(1).sortWithinPartitions("event_type"))
    val li = t("lineitem")
    def dp = li.groupBy(year(col("l_shipdate")).as("y"), month(col("l_shipdate")).as("m"))
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
    time("dateparts_orderBy", 4)(dp.orderBy("y", "m"))
    time("dateparts_sortWithin", 4)(dp.coalesce(1).sortWithinPartitions("y", "m"))
    s.stop()
  }
}

/** pii_scrub cost decomposition at the x100 point: synthesis vs
  * scanner UDF vs md5+sort, to find where the ~1.9x vs DuckDB sits. */
object ProfilePii {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._
  private def time(name: String, reps: Int)(mk: => DataFrame): Unit = {
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      mk.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[pii] $name%-28s min=${ts.min}%6.3f median=${ts.sorted.apply(reps / 2)}%6.3f")
  }
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scale/x100")
    val s = Sessions.local("32")
    s.range(100000).agg(sum("id")).collect()
    val docs = Tables.load(s, d, "documents")
    def withPii = docs.select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id"),
            lit("@example.com for access"))).otherwise(lit("")),
        when(col("doc_id") % 4 === 0,
          concat(lit(" call +82-10-"),
            format_string("%04d", col("doc_id") % 10000),
            lit("-1234"))).otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" see https://data.example.org/doc/"), col("doc_id"),
            lit(" for details"))).otherwise(lit(""))).as("t"))
    time("synthesis_only", 4)(
      withPii.select(col("doc_id"), length(col("t")).as("l")))
    time("synthesis_scrub", 4)(
      withPii.select(col("doc_id"),
        graft.operators.Pii.scrub(col("t")).as("p"))
        .select(col("doc_id"), col("p._1").as("n"), length(col("p._4")).as("l")))
    time("full_query", 4)(graft.SparkEntry.queries("pii_scrub")(s, d))
    time("full_minus_sort", 4) {
      val q = withPii.select(col("doc_id"), graft.operators.Pii.scrub(col("t")).as("p"))
        .select(col("doc_id"), col("p._1").as("n_emails"), col("p._2").as("n_phones"),
          col("p._3").as("n_urls"), length(col("p._4")).cast("bigint").as("masked_len"),
          md5(col("p._4")).as("masked_md5"))
      q
    }
    s.stop()
  }
}

/** Round-11 straggler decomposition: early-sort for pii_scrub (range
  * sampling re-runs the child — keep the UDF above the sort), and
  * orderedSmall-style finishes for url_canonical / pack_sequences. */
object ProfileStrag {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._
  private def time(name: String, reps: Int)(mk: => DataFrame): Unit = {
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      mk.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[strag] $name%-28s min=${ts.min}%6.3f median=${ts.sorted.apply(reps / 2)}%6.3f")
  }
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scale/x100")
    val s = Sessions.local("32")
    s.range(100000).agg(sum("id")).collect()
    val docs = Tables.loadParallel(s, d, "documents")
    def withPii = docs.select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id"),
            lit("@example.com for access"))).otherwise(lit("")),
        when(col("doc_id") % 4 === 0,
          concat(lit(" call +82-10-"),
            format_string("%04d", col("doc_id") % 10000),
            lit("-1234"))).otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" see https://data.example.org/doc/"), col("doc_id"),
            lit(" for details"))).otherwise(lit(""))).as("t"))
    time("pii_current", 4)(graft.SparkEntry.queries("pii_scrub")(s, d))
    time("pii_sort_early", 4)(
      withPii.orderBy("doc_id")
        .select(col("doc_id"), graft.operators.Pii.scrub(col("t")).as("p"))
        .select(col("doc_id"),
          col("p._1").as("n_emails"), col("p._2").as("n_phones"),
          col("p._3").as("n_urls"),
          length(col("p._4")).cast("bigint").as("masked_len"),
          md5(col("p._4")).as("masked_md5")))
    time("pii_rbr32_sortwithin", 4)(
      withPii.repartitionByRange(32, col("doc_id")).sortWithinPartitions("doc_id")
        .select(col("doc_id"), graft.operators.Pii.scrub(col("t")).as("p"))
        .select(col("doc_id"),
          col("p._1").as("n_emails"), col("p._2").as("n_phones"),
          col("p._3").as("n_urls"),
          length(col("p._4")).cast("bigint").as("masked_len"),
          md5(col("p._4")).as("masked_md5")))
    time("url_current", 4)(graft.SparkEntry.queries("url_canonical")(s, d))
    time("pack_current", 4)(graft.SparkEntry.queries("pack_sequences")(s, d))
    // pack without the global sort, to size the sort's share
    val docs2 = docs.select(col("doc_id"), pmod(col("doc_id"), lit(8)).as("shard"),
      (length(col("text")) - length(translate(col("text"), " ", "")) + 1)
        .cast("long").as("toks"))
    time("pack_nosort", 4)(
      graft.operators.Packing.packSequences(docs2, col("shard"), col("doc_id"),
          col("toks"), 2048L)
        .groupBy("shard", "seq_id")
        .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens")))
    time("pack_sortwithin", 4)(
      graft.operators.Packing.packSequences(docs2, col("shard"), col("doc_id"),
          col("toks"), 2048L)
        .groupBy("shard", "seq_id")
        .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
        .coalesce(1).sortWithinPartitions("shard", "seq_id"))
    s.stop()
  }
}
