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
