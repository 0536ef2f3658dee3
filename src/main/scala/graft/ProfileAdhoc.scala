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

    import org.apache.spark.sql.Column
    import org.apache.spark.sql.expressions.Window
    // inline copies of the proximityCount internals so three chunking
    // strategies can be timed against each other on the same corpus
    def downstream(df: DataFrame): DataFrame = df
      .filter(col("n_matches") > 0)
      .groupBy(to_date(col("p_ts")).as("day"))
      .agg(sum("n_matches").as("n_pairs"),
        count(col("p_id")).as("n_purchases"))
      .orderBy("day")
    val tolSec = 300L
    val tolUs = tolSec * 1000000L
    def bucket(c: Column): Column = floor(unix_micros(c) / tolUs)
    def eN(right: DataFrame) = {
      val eB = right.groupBy(bucket(col("e_ts")).as("_b"))
        .agg(sort_array(collect_list(unix_micros(col("e_ts")))).as("_ts"))
      eB.select(col("_b").as("_src"), col("_ts"),
          explode(array(lit(-1L), lit(0L), lit(1L))).as("_shift"))
        .groupBy((col("_src") + col("_shift")).as("_b"))
        .agg(flatten(transform(
          sort_array(collect_list(struct(col("_src"), col("_ts")))),
          x => x.getField("_ts"))).as("_ts"))
    }
    def finish(pB: DataFrame, right: DataFrame, cols: Seq[String]) =
      pB.join(eN(right), Seq("_b"), "left")
        .select(explode(arrays_zip(
          transform(col("_ps"), x => x.getField("_row")),
          operators.TemporalJoin.windowCountsUdfForBench(
            transform(col("_ps"), x => x.getField("_us")),
            col("_ts"), lit(tolUs)))).as("_z"))
        .select((cols.map(c =>
          col("_z").getField("0").getField(c).as(c)) :+
          col("_z").getField("1").as("n_matches")): _*)

    time("pc_old_unchunked", reps) {
      val left = purchases
      val pB = left.groupBy(bucket(col("p_ts")).as("_b"))
        .agg(collect_list(struct(unix_micros(col("p_ts")).as("_us"),
          struct(left.columns.map(col): _*).as("_row"))).as("_ps"))
      downstream(finish(pB, errors, left.columns.toSeq))
    }

    time("pc_precount_chunked", reps) {
      downstream(operators.TemporalJoin
        .proximityCount(purchases, errors, "p_ts", "e_ts", tolSec))
    }

    time("pc_reuse_exchange_chunked", reps) {
      val left = purchases
      val maxChunk = 65536
      val lb = left.withColumn("_b", bucket(col("p_ts")))
        .repartition(col("_b"))
      val cnt = lb.groupBy("_b")
        .agg(ceil(count(lit(1)) / lit(maxChunk.toDouble)).cast("long").as("_nc"))
      val pB = lb.join(cnt, Seq("_b"))
        .withColumn("_sub", pmod(hash(left.columns.map(col): _*), col("_nc")))
        .groupBy(col("_b"), col("_sub"))
        .agg(collect_list(struct(unix_micros(col("p_ts")).as("_us"),
          struct(left.columns.map(col): _*).as("_row"))).as("_ps"))
      downstream(finish(pB, errors, left.columns.toSeq))
    }

    time("pc_window_chunked", reps) {
      val left = purchases
      val maxChunk = 65536
      val wB = Window.partitionBy(col("_b"))
      val pB = left
        .withColumn("_b", bucket(col("p_ts")))
        .withColumn("_nc", ceil(count(lit(1)).over(wB) / lit(maxChunk.toDouble)).cast("long"))
        .withColumn("_sub", pmod(hash(left.columns.map(col): _*), col("_nc")))
        .groupBy(col("_b"), col("_sub"))
        .agg(collect_list(struct(unix_micros(col("p_ts")).as("_us"),
          struct(left.columns.map(col): _*).as("_row"))).as("_ps"))
      downstream(finish(pB, errors, left.columns.toSeq))
    }

    spark.stop()
  }
}
