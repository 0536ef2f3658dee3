package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch micro-bench for plan-shape A/B runs during optimization
  * rounds. Each variant is timed with the same noop sink the suite
  * uses. Not part of any contract; kept out of the query registry.
  *
  * Current A/B: a6_pricing_summary's group-key representation. The
  * r16 a6_floor_ab named the residual: the 6-group HashAggregate over
  * TWO string key columns adds 0.064 s over the bare 7-col scan at
  * sf0.1 (and read 2.3x isolated at x100 in r15). Candidate fix: pack
  * the two 1-char columns into ONE int key (ascii*256+ascii) so the
  * aggregate takes HashAggregate's primitive-key fast path and the
  * strings materialize once per GROUP on output, not once per row in
  * the key comparator. Run on an otherwise-idle box:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ProfileAdhoc"
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

    def li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("date"))

    val aggs = Seq(
      round(sum("l_quantity"), 2).as("sum_qty"),
      round(sum("l_extendedprice"), 2).as("sum_base_price"),
      round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("sum_disc_price"),
      round(avg("l_quantity"), 4).as("avg_qty"),
      round(avg("l_extendedprice"), 4).as("avg_price"),
      count(lit(1)).as("count_order"))

    // warm file/page cache with the bare scan
    time("bare_7col_scan", reps) {
      li.agg(sum("l_quantity"), sum("l_extendedprice"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
        count(lit(1)), count(col("l_returnflag")), count(col("l_linestatus")))
    }

    time("a6_string_keys", reps) {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(aggs.head, aggs.tail: _*)
        .orderBy("l_returnflag", "l_linestatus")
    }

    time("a6_packed_int_key", reps) {
      li.groupBy((ascii(col("l_returnflag")) * 256 +
          ascii(col("l_linestatus"))).as("_code"))
        .agg(aggs.head, aggs.tail: _*)
        .select(
          chr(floor(col("_code") / 256)).as("l_returnflag"),
          chr(col("_code") % 256).as("l_linestatus"),
          col("sum_qty"), col("sum_base_price"), col("sum_disc_price"),
          col("avg_qty"), col("avg_price"), col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }

    time("a6_substr_byte_key", reps) {
      // same packing via substring-free byte access: ascii() already
      // reads byte 0; this variant checks whether the arithmetic
      // packing vs a straight two-int groupBy matters
      li.groupBy(ascii(col("l_returnflag")).as("_rf"),
          ascii(col("l_linestatus")).as("_ls"))
        .agg(aggs.head, aggs.tail: _*)
        .select(chr(col("_rf")).as("l_returnflag"),
          chr(col("_ls")).as("l_linestatus"),
          col("sum_qty"), col("sum_base_price"), col("sum_disc_price"),
          col("avg_qty"), col("avg_price"), col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }

    spark.stop()
  }
}
