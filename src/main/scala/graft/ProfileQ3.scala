package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage decomposition for `q3_shipping`'s residual (r13 judge item
  * #3): lineitem bare 2-double-col scans at 0.95× DuckDB, yet q3's
  * fact-scan job measured ~3× the bare scan. The r13 comparison was
  * apples-to-oranges: q3's fact stage reads FOUR columns (orderkey
  * INT64 + shipdate TIMESTAMP for the filter + two doubles), probes a
  * broadcast, and partial-aggregates. This main prices each increment
  * on the same file so the gap decomposes into (columns read) +
  * (probe) + (agg) instead of "unexplained residual".
  * Run idle: `SPARK_GRAFT_SF_DIR=/tmp/scale/x100 sbt -batch "runMain graft.ProfileQ3"`. */
object ProfileQ3 {
  private def time(name: String, reps: Int)(mk: => DataFrame): Double = {
    mk.write.mode("overwrite").format("noop").save()
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      mk.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val m = ts.min
    println(f"[q3] $name%-58s min=$m%.3f median=${ts.sorted.apply(reps / 2)}%.3f")
    m
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scale/x100")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.range(100000).agg(sum("id")).collect()
    def li = Tables.load(spark, sfDir, "lineitem")
    val cut = lit("1995-03-15").cast("date")

    time("li 2 doubles (r13 scan_floor)", reps)(
      li.agg(sum("l_extendedprice"), avg("l_quantity")))
    time("li + orderkey: 3 cols", reps)(
      li.agg(sum("l_extendedprice"), avg("l_quantity"), max("l_orderkey")))
    time("li 4 cols as q3 reads (no filter)", reps)(
      li.agg(sum("l_extendedprice"), sum("l_discount"), max("l_orderkey"),
        max("l_shipdate")))
    time("li 4 cols + shipdate filter (q3 scan shape)", reps)(
      li.filter(col("l_shipdate") > cut)
        .agg(sum("l_extendedprice"), sum("l_discount"), max("l_orderkey")))
    time("q3 revenue expr only (no join): filter+agg", reps)(
      li.filter(col("l_shipdate") > cut)
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))))
    // the oc build alone (orders ⋈ BUILDING customers, two stages)
    def oc = {
      val c = Tables.load(spark, sfDir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.load(spark, sfDir, "orders")
        .filter(col("o_orderdate") < cut)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    }
    time("oc chain alone (orders x BUILDING customers)", reps)(
      oc.agg(count(lit(1))))
    time("full q3_shipping", reps)(
      SparkEntry.queries("q3_shipping")(spark, sfDir))
    // restructure candidate: semi-filter the fact with a bitmap of
    // qualifying orderkeys (join-free fact pass), aggregate revenue on
    // the narrow l_orderkey only, THEN attach (date, priority) to the
    // tiny aggregated result via one small broadcast join
    time("q3 restructured: bitmap fact-filter, agg, attach-after", reps) {
      val c = Tables.load(spark, sfDir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.load(spark, sfDir, "orders")
        .filter(col("o_orderdate") < cut)
      val l = Tables.load(spark, sfDir, "lineitem")
        .filter(col("l_shipdate") > cut)
      val oc = graft.operators.Relational.bitmapSemiJoin(o, c, "o_custkey", "c_custkey")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .persist() // ~15 MB per rep; profiling main, never unpersisted
      val liq = graft.operators.Relational.bitmapSemiJoin(
        l.select("l_orderkey", "l_extendedprice", "l_discount"),
        oc, "l_orderkey", "o_orderkey")
      val rev = liq.groupBy("l_orderkey")
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("raw"))
      rev.join(broadcast(oc), rev("l_orderkey") === oc("o_orderkey"))
        .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("order_date"),
          col("o_orderpriority"))
        .agg(round(sum(col("raw")), 2).as("revenue"))
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(10)
    }
    // r15 shipped shape, priced stage by stage: both bitmap builds,
    // the join-free fact probe+agg+top10, and the 10-row attach scan
    time("r15 stage: ocKeys bitmap chain (orders probe+count)", reps) {
      val c = Tables.load(spark, sfDir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.load(spark, sfDir, "orders")
        .filter(col("o_orderdate") < cut)
      graft.operators.Relational.bitmapSemiJoin(o, c, "o_custkey", "c_custkey")
        .select(col("o_orderkey")).agg(count(lit(1)))
    }
    time("r15 stage: fact probe+agg+top10 (no attach)", reps) {
      val c = Tables.load(spark, sfDir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.load(spark, sfDir, "orders")
        .filter(col("o_orderdate") < cut)
      val l = li.filter(col("l_shipdate") > cut)
      val ocKeys = graft.operators.Relational
        .bitmapSemiJoin(o, c, "o_custkey", "c_custkey").select(col("o_orderkey"))
      graft.operators.Relational
        .bitmapSemiJoin(l, ocKeys, "l_orderkey", "o_orderkey")
        .groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(desc("revenue"), col("l_orderkey")).limit(10)
    }
    time("r15 stage: attach scan alone (orders x 10-row broadcast)", reps) {
      import spark.implicits._
      val ten = Seq.tabulate(10)(i => (i * 1500L + 7L, 1000.0 - i))
        .toDF("l_orderkey", "revenue")
      val o = Tables.load(spark, sfDir, "orders")
        .filter(col("o_orderdate") < cut)
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("order_date"),
          col("o_orderpriority"))
      o.join(broadcast(ten), ten("l_orderkey") === o("o_orderkey"))
        .select(col("l_orderkey"), col("order_date"), col("o_orderpriority"),
          col("revenue"))
    }
    spark.stop()
  }
}
