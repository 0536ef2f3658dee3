package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing — the zero-shuffle join layout big
  * fact⋈fact joins need at 100 TB (SURVEY §2.3 "sort-merge/shuffle
  * joins come free from Catalyst"; pre-partitioning is ours to
  * choose). Writing both sides bucketed by the join key lets the
  * SortMergeJoin run with NO Exchange on either side. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed fact-fact join plans without a shuffle Exchange") {
    val n = 1000
    val orders = (1L to n.toLong).map(i => (i, s"prio${i % 5}")).toDF("okey", "prio")
    val lineitem = (1L to n.toLong).flatMap(i =>
      Seq((i, i * 1.0), (i, i * 2.0))).toDF("okey", "price")

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    // a previously killed run can leave the managed location behind
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    Seq("orders_b", "lineitem_b").foreach { t =>
      val dir = new java.io.File(wh, t)
      if (dir.exists()) org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
    orders.write.bucketBy(8, "okey").sortBy("okey")
      .format("parquet").mode("overwrite").saveAsTable("orders_b")
    lineitem.write.bucketBy(8, "okey").sortBy("okey")
      .format("parquet").mode("overwrite").saveAsTable("lineitem_b")

    // force the merge join (broadcast would hide the bucketing effect)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (plan, joined) = try {
      val j = spark.table("lineitem_b")
        .join(spark.table("orders_b"), "okey")
        .groupBy("prio").agg(sum("price").as("rev"))
      (j.queryExecution.executedPlan.toString, j)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    // the join itself must not re-shuffle either bucketed side
    val joinSection = plan.split("HashAggregate").last
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan.take(1500))
    assert(!joinSection.contains("Exchange hashpartitioning(okey"),
      "join re-shuffled a bucketed side:\n" + plan.take(2500))
    // and the numbers are right
    val rev = joined.filter($"prio" === "prio1").head.getDouble(1)
    val expect = (1L to n.toLong).filter(_ % 5 == 1).map(i => i * 3.0).sum
    assert(rev == expect)
  }
}
