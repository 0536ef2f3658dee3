package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time a named subset of SparkEntry queries on
  * SPARK_GRAFT_SF_DIR, several reps each, after the standard warmup.
  * Usage: sbt "runMain graft.ProfileQuery q1 q2 ..." — prints one
  * line per (query, rep) plus a min/median summary. Not part of the
  * bench contract; exists so per-query optimization work measures the
  * same code path Bench times (noop sink, warm JVM).
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("true")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.range(100000).agg(org.apache.spark.sql.functions.sum("id")).collect()
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    })
    val names = if (args.nonEmpty) args.toSeq else Seq("a13_metrics", "approx_distinct")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val times = (1 to reps).map { i =>
        jobs.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(150) // let the listener bus drain before reading counters
        println(f"[profile] $name rep$i: $dt%.3f s jobs=${jobs.get} tasks=${tasks.get}")
        if (explain && i == reps)
          println(s"[plan] $name\n${df.queryExecution.executedPlan}")
        dt
      }
      println(f"[profile] $name min=${times.min}%.3f median=${times.sorted.apply(reps / 2)}%.3f")
    }
    spark.stop()
  }
}
