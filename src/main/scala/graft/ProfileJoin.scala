package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec}

/** Join-family wall-clock decomposition (round-12: the q3_shipping /
  * j4_semijoin / j1_equijoin / salted_join / asof_join ~1-2.4 s at the
  * x100 point has been ATTRIBUTED to "the broadcast build floor" for
  * two rounds without a measurement). Two instruments on one warm run:
  *
  *  - a SparkListener job timeline: broadcast-join plans execute as a
  *    serial chain (dim-scan job → driver collect+build → fact job),
  *    so per-job walls plus the gaps between them partition the query
  *    wall exactly;
  *  - BroadcastExchangeExec's own driver-side metrics (collectTime,
  *    buildTime, broadcastTime) — the serial driver work between jobs.
  *
  * Output: one [jfp] JSON line per query attributing the wall into
  * jobs / broadcast collect+build+transmit / driver residual. The same
  * capture runs inside Bench (join_floor_profile) so the artifact
  * carries the attribution at every scale point.
  */
object ProfileJoin {

  /** One warm execution's wall-time attribution. `jobUnionSec` is the
    * union of job intervals (jobs overlap when broadcast stages run
    * async), so `wallSec - jobUnionSec` is driver-only time; of that,
    * `bcastDriverSec` is the measured broadcast collect+build+transmit
    * share. `constructSec` is DataFrame-CONSTRUCTION time — ~0 for
    * lazy plans, but bitmapSemiJoin/denseLookupJoin collect their key
    * side and build the broadcast structure eagerly at construction
    * (r12 advisory: the old timer started after `mk`, so the bitmap
    * collect+build was excluded from wall_s while its job still
    * entered the job map, clamping driver_only_s to 0 and reporting
    * a wall ~3× below the suite slot). wall_s now covers construction
    * + execution, and construct_s makes the eager share explicit.
    * Residual = planning + AQE stage re-optimization + commit. */
  final case class Attribution(wallSec: Double, jobSumSec: Double,
                               jobUnionSec: Double, bcastDriverSec: Double,
                               constructSec: Double,
                               jobsJson: String, bcastJson: String) {
    def driverOnlySec: Double = math.max(0.0, wallSec - jobUnionSec)
    def json: String =
      s"""{"wall_s":${"%.3f".format(wallSec)},"construct_s":${"%.3f".format(constructSec)},"job_union_s":${"%.3f".format(jobUnionSec)},"driver_only_s":${"%.3f".format(driverOnlySec)},"jobs_s":$jobsJson,"bcast_driver_s":${"%.3f".format(bcastDriverSec)},"broadcasts":$bcastJson}"""
  }

  def attribute(spark: org.apache.spark.sql.SparkSession)
               (mk: => DataFrame): Attribution = {
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (js.time, -1L))
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.computeIfPresent(je.jobId, (_, v) => (v._1, je.time))
    }
    spark.sparkContext.addSparkListener(listener)
    // timer starts BEFORE construction: eager operators (bitmap/dense
    // lookup collects) do real work in `mk`, and their collect jobs
    // land in the listener's map either way
    val t0 = System.nanoTime()
    val df = mk
    val tConstruct = (System.nanoTime() - t0) / 1e9
    // execute THIS QueryExecution (df.write would plan a fresh one and
    // the metrics below would read from a never-executed twin); the
    // noop-sink difference is one empty commit, sub-millisecond
    df.queryExecution.toRdd.foreach(_ => ())
    val wall = (System.nanoTime() - t0) / 1e9
    // listener bus is async — give it a beat to drain before reading
    // (private API waitUntilEmpty is inaccessible; job-end events for
    // completed jobs land within milliseconds of the action returning)
    Thread.sleep(200)
    spark.sparkContext.removeSparkListener(listener)

    import scala.jdk.CollectionConverters._
    val intervals = jobs.asScala.values.toSeq.filter(_._2 > 0).sortBy(_._1)
    val jobList = intervals.map { case (s, e) => (e - s) / 1e3 }
    val jobSum = jobList.sum
    // union of job intervals: jobs can overlap (async broadcast-stage
    // jobs), so wall - UNION is the true driver-only share
    val union = {
      var covered = 0L; var hi = Long.MinValue
      intervals.foreach { case (s, e) =>
        if (s > hi) { covered += e - s; hi = e }
        else if (e > hi) { covered += e - hi; hi = e }
      }
      covered / 1e3
    }
    val jobsJson = jobList.map(d => "%.3f".format(d)).mkString("[", ",", "]")

    // broadcast exchange driver metrics from the executed plan (walk
    // into AQE's final plan; metric values are milliseconds)
    def collectBcast(p: SparkPlan): Seq[SparkPlan] = {
      val here = p match {
        case a: AdaptiveSparkPlanExec => collectBcast(a.executedPlan)
        // AQE wraps each materialized exchange in a leaf QueryStageExec
        // — the executed BroadcastExchangeExec (with live metrics) is
        // its `plan`, not a child
        case q: QueryStageExec => collectBcast(q.plan)
        case r: ReusedExchangeExec => collectBcast(r.child)
        case b: BroadcastExchangeExec => Seq(b) ++ b.children.flatMap(collectBcast)
        case other => other.children.flatMap(collectBcast)
      }
      // subqueries (scalar + reused exchanges) can also hold broadcasts
      here ++ p.subqueries.flatMap(collectBcast)
    }
    val bcasts = collectBcast(df.queryExecution.executedPlan)
    def m(p: SparkPlan, k: String): Double =
      p.metrics.get(k).map(_.value / 1e3).getOrElse(0.0)
    val bcastDriver = bcasts.map(b =>
      m(b, "collectTime") + m(b, "buildTime") + m(b, "broadcastTime")).sum
    val bcastJson = bcasts.map { b =>
      s"""{"rows":${b.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)},"data_mb":${"%.1f".format(b.metrics.get("dataSize").map(_.value / 1e6).getOrElse(-1.0))},"collect_s":${"%.3f".format(m(b, "collectTime"))},"build_s":${"%.3f".format(m(b, "buildTime"))},"bcast_s":${"%.3f".format(m(b, "broadcastTime"))}}"""
    }.mkString("[", ",", "]")
    Attribution(wall, jobSum, union, bcastDriver, tConstruct, jobsJson, bcastJson)
  }

  /** SHUFFLE_HASH counterfactuals of the broadcast-join suite queries
    * (j1/j4/salted): the alternative to the serial driver-side
    * hash-relation build is a parallel partitioned build — which loses
    * 2-4× here because it exchanges the 60M-row fact. Exposed so Bench
    * can embed the A/B next to the attribution (the floor is only a
    * floor if the obvious alternative is measurably worse). */
  def shjVariants(s: org.apache.spark.sql.SparkSession,
                  d: String): Seq[(String, () => DataFrame)] = {
    import org.apache.spark.sql.functions._
    def t2(tab: String) = Tables.load(s, d, tab)
    def j1Shj = {
      val o = t2("orders")
      val c = t2("customer").hint("shuffle_hash")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("revenue"))
        .orderBy("segment")
    }
    def j4Shj = {
      val li = t2("lineitem")
      val urgent = t2("orders").filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey").hint("shuffle_hash")
      li.join(urgent, li("l_orderkey") === urgent("o_orderkey"), "left_semi")
        .agg(count(lit(1)).as("n"))
    }
    def saltedShj = {
      val big = t2("lineitem").select("l_orderkey", "l_extendedprice")
      val small = t2("orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
        .hint("shuffle_hash")
      big.join(small, Seq("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("revenue"))
        .orderBy("o_orderpriority")
    }
    Seq(("j1_shj", () => j1Shj), ("j4_shj", () => j4Shj),
      ("salted_shj", () => saltedShj))
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scale/x100")
    val s = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import org.apache.spark.sql.functions._
    s.range(100000).agg(sum("id")).collect()
    SparkEntry.warmTableStats(s, d)
    val names = if (args.nonEmpty) args.toSeq
      else Seq("j1_equijoin", "j4_semijoin", "q3_shipping", "salted_join",
        "asof_join", "a8_interpolate")
    names.foreach { n =>
      val q = SparkEntry.queries(n)
      q(s, d).write.mode("overwrite").format("noop").save() // warm codegen
      (1 to 3).foreach { i =>
        val a = attribute(s)(q(s, d))
        println(s"[jfp] $n run$i ${a.json}")
      }
    }

    // A/B: the same joins with the small side SHUFFLE_HASH'd instead of
    // broadcast — the driver-build floor vs a parallel partitioned build
    shjVariants(s, d).foreach { case (n, mk) =>
      mk().write.mode("overwrite").format("noop").save()
      (1 to 3).foreach { i =>
        val a = attribute(s)(mk())
        println(s"[jfp] $n run$i ${a.json}")
      }
    }
    s.stop()
  }
}
