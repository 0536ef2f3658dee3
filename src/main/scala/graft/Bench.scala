package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR
  * and emits ONE bare JSON line (plus a file copy at
  * SPARK_GRAFT_BENCH_OUT, default BENCH_LOCAL.json, so the driver's
  * parse never depends on sbt log-prefix stripping). Failed queries
  * are recorded as `"name": -1` in an `errors` map entry — never
  * silently timed as successes. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val outcomes = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val good = outcomes.filter(_._3)
    val qs = good.map { case (k, v, _) => s""""$k":${"%.3f".format(v)}""" }
      .mkString("{", ",", "}")
    val errs = outcomes.filterNot(_._3).map { case (k, _, _) => s""""$k":-1""" }
      .mkString("{", ",", "}")
    val total = "%.3f".format(good.map(_._2).sum)
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    Files.writeString(
      Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")), json)
    spark.stop()
    // bare last line on stdout, after Spark's shutdown logging
    println(json)
  }
}
