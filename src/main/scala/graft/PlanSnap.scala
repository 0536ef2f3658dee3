package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.FormattedMode

/** r19 optimization-round evidence tool: writes the FORMATTED physical
  * plan of named registry queries to `plans/<tag>/<query>_<suffix>.txt`
  * so before/after plan claims in OPTIMIZATION_r19.md are checkable
  * without running Spark.
  *
  * Usage:
  *   SPARK_GRAFT_PLAN_TAG=r19 SPARK_GRAFT_PLAN_SUFFIX=before \
  *     sbt "runMain graft.PlanSnap text_tokens st_dedup ..."
  *
  * Driver-side tooling; the library never depends on this. */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "r19")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    require(args.nonEmpty, "usage: PlanSnap <query> [<query> ...]")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val outDir = Paths.get("plans", tag)
    Files.createDirectories(outDir)
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      val df = fn(spark, dir)
      val plan = df.queryExecution.explainString(FormattedMode)
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"),
        s"# $name — explain(formatted), data=$dir, suffix=$suffix\n" + plan)
      println(s"[plansnap] wrote plans/$tag/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
