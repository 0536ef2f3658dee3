package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B harness for the events/lineitem TIMESTAMP-decode floor (r13
  * judge item #2): `scan_floor` shows events at 3.44× DuckDB while
  * lineitem sits at 0.95× parity — but the lineitem floor reads only
  * DOUBLE columns, while every weak date/ts query decodes an INT64
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) column written by a
  * non-Spark writer (DuckDB/pyarrow — no Spark version metadata).
  *
  * Hypotheses measured here, same files, same aggregate shape:
  *  1. REBASE-CHECK TAX: without writer metadata Spark's vectorized
  *     reader runs under `datetimeRebaseModeInRead` (default
  *     EXCEPTION), which swaps the bulk `readLongs` updater for a
  *     per-value julian-cutoff-checking one. CORRECTED restores the
  *     plain bulk path.
  *  2. NTZ-CAST TAX: isAdjustedToUTC=false infers TIMESTAMP_NTZ and
  *     [[Tables.load]] casts to TimestampType — a per-value projection
  *     the raw-NTZ variant skips.
  *  3. TYPE FLOOR: the same file's plain INT64 column (event_id) is
  *     the true decode floor for an 8-byte column.
  * Run on an IDLE box: `sbt -batch "runMain graft.ProfileTsDecode"`.
  */
object ProfileTsDecode {
  private def time(name: String, reps: Int)(mk: => DataFrame): Double = {
    mk.write.mode("overwrite").format("noop").save() // warm
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      mk.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val m = ts.min
    println(f"[tsdecode] $name%-52s min=$m%.3f median=${ts.sorted.apply(reps / 2)}%.3f")
    m
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scale/x100")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.range(100000).agg(sum("id")).collect()

    def freshEvents = spark.read.parquet(s"$sfDir/events.parquet")
    def freshLineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    println("events raw read schema:   " + freshEvents.schema.simpleString)
    println("lineitem raw read schema: " + freshLineitem.schema.simpleString)

    // fixed-cost decomposition: a zero-column count is pure
    // scan-scheduling floor (row-group metadata + task round-trips,
    // no value decode); spark.range is the job floor with no file at all
    time("JOB FLOOR   spark.range(10M).sum", reps)(
      spark.range(10L * 1000 * 1000).agg(sum("id")))
    time("events  count(1)  [zero-column scan floor]", reps)(
      freshEvents.agg(count(lit(1))))
    time("lineitem count(1) [zero-column scan floor]", reps)(
      freshLineitem.agg(count(lit(1))))

    for (mode <- Seq("EXCEPTION", "CORRECTED")) {
      spark.conf.set("spark.sql.parquet.datetimeRebaseModeInRead", mode)
      println(s"--- datetimeRebaseModeInRead=$mode ---")
      time(s"events  count(event_id)+sum(value)   [plain INT64 floor]", reps)(
        freshEvents.agg(count(col("event_id")), sum(col("value"))))
      time(s"events  count(ts)+sum(value)         [raw ts col]", reps)(
        freshEvents.agg(count(col("ts")), sum(col("value"))))
      time(s"events  count(cast ts)+sum(value)    [Tables.load shape]", reps)(
        freshEvents.withColumn("ts", col("ts").cast("timestamp"))
          .agg(count(col("ts")), sum(col("value"))))
      time(s"events  max(unix_micros(cast ts))    [arith after cast]", reps)(
        freshEvents.withColumn("ts", col("ts").cast("timestamp"))
          .agg(max(unix_micros(col("ts")))))
      time(s"lineitem count(l_shipdate)+sum(price) [ts col]", reps)(
        freshLineitem.agg(count(col("l_shipdate")), sum(col("l_extendedprice"))))
      time(s"lineitem sum(price)+avg(qty)          [r13 scan_floor]", reps)(
        freshLineitem.agg(sum(col("l_extendedprice")), avg(col("l_quantity"))))
      time(s"lineitem shipdate>1995-03-15 count    [q3 filter shape]", reps)(
        freshLineitem
          .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp_ntz"))
          .agg(count(lit(1))))
    }
    spark.stop()
  }
}
