package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    new java.io.File(outDir).mkdirs()
    // oracle-readable fixture inputs must exist before the driver's
    // DuckDB pass replays oracle_sql.json (tool_calls / grocery family)
    graft.fixtures.Fixtures.materializeForOracle(spark)
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), oracleSqlJson)
    spark.stop()
  }

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness. */
  def jsonQuote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** The oracle map as one JSON object (shared with Bench's
    * self-adjudication dump). */
  def oracleSqlJson: String = oracleSqlJson(Set.empty)

  /** Same, minus an exclusion set — Bench passes its
    * SPARK_GRAFT_EXCLUDE list so the DuckDB baseline never runs the
    * oracles of queries the point explicitly dropped (at the x1000
    * sweep point the quadratic range_join oracle alone would run for
    * hours). */
  def oracleSqlJson(exclude: Set[String]): String = SparkEntry.oracleSql
    .filterNot { case (k, _) => exclude(k) }
    .map { case (k, v) => s"${jsonQuote(k)}: ${jsonQuote(v)}" }
    .mkString("{", ",", "}")
}
