package graft

/** Regenerates pinned VALUES oracles: runs one registered query and
  * prints its rows as a DuckDB/Spark-parseable VALUES literal (the
  * format PinnedOracleSpec replays through `spark.sql`).
  *
  * Usage: runMain graft.PinDump <sfDir> <queryName>
  */
object PinDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val df = SparkEntry.queries(name)(spark, sfDir)
    val schema = df.schema
    val rows = df.collect()
    def lit(v: Any, dt: org.apache.spark.sql.types.DataType): String = {
      import org.apache.spark.sql.types._
      (v, dt) match {
        case (null, _) => "NULL"
        case (x, LongType)    => s"CAST($x AS BIGINT)"
        case (x, IntegerType) => s"CAST($x AS INT)"
        case (x, DoubleType)  => s"CAST($x AS DOUBLE)"
        case (x: String, _)   => "'" + x.replace("'", "''") + "'"
        case (x, _) => x.toString
      }
    }
    val values = rows.map { r =>
      schema.fields.indices
        .map(i => lit(r.get(i), schema.fields(i).dataType))
        .mkString("(", ", ", ")")
    }.mkString(", ")
    val cols = schema.fieldNames.mkString(", ")
    println(s"PIN>>> SELECT * FROM (VALUES $values) AS t($cols)")
    spark.stop()
  }
}
