package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MySQL/MariaDB dialect coercions for the JDBC front door (S2).
  *
  * The reference serves its user tables from MariaDB over aiomysql and
  * normalizes three type quirks in the serving layer, row by row:
  *  - BIT / TINYINT(1) flags arrive as ints or bytes and are coerced
  *    with `bool(...)` (ref src/tools/tool_executor.py:227-228,
  *    `alarm_enabled`);
  *  - TIME columns arrive as timedeltas and are formatted to "HH:MM"
  *    with seconds DROPPED (ref src/tools/tool_executor.py:156-161);
  *  - DATE columns are emitted as ISO strings (ref
  *    src/tools/tool_executor.py:199-201, `diagnosed_date.isoformat()`).
  *
  * Here the same contract is a set of COLUMN expressions applied once
  * over whatever arrival type the JDBC dialect produced — row-local,
  * codegen'd, schema-driven — instead of a per-row Python loop. Works
  * against any JDBC database: the switch is on the arrived Spark type,
  * not on the source engine (embedded Derby stands in for MariaDB in
  * tests; its TIME/SMALLINT/DATE columns arrive with the same Spark
  * types MySQL's would).
  */
object MySqlCoercions {

  /** BIT(1)/TINYINT(1)/BOOLEAN flag → BooleanType, whatever shape the
    * dialect delivered: boolean (kept), any numeric (`≠ 0`, MySQL
    * TINYINT(1) semantics), or BINARY (BIT(n) as bytes: numeric value
    * of the hex payload `≠ 0`). Nulls stay null — the reference's
    * `if ... is not None` guard. */
  def bitToBool(c: Column, dt: DataType): Column = dt match {
    case BooleanType => c
    case _: NumericType => c =!= 0
    case BinaryType => conv(hex(c), 16, 10).cast("long") =!= 0L
    case StringType => c.cast("long") =!= 0L
    case other => throw new IllegalArgumentException(
      s"bitToBool: unsupported arrival type $other")
  }

  /** TIME → "HH:MM" with seconds dropped (the reference's
    * divmod(td.seconds, 3600) formatting). JDBC TIME arrives as a
    * 1970-01-01 TimestampType clock time; string arrivals
    * ("HH:MM:SS") are truncated. A string without at least an
    * "H:M" shape (e.g. "0730", "garbage") maps to null — an
    * explicit miss, never a fabricated clock time. MySQL TIME
    * ranges to 838:59:59; the reference's `.seconds` accessor drops
    * whole days, so >24h hours reduce MOD 24 for parity:
    * "123:45:00" → "03:45" (123h = 5d 3h45m), exactly what the
    * reference emits for the same value. */
  def timeToHhMm(c: Column, dt: DataType): Column = dt match {
    case TimestampType | TimestampNTZType => date_format(c, "HH:mm")
    case StringType =>
      // split on ':' rather than fixed positions — a non-padded
      // arrival like "7:05:59" must yield "07:05", not "7:05:"
      val hh = lpad((split(c, ":").getItem(0).cast("long") % 24).cast("string"),
        2, "0")
      when(c.rlike("^\\d+:\\d{1,2}(:\\d{1,2}(\\.\\d+)?)?$"),
        concat(hh, lit(":"), lpad(split(c, ":").getItem(1), 2, "0")))
        .otherwise(lit(null).cast("string"))
    case other => throw new IllegalArgumentException(
      s"timeToHhMm: unsupported arrival type $other")
  }

  /** DATE → ISO "yyyy-MM-dd" string (`isoformat()`). A string that
    * does not lead with a "Y-M-D" shape maps to null rather than the
    * plausible-looking sentinel "0000-00-00" that an unguarded
    * regexp_extract ("" on miss) would fabricate. */

  def dateToIso(c: Column, dt: DataType): Column = dt match {
    case DateType | TimestampType | TimestampNTZType =>
      date_format(c, "yyyy-MM-dd")
    case StringType =>
      // extract and re-pad the components — "2024-7-5 10:00" must
      // yield "2024-07-05", not a fixed-width slice of the raw string
      val part = (i: Int) => regexp_extract(c, "^(\\d+)-(\\d+)-(\\d+)", i)
      when(c.rlike("^\\d+-\\d+-\\d+"),
        concat(lpad(part(1), 4, "0"), lit("-"),
          lpad(part(2), 2, "0"), lit("-"), lpad(part(3), 2, "0")))
        .otherwise(lit(null).cast("string"))
    case other => throw new IllegalArgumentException(
      s"dateToIso: unsupported arrival type $other")
  }

  /** Apply the serving-layer coercion contract to named columns,
    * switching each on its ARRIVED type (so the same call works over
    * MySQL, Derby, or a parquet snapshot of either). Unknown names
    * fail loudly. */
  def normalize(df: DataFrame, bitCols: Seq[String] = Nil,
                timeCols: Seq[String] = Nil,
                dateCols: Seq[String] = Nil): DataFrame = {
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    def dtOf(n: String): DataType = types.getOrElse(n,
      throw new IllegalArgumentException(s"normalize: no column '$n'"))
    val withBits = bitCols.foldLeft(df)((acc, n) =>
      acc.withColumn(n, bitToBool(col(n), dtOf(n))))
    val withTimes = timeCols.foldLeft(withBits)((acc, n) =>
      acc.withColumn(n, timeToHhMm(col(n), dtOf(n))))
    dateCols.foldLeft(withTimes)((acc, n) =>
      acc.withColumn(n, dateToIso(col(n), dtOf(n))))
  }
}
