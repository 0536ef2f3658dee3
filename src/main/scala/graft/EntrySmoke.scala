package graft
import org.apache.spark.sql.SparkSession
/** Replicates the driver's smoke check: a plain session (no graft
  * extensions, no legacy flags) calling SparkEntry.entry. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.show(3, 60)
    spark.stop()
  }
}
