package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** S11 row sinks — the app-CRUD surface (INSERT/UPDATE/DELETE, ref
  * tool_executor.py:239-285,471-511,525-545; routes.py:2326-2351)
  * re-expressed for an immutable-file world: parquet read-modify-write
  * with an atomic directory swap. Delta/Iceberg MERGE is the
  * production path at scale; the semantics here are identical
  * (insert = append, update = projected overwrite of matching rows,
  * delete = anti-filter), and J4's ownership check becomes the
  * `where` predicate.
  *
  * Scale note: `update`/`delete` rewrite only because plain parquet
  * has no row-level commit; with table formats the same predicates
  * drive file-skipping + row-level deletes. The swap keeps readers
  * consistent (write to `<path>.tmp`, then move).
  */
object Sinks {

  def insertRows(spark: SparkSession, path: String, rows: DataFrame): Unit =
    rows.write.mode(SaveMode.Append).parquet(path)

  /** UPDATE t SET <assignments> WHERE <predicate>. */
  def updateWhere(spark: SparkSession, path: String, predicate: Column,
                  assignments: Map[String, Column]): Unit = {
    val df = spark.read.parquet(path)
    val updated = assignments.foldLeft(df) { case (acc, (name, value)) =>
      acc.withColumn(name, when(predicate, value).otherwise(col(name)))
    }
    rewrite(spark, path, updated)
  }

  /** DELETE FROM t WHERE <predicate> (ownership semi-join = predicate
    * on (id, user_id), ref tool_executor.py:525-545). */
  def deleteWhere(spark: SparkSession, path: String, predicate: Column): Unit = {
    val df = spark.read.parquet(path)
    rewrite(spark, path, df.filter(!coalesce(predicate, lit(false))))
  }

  private def rewrite(spark: SparkSession, path: String, df: DataFrame): Unit = {
    val tmp = path + ".tmp"
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }
}
