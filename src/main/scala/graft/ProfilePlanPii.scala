package graft
import org.apache.spark.sql.functions._
object ProfilePlanPii {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val s = Sessions.local("8")
    val docs = Tables.load(s, d, "documents")
    def withPii = docs.select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id"),
            lit("@example.com for access"))).otherwise(lit(""))).as("t"))
    val cur = graft.SparkEntry.queries("pii_scrub")(s, d)
    val early = withPii.orderBy("doc_id")
      .select(col("doc_id"), graft.operators.Pii.scrub(col("t")).as("p"))
      .select(col("doc_id"),
        col("p._1").as("n_emails"), col("p._2").as("n_phones"),
        col("p._3").as("n_urls"),
        length(col("p._4")).cast("bigint").as("masked_len"),
        md5(col("p._4")).as("masked_md5"))
    def udfCount(df: org.apache.spark.sql.DataFrame): Int = {
      val p = df.queryExecution.executedPlan.toString
      "UDF".r.findAllIn(p).length
    }
    println("CUR udf refs: " + udfCount(cur))
    println(cur.queryExecution.executedPlan.toString.take(1800))
    println("EARLY udf refs: " + udfCount(early))
    println(early.queryExecution.executedPlan.toString.take(1800))
    s.stop()
  }
}
