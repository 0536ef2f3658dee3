package graft.plans

import graft.SparkSpec
import graft.functions.VectorFunctions.cosineFast
import graft.operators.VectorIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ANN auto-swap (SURVEY §4): a registered cluster-partitioned
  * table answers `ORDER BY cosine DESC LIMIT k` by probing — the rule
  * must inject the cluster predicate (→ partition pruning at the
  * scan), produce exactly searchApprox's results, and never fire
  * without registration or over an explicit cluster predicate. */
class RewriteCosineTopKToProbesSpec extends SparkSpec {

  private lazy val dim = 8
  private lazy val (indexPath, model) = {
    import spark.implicits._
    val corpus = spark.range(200)
      .select(col("id").as("vec_id"),
        graft.ingest.HashEmbedder.embedUdf(dim)(
          concat(lit("doc "), col("id"))).as("embedding"))
    val m = VectorIndex.train(corpus.toDF(), "embedding", k = 4, maxIter = 10)
    val dir = java.nio.file.Files.createTempDirectory("graft_swapspec_").toString
    VectorIndex.buildAndWrite(corpus.toDF(), "embedding", m, dir)
    VectorIndexRegistry.register(dir, m, nprobe = 2)
    (dir, m)
  }
  private lazy val q = graft.ingest.HashEmbedder.embed("doc 7", dim)

  private def topk(df: DataFrame): DataFrame =
    df.select(col("vec_id"), cosineFast(col("embedding"), lit(q)).as("score"))
      .orderBy(desc("score"), col("vec_id")).limit(5)

  test("registered table: probe filter injected and partition-pruned") {
    val df = topk(spark.read.parquet(indexPath))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("cluster") && optimized.contains(" IN "), optimized)
    df.collect()
    val physical = df.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cluster[^\\]]*IN".r
      .findFirstIn(physical).isDefined, physical)
  }

  test("swap result equals searchApprox exactly (outer projection shape)") {
    import spark.implicits._
    val idx = spark.read.parquet(indexPath)
    // the trailing select reproduces the pruning-inserted Project
    // between the limit and the sort that hid the round-6 near-miss
    val swapped = topk(idx).select("vec_id")
    assert(swapped.queryExecution.optimizedPlan.toString.contains(" IN "),
      swapped.queryExecution.optimizedPlan.toString)
    val viaSwap = swapped.as[Long].collect().toSeq
    val viaApi = VectorIndex.searchApprox(idx, model, "vec_id", "embedding",
        q, 5, 2).select("vec_id").as[Long].collect().toSeq
    assert(viaSwap == viaApi)
  }

  test("no registration, no swap: unregistered copy returns exact top-k") {
    import spark.implicits._
    val plain = spark.read.parquet(indexPath)
    val copy = java.nio.file.Files.createTempDirectory("graft_swapspec_un_").toString
    plain.write.mode("overwrite").partitionBy("cluster").parquet(copy)
    val df = topk(spark.read.parquet(copy))
    assert(!df.queryExecution.optimizedPlan.toString.contains(" IN "),
      df.queryExecution.optimizedPlan.toString)
    val exact = plain
      .select(col("vec_id"), cosineFast(col("embedding"), lit(q)).as("s"))
      .orderBy(desc("s"), col("vec_id")).limit(5)
      .select("vec_id").as[Long].collect().toSeq
    assert(df.select("vec_id").as[Long].collect().toSeq == exact)
  }

  test("an explicit cluster predicate blocks the swap") {
    val df = topk(spark.read.parquet(indexPath).filter(col("cluster") === 0))
    val optimized = df.queryExecution.optimizedPlan.toString
    // the user's own equality survives; no IN-probe list is stacked
    assert(!optimized.contains(" IN "), optimized)
  }

  test("ascending order never swaps (probing nearest clusters would be wrong)") {
    val df = spark.read.parquet(indexPath)
      .select(col("vec_id"), cosineFast(col("embedding"), lit(q)).as("score"))
      .orderBy(asc("score"), col("vec_id")).limit(5)
    assert(!df.queryExecution.optimizedPlan.toString.contains(" IN "),
      df.queryExecution.optimizedPlan.toString)
  }
}
