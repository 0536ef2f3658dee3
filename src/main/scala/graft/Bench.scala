package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR
  * and emits ONE bare JSON line (plus a file copy at
  * SPARK_GRAFT_BENCH_OUT, default BENCH_LOCAL.json, so the driver's
  * parse never depends on sbt log-prefix stripping). Failed queries
  * are recorded as `"name": -1` in an `errors` map entry — never
  * silently timed as successes. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val warmSec =
      if (sys.env.getOrElse("SPARK_GRAFT_WARM", "0") == "1")
        Tables.warmAll(spark, sfDir)
      else 0.0
    // Queries are independent reads — run them concurrently (bounded
    // pool) so the 32-core scheduler overlaps their many tiny stages;
    // `value` is the honest wall-clock for the whole suite, per-query
    // seconds include contention. SPARK_GRAFT_PAR=1 restores
    // sequential timing.
    val par = sys.env.getOrElse("SPARK_GRAFT_PAR", "8").toInt
    val wall0 = System.nanoTime()
    // longest-processing-time-first: start the known-heavy queries so
    // they overlap the long tail of cheap ones (wall = max, not sum)
    val heavy = Seq("minhash_bands", "rag_sources", "simhash_sketch",
      "a12_l2branch", "a13_metrics", "a8_interpolate", "a9_longest_run",
      "multimodal_decode", "lang_stopwords", "quality_scores").zipWithIndex.toMap
    val tasks = SparkEntry.queries.toSeq
      .sortBy { case (n, _) => (heavy.getOrElse(n, Int.MaxValue), n) }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futures = tasks.map { case (name, fn) =>
      scala.concurrent.Future {
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
          }
        (name, (System.nanoTime() - t0) / 1e9, ok)
      }
    }
    val outcomes = futures.map(f =>
      scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf))
    pool.shutdown()
    val wallSec = (System.nanoTime() - wall0) / 1e9
    val good = outcomes.filter(_._3)
    val qs = good.map { case (k, v, _) => s""""$k":${"%.3f".format(v)}""" }
      .mkString("{", ",", "}")
    val errs = outcomes.filterNot(_._3).map { case (k, _, _) => s""""$k":-1""" }
      .mkString("{", ",", "}")
    val total = "%.3f".format(wallSec)
    // Compact vector-path numbers (BASELINE.md bench plan): brute-force
    // codegen-cosine top-10 over 10k synthetic 1024-dim vectors + IVF
    // probe with recall@10. Reported separately from the suite wall.
    val vector = try {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val dim = 1024
      val corpus = spark.range(10000)
        .select(col("id").as("vec_id"),
          graft.ingest.HashEmbedder.embedUdf(dim)(concat(lit("synthetic doc "),
            col("id"), lit(" body "), (col("id") % 97).cast("string"))).as("embedding"))
        .cache()
      corpus.count()
      val q = graft.ingest.HashEmbedder.embed("synthetic doc 1 body 1", dim)
      val t0 = System.nanoTime()
      val exact = corpus.select(col("vec_id"),
          graft.functions.VectorFunctions.cosineFast(col("embedding"), lit(q)).as("s"))
        .orderBy(desc("s"), col("vec_id")).limit(10)
        .select("vec_id").as[Long].collect().toSeq
      val tKnn = (System.nanoTime() - t0) / 1e9
      val model = graft.operators.VectorIndex.train(corpus, "embedding", k = 32)
      val indexed = graft.operators.VectorIndex.assign(corpus, "embedding", model).cache()
      indexed.count()
      val t1 = System.nanoTime()
      val approx = graft.operators.VectorIndex.searchApprox(indexed, model,
        "vec_id", "embedding", q, 10, 4).select("vec_id").as[Long].collect().toSeq
      val tIvf = (System.nanoTime() - t1) / 1e9
      val recall = graft.operators.VectorIndex.recallAtK(exact, approx)
      corpus.unpersist(); indexed.unpersist()
      s""","vector_n10k_dim1024":{"knn_codegen_sec":${"%.3f".format(tKnn)},"ivf_probe4of32_sec":${"%.3f".format(tIvf)},"ivf_recall_at10":${"%.2f".format(recall)}}"""
    } catch { case e: Throwable =>
      System.err.println(s"[bench] vector bench FAILED: ${e.getMessage}"); ""
    }
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sum_query_sec":${"%.3f".format(good.map(_._2).sum)},"parallelism":$par,"warmup_sec":${"%.3f".format(warmSec)}$vector,"sf":"$sfDir"}"""
    Files.writeString(
      Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")), json)
    spark.stop()
    // bare last line on stdout, after Spark's shutdown logging
    println(json)
  }
}
