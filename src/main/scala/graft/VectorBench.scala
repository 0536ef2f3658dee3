package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.{VectorIndex, VectorSearch}

/** Vector-path benchmark (BASELINE.md "Spark bench plan"): brute-force
  * cosine top-k over N synthetic 1024-dim vectors, N ∈ {10k, 100k},
  * comparing the HOF cosine against the native codegen expression, and
  * the IVF approximate path with its recall@10. Emits one JSON line
  * (plus a file at SPARK_GRAFT_VBENCH_OUT). */
object VectorBench {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    val dim = 1024
    val results = Seq(10000, 100000).map { n =>
      // deterministic synthetic corpus: feature-hashed doc ids
      val corpus = spark.range(n)
        .select(col("id").as("vec_id"),
          graft.ingest.HashEmbedder.embedUdf(dim)(concat(lit("synthetic doc "),
            col("id"), lit(" body "), (col("id") % 97).cast("string"))).as("embedding"))
        .cache()
      corpus.count() // materialize: bench scores scan+topk, not embed
      val query = graft.ingest.HashEmbedder.embed("synthetic doc 1 body 1", dim)

      def time[T](f: => T): (T, Double) = {
        val t0 = System.nanoTime()
        val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      val (exact, tHof) = time {
        corpus.select(col("vec_id"),
            VectorFunctions.cosine(col("embedding"), lit(query)).as("score"))
          .orderBy(desc("score"), col("vec_id")).limit(10)
          .select("vec_id").as[Long].collect().toSeq
      }
      val (exactGen, tGen) = time {
        corpus.select(col("vec_id"),
            VectorFunctions.cosineFast(col("embedding"), lit(query)).as("score"))
          .orderBy(desc("score"), col("vec_id")).limit(10)
          .select("vec_id").as[Long].collect().toSeq
      }
      require(exact == exactGen, "codegen/HOF disagreement")
      val (model, tTrain) = time(VectorIndex.train(corpus, "embedding", k = 32))
      val indexed = VectorIndex.assign(corpus, "embedding", model).cache()
      indexed.count()
      val (approx, tIvf) = time {
        VectorIndex.searchApprox(indexed, model, "vec_id", "embedding",
          query, k = 10, nprobe = 4).select("vec_id").as[Long].collect().toSeq
      }
      val recall = VectorIndex.recallAtK(exact, approx)
      corpus.unpersist(); indexed.unpersist()
      s""""n$n":{"knn_hof_sec":${"%.3f".format(tHof)},"knn_codegen_sec":${"%.3f".format(tGen)},""" +
        s""""ivf_train_sec":${"%.3f".format(tTrain)},"ivf_probe4of32_sec":${"%.3f".format(tIvf)},""" +
        s""""ivf_recall_at10":${"%.2f".format(recall)}}"""
    }
    val json = s"""{"metric":"vector_bench","dim":$dim,${results.mkString(",")}}"""
    Files.writeString(
      Paths.get(sys.env.getOrElse("SPARK_GRAFT_VBENCH_OUT", "VBENCH_LOCAL.json")), json)
    spark.stop()
    println(json)
  }
}
