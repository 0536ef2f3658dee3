package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** IVF-style approximate-nearest-neighbor index — the scale path that
  * replaces the reference's FAISS index (SURVEY §4 "ANN index";
  * enhanced_internal_db_service.py:602-630). Brute-force
  * [[VectorSearch.knnExact]] stays the exact/oracle baseline.
  *
  * Design (standard inverted-file ANN):
  *  - **train**: k-means centroids over (a sample of) the corpus
  *    (MLlib, one pass over a driver-bounded sample);
  *  - **assign**: each vector gets its nearest-centroid id — row-local
  *    with the centroid table broadcast in the plan literal;
  *  - **store**: parquet partitioned by `cluster` — a probe touches
  *    only nprobe partitions (partition pruning, never a full scan);
  *  - **query**: rank centroids on the driver (k × dim floats —
  *    trivially small), probe the top `nprobe` clusters, exact
  *    cosine rerank inside them.
  *
  * Recall/latency trade is nprobe/k: nprobe = k degrades to exact
  * search. At 100 TB the same layout holds — clusters are directories,
  * probing is partition pruning, rerank is a pruned scan.
  */
object VectorIndex {

  final case class Model(centroids: Array[Array[Float]]) {
    def nearest(v: Array[Float]): Int = {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < centroids.length) {
        var d = 0.0
        val ctr = centroids(c)
        var i = 0
        while (i < math.min(ctr.length, v.length)) {
          val t = ctr(i) - v(i); d += t * t; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

    /** Centroid ids ranked by distance to `v` (for probing). */
    def ranked(v: Array[Float]): Seq[Int] =
      centroids.indices.sortBy { c =>
        val ctr = centroids(c)
        var d = 0.0
        var i = 0
        while (i < math.min(ctr.length, v.length)) {
          val t = ctr(i) - v(i); d += t * t; i += 1
        }
        d
      }
  }

  /** Train k centroids (k-means||, fixed seed → deterministic) on a
    * seeded SAMPLE of the corpus, never the full data: IVF centroids
    * only need to approximate the density, and a full-corpus fit at
    * 100 TB is a full-data ML job before a single probe can run.
    * `maxTrainSamples` (default 20k ≈ 80 MB of 1024-dim floats)
    * bounds the fit; corpora at or under the bound train exactly as
    * before. One cheap count() sizes the sampling fraction. */
  def train(df: DataFrame, embCol: String, k: Int, seed: Long = 42L,
            maxIter: Int = 20, maxTrainSamples: Int = 20000): Model = {
    val vecs0 = df.select(array_to_vector(col(embCol)).as("features"))
    val n = vecs0.count()
    val vecs =
      if (n <= maxTrainSamples) vecs0
      // 1.2× oversample so the post-sample count lands at or above the
      // target with high probability; exactness is irrelevant here
      else vecs0.sample(withReplacement = false,
        math.min(1.0, 1.2 * maxTrainSamples / n.toDouble), seed)
    val km = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
    val model = km.fit(vecs)
    Model(model.clusterCenters.map(_.toArray.map(_.toFloat)))
  }

  /** Assign a cluster id per row (row-local; centroids ride the
    * closure). */
  def assign(df: DataFrame, embCol: String, model: Model): DataFrame = {
    val centroids = model.centroids
    val nearestUdf = udf((v: Seq[Float]) => Model(centroids).nearest(v.toArray))
    df.withColumn("cluster", nearestUdf(col(embCol)))
  }

  /** Build and persist the partitioned index. */
  def buildAndWrite(df: DataFrame, embCol: String, model: Model,
                    path: String): Unit =
    assign(df, embCol, model).write.mode("overwrite")
      .partitionBy("cluster").parquet(path)

  /** Approximate top-k: probe the `nprobe` nearest clusters, exact
    * cosine rerank within them. `index` must carry a `cluster`
    * column (from [[assign]] or the partitioned parquet). */
  def searchApprox(index: DataFrame, model: Model, idCol: String,
                   embCol: String, query: Array[Float], k: Int,
                   nprobe: Int): DataFrame = {
    val probes = model.ranked(query).take(nprobe)
    index.filter(col("cluster").isin(probes: _*))
      .select(col(idCol),
        VectorFunctions.cosineFast(col(embCol), lit(query)).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** recall@k of an approximate result against the exact result
    * (driver-side over two k-row sets). */
  def recallAtK(exact: Seq[Long], approx: Seq[Long]): Double =
    if (exact.isEmpty) 1.0
    else exact.toSet.intersect(approx.toSet).size.toDouble / exact.size
}
