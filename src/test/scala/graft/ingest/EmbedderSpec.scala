package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The pluggable embedder boundary (ref embedding_handler.py:41-55):
  * the contract is that implementations receive BATCHES of at most
  * `batchSize` texts, partition-locally, and the column transform is
  * equivalent to the per-row UDF path. */
/** Records every batch size it is handed (accumulator survives the
  * executor round trip). Top-level so the closure doesn't capture the
  * non-serializable spec instance. */
private class RecordingEmbedder(batches: org.apache.spark.util.CollectionAccumulator[Int])
    extends Embedder {
  override val dim = 8
  override val batchSize = 3
  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    batches.add(texts.length)
    texts.map(t => HashEmbedder.embed(t, dim))
  }
}

class EmbedderSpec extends SparkSpec {
  import spark.implicits._

  test("embedColumn feeds the backend <=batchSize groups and embeds every row") {
    val acc = spark.sparkContext.collectionAccumulator[Int]("batches")
    val docs = (1 to 10).map(i => (i.toLong, s"doc number $i about topic ${i % 3}"))
      .toDF("id", "text").repartition(2)
    val out = new RecordingEmbedder(acc).embedColumn(docs, "text", "embedding")
    assert(out.count() == 10)
    val sizes = acc.value
    assert(!sizes.isEmpty, "backend never called")
    sizes.forEach(n => assert(n <= 3, s"batch of $n exceeds batchSize=3"))
    assert(sizes.stream.mapToInt(identity(_)).sum == 10, "every row embedded exactly once")
    // schema: appended array<float> column
    assert(out.schema("embedding").dataType.typeName == "array")
  }

  test("HashEmbedder through the trait boundary equals the UDF path") {
    val docs = Seq((1L, "attention is all you need"), (2L, "spark shuffle service"),
      (3L, "")).toDF("id", "text")
    val viaTrait = HashEmbedder.embedColumn(docs, "text", "emb")
      .select($"id", $"emb").as[(Long, Seq[Float])].collect().toMap
    val viaUdf = docs.select($"id",
        HashEmbedder.embedCol($"text", HashEmbedder.DefaultDim).as("emb"))
      .as[(Long, Seq[Float])].collect().toMap
    assert(viaTrait == viaUdf)
  }

  test("embedBatch contract: one vector per text, in order, at dim") {
    val texts = Seq("a", "b c d", "")
    val vecs = HashEmbedder.embedBatch(texts)
    assert(vecs.length == 3)
    assert(vecs.forall(_.length == HashEmbedder.DefaultDim))
    assert(vecs(0).toSeq == HashEmbedder.embed("a", HashEmbedder.DefaultDim).toSeq)
  }
}
