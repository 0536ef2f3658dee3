package graft.ingest

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}

/** The pluggable embedding-model boundary (SURVEY §7.1 step 3; ref
  * embedding_handler.py:41-55 — a batched `encode(texts) -> vectors`
  * interface in front of BAAI/bge-m3).
  *
  * The contract is BATCHED on purpose: a real model backend amortizes
  * per-call overhead (GPU kernel launch, tokenizer setup, HTTP round
  * trip) over `batchSize` texts, so the Spark integration must hand the
  * implementation grouped batches, never one row at a time.
  * [[embedColumn]] does exactly that — `mapPartitions` → `grouped`
  * → one `embedBatch` call per group — which is the shape that keeps a
  * 1000-executor embedding job model-bound instead of overhead-bound.
  *
  * [[HashEmbedder]] implements this trait as the deterministic
  * hash-projection stand-in; swapping in a real model is implementing
  * `embedBatch` (and nothing else).
  */
trait Embedder extends Serializable {

  /** Output dimensionality; every returned vector must have it. */
  def dim: Int

  /** Max texts per [[embedBatch]] call. */
  def batchSize: Int = 64

  /** Embed one batch (size ≤ [[batchSize]]) — the single point a model
    * backend implements. Must return exactly one vector per input, in
    * order. */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]]

  /** Append `outCol: array<float>` to `df` by embedding `textCol`,
    * feeding the backend [[batchSize]]-row groups per partition.
    * Row-local (no shuffle); null/absent text embeds as the zero-input
    * case the backend defines. */
  def embedColumn(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val idx = df.schema.fieldIndex(textCol)
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(FloatType, containsNull = false), nullable = false))
    val enc = Encoders.row(outSchema)
    val bs = batchSize
    df.mapPartitions { rows =>
      rows.grouped(bs).flatMap { batch =>
        val vecs = embedBatch(batch.map(r => if (r.isNullAt(idx)) "" else r.getString(idx)))
        require(vecs.length == batch.length,
          s"embedBatch returned ${vecs.length} vectors for ${batch.length} texts")
        batch.lazyZip(vecs).map((r, v) => Row.fromSeq(r.toSeq :+ v.toSeq))
      }
    }(enc)
  }
}
