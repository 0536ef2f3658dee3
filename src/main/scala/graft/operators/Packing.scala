package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training-data prep (north-star operator;
  * no reference counterpart — designed Spark-first): assign documents
  * to fixed-token-budget training sequences the way large-scale
  * pipelines do it — concat-and-split in a deterministic document
  * order, i.e. a document's sequence id is `floor(tokens-before /
  * budget)` within its shard.
  *
  * Scale design: packing is inherently sequential (each assignment
  * depends on the running token total), so the operator packs WITHIN
  * shards — the window partitions by the shard key, one shuffle, every
  * shard packs in parallel. A single global pack would be one
  * unpartitioned window over the corpus; shards are how a 100 TB
  * corpus packs on 1000 executors, and per-shard sequence ids are
  * globally unique once prefixed with the shard id.
  */
object Packing {

  /** Adds `seq_id` (per-shard packed-sequence id) to `df`.
    *
    * @param shardCol deterministic shard key (e.g. `pmod(doc_id, n)`)
    * @param orderCol pack order within the shard (unique, for
    *                 determinism)
    * @param tokenCol per-document token count
    * @param budget   tokens per packed sequence
    */
  def packSequences(df: DataFrame, shardCol: Column, orderCol: Column,
                    tokenCol: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("_before", coalesce(sum(tokenCol).over(w), lit(0L)))
      .withColumn("seq_id", floor(col("_before") / budget).cast("long"))
      .drop("_before")
  }
}
