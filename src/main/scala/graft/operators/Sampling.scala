package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-mix sampling (north-star operator; no reference
  * counterpart): deterministic hash-mod systematic sampling at
  * per-stratum rates — keep a row iff `(id·PRIME) mod 1000 <
  * rate_permille(stratum)`.
  *
  * Why not `df.sample`/`sampleBy`: RNG-based sampling is
  * partition-order-dependent and irreproducible across engines or
  * re-runs on re-partitioned data. The hash-mod rule is row-local,
  * engine-portable (plain integer arithmetic — the DuckDB oracle
  * reproduces it exactly), and auditable: membership of every document
  * in the training mix is a pure function of its id. That property is
  * what a 100 TB mix build needs — re-running the pipeline, or
  * rebuilding one shard, selects the same rows.
  *
  * The id is folded mod a prime BEFORE the multiply, so the product
  * stays < 2^48 and the rule never 64-bit-wraps at any id range (a
  * bare id·PRIME silently wraps in Spark past id ≈ 3.5e9 while DuckDB
  * raises — exactly the divergence a portable rule must not have).
  * Ids are assumed non-negative (DuckDB `%` goes negative there,
  * Spark's pmod does not). */
object Sampling {

  def systematicSample(df: DataFrame, idCol: Column, stratumCol: Column,
                       ratesPermille: Map[String, Long],
                       defaultPermille: Long = 0L): DataFrame = {
    val key = pmod(pmod(idCol, lit(100003L)) * lit(2654435761L), lit(1000L))
    // foldLeft in sorted order for a deterministic plan
    val rate = ratesPermille.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPermille)) { case (acc, (s, r)) =>
        when(stratumCol === s, lit(r)).otherwise(acc)
      }
    df.filter(key < rate)
  }
}
