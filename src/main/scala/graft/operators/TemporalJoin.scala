package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the built-in surface doesn't ship whole:
  * an as-of join (latest right row at-or-before each left timestamp,
  * per key) and a no-equi-key proximity join (all pairs within a time
  * tolerance). Both are composed from existing relational operators —
  * union + running window, bucketed equi-join — so Catalyst keeps
  * optimizing them; no custom physical plan is needed.
  *
  * Reference shapes: the chart/forecast services align price ticks to
  * feature timestamps (stock_service.py:141-166 resamples then joins
  * on the nearest prior bar) and the RAG logs attribute a search to
  * the most recent prior ingest (routes.py:1316-1371 replays history
  * in arrival order) — both are as-of semantics re-expressed here as
  * one declarative operator instead of a driver-side loop.
  */
object TemporalJoin {

  /** As-of join: for each left row, the payload of the LATEST right
    * row with the same key and `rTs <= lTs` (null payload when no such
    * row). Classic backward as-of, tie = match.
    *
    * Scale shape: the naive formulation is a range join (quadratic
    * candidates per key); this one UNIONs the tagged sides and takes a
    * running `last(_, ignoreNulls)` over one (key, time)-sorted
    * window — exactly ONE shuffle on the key, linear state, no
    * candidate explosion, and both inputs stream through in sort
    * order. At equal timestamps right rows sort BEFORE left rows so
    * "at-or-before" includes exact ties.
    *
    * `right` must be unique per (keys, rTs) — pre-aggregate if not
    * (ambiguous as-of matches are a modeling bug, not a tie to break
    * silently).
    *
    * The payload travels as ONE struct and the window takes `last` of
    * the struct, so a matched row's columns always come from the SAME
    * right row — per-column `last(_, ignoreNulls)` would let a null in
    * one payload column fall back to an older right row and stitch an
    * incoherent match (round-4 advisory). Right payload columns may
    * themselves be null; only the left-side marker struct is null.
    *
    * @param rPayload right columns to carry (may include the `rTs`
    *                 column itself, e.g. to compute the match lag)
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           lTs: String, rTs: String, rPayload: Seq[String]): DataFrame = {
    val lPayload = left.columns.filterNot(keys.contains).toSeq
    val lTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap
    val rStructType = org.apache.spark.sql.types.StructType(
      right.schema.fields.filter(f => rPayload.contains(f.name))
        .sortBy(f => rPayload.indexOf(f.name)))
    val lSide = left.select(
      keys.map(col) ++
        Seq(col(lTs).as("_t"), lit(1).as("_side"),
          lit(null).cast(rStructType).as("_rp")) ++
        lPayload.map(col): _*)
    val rSide = right.select(
      keys.map(col) ++
        Seq(col(rTs).as("_t"), lit(0).as("_side"),
          struct(rPayload.map(col): _*).as("_rp")) ++
        lPayload.map(c => lit(null).cast(lTypes(c)).as(c)): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .select(
        keys.map(col) ++ lPayload.map(col) ++ Seq(col("_side")) ++
          Seq(last(col("_rp"), ignoreNulls = true).over(w).as("_rp")): _*)
      .filter(col("_side") === 1)
      .select(
        keys.map(col) ++ lPayload.map(col) ++
          rPayload.map(c => col("_rp").getField(c).as(c)): _*)
  }

  /** Temporal proximity join: every (left, right) pair with
    * `|lTs - rTs| <= tolSec` — a range join with NO equi key, which
    * naively is a cross join. The scalable shape: bucket time into
    * `tolSec`-wide windows; each left row lands in exactly one bucket,
    * each right row is replicated into its own and the two adjacent
    * buckets, the join becomes an EQUI-join on the bucket id, and the
    * exact predicate filters the candidates. A qualifying pair is
    * always co-bucketed (|Δt| <= tol spans at most one boundary) and
    * never twice (the left row has one bucket), so no dedup pass.
    * Candidates scale with density × 3·tol, not n².
    *
    * Column names must be disjoint between the two sides.
    */
  def proximity(left: DataFrame, right: DataFrame,
                lTs: String, rTs: String, tolSec: Long): DataFrame = {
    val tolUs = tolSec * 1000000L
    def bucket(c: Column): Column = floor(unix_micros(c) / tolUs)
    val l = left.withColumn("_b", bucket(col(lTs)))
    val r = right
      .withColumn("_shift", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("_b", bucket(col(rTs)) + col("_shift"))
      .drop("_shift")
    l.join(r, Seq("_b"))
      .filter(abs(unix_micros(col(lTs)) - unix_micros(col(rTs))) <= tolUs)
      .drop("_b")
  }
}
