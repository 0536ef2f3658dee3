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
  * Reference shapes: the chart pipeline aligns price bars to request
  * timestamps (yahoo_finance_service.py:102-121 fetches the
  * timestamp-aligned chart series that tool_executor.py:304-331
  * consumes bar-by-bar) and the RAG logs attribute a search to the
  * most recent prior ingest (routes.py:1316-1371 replays history in
  * arrival order) — both are as-of semantics re-expressed here as
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

  /** [[asof]] for the common case where BOTH sides are predicates
    * over ONE source (last-touch attribution, event-to-event
    * alignment): the two-table formulation scans the source twice and
    * pays a pre-aggregation shuffle to make the right side unique,
    * while the union+window shape never needed two inputs at all —
    * the union IS the source. One scan (both predicates and the key
    * filters push into it as a single disjunction), one shuffle on
    * the keys, and the right-side uniqueness contract is replaced by
    * an explicit `rTieBreak`: among right rows with equal (keys, ts)
    * the LAST in ascending tie-break order wins — e.g. a
    * `max(event_id)` pre-aggregation becomes `rTieBreak =
    * Seq(col("event_id"))` with no shuffle. At the 100× bench point
    * the two-table form's wall was two events scans + the pre-agg;
    * this form halves the scan bytes and deletes the shuffle.
    *
    * `isLeft` and `isRight` must be DISJOINT (a row satisfying both
    * would have to act as its own match candidate — model that
    * explicitly with [[asof]]). ENFORCED per row at zero extra cost
    * (r16 self-audit: this was documented only): the side tag raises
    * through Spark's `raise_error` on the first overlapping row, so a
    * contract violation fails the job loudly instead of silently
    * tagging the row as left-only. Payloads are (name, expression)
    * pairs evaluated on the source row.
    *
    * `rTieBreak = Nil` requires UNIQUE right rows per (keys, ts):
    * with no tie-break, duplicate right rows at an equal (keys, ts)
    * sort in nondeterministic relative order and the running `last`
    * picks an arbitrary one. The base [[asof]] documents the same
    * uniqueness contract; here the empty case warns loud (same style
    * as toDailySpine) because the fused form's doc says the tie-break
    * "replaces" the pre-aggregation — it only does if you pass one.
    */
  def asofFused(src: DataFrame, isLeft: Column, isRight: Column,
                keys: Seq[String], ts: Column,
                lPayload: Seq[(String, Column)],
                rPayload: Seq[(String, Column)],
                rTieBreak: Seq[Column] = Nil): DataFrame = {
    if (rTieBreak.isEmpty)
      System.err.println(
        "[graft] asofFused: empty rTieBreak — duplicate right rows at " +
          "an equal (keys, ts) match nondeterministically; pass a " +
          "tie-break or guarantee unique (keys, ts) right rows")
    val lCols = lPayload.map { case (n, c) => c.as(n) }
    val tagged = src
      .filter(isLeft || isRight)
      .select(
        keys.map(col) ++
          Seq(ts.as("_t"),
            when(isLeft && isRight, raise_error(lit(
              "asofFused: isLeft and isRight overlap on a row — the " +
                "predicates must be disjoint (model a self-matching " +
                "row with asof)")).cast("int"))
              .when(isLeft, 1).otherwise(0).as("_side"),
            when(isRight, struct(rPayload.map { case (n, c) => c.as(n) }: _*))
              .as("_rp")) ++
          lCols ++ rTieBreak.zipWithIndex.map { case (c, i) => c.as(s"_tb$i") }: _*)
    // right rows sort BEFORE left rows at equal ts (tie = match), and
    // among equal-(keys, ts) right rows the tie-break puts the winner
    // LAST so the running `last` picks it. The payload travels as one
    // struct for the same row-coherence reason as [[asof]].
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t") +: col("_side") +: rTieBreak.indices.map(i => col(s"_tb$i")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("_rp", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(
        keys.map(col) ++ lPayload.map { case (n, _) => col(n) } ++
          rPayload.map { case (n, _) => col("_rp").getField(n).as(n) }: _*)
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

  /** Per-bucket batch of inclusive-bounds binary-search counts: for
    * each probe timestamp, the number of sorted `arr` values in
    * [p−tol, p+tol] (upperBound − lowerBound). ONE call per bucket —
    * the arrays deserialize once and every probe in the bucket reuses
    * them; the per-probe-row formulation re-copied the neighbor array
    * for every probe (measured 92 GB of array copies / 11.7 s at the
    * 100× point vs ~3 s for this shape). Null/empty neighbor array →
    * all zeros. */
  /** Exposed for ProfileAdhoc plan A/Bs only. */
  private[graft] def windowCountsUdfForBench = windowCountsUdf

  private val windowCountsUdf =
    udf((probes: Seq[Long], arr: Seq[Long], tolUs: Long) => {
      if (probes == null) Seq.empty[Long]
      else if (arr == null || arr.isEmpty) probes.map(_ => 0L)
      else {
        val a = arr.toArray
        probes.map { ts =>
          val lo = ts - tolUs; val hi = ts + tolUs
          var l = 0; var r = a.length
          while (l < r) { val m = (l + r) >>> 1; if (a(m) < lo) l = m + 1 else r = m }
          val first = l
          l = first; r = a.length
          while (l < r) { val m = (l + r) >>> 1; if (a(m) <= hi) l = m + 1 else r = m }
          (l - first).toLong
        }
      }
    })

  /** Aggregate pushdown through [[proximity]]: per LEFT row, the
    * COUNT of right rows within `tolSec` — without materializing the
    * pairs. When a consumer only needs counts (pairs-per-window,
    * has-any-neighbor), enumerating the join output makes the work
    * O(qualifying pairs): at the 100× bench point the events corpus
    * yields ~8 G purchase×error pairs and the enumerate-then-count
    * plan spends 26 s producing rows an aggregate immediately folds
    * away. Here the right side collapses to ONE sorted timestamp
    * array per `tolSec` bucket, each left row probes its own and the
    * two adjacent buckets (same co-bucketing argument as
    * [[proximity]], replication flipped to the left side), and two
    * binary searches per probe count the inclusive [ts−tol, ts+tol]
    * window — O((|L|+|R|) log density) total, independent of the pair
    * count. Same bounds semantics as proximity's `abs(Δ) <= tol`
    * (spec-asserted equal to counting its output).
    *
    * Returns left.* + `n_matches` (zero-count rows KEPT — "no
    * neighbors" is an answer, where the enumerating join would drop
    * the row). `left` must not already contain `n_matches`.
    *
    * Scale notes (both sides bounded differently):
    *  - LEFT: probes are chunked — an in-shuffle window count sizes a
    *    per-bucket chunk fan-out, and rows spread across
    *    `ceil(n/maxProbesPerChunk)` chunks by row-content hash,
    *    so no single aggregation buffer / output row ever holds more
    *    than ~`maxProbesPerChunk` left rows no matter how dense a
    *    tolSec bucket gets (a traffic spike, a clock-skewed batch
    *    import). Sparse buckets get exactly one chunk — zero fan-out
    *    cost — and each extra chunk only re-reads the bucket's right
    *    arrays, never re-shuffles the left. Chunking is
    *    deterministic-by-value (content hash), so identical input
    *    multisets chunk identically across retries; a degenerate
    *    corpus of millions of BYTE-IDENTICAL left rows collapses to
    *    one chunk (interchangeable rows, counts still correct — only
    *    the memory bound reverts to disclosed-unbounded there).
    *  - RIGHT: per-bucket state is density × 8 B (one long per right
    *    row in the bucket, 3× via the neighbor concat); the densest
    *    right bucket still bounds executor memory. For corpora where
    *    one tolSec window holds tens of millions of RIGHT rows, shrink
    *    the window or pre-aggregate the right side to coarser ticks.
    *
    * @param maxProbesPerChunk target left rows per aggregation chunk;
    *        the default (64 Ki) keeps a chunk's payload in the tens of
    *        MB for wide rows while still amortizing the right-array
    *        deserialization that motivates batching probes at all
    */
  def proximityCount(left: DataFrame, right: DataFrame,
                     lTs: String, rTs: String, tolSec: Long,
                     maxProbesPerChunk: Int = 65536): DataFrame = {
    require(maxProbesPerChunk > 0, "maxProbesPerChunk must be positive")
    val tolUs = tolSec * 1000000L
    def bucket(c: Column): Column = floor(unix_micros(c) / tolUs)
    // right side: one sorted timestamp array per bucket, then each
    // bucket's VISIBLE window = its own + both neighbors' arrays,
    // concatenated in source-bucket order (bucket b's values are all
    // below bucket b+1's, so the concat stays globally sorted)
    val eB = right.groupBy(bucket(col(rTs)).as("_b"))
      .agg(sort_array(collect_list(unix_micros(col(rTs)))).as("_ts"))
    val eN = eB
      .select(col("_b").as("_src"), col("_ts"),
        explode(array(lit(-1L), lit(0L), lit(1L))).as("_shift"))
      .groupBy((col("_src") + col("_shift")).as("_b"))
      .agg(flatten(transform(
        sort_array(collect_list(struct(col("_src"), col("_ts")))),
        x => x.getField("_ts"))).as("_ts"))
    // left side: whole rows grouped per (bucket, chunk) — probe
    // timestamps ride along, so a chunk's arrays deserialize ONCE for
    // all its probes. The chunk fan-out adapts to measured density
    // WITHOUT a second scan: one Exchange on the bucket id feeds an
    // unordered window that counts the bucket in place, `_nc =
    // ceil(n/maxProbesPerChunk)` sizes the fan-out, and the grouping
    // by (_b, _sub) runs on the SAME partitioning (subset hash
    // partitioning satisfies the aggregation's clustered-distribution
    // requirement — no further exchange; A/B at the 100× point: this
    // shape costs +0.5-0.9 s over the unbounded single-group form,
    // while a count-prepass join costs more by rescanning the left).
    val wB = Window.partitionBy(col("_b"))
    val pB = left
      .withColumn("_b", bucket(col(lTs)))
      .withColumn("_nc",
        ceil(count(lit(1)).over(wB) / lit(maxProbesPerChunk.toDouble))
          .cast("long"))
      .withColumn("_sub", pmod(hash(left.columns.map(col): _*), col("_nc")))
      .groupBy(col("_b"), col("_sub"))
      .agg(collect_list(struct(
        unix_micros(col(lTs)).as("_us"),
        struct(left.columns.map(col): _*).as("_row"))).as("_ps"))
    // pB and eN are both hash-partitioned on _b (pB's aggregation kept
    // the window's bucket partitioning) — the join needs no further
    // exchange, and only COLLAPSED chunk rows ever sit in a buffer
    pB.join(eN, Seq("_b"), "left")
      .select(explode(arrays_zip(
        transform(col("_ps"), x => x.getField("_row")),
        windowCountsUdf(transform(col("_ps"), x => x.getField("_us")),
          col("_ts"), lit(tolUs)))).as("_z"))
      .select((left.columns.map(c =>
        col("_z").getField("0").getField(c).as(c)) :+
        col("_z").getField("1").as("n_matches")): _*)
  }
}
