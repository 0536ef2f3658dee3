package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed `Aggregator` — the
  * frequency-sketch sibling of `approx_count_distinct` (SURVEY §2
  * sketch family; the 100 TB use case is domain/vocab heavy-hitter
  * detection for corpus filtering, where an exact `GROUP BY` would
  * shuffle billions of distinct keys to find the handful that matter).
  *
  * State is O(capacity) per task no matter the input size, the merge
  * is associative (Agarwal et al., "Mergeable Summaries", PODS 2012:
  * add counts, then subtract the (capacity+1)-th largest and keep
  * positives), so the whole aggregate is one map-side-combined
  * shuffle of ≤capacity (key,count) pairs per task.
  *
  * Guarantees (n = stream length):
  *  - every item with true count > n/capacity is in the summary;
  *  - estimates only undercount, by at most n/capacity;
  *  - when the number of distinct items never exceeds `capacity`, no
  *    decrement ever fires and the sketch is EXACT (the
  *    `heavy_hitters` query's real-SQL oracle relies on this).
  */
object FrequentItems {

  final class MisraGries(capacity: Int)
      extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
    require(capacity >= 1, "capacity must be >= 1")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
      b.get(item) match {
        case Some(c) => b.updated(item, c + 1L)
        case None if b.size < capacity => b.updated(item, 1L)
        case None =>
          // decrement-all: drop zeros, the incoming item is absorbed
          b.iterator.map { case (k, c) => (k, c - 1L) }
            .filter(_._2 > 0L).toMap
      }

    override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
      val sum = y.foldLeft(x) { case (acc, (k, c)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + c)
      }
      if (sum.size <= capacity) sum
      else {
        val cut = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)(capacity)
        sum.iterator.map { case (k, c) => (k, c - cut) }
          .filter(_._2 > 0L).toMap
      }
    }

    override def finish(r: Map[String, Long]): Seq[(String, Long)] =
      r.toSeq.sortBy { case (k, c) => (-c, k) }

    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** Weighted Misra-Gries: each input is a (key, weight) pair folded
    * in as `weight` occurrences at once — exactly a [[MisraGries]]
    * merge with a singleton summary, so associativity and the
    * mergeable-summaries error bound carry over unchanged (estimates
    * undercount by ≤ n/capacity where n = Σ weights).
    *
    * This is the fast path for feeding the sketch from a PRE-COUNTED
    * stream: `groupBy(key).count()` runs as whole-stage-codegen
    * HashAggregate with map-side combine (longs through the shuffle),
    * and the object aggregator then touches only one row per distinct
    * key — instead of one per input row with per-row
    * ExpressionEncoder serde (the r17 x1000 profile: 100 M
    * `toString()+Map` updates were most of heavy_hitters' 1.7 s wall).
    * When the key domain is enum-sized the pre-count is exact and so
    * is the sketch; when the domain is too large to shuffle distinct
    * keys at all, feed [[column]] directly from the raw rows — same
    * guarantees, no pre-count shuffle. */
  final class MisraGriesWeighted(capacity: Int)
      extends Aggregator[(String, Long), Map[String, Long], Seq[(String, Long)]] {
    private val base = new MisraGries(capacity)
    override def zero: Map[String, Long] = base.zero
    override def reduce(b: Map[String, Long],
                        item: (String, Long)): Map[String, Long] =
      if (item._2 <= 0L) b else base.merge(b, Map(item._1 -> item._2))
    override def merge(x: Map[String, Long],
                       y: Map[String, Long]): Map[String, Long] =
      base.merge(x, y)
    override def finish(r: Map[String, Long]): Seq[(String, Long)] =
      base.finish(r)
    override def bufferEncoder: Encoder[Map[String, Long]] =
      base.bufferEncoder
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      base.outputEncoder
  }

  /** Use with `Dataset[String].select(FrequentItems.column(capacity))`. */
  def column(capacity: Int): TypedColumn[String, Seq[(String, Long)]] =
    new MisraGries(capacity).toColumn

  /** Use with `Dataset[(String, Long)].select(weightedColumn(cap))`
    * over pre-counted (key, count) pairs. */
  def weightedColumn(capacity: Int): TypedColumn[(String, Long), Seq[(String, Long)]] =
    new MisraGriesWeighted(capacity).toColumn
}
