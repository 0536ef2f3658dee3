package graft.functions

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class FrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(items: Seq[String], capacity: Int, parts: Int): Seq[(String, Long)] =
    items.toDS().repartition(parts)
      .select(FrequentItems.column(capacity)).head()

  test("exact when capacity >= distinct, independent of partitioning") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_type").as[String].collect().toSeq
    val exact = ev.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      .toSeq.sortBy { case (k, c) => (-c, k) }
    assert(sketch(ev, 16, 1) == exact)
    assert(sketch(ev, 16, 13) == exact)
  }

  test("heavy item survives capacity < distinct; estimates undercount <= n/capacity") {
    // 300 of "hot" buried in 600 distinct rare keys
    val items = Seq.fill(300)("hot") ++ (0 until 600).map(i => s"rare$i")
    val n = items.size
    val cap = 8
    for (parts <- Seq(1, 7)) {
      val s = sketch(new scala.util.Random(3).shuffle(items), cap, parts).toMap
      assert(s.contains("hot"), s"count>n/cap item must survive (parts=$parts)")
      s.foreach { case (k, est) =>
        val truth = if (k == "hot") 300L else 1L
        assert(est <= truth, s"$k overcounted: $est > $truth")
        assert(truth - est <= n.toLong / cap,
          s"$k undercount ${truth - est} > n/cap ${n / cap}")
      }
    }
  }

  test("merge keeps at most capacity entries") {
    val items = (0 until 500).map(i => s"k${i % 50}")
    assert(sketch(items, 8, 11).size <= 8)
  }

  test("weighted sketch over pre-counts equals per-row sketch (exact regime)") {
    // the heavy_hitters fast path: groupBy-count then weighted merge —
    // when distinct <= capacity both are exact and identical
    val items = Seq.fill(300)("hot") ++ Seq.fill(40)("warm") ++ Seq.fill(7)("cold")
    val shuffled = new scala.util.Random(11).shuffle(items)
    val perRow = sketch(shuffled, 16, 5)
    val weighted = shuffled.toDS().groupBy("value")
      .agg(count(lit(1)).as("cnt")).as[(String, Long)]
      .repartition(5)
      .select(FrequentItems.weightedColumn(16)).head()
    assert(weighted == perRow)
  }

  test("weighted sketch respects capacity and keeps the planted heavy item") {
    val pairs = ("hot", 500L) +: (0 until 600).map(i => (s"rare$i", 1L))
    val w = new scala.util.Random(5).shuffle(pairs).toDS()
      .repartition(7)
      .select(FrequentItems.weightedColumn(8)).head().toMap
    assert(w.size <= 8)
    assert(w.contains("hot"))
    assert(w("hot") <= 500L && 500L - w("hot") <= 1100L / 8)
  }
}
