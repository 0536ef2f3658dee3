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
}
