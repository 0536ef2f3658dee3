package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders = Seq(
    ("u1", 1L, "2025-01-01"), ("u1", 2L, "2025-01-03"), ("u1", 3L, "2025-01-02"),
    ("u2", 4L, "2025-01-05"), ("u2", 5L, "2025-01-05")).toDF("user", "id", "d")

  test("topNPerGroup keeps n best with deterministic tie-break") {
    val out = Relational.topNPerGroup(orders, Seq($"user"),
      Seq(desc("d"), desc("id")), 2)
      .select("user", "id").as[(String, Long)].collect().toSet
    assert(out == Set(("u1", 2L), ("u1", 3L), ("u2", 5L), ("u2", 4L)))
  }

  test("latestPerKey returns one row per key") {
    val out = Relational.latestPerKey(orders, Seq($"user"), Seq(desc("d"), desc("id")))
      .select("user", "id").as[(String, Long)].collect().toSet
    assert(out == Set(("u1", 2L), ("u2", 5L)))
  }

  test("bucketize applies predicates in priority order") {
    val out = Seq(5, 15, 40).toDF("n")
      .select(Relational.bucketize($"n",
        Seq("small" -> ($"n" < 10), "medium" -> ($"n" < 25)), "large"))
      .as[String].collect()
    assert(out.toSeq == Seq("small", "medium", "large"))
  }

  test("saltedJoin equals the plain inner join") {
    val big = (1 to 100).map(i => (i % 3 + 1L, i.toDouble)).toDF("k", "v")
    val small = Seq((1L, "a"), (2L, "b")).toDF("k", "tag")
    val salted = Relational.saltedJoin(big, small, "k", saltFactor = 4)
      .groupBy("tag").count().as[(String, Long)].collect().toMap
    val plain = big.join(small, "k")
      .groupBy("tag").count().as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("skewJoin equals the plain inner join on skewed data (hot keys salted, cold plain)") {
    // key 7 carries 500 rows (hot), keys 100..149 one row each (cold);
    // the seeded 50% sample cannot miss the hot key
    val big = ((1 to 500).map(_ => 7L) ++ (100L to 149L))
      .zipWithIndex.map { case (k, i) => (k, i.toDouble) }.toDF("k", "v")
    val small = (Seq(7L) ++ (100L to 149L)).map(k => (k, s"t$k")).toDF("k", "tag")
    val skew = Relational.skewJoin(big, small, "k", saltFactor = 4,
        sampleFraction = 0.5, hotKeyCount = 2)
      .groupBy("tag").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .as[(String, Long, Double)].collect().toSet
    val plain = big.join(small, "k")
      .groupBy("tag").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .as[(String, Long, Double)].collect().toSet
    assert(skew == plain)
    assert(skew.exists { case (tag, n, _) => tag == "t7" && n == 500 })

    // caller-provided hot keys (the table-statistics path) skip the
    // sample job and produce the same result
    val preStats = Relational.skewJoin(big, small, "k", saltFactor = 4,
        hotKeys = Some(Seq(7L)))
      .groupBy("tag").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .as[(String, Long, Double)].collect().toSet
    assert(preStats == plain)
  }

  test("skewJoin gates salting on measured skew: uniform keys emit the plain join plan") {
    // 50 keys × 8 rows each — no key can reach 4× the mean sampled
    // frequency (max possible count 8 < 4×mean 16), so the profile is
    // empty for ANY sample outcome and the plan must be the untouched
    // plain join: no _salt column, no small-side explode
    val big = (1 to 400).map(i => (i % 50 + 1L, i.toDouble)).toDF("k", "v")
    val small = (1L to 50L).map(k => (k, s"t$k")).toDF("k", "tag")
    val gated = Relational.skewJoin(big, small, "k", saltFactor = 4,
      sampleFraction = 0.5)
    val plan = gated.queryExecution.analyzed.toString
    assert(!plan.contains("_salt") && !plan.toLowerCase.contains("explode"))
    val out = gated.groupBy("tag").count().as[(String, Long)].collect().toMap
    val plain = big.join(small, "k").groupBy("tag").count()
      .as[(String, Long)].collect().toMap
    assert(out == plain)
  }

  test("cumulativeBudget keeps the boundary row (truncate-last semantics)") {
    val docs = Seq((1L, 500L), (2L, 400L), (3L, 300L), (4L, 200L)).toDF("id", "len")
    val out = Relational.cumulativeBudget(docs, Seq(desc("len"), $"id"), $"len", 1000L)
      .select("id").as[Long].collect().toSet
    // spent-before: id1=0, id2=500, id3=900 (kept, crosses), id4=1200 (dropped)
    assert(out == Set(1L, 2L, 3L))
  }
}
