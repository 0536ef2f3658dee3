package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def tsDf(name: String, idCol: String, tsCol: String,
                   usOffsets: Seq[Long]) = {
    val base = 1700000000000000L // fixed epoch-micros anchor
    usOffsets.zipWithIndex
      .map { case (us, i) => (i.toLong, base + us) }
      .toDF(idCol, "_us")
      .select(col(idCol), timestamp_micros(col("_us")).as(tsCol))
  }

  test("proximityCount equals counting the enumerating proximity join (seeded corpus)") {
    // seeded pseudo-random offsets spread across ~40 tolerance buckets,
    // dense enough that many windows span bucket boundaries
    val rnd = new scala.util.Random(42)
    val tolSec = 60L
    val left = tsDf("p_id", "p_id", "p_ts",
      Seq.fill(300)(rnd.nextLong(40L * tolSec * 1000000L)))
    val right = tsDf("e_id", "e_id", "e_ts",
      Seq.fill(500)(rnd.nextLong(40L * tolSec * 1000000L))).drop("e_id")

    val counted = TemporalJoin.proximityCount(left, right, "p_ts", "e_ts", tolSec)
      .select(col("p_id"), col("n_matches"))
      .as[(Long, Long)].collect().toMap
    val enumerated = TemporalJoin.proximity(left, right, "p_ts", "e_ts", tolSec)
      .groupBy("p_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap

    // every enumerated count matches; left rows with no neighbor are
    // present in counted with 0 (the enumerating inner join drops them)
    assert(counted.size == 300)
    enumerated.foreach { case (id, n) => assert(counted(id) == n, s"p_id=$id") }
    counted.foreach { case (id, n) =>
      if (!enumerated.contains(id)) assert(n == 0L, s"p_id=$id expected 0")
    }
    assert(counted.values.sum == enumerated.values.sum)
  }

  test("proximityCount bounds are inclusive at exactly +-tol and bucket edges") {
    val tolSec = 10L
    val tolUs = tolSec * 1000000L
    // left probe sits exactly on a bucket boundary; right rows at
    // -tol, -tol-1us, +tol, +tol+1us, and same-instant
    val left = tsDf("p_id", "p_id", "p_ts", Seq(5L * tolUs))
    val right = tsDf("e_id", "e_id", "e_ts",
      Seq(4L * tolUs, 4L * tolUs - 1L, 6L * tolUs, 6L * tolUs + 1L, 5L * tolUs))
      .drop("e_id")
    val n = TemporalJoin.proximityCount(left, right, "p_ts", "e_ts", tolSec)
      .select("n_matches").as[Long].head()
    assert(n == 3L) // -tol, +tol, same-instant; the two 1us-outside miss
  }
}
