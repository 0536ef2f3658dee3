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

  test("proximityCount chunked path (tiny maxProbesPerChunk) equals the enumerating join") {
    // same seeded corpus as the equality test above, but probes forced
    // into many sub-bucket chunks — the dense-bucket containment path
    // must be output-identical to the single-chunk formulation
    val rnd = new scala.util.Random(43)
    val tolSec = 60L
    val left = tsDf("p_id", "p_id", "p_ts",
      Seq.fill(300)(rnd.nextLong(10L * tolSec * 1000000L))) // ~30 probes/bucket
    val right = tsDf("e_id", "e_id", "e_ts",
      Seq.fill(400)(rnd.nextLong(10L * tolSec * 1000000L))).drop("e_id")
    val counted = TemporalJoin.proximityCount(left, right, "p_ts", "e_ts",
        tolSec, maxProbesPerChunk = 7)
      .select(col("p_id"), col("n_matches"))
      .as[(Long, Long)].collect().toMap
    val enumerated = TemporalJoin.proximity(left, right, "p_ts", "e_ts", tolSec)
      .groupBy("p_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(counted.size == 300) // chunking never drops or duplicates a probe
    enumerated.foreach { case (id, n) => assert(counted(id) == n, s"p_id=$id") }
    counted.foreach { case (id, n) =>
      if (!enumerated.contains(id)) assert(n == 0L, s"p_id=$id expected 0")
    }
  }

  test("proximityCount planted mega-bucket: 1M probes in ONE tolSec bucket, bounded chunks") {
    // the dense-left hazard from the round-10 verdict: every probe of a
    // bucket used to land in one collect_list buffer / one output row.
    // 1M probes share bucket 0 here; with maxProbesPerChunk=4096 the
    // bucket must split into ~245 chunks, each a bounded aggregation
    // buffer, and the counts must still match an analytic oracle.
    val base = 1700000000000000L // aligned: base % tolUs == 0
    val tolSec = 1000L
    val tolUs = tolSec * 1000000L
    val nL = 1000000L
    val left = spark.range(nL).select(col("id").as("p_id"),
      timestamp_micros(lit(base) + col("id") * 1000L).as("p_ts")) // all < tolUs
    val nR = 1000
    // right rows spread over [-tol, 2*tol): exercises both neighbor
    // buckets plus the home bucket in the concat window
    val rOff = (0 until nR).map(j => j.toLong * 3000000L - tolUs).toArray
    val right = spark.range(nR).select(
      timestamp_micros(lit(base) + (col("id") * 3000000L - lit(tolUs))).as("e_ts"))

    val out = TemporalJoin.proximityCount(left, right, "p_ts", "e_ts",
      tolSec, maxProbesPerChunk = 4096)
    def expected(tUs: Long): Long =
      rOff.count(r => math.abs(tUs - r) <= tolUs).toLong
    val expSum = (0L until nL).map(i => expected(i * 1000L)).sum
    val (gotRows, gotSum) = out.agg(count(lit(1)), sum("n_matches"))
      .as[(Long, Long)].head()
    assert(gotRows == nL, "every probe exactly once")
    assert(gotSum == expSum, s"sum of counts: got $gotSum want $expSum")
    // spot-check individual probes against the analytic count
    val sample = out.filter(col("p_id") % 99991 === 0)
      .select(col("p_id"), col("n_matches")).as[(Long, Long)].collect()
    assert(sample.length == 11)
    sample.foreach { case (id, n) =>
      assert(n == expected(id * 1000L), s"p_id=$id") }
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
