package graft.operators

import java.sql.Date

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of gap-limited interpolation on random series (beyond
  * the pandas goldens in TimeSeriesOpsSpec). */
class InterpolationPropertySpec extends SparkSpec {
  import spark.implicits._

  test("invariants hold on 20 random series") {
    val rnd = new scala.util.Random(5)
    (1 to 20).foreach { trial =>
      val n = 10 + rnd.nextInt(30)
      val maxGap = 1 + rnd.nextInt(4)
      val vals: Seq[Option[Double]] = (0 until n).map(_ =>
        if (rnd.nextDouble() < 0.45) None
        else Some(math.round(rnd.nextDouble() * 1000) / 10.0))
      val days = (0 until n).map(i =>
        Date.valueOf(java.time.LocalDate.of(2025, 1, 1).plusDays(i)))
      val spine = days.zip(vals).map { case (d, v) => ("k", d, v) }
        .toDF("key", "day", "v")
      val out = TimeSeriesOps.interpolateGapLimited(spine, Seq("key"), "day", "v", maxGap)
        .orderBy("day").select("v").collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))

      val validIdx = vals.zipWithIndex.collect { case (Some(_), i) => i }
      (0 until n).foreach { i =>
        vals(i) match {
          case Some(x) =>
            assert(out(i).contains(x), s"trial $trial: observed value changed at $i")
          case None =>
            val dPrev = validIdx.filter(_ < i).map(i - _).minOption
            val dNext = validIdx.filter(_ > i).map(_ - i).minOption
            val reachable = dPrev.exists(_ <= maxGap) || dNext.exists(_ <= maxGap)
            assert(out(i).isDefined == reachable,
              s"trial $trial idx $i: filled=${out(i).isDefined} reachable=$reachable (maxGap=$maxGap)")
            if (reachable && dPrev.isDefined && dNext.isDefined) {
              val lo = math.min(vals(i - dPrev.get).get, vals(i + dNext.get).get)
              val hi = math.max(vals(i - dPrev.get).get, vals(i + dNext.get).get)
              assert(out(i).get >= lo - 1e-9 && out(i).get <= hi + 1e-9,
                s"trial $trial idx $i: blend ${out(i).get} outside [$lo,$hi]")
            }
        }
      }
    }
  }
}
