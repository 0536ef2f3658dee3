package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** R² (coefficient of determination) as a typed `Aggregator`
  * (SURVEY §2.11; ref evaluate.py:13-58) — single-pass Welford/
  * Chan-style central-moment statistics (n, mean, M2, Σ(a−p)²) that
  * merge associatively, so the aggregate is one map-side-combined
  * shuffle at any scale. Centered accumulation keeps SStot = M2
  * accurate when |mean| ≫ stddev, where the raw Σa² − (Σa)²/n form
  * cancels catastrophically — same fix as
  * [[graft.operators.TimeSeriesOps.r2Agg]]'s var_pop·n.
  */
object R2Aggregator extends Aggregator[(Double, Double), (Long, Double, Double, Double), Double] {

  override def zero: (Long, Double, Double, Double) = (0L, 0.0, 0.0, 0.0)

  override def reduce(b: (Long, Double, Double, Double),
                      ap: (Double, Double)): (Long, Double, Double, Double) = {
    val (n, mean, m2, sres) = b
    val (a, p) = ap
    val n1 = n + 1
    val delta = a - mean
    val mean1 = mean + delta / n1
    (n1, mean1, m2 + delta * (a - mean1), sres + (a - p) * (a - p))
  }

  override def merge(x: (Long, Double, Double, Double),
                     y: (Long, Double, Double, Double)): (Long, Double, Double, Double) = {
    val (nx, mx, m2x, rx) = x
    val (ny, my, m2y, ry) = y
    if (nx == 0) (ny, my, m2y, rx + ry)
    else if (ny == 0) (nx, mx, m2x, rx + ry)
    else {
      val n = nx + ny
      val delta = my - mx
      (n, mx + delta * ny / n,
        m2x + m2y + delta * delta * nx.toDouble * ny.toDouble / n, rx + ry)
    }
  }

  override def finish(r: (Long, Double, Double, Double)): Double = {
    val (n, _, m2, sres) = r
    if (n == 0) Double.NaN
    else 1.0 - sres / m2
  }

  override def bufferEncoder: Encoder[(Long, Double, Double, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble,
      Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Use with `Dataset[(Double, Double)].select(R2Aggregator.column)`. */
  def column: TypedColumn[(Double, Double), Double] = toColumn
}
