package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** R² (coefficient of determination) as a typed `Aggregator`
  * (SURVEY §2.11; ref evaluate.py:13-58) — the single-pass sufficient
  * statistics (n, Σa, Σa², Σ(a−p)²) merge associatively, so the
  * aggregate is one map-side-combined shuffle at any scale, identical
  * to the closed-form SQL in [[graft.operators.TimeSeriesOps.r2Agg]].
  */
object R2Aggregator extends Aggregator[(Double, Double), (Long, Double, Double, Double), Double] {

  override def zero: (Long, Double, Double, Double) = (0L, 0.0, 0.0, 0.0)

  override def reduce(b: (Long, Double, Double, Double),
                      ap: (Double, Double)): (Long, Double, Double, Double) = {
    val (n, sa, saa, sres) = b
    val (a, p) = ap
    (n + 1, sa + a, saa + a * a, sres + (a - p) * (a - p))
  }

  override def merge(x: (Long, Double, Double, Double),
                     y: (Long, Double, Double, Double)): (Long, Double, Double, Double) =
    (x._1 + y._1, x._2 + y._2, x._3 + y._3, x._4 + y._4)

  override def finish(r: (Long, Double, Double, Double)): Double = {
    val (n, sa, saa, sres) = r
    if (n == 0) Double.NaN
    else {
      val ssTot = saa - sa * sa / n
      1.0 - sres / ssTot
    }
  }

  override def bufferEncoder: Encoder[(Long, Double, Double, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble,
      Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Use with `Dataset[(Double, Double)].select(R2Aggregator.column)`. */
  def column: TypedColumn[(Double, Double), Double] = toColumn
}
