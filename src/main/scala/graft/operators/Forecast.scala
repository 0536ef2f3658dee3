package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained forecaster on calendar features — the engine's model-based
  * step up from [[TimeSeriesOps.seasonalNaive]] (ref
  * modules/price_forecast/train.py:43-95 trains an LSTM; SURVEY §7
  * descopes the DL model, this supplies the trained-model slot with a
  * ridge regression on the same seasonal features the reference's
  * data pipeline derives, ref data_utils.py:49-61).
  *
  * Shape at scale — this is deliberately NOT an iterative MLlib fit:
  * a ridge model on d features needs only the d×d Gram matrix XᵀX and
  * the d-vector Xᵀy, both SUMS over rows. So training is ONE
  * map-side-combinable aggregation pass over the training split (no
  * iteration, no shuffle beyond the single agg), the driver solves the
  * (d+1)×(d+1) normal equations in microseconds, and scoring is a
  * row-local dot product with the coefficients folded into the plan as
  * literals. A 100 TB training split costs exactly one scan — the same
  * shape GBT/LBFGS would need per ITERATION.
  */
object Forecast {

  /** Feature columns: intercept, linear trend (days since epoch,
    * centered by the caller's data via the Gram solve), day-of-year
    * and day-of-week sin/cos — the reference pipeline's seasonal
    * encoding (data_utils.py:49-61). */
  private def features(dayCol: Column): Seq[Column] = {
    val twoPi = 2.0 * math.Pi
    val doy = dayofyear(dayCol).cast("double")
    val dow = (dayofweek(dayCol) - 1).cast("double")
    Seq(
      lit(1.0),
      // trend in YEARS since 2000-01-01: keeps the Gram matrix
      // well-conditioned (raw epoch-days ~2e4 would dwarf the unit
      // seasonal features and amplify float cancellation)
      datediff(dayCol, lit("2000-01-01").cast("date")).cast("double") / 365.25,
      sin(doy * twoPi / 365.25), cos(doy * twoPi / 365.25),
      sin(dow * twoPi / 7.0), cos(dow * twoPi / 7.0))
  }

  final val Dim = 6

  /** Fit ridge coefficients on `(dayCol, valCol)` rows: one
    * aggregation pass computes XᵀX (upper triangle, d(d+1)/2 sums) and
    * Xᵀy (d sums); the driver solves (XᵀX + λI)β = Xᵀy by Gaussian
    * elimination with partial pivoting. λ > 0 keeps the solve
    * well-posed even on degenerate splits (constant day-of-week,
    * short history). Deterministic up to float-sum order — rounded
    * metrics downstream absorb the low bits. */
  def fitRidgeCalendar(train: DataFrame, dayCol: String, valCol: String,
                       lambda: Double = 1e-3): Array[Double] = {
    val fs = features(col(dayCol))
    val y = col(valCol).cast("double")
    val gramAggs =
      (for (i <- 0 until Dim; j <- i until Dim)
        yield sum(fs(i) * fs(j)).as(s"g_${i}_$j")) ++
      (0 until Dim).map(i => sum(fs(i) * y).as(s"b_$i"))
    val row = train.filter(y.isNotNull)
      .agg(gramAggs.head, gramAggs.tail: _*).head()
    // an empty (or all-null-value) training split aggregates to null
    // sums — fail with a diagnosis, not a bare NPE from getDouble
    require(!row.isNullAt(0),
      s"fitRidgeCalendar: empty training split (no non-null '$valCol' rows)")

    val a = Array.ofDim[Double](Dim, Dim + 1)
    var idx = 0
    for (i <- 0 until Dim; j <- i until Dim) {
      a(i)(j) = row.getDouble(idx); a(j)(i) = a(i)(j); idx += 1
    }
    (0 until Dim).foreach { i =>
      a(i)(Dim) = row.getDouble(idx); idx += 1
      a(i)(i) += lambda
    }
    // Gaussian elimination, partial pivoting — d=6, driver-side
    for (p <- 0 until Dim) {
      val piv = (p until Dim).maxBy(r => math.abs(a(r)(p)))
      val tmp = a(p); a(p) = a(piv); a(piv) = tmp
      require(math.abs(a(p)(p)) > 1e-12, "singular Gram matrix (ridge λ too small?)")
      for (r <- p + 1 until Dim) {
        val f = a(r)(p) / a(p)(p)
        for (c <- p to Dim) a(r)(c) -= f * a(p)(c)
      }
    }
    val beta = new Array[Double](Dim)
    for (p <- (Dim - 1) to 0 by -1) {
      var s = a(p)(Dim)
      for (c <- p + 1 until Dim) s -= a(p)(c) * beta(c)
      beta(p) = s / a(p)(p)
    }
    beta
  }

  /** Row-local scoring column: β · features(day). The coefficients are
    * plan literals (broadcast with the closure), so prediction adds a
    * Project — no join, no shuffle, whole-stage codegen keeps it in
    * the scan stage. */
  def predictCalendar(dayCol: Column, beta: Array[Double]): Column = {
    require(beta.length == Dim, s"expected $Dim coefficients")
    features(dayCol).zip(beta)
      .map { case (f, b) => f * lit(b) }
      .reduce(_ + _)
  }
}
