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

  /** The flattened Gram layout both fits share: the d(d+1)/2 upper
    * triangle of XᵀX row-major, then the d entries of Xᵀy. */
  private def gramSums(feats: Seq[Column], y: Column): Seq[Column] = {
    val d = feats.length
    (for (i <- 0 until d; j <- i until d)
      yield sum(feats(i) * feats(j)).as(s"g_${i}_$j")) ++
      (0 until d).map(i => sum(feats(i) * y).as(s"b_$i"))
  }

  /** Solve (XᵀX + λI)β = Xᵀy from the flattened Gram sums by Gaussian
    * elimination with partial pivoting — d is small (lookback+1 or the
    * 6 calendar features), so the solve is microseconds wherever it
    * runs (driver for a pooled fit, inside a task for per-key fits). */
  private[operators] def solveRidge(d: Int, flat: Int => Double,
                                    lambda: Double): Array[Double] = {
    val a = Array.ofDim[Double](d, d + 1)
    var idx = 0
    for (i <- 0 until d; j <- i until d) {
      a(i)(j) = flat(idx); a(j)(i) = a(i)(j); idx += 1
    }
    (0 until d).foreach { i =>
      a(i)(d) = flat(idx); idx += 1
      a(i)(i) += lambda
    }
    for (p <- 0 until d) {
      val piv = (p until d).maxBy(r => math.abs(a(r)(p)))
      val tmp = a(p); a(p) = a(piv); a(piv) = tmp
      require(math.abs(a(p)(p)) > 1e-12, "singular Gram matrix (ridge λ too small?)")
      for (r <- p + 1 until d) {
        val f = a(r)(p) / a(p)(p)
        for (c <- p to d) a(r)(c) -= f * a(p)(c)
      }
    }
    val beta = new Array[Double](d)
    for (p <- (d - 1) to 0 by -1) {
      var s = a(p)(d)
      for (c <- p + 1 until d) s -= a(p)(c) * beta(c)
      beta(p) = s / a(p)(p)
    }
    beta
  }

  /** Fit pooled ridge coefficients over arbitrary feature columns: one
    * aggregation pass computes XᵀX (upper triangle, d(d+1)/2 sums) and
    * Xᵀy (d sums); the driver solves the (d+1)×(d+1) normal equations.
    * λ > 0 keeps the solve well-posed even on degenerate splits
    * (constant day-of-week, short history). Deterministic up to
    * float-sum order — rounded metrics downstream absorb the low
    * bits. */
  def fitRidge(train: DataFrame, feats: Seq[Column], y: Column,
               lambda: Double = 1e-3): Array[Double] = {
    val gs = gramSums(feats, y)
    // drop rows with ANY null feature, not just null targets: Spark's
    // sum skips nulls PER ENTRY, so a null-feature row would be
    // counted by some Gram sums and not others — silently skewed
    // coefficients (and an all-null entry NPEs inside the solve)
    val row = train.filter(completeRow(feats, y)).agg(gs.head, gs.tail: _*).head()
    // an empty (or all-null) training split aggregates to null sums —
    // fail with a diagnosis, not a bare NPE from getDouble
    require(!row.isNullAt(0),
      "fitRidge: empty training split (no complete non-null rows)")
    solveRidge(feats.length, row.getDouble, lambda)
  }

  /** Row predicate: target and every feature non-null — the only rows
    * a Gram-matrix fit can consume coherently. */
  private def completeRow(feats: Seq[Column], y: Column): Column =
    feats.foldLeft(y.isNotNull)((acc, f) => acc && f.isNotNull)

  /** One independent ridge model per key group, fully distributed: the
    * Gram sums are a map-side-combinable groupBy aggregation and the
    * tiny d×d solve runs inside the task per group — a 100 TB corpus
    * of millions of series trains every model in ONE scan + one
    * keyed shuffle, no driver bottleneck, no iteration. Returns
    * `keys :+ beta array<double>`; groups with no complete (target +
    * all features non-null) row simply have no model row. */
  def fitRidgePerKey(train: DataFrame, keys: Seq[String], feats: Seq[Column],
                     y: Column, lambda: Double = 1e-3): DataFrame = {
    val d = feats.length
    val solve = udf { flat: Seq[Double] =>
      solveRidge(d, flat, lambda)
    }
    train.filter(completeRow(feats, y))
      .groupBy(keys.map(col): _*)
      .agg(array(gramSums(feats, y): _*).as("_gram"))
      .withColumn("beta", solve(col("_gram")))
      .drop("_gram")
  }

  /** Backwards-named calendar fit: pooled ridge on the seasonal
    * feature set. */
  def fitRidgeCalendar(train: DataFrame, dayCol: String, valCol: String,
                       lambda: Double = 1e-3): Array[Double] =
    fitRidge(train, features(col(dayCol)), col(valCol).cast("double"), lambda)

  /** AR(p) lag features per key: `lag_1..lag_p` columns from ONE keyed
    * window pass (all lags share the partitioning, Catalyst collapses
    * them into a single Window operator — one shuffle total); rows
    * without full lookback history are dropped. This is the sliding-
    * window input encoding of the reference's sequence model (ref
    * modules/price_forecast/dataset.py:52-58 builds the same
    * lookback windows for the LSTM). */
  def lagFeatures(df: DataFrame, keys: Seq[String], orderCol: String,
                  valCol: String, p: Int): DataFrame = {
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    val lagged = (1 to p).foldLeft(df) { (acc, i) =>
      acc.withColumn(s"lag_$i", lag(col(valCol), i).over(byKey))
    }
    lagged.filter((1 to p).map(i => col(s"lag_$i").isNotNull).reduce(_ && _))
  }

  /** The AR(p)+intercept feature vector over lagFeatures output. */
  def arFeatures(p: Int): Seq[Column] =
    lit(1.0) +: (1 to p).map(i => col(s"lag_$i"))

  /** Row-local scoring against a per-key `beta` array column (from
    * [[fitRidgePerKey]]): Σ featsᵢ·βᵢ via zip_with/aggregate — d+1
    * element arrays, no join beyond the caller's model join. */
  def predictLinear(feats: Seq[Column], betaCol: Column): Column =
    aggregate(zip_with(array(feats.map(_.cast("double")): _*), betaCol,
      (f, b) => f * b), lit(0.0), _ + _)

  /** Scoring with driver-held coefficients folded into the plan as
    * literals — the right shape when there is ONE model (or a bounded
    * few): a 1-row model join on a constant key would constant-fold
    * the equi-condition away and plan a nested loop. */
  def predictLinear(feats: Seq[Column], beta: Array[Double]): Column =
    feats.zip(beta).map { case (f, b) => f * lit(b) }.reduce(_ + _)

  /** h-step-ahead AR coefficients by closed-form recurrence
    * composition: where the reference's LSTM rolls its own
    * predictions back in autoregressively for a horizon forecast (ref
    * modules/price_forecast/predict.py rollout loop), a LINEAR
    * sequence model composes exactly — lift β = (β0, β1..βp) to the
    * (p+1)×(p+1) companion matrix over state [y_t..y_{t-p+1}, 1],
    * take its h-th power on the driver (p is small), and read the
    * direct h-step coefficients off the first row. Scoring any
    * horizon stays ONE row-local dot product over the same lag
    * features — no per-step passes over the data, no sequential
    * rollout job. Returns (intercept, coef for y_t..y_{t-p+1}) in
    * [[arFeatures]] order. */
  def arRolloutCoefficients(beta: Array[Double], h: Int): Array[Double] = {
    require(h >= 1, s"horizon must be >= 1, got $h")
    val p = beta.length - 1
    val n = p + 1
    // companion: row 0 = [β1..βp | β0]; rows 1..p-1 shift the state;
    // row p preserves the constant 1
    val a = Array.ofDim[Double](n, n)
    for (i <- 1 to p) a(0)(i - 1) = beta(i)
    a(0)(n - 1) = beta(0)
    for (r <- 1 until p) a(r)(r - 1) = 1.0
    a(n - 1)(n - 1) = 1.0
    def mul(x: Array[Array[Double]], y: Array[Array[Double]]) = {
      val z = Array.ofDim[Double](n, n)
      for (i <- 0 until n; k <- 0 until n if x(i)(k) != 0.0; j <- 0 until n)
        z(i)(j) += x(i)(k) * y(k)(j)
      z
    }
    var pow = a
    for (_ <- 2 to h) pow = mul(pow, a)
    // back to arFeatures order: intercept first, then lag_1..lag_p
    pow(0)(n - 1) +: (0 until p).map(i => pow(0)(i)).toArray
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
