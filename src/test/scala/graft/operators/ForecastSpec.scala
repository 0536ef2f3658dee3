package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Calendar ridge forecaster: recovers a known seasonal+trend signal,
  * beats seasonal-naive on trending series, and slots into the same
  * split/metrics harness an MLlib estimator would (cross-checked
  * against spark.ml GBT on the identical feature frame). */
class ForecastSpec extends SparkSpec {
  import spark.implicits._

  /** 3 years of daily y = 10 + 2.5·years + 4·sin(2π·doy/365.25)
    * + 1.5·cos(2π·dow/7) + tiny deterministic noise. */
  private def synthetic() = {
    val twoPi = 2.0 * math.Pi
    spark.range(0, 1096)
      .select(date_add(lit("2020-01-01").cast("date"), col("id").cast("int")).as("day"))
      .withColumn("y",
        lit(10.0) +
          lit(2.5) * datediff(col("day"), lit("2000-01-01").cast("date")) / 365.25 +
          lit(4.0) * sin(dayofyear(col("day")) * twoPi / 365.25) +
          lit(1.5) * cos((dayofweek(col("day")) - 1) * twoPi / 7.0) +
          pmod(xxhash64(col("day")), lit(100)).cast("double") / 1000.0)
  }

  test("ridge fit recovers a seasonal+trend signal (test RMSE ~ noise floor)") {
    val df = synthetic()
    val split = TimeSeriesOps.ratioSplit(df, Seq.empty, "day", (0.8, 0.0, 0.2))
    val beta = Forecast.fitRidgeCalendar(
      split.filter(col("split") === "train"), "day", "y")
    val rmse = split.filter(col("split") === "test")
      .withColumn("pred", Forecast.predictCalendar(col("day"), beta))
      .agg(TimeSeriesOps.rmse(col("y"), col("pred"))).head.getDouble(0)
    // signal amplitude ~4; uniform noise on [0, 0.1) → rmse ≈ 0.03
    assert(rmse < 0.1, s"ridge rmse $rmse did not reach the noise floor")
  }

  test("ridge beats seasonal-naive on a trending series") {
    val df = synthetic()
    val split = TimeSeriesOps.ratioSplit(df, Seq.empty, "day", (0.8, 0.0, 0.2))
    val beta = Forecast.fitRidgeCalendar(
      split.filter(col("split") === "train"), "day", "y")
    val ridgeRmse = split.filter(col("split") === "test")
      .withColumn("pred", Forecast.predictCalendar(col("day"), beta))
      .agg(TimeSeriesOps.rmse(col("y"), col("pred"))).head.getDouble(0)
    val naiveRmse = TimeSeriesOps.seasonalNaive(
        split.filter(col("split") === "test"), Seq.empty, "day", "y", 7)
      .agg(TimeSeriesOps.rmse(col("y"), col("pred"))).head.getDouble(0)
    assert(ridgeRmse < naiveRmse,
      s"ridge $ridgeRmse not better than seasonal-naive $naiveRmse")
  }

  test("fit is deterministic across partitioning layouts") {
    val df = synthetic()
    val b1 = Forecast.fitRidgeCalendar(df.repartition(1), "day", "y")
    val b8 = Forecast.fitRidgeCalendar(df.repartition(8), "day", "y")
    b1.zip(b8).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-6, s"coefficients diverged: $x vs $y")
    }
  }

  test("degenerate split (constant features) still solves via ridge λ") {
    // one repeated day: trend/seasonal columns are constant → rank-1
    // Gram matrix; λ must keep the solve well-posed
    val df = Seq.fill(20)(("2021-06-01", 5.0)).toDF("d", "y")
      .select(col("d").cast("date").as("day"), col("y"))
    val beta = Forecast.fitRidgeCalendar(df, "day", "y")
    val pred = df.withColumn("p", Forecast.predictCalendar(col("day"), beta))
      .agg(avg("p")).head.getDouble(0)
    assert(math.abs(pred - 5.0) < 0.1, s"degenerate fit predicted $pred, want ~5")
  }

  /** Driver-generated AR(2) series y_t = c + φ1·y_{t-1} + φ2·y_{t-2}
    * + e_t with seeded white-noise innovations — white noise (not a
    * deterministic forcing, which has its own lag recurrence and
    * destroys identifiability) lets OLS recover (c, φ1, φ2) to
    * O(1/√n). */
  private def arSeries(key: String, c: Double, phi1: Double, phi2: Double,
                       n: Int): Seq[(String, Int, Double)] = {
    val rng = new scala.util.Random(key.hashCode * 31 + 42)
    val y = Array.ofDim[Double](n)
    y(0) = c; y(1) = c + 0.5
    for (t <- 2 until n) y(t) = c + phi1 * y(t - 1) + phi2 * y(t - 2) +
      0.3 * (rng.nextDouble() - 0.5)
    (0 until n).map(t => (key, t, y(t)))
  }

  test("AR lag ridge recovers known AR(2) coefficients") {
    val df = arSeries("a", 5.0, 0.6, -0.3, 2000)
      .toDF("k", "t", "y")
    val lagged = Forecast.lagFeatures(df, Seq("k"), "t", "y", 2)
    val beta = Forecast.fitRidge(lagged, Forecast.arFeatures(2), col("y"),
      lambda = 1e-8)
    // the forcing term is not in the feature set, so recovery is close
    // but not exact; the AR structure must dominate
    assert(math.abs(beta(1) - 0.6) < 0.05 && math.abs(beta(2) + 0.3) < 0.05,
      s"AR coefficients not recovered: ${beta.toSeq}")
  }

  test("per-key fit trains independent models in one pass") {
    val df = (arSeries("a", 5.0, 0.6, -0.3, 2000) ++
      arSeries("b", 2.0, -0.4, 0.2, 2000)).toDF("k", "t", "y")
    val lagged = Forecast.lagFeatures(df, Seq("k"), "t", "y", 2)
    val models = Forecast.fitRidgePerKey(lagged, Seq("k"),
        Forecast.arFeatures(2), col("y"), lambda = 1e-8)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(math.abs(models("a")(1) - 0.6) < 0.05, s"key a: ${models("a")}")
    assert(math.abs(models("b")(1) + 0.4) < 0.05, s"key b: ${models("b")}")
  }

  test("per-key fit matches the pooled fit on a single key, any layout") {
    val df = arSeries("a", 5.0, 0.6, -0.3, 300).toDF("k", "t", "y")
    val lagged = Forecast.lagFeatures(df, Seq("k"), "t", "y", 2)
    val pooled = Forecast.fitRidge(lagged, Forecast.arFeatures(2), col("y"))
    val perKey = Forecast.fitRidgePerKey(lagged.repartition(8), Seq("k"),
        Forecast.arFeatures(2), col("y"))
      .head.getSeq[Double](1)
    pooled.zip(perKey).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-6, s"pooled $x vs per-key $y")
    }
  }

  test("one-step-ahead AR beats seasonal-naive on an autoregressive series") {
    val df = arSeries("a", 5.0, 0.6, -0.3, 400).toDF("k", "t", "y")
    val lagged = Forecast.lagFeatures(df, Seq("k"), "t", "y", 7)
    val split = TimeSeriesOps.ratioSplit(lagged, Seq("k"), "t", (0.8, 0.0, 0.2))
    val models = Forecast.fitRidgePerKey(
      split.filter(col("split") === "train"), Seq("k"),
      Forecast.arFeatures(7), col("y"))
    val arRmse = split.filter(col("split") === "test")
      .join(models, "k")
      .withColumn("pred", Forecast.predictLinear(Forecast.arFeatures(7), col("beta")))
      .agg(TimeSeriesOps.rmse(col("y"), col("pred"))).head.getDouble(0)
    val naiveRmse = TimeSeriesOps.seasonalNaive(
        split.filter(col("split") === "test"), Seq("k"), "t", "y", 7)
      .agg(TimeSeriesOps.rmse(col("y"), col("pred"))).head.getDouble(0)
    assert(arRmse < naiveRmse,
      s"AR one-step $arRmse not better than seasonal-naive $naiveRmse")
  }

  test("closed-form rollout equals the recursive autoregressive rollout") {
    val beta = Array(1.2, 0.5, -0.2, 0.1) // intercept + AR(3)
    val hist = Array(3.0, 2.0, 1.0)       // y_t, y_{t-1}, y_{t-2}
    var window = hist.toList              // most recent first
    val recursive = (1 to 5).map { _ =>
      val nxt = beta(0) + (1 to 3).map(i => beta(i) * window(i - 1)).sum
      window = nxt :: window
      nxt
    }
    (1 to 5).foreach { h =>
      val ch = Forecast.arRolloutCoefficients(beta, h)
      val direct = ch(0) + (1 to 3).map(i => ch(i) * hist(i - 1)).sum
      assert(math.abs(direct - recursive(h - 1)) < 1e-10,
        s"h=$h: direct $direct vs recursive ${recursive(h - 1)}")
    }
  }

  test("rollout coefficients score as one row-local dot product") {
    val df = arSeries("a", 5.0, 0.6, -0.3, 600).toDF("k", "t", "y")
    val lagged = Forecast.lagFeatures(df, Seq("k"), "t", "y", 2)
    val beta = Forecast.fitRidge(lagged, Forecast.arFeatures(2), col("y"))
    val c3 = Forecast.arRolloutCoefficients(beta, 3)
    // row t's lag features are the state (y_{t-1}, y_{t-2}), so the
    // h=3 coefficients there predict y_{t+2} = lead(y, 2); the
    // multi-step error must stay bounded (series std ~0.9)
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy("t")
    val rmse3 = lagged
      .withColumn("y_h3", lead(col("y"), 2).over(byKey))
      .filter(col("y_h3").isNotNull)
      .withColumn("pred", Forecast.predictLinear(Forecast.arFeatures(2), c3))
      .agg(TimeSeriesOps.rmse(col("y_h3"), col("pred"))).head.getDouble(0)
    assert(rmse3 < 0.5, s"3-step rollout rmse $rmse3 unexpectedly large")
  }

  test("the harness accommodates an MLlib estimator (GBT on the same features)") {
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.regression.GBTRegressor
    val twoPi = 2.0 * math.Pi
    val featured = synthetic()
      .withColumn("trend",
        datediff(col("day"), lit("2000-01-01").cast("date")).cast("double") / 365.25)
      .withColumn("doy_sin", sin(dayofyear(col("day")) * twoPi / 365.25))
      .withColumn("doy_cos", cos(dayofyear(col("day")) * twoPi / 365.25))
      .withColumn("dow_sin", sin((dayofweek(col("day")) - 1) * twoPi / 7.0))
      .withColumn("dow_cos", cos((dayofweek(col("day")) - 1) * twoPi / 7.0))
    val split = TimeSeriesOps.ratioSplit(featured, Seq.empty, "day", (0.8, 0.0, 0.2))
    val assembler = new VectorAssembler()
      .setInputCols(Array("trend", "doy_sin", "doy_cos", "dow_sin", "dow_cos"))
      .setOutputCol("features")
    val gbt = new GBTRegressor().setLabelCol("y").setFeaturesCol("features")
      .setMaxIter(20).setMaxDepth(4).setSeed(42L)
    val model = gbt.fit(assembler.transform(split.filter(col("split") === "train")))
    val rmse = model.transform(assembler.transform(split.filter(col("split") === "test")))
      .agg(TimeSeriesOps.rmse(col("y"), col("prediction"))).head.getDouble(0)
    // GBT can't extrapolate the linear trend beyond the train range, so
    // its held-out-tail RMSE carries the up-to-1.5 trend drift over the
    // test window (signal std ~3.5) — the point is the HARNESS runs an
    // MLlib estimator end-to-end, and the closed-form ridge (which
    // extrapolates) is the better scale choice; assert GBT at least
    // learns the seasonality (a mean-only model would sit near 3.5+)
    assert(rmse < 3.0, s"GBT rmse $rmse learned nothing")
  }
}
