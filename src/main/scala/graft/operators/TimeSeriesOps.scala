package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators (SURVEY.md §2.4 A7-A9/A13, §2.5 W5-W6).
  * Ref: modules/price_forecast/data_utils.py, dataset.py, evaluate.py.
  *
  * Scale design: every op is keyed by a series id (`keyCols`) so
  * windows partition by series, never a global single-partition sort.
  * The reference processes one fruit at a time; here thousands of
  * series interpolate in one shuffle.
  */
object TimeSeriesOps {

  /** UTC calendar day of a TimestampType column in pure int64
    * arithmetic — value-identical to `to_date(ts)` under the engine's
    * UTC-pinned session ([[graft.Sessions]]), but codegen'd as three
    * integer ops instead of the per-row Instant/LocalDate allocation
    * `Cast(Timestamp→Date)` runs (r17 ProfileQuery: the cast was
    * ~0.4 s of every events-family day-grain query at the 100 M-row
    * point). `unix_micros` is a zero-cost reinterpret of the internal
    * micros long; the subtract-pmod form is an exact floor division,
    * so pre-1970 (negative-micros) days round toward −∞ like the cast
    * does, not toward zero like `div` would (TimeSeriesOpsSpec pins
    * equality across the 1582..2200 range). The `/` is Spark's double
    * division, exact here because the dividend is pmod-aligned to a
    * day multiple and |micros| < 2⁵³ for every date before year 2255
    * (documented domain bound; the spec's upper pin sits inside it). */
  def utcDay(tsCol: Column): Column = {
    val us = unix_micros(tsCol)
    val perDay = lit(86400000000L)
    date_from_unix_date(((us - pmod(us, perDay)) / perDay).cast("int"))
  }

  /** A7: daily mean resample of an event stream.
    * Ref: data_utils.py:36 (`resample('D').mean()`). */
  def dailyResample(df: DataFrame, keyCols: Seq[Column], tsCol: Column,
                    valCol: Column): DataFrame =
    df.groupBy((keyCols :+ utcDay(tsCol).as("day")): _*)
      .agg(avg(valCol).as("avg_value"))

  /** Dense daily calendar spine per key with values attached —
    * missing days become nulls (the interpolation input shape).
    * Spine bounds are per-key min/max dates.
    *
    * FUSED single-pass form (r15): instead of a bounds aggregation +
    * calendar explode + left join back (three operators, two extra
    * jobs at the 100× point — the bounds agg's extra exchange and the
    * spine join's broadcast build), each observed row emits the gap
    * days up to (exclusive) the NEXT observation via one `lead`
    * window + `explode(sequence(...))`. The union of [day, next−1]
    * ranges over consecutive observations is exactly the min..max
    * calendar (the last row contributes just itself), and the
    * partitioning the lead window installs (hash on `keys`) is the
    * SAME one every downstream interpolation/run-length window needs,
    * so the whole spine+interpolate chain runs in one exchange after
    * the input. Precondition (unchanged from the join form's
    * fan-out-free contract): (keys, day) unique — the resample/groupBy
    * output shape; a duplicated day emits its single-day range twice,
    * mirroring the old left-join duplication rather than failing.
    * Keyless spines (empty `keys`) use a global window — callers
    * pre-coalesce a bounded input (j3 does), same contract as the old
    * global bounds aggregate. */
  def toDailySpine(daily: DataFrame, keys: Seq[String], dayCol: String,
                   valCol: String): DataFrame = {
    if (keys.isEmpty)
      // r15 advisory: the fused form's keyless lead window funnels the
      // whole input through ONE partition (Spark's own 'No Partition
      // Defined' hazard) — fine for the pre-coalesced bounded inputs
      // this contract documents (j3 aggregates to one user's calendar
      // first), wrong for a large keyless input. Loud, not fatal: the
      // result is still correct, only single-task.
      System.err.println(
        "[graft] toDailySpine: keyless spine runs a GLOBAL window " +
          "(single partition) — pre-aggregate/coalesce a bounded input, " +
          "or pass keys for a distributed spine")
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy(col(dayCol))
    val gapEnd = coalesce(date_sub(lead(col(dayCol), 1).over(byKey), 1),
      col(dayCol))
    daily
      .select((keys.map(col) :+ col(dayCol) :+ col(valCol) :+
        // greatest() guards the dup-day edge: sequence() refuses a
        // descending range, and a duplicate day's lead is the same day
        gapEnd.as("_gap_end")): _*)
      .select((keys.map(col) :+ col(dayCol) :+ col(valCol) :+
        explode(sequence(col(dayCol),
          greatest(col(dayCol), col("_gap_end")),
          expr("interval 1 day"))).as("_spine_day")): _*)
      .select((keys.map(col) :+
        col("_spine_day").as(dayCol) :+
        when(col("_spine_day") === col(dayCol), col(valCol)).as(valCol)): _*)
  }

  /** A8: gap-limited, both-direction, time-weighted interpolation,
    * matching pandas `interpolate(method='time', limit=maxGap,
    * limit_direction='both')` exactly (ref data_utils.py:38; semantics
    * verified against pandas — see TimeSeriesSpec):
    *  - interior null filled with the time-weighted blend when its
    *    distance to the nearest valid on EITHER side is <= maxGap;
    *  - leading nulls back-fill, trailing nulls forward-fill, same
    *    distance bound;
    *  - nulls farther than maxGap from both sides stay null.
    * Input must be a dense daily spine (use [[toDailySpine]]).
    * One shuffle on `keys`; two window passes. */
  def interpolateGapLimited(spine: DataFrame, keys: Seq[String],
                            dayCol: String, valCol: String,
                            maxGap: Int): DataFrame = {
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy(col(dayCol))
    val before = byKey.rowsBetween(Window.unboundedPreceding, 0)
    val after = byKey.rowsBetween(0, Window.unboundedFollowing)
    val v = col(valCol)
    // all four neighbor columns in ONE select: the sequential
    // withColumn chain interleaved Projects (the when(v.isNotNull, day)
    // marker) between the Window nodes, which blocked CollapseWindow —
    // the plan ran THREE full window passes over the exploded spine
    // (r19 x1000: the window materializations were most of the 5.9×
    // residual). Emitted together, the analyzer groups all four
    // functions by (partition, order) into a single WindowExec with
    // two frame processors (running last + lookahead first) — one
    // buffered pass, same values.
    val withNeighbors = spine.select(
      (spine.columns.map(col).toSeq :+
        last(v, ignoreNulls = true).over(before).as("_pv") :+
        last(when(v.isNotNull, col(dayCol)), ignoreNulls = true)
          .over(before).as("_pd") :+
        first(v, ignoreNulls = true).over(after).as("_nv") :+
        first(when(v.isNotNull, col(dayCol)), ignoreNulls = true)
          .over(after).as("_nd")): _*)
    val dL = datediff(col(dayCol), col("_pd"))
    val dR = datediff(col("_nd"), col(dayCol))
    val inReach = (col("_pd").isNotNull && dL <= maxGap) ||
      (col("_nd").isNotNull && dR <= maxGap)
    val interp = col("_pv") +
      (col("_nv") - col("_pv")) * dL.cast("double") /
        datediff(col("_nd"), col("_pd")).cast("double")
    val filled = when(v.isNotNull, v)
      .when(!inReach, lit(null))
      .when(col("_pd").isNotNull && col("_nd").isNotNull, interp)
      .when(col("_nd").isNotNull, col("_nv")) // leading → bfill
      .when(col("_pd").isNotNull, col("_pv")) // trailing → ffill
    withNeighbors.withColumn(valCol, filled)
      .drop("_pv", "_pd", "_nv", "_nd")
  }

  /** A9: longest contiguous non-null run per key (gaps-and-islands).
    * Ref: data_utils.py:66-99. Returns (keys..., run_len, run_start). */
  def longestNonNullRun(spine: DataFrame, keys: Seq[String], dayCol: String,
                        valCol: String): DataFrame = {
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy(col(dayCol))
    val islands = spine
      .withColumn("_nullCnt",
        sum(when(col(valCol).isNull, 1).otherwise(0)).over(
          byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col(valCol).isNotNull)
      .groupBy((keys.map(col) :+ col("_nullCnt")): _*)
      .agg(count(lit(1)).as("run_len"), min(col(dayCol)).as("run_start"))
    val best = Window.partitionBy(keys.map(col): _*)
      .orderBy(desc("run_len"), col("run_start"))
    islands.withColumn("_rn", row_number().over(best))
      .filter(col("_rn") === 1).drop("_rn", "_nullCnt")
  }

  /** A9 fused form: longest run of CONSECUTIVE days per key, straight
    * from a (keys, day)-distinct daily frame — no spine. Equivalent to
    * [[toDailySpine]] + [[longestNonNullRun]] when values exist exactly
    * on observed days (the spine's inserted nulls break runs precisely
    * where a calendar gap does), but ONE scan instead of two (the spine
    * needs a bounds aggregation plus a calendar join over the same
    * input) and no explode. Classic gaps-and-islands: `day −
    * row_number` is constant within a consecutive run. Use
    * [[longestNonNullRun]] when the input is already a spine with
    * genuine nulls (e.g. post-interpolation leftovers).
    * Returns (keys..., run_len, run_start). */
  def longestConsecutiveRun(daily: DataFrame, keys: Seq[String],
                            dayCol: String): DataFrame = {
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy(col(dayCol))
    val islands = daily
      .withColumn("_grp",
        datediff(col(dayCol), lit(java.sql.Date.valueOf("1970-01-01"))) -
          row_number().over(byKey))
      .groupBy((keys.map(col) :+ col("_grp")): _*)
      .agg(count(lit(1)).as("run_len"), min(col(dayCol)).as("run_start"))
    val best = Window.partitionBy(keys.map(col): _*)
      .orderBy(desc("run_len"), col("run_start"))
    islands.withColumn("_rn", row_number().over(best))
      .filter(col("_rn") === 1).drop("_rn", "_grp")
  }

  /** Calendar features (ref data_utils.py:49-61): day-of-year /
    * day-of-week sin+cos seasonal encodings. */
  def calendarFeatures(df: DataFrame, dayCol: String): DataFrame = {
    val twoPi = 2.0 * math.Pi
    val doy = dayofyear(col(dayCol)).cast("double")
    val dow = (dayofweek(col(dayCol)) - 1).cast("double") // 0..6
    df.withColumn("doy_sin", sin(doy * twoPi / 365.25))
      .withColumn("doy_cos", cos(doy * twoPi / 365.25))
      .withColumn("dow_sin", sin(dow * twoPi / 7.0))
      .withColumn("dow_cos", cos(dow * twoPi / 7.0))
  }

  /** W5: sliding lookback×horizon training windows per key: for each
    * row, the previous `lookback` values (incl. current) and next
    * `horizon` values; only complete windows kept.
    * Ref: dataset.py:52-58. */
  def slidingWindows(df: DataFrame, keys: Seq[String], orderCol: String,
                     valCol: String, lookback: Int, horizon: Int): DataFrame = {
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    df.withColumn("features",
        collect_list(col(valCol)).over(byKey.rowsBetween(-(lookback - 1), 0)))
      .withColumn("targets",
        collect_list(col(valCol)).over(byKey.rowsBetween(1, horizon)))
      .filter(size(col("features")) === lookback && size(col("targets")) === horizon)
  }

  /** A13 regression metric aggregates (ref evaluate.py:13-58, sMAPE
    * data_utils.py:151-159). Use inside one `agg(...)`. */
  def rmse(actual: Column, pred: Column): Column =
    sqrt(avg(pow(pred - actual, 2.0)))

  /** R² as a single-pass aggregate: 1 - SSres/SStot with
    * SStot = var_pop(a)·n. Spark's `var_pop` accumulates central
    * moments (Welford-style merge), so SStot stays accurate when
    * |mean| ≫ stddev — the raw Σa² − n·mean² form cancels
    * catastrophically there (fine at sf0.1, wrong at 100× with
    * large-valued series). NULL actuals are excluded on both factors
    * (var_pop and count ignore nulls), matching the oracle's
    * count(value). */
  def r2Agg(actual: Column, pred: Column): Column = {
    val ssRes = sum(pow(actual - pred, 2.0))
    val ssTot = var_pop(actual) * count(actual)
    lit(1.0) - ssRes / ssTot
  }

  def smape(actual: Column, pred: Column): Column =
    avg(lit(2.0) * abs(pred - actual) /
      greatest(abs(actual) + abs(pred), lit(1e-8))) * 100.0

  /** Positional ratio split per key (ref data_utils.py:100-129
    * `split_block_lenient._split`): rows ordered by `orderCol` get a
    * `split` label with cut1 = floor(n·a), cut2 = floor(n·(a+b)) for
    * normalized ratios a:b:c — reproducing pandas iloc slicing
    * exactly. One window pass per key. */
  def ratioSplit(df: DataFrame, keys: Seq[String], orderCol: String,
                 ratios: (Double, Double, Double)): DataFrame = {
    val (a, b, c) = ratios
    val tot = a + b + c
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    val all = Window.partitionBy(keys.map(col): _*)
    df.withColumn("_pos", row_number().over(byKey))
      .withColumn("_n", count(lit(1)).over(all))
      .withColumn("split",
        when(col("_pos") <= floor(col("_n") * (a / tot)), "train")
          .when(col("_pos") <= floor(col("_n") * ((a + b) / tot)), "val")
          .otherwise("test"))
      .drop("_pos", "_n")
  }

  /** Seasonal-naive forecast baseline (the engine's stand-in for the
    * reference's LSTM, SURVEY §7.1 step 7): ŷ(t) = y(t − period). For
    * in-sample evaluation rows without a t−period observation are
    * dropped. */
  def seasonalNaive(df: DataFrame, keys: Seq[String], dayCol: String,
                    valCol: String, periodDays: Int): DataFrame = {
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy(col(dayCol))
    df.withColumn("pred", lag(col(valCol), periodDays).over(byKey))
      .filter(col("pred").isNotNull)
  }

  /** Recursive rollout (ref routers/price_forecast.py:89-112): starting
    * from the last `period` observed values, roll `horizon` days
    * forward with the seasonal-naive step — a driver-side fold over a
    * window-sized seed (the model's state is tiny even when the
    * history is huge). Returns (dayOffset 1.., predicted). */
  def rolloutSeasonalNaive(seed: Seq[Double], period: Int,
                           horizon: Int): Seq[(Int, Double)] = {
    require(seed.length >= period, s"need ≥$period seed values")
    val buf = scala.collection.mutable.ArrayBuffer(seed.takeRight(period): _*)
    (1 to horizon).map { h =>
      val pred = buf(buf.length - period)
      buf += pred
      (h, pred)
    }
  }
}
