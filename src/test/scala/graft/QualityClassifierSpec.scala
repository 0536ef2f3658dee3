package graft

import org.apache.spark.sql.functions._

/** The rule-distillation quality classifier must actually LEARN: its
  * held-out agreement with the teacher rule has to clear the
  * majority-class base rate by a wide margin (a degenerate fit that
  * predicts one class scores exactly the base rate — the failure mode
  * this spec pins against), and the fit must not depend on the input
  * partitioning. */
class QualityClassifierSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("distilled linear probe beats the majority-class base rate") {
    val row = SparkEntry.queries("quality_classifier")(spark, dir).head()
    val nEval = row.getLong(0)
    val nPred = row.getLong(1)
    val acc = row.getDouble(2)
    // teacher labels on the same held-out split: majority share = the
    // accuracy of always predicting one class
    val docs = Tables.load(spark, dir, "documents")
      .filter(pmod(xxhash64(col("doc_id")), lit(5)) >= 4)
      .withColumn("_y",
        (graft.operators.TextAnalysis.qualityScore(col("text")) > 0.70)
          .cast("double"))
    val pos = docs.agg(avg("_y")).head.getDouble(0)
    val baseRate = math.max(pos, 1.0 - pos)
    assert(acc >= baseRate + 0.15,
      s"accuracy $acc does not clear base rate $baseRate — degenerate fit")
    assert(nPred > 0L && nPred < nEval,
      s"degenerate prediction: $nPred of $nEval positive")
  }

  test("no held-out score sits near the 0.5 threshold (pinned counts are stable)") {
    // the pinned n_pred_hq/accuracy depend on a hard _score > 0.5 cut
    // over float Gram sums whose accumulation order can vary with
    // shuffle-block arrival; the pin is only trustworthy if every
    // held-out score clears the threshold by far more than any
    // summation-order ulp jitter (~1e-12 relative) could move it
    val minMargin = SparkEntry.qualityClassifierScored(spark, dir)
      .agg(min(abs(col("_score") - 0.5))).head.getDouble(0)
    assert(minMargin > 1e-3,
      f"held-out score within $minMargin%.2e of the 0.5 threshold — " +
        "pinned counts could flake under different parallelism")
  }
}
