package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Systematic training-mix sampling: deterministic, rate-accurate,
  * partition-layout-independent. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1L to 10000L)
    .map(i => (i, if (i % 2 == 0) "en" else "zh")).toDF("id", "lang")

  test("per-stratum rates hold within sampling tolerance") {
    val out = Sampling.systematicSample(docs, $"id", $"lang",
        Map("en" -> 500L, "zh" -> 100L))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // 5000 docs per stratum; hash-mod is equidistributed
    assert(math.abs(out("en") - 2500L) < 250, s"en=${out("en")}")
    assert(math.abs(out("zh") - 500L) < 150, s"zh=${out("zh")}")
  }

  test("membership is deterministic and independent of partitioning") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.systematicSample(df, $"id", $"lang", Map("en" -> 300L))
        .select("id").as[Long].collect().toSet
    val a = ids(docs)
    val b = ids(docs.repartition(13))
    assert(a == b && a.nonEmpty)
  }

  test("temperature mix upsamples small domains toward the budget") {
    // 9000 en vs 1000 zh: proportional sampling would give zh 10% of
    // the mix; w ∝ √n gives zh √1000/(√9000+√1000) ≈ 25%
    val skewed = ((1L to 9000L).map(i => (i, "en")) ++
      (9001L to 10000L).map(i => (i, "zh"))).toDF("id", "lang")
    val out = Sampling.temperatureMix(skewed, $"id", $"lang", budget = 400L)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val total = out.values.sum
    assert(math.abs(total - 400L) < 80, s"total $total far from budget")
    val zhShare = out("zh").toDouble / total
    assert(zhShare > 0.17 && zhShare < 0.33,
      s"zh share $zhShare not flattened toward ~0.25")
  }

  test("temperature mix membership is independent of partitioning") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.temperatureMix(df, $"id", $"lang", budget = 300L)
        .select("id").as[Long].collect().toSet
    assert(ids(docs) == ids(docs.repartition(17)) && ids(docs).nonEmpty)
  }

  test("temperature mix fails loud on a row-grained stratum column") {
    // r16 self-audit: the per-stratum count collect is limit-gated —
    // passing an id-like column must error with guidance, not pull
    // every distinct value to the driver
    val rowGrained = (1L to 50L).map(i => (i, s"s$i")).toDF("id", "lang")
    val e = intercept[IllegalArgumentException] {
      Sampling.temperatureMix(rowGrained, $"id", $"lang",
        budget = 10L, maxStrata = 20)
    }
    assert(e.getMessage.contains("distinct strata"))
    // at-the-bound stays in contract
    assert(Sampling.temperatureMix(rowGrained, $"id", $"lang",
      budget = 50L, maxStrata = 50).count() > 0)
  }

  test("unknown strata fall back to the default rate (0 = dropped)") {
    val out = Sampling.systematicSample(docs, $"id", $"lang", Map("fr" -> 900L))
    assert(out.count() == 0)
    val kept = Sampling.systematicSample(docs, $"id", $"lang",
      Map.empty, defaultPermille = 1000L)
    assert(kept.count() == 10000)
  }
}
