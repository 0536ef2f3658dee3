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

  test("unknown strata fall back to the default rate (0 = dropped)") {
    val out = Sampling.systematicSample(docs, $"id", $"lang", Map("fr" -> 900L))
    assert(out.count() == 0)
    val kept = Sampling.systematicSample(docs, $"id", $"lang",
      Map.empty, defaultPermille = 1000L)
    assert(kept.count() == 10000)
  }
}
