package graft.functions

import graft.SparkSpec
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)),
    (Seq(1f, 2f, 2f), Seq(1f, 2f, 2f)),
    (Seq(0f, 0f, 0f), Seq(1f, 1f, 1f))).toDF("a", "b")

  test("dot / l2Norm / cosine") {
    val rows = df.select(dot($"a", $"b"), l2Norm($"a"), cosine($"a", $"b")).collect()
    assert(rows(0).getDouble(0) == 0.0 && rows(0).getDouble(1) == 1.0 && rows(0).getDouble(2) == 0.0)
    assert(rows(1).getDouble(0) == 9.0 && rows(1).getDouble(1) == 3.0)
    assert(math.abs(rows(1).getDouble(2) - 1.0) < 1e-12)
    // zero vector → cosine 0, not NaN
    assert(rows(2).getDouble(2) == 0.0)
  }

  test("l2Normalize yields unit vectors; zero passes through") {
    val rows = df.select(l2Norm(l2Normalize($"a"))).collect()
    assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(rows(1).getDouble(0) - 1.0) < 1e-12)
    assert(rows(2).getDouble(0) == 0.0)
  }

  test("codegen dotFast/l2DistFast match the HOF forms exactly") {
    val r = df.select(dot($"a", $"b"), dotFast($"a", $"b"),
      l2Dist($"a", $"b"), l2DistFast($"a", $"b")).collect()
    r.foreach { row =>
      assert(row.getDouble(0) == row.getDouble(1))
      assert(row.getDouble(2) == row.getDouble(3))
    }
  }

  test("R2Aggregator matches the closed-form r2Agg column") {
    val data = Seq((1.0, 1.5), (2.0, 2.5), (3.0, 2.5), (4.0, 3.8))
    val ds = data.toDF("a", "p").as[(Double, Double)]
    val typed = ds.select(R2Aggregator.column).head()
    val closed = data.toDF("a", "p")
      .agg(graft.operators.TimeSeriesOps.r2Agg($"a", $"p")).head.getDouble(0)
    assert(math.abs(typed - closed) < 1e-12)
  }

  test("l2Dist and l2ToSimilarity") {
    val r = Seq((Seq(0f, 3f), Seq(4f, 0f))).toDF("a", "b")
      .select(l2Dist($"a", $"b"), l2ToSimilarity(l2Dist($"a", $"b"))).head
    assert(r.getDouble(0) == 5.0)
    assert(math.abs(r.getDouble(1) - 1.0 / 6.0) < 1e-12)
  }
}
