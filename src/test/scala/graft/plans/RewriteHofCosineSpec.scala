package graft.plans

import graft.{SparkSpec, Tables}
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class RewriteHofCosineSpec extends SparkSpec {
  import spark.implicits._

  // a file-backed source: a LocalRelation would be constant-folded by
  // ConvertToLocalRelation before the plan can be observed
  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.load(spark, dir, "embeddings")
  private lazy val query: Seq[Float] =
    emb.filter($"vec_id" === 0).select("embedding").head.getSeq[Float](0)

  test("HOF cosine is rewritten to the native CosineSimilarity expression") {
    val q = emb.select($"vec_id",
      VectorFunctions.cosine($"embedding", lit(query.toArray)).as("c"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("cosinesimilarity"),
      "rule did not fire:\n" + optimized.take(1500))
    assert(!optimized.contains("aggregate(zip_with"),
      "HOF residue left:\n" + optimized.take(1500))
  }

  test("rewrite preserves results exactly") {
    val viaRule = emb.select($"vec_id",
        VectorFunctions.cosine($"embedding", lit(query.toArray)).as("c"))
      .as[(Long, Double)].collect().toMap
    val direct = emb.select($"vec_id",
        VectorFunctions.cosineFast($"embedding", lit(query.toArray)).as("c"))
      .as[(Long, Double)].collect().toMap
    assert(viaRule == direct)
  }

  test("same-shape but different-meaning lambdas are NOT rewritten") {
    emb.createOrReplaceTempView("vecs_neg")
    // zip_with multiplies x*x (not x*y) — shape matches the cosine
    // pattern but semantics differ; the exprId binding must reject it
    val q = spark.sql(
      """SELECT vec_id,
        |  CASE WHEN sqrt(aggregate(transform(embedding, x -> cast(x as double)), 0.0D, (acc, v) -> acc + v*v))
        |          * sqrt(aggregate(transform(embedding, x -> cast(x as double)), 0.0D, (acc, v) -> acc + v*v)) = 0.0D THEN 0.0D
        |       ELSE aggregate(zip_with(transform(embedding, x -> cast(x as double)), transform(embedding, x -> cast(x as double)), (x, y) -> x*x), 0.0D, (acc, v) -> acc + v)
        |          / (sqrt(aggregate(transform(embedding, x -> cast(x as double)), 0.0D, (acc, v) -> acc + v*v))
        |          * sqrt(aggregate(transform(embedding, x -> cast(x as double)), 0.0D, (acc, v) -> acc + v*v))) END AS c
        |FROM vecs_neg WHERE vec_id = 1""".stripMargin)
    assert(!q.queryExecution.optimizedPlan.toString.contains("cosinesimilarity"),
      "x*x lambda must not be rewritten into a dot product")
  }

  test("native expressions return NULL on length mismatch / null elements, like the HOF") {
    val df = Seq(
      (1L, Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](1f, 2f, 3f)),
      (2L, Seq[java.lang.Float](1f, null), Seq[java.lang.Float](1f, 2f)))
      .toDF("id", "a", "b")
    val out = df.selectExpr("graft_cosine(a, b)", "graft_dot(a, b)", "graft_l2dist(a, b)")
      .collect()
    out.foreach { r => (0 until 3).foreach(i => assert(r.isNullAt(i), s"row $r col $i")) }
    // and the healthy case still computes
    val ok = Seq((Seq(1f, 0f), Seq(1f, 0f))).toDF("a", "b")
      .selectExpr("graft_cosine(a, b)").head.getDouble(0)
    assert(math.abs(ok - 1.0) < 1e-12)
  }

  test("SQL-authored HOF cosine also gets the native expression") {
    emb.createOrReplaceTempView("vecs_rw")
    val q = spark.sql(
      """SELECT vec_id,
        |  CASE WHEN sqrt(aggregate(transform(embedding, x -> cast(x as double)), 0.0D, (acc, v) -> acc + v*v))
        |          * sqrt(aggregate(transform(embedding, x -> cast(x as double)), 0.0D, (acc, v) -> acc + v*v)) = 0.0D THEN 0.0D
        |       ELSE aggregate(zip_with(transform(embedding, x -> cast(x as double)), transform(embedding, x -> cast(x as double)), (x, y) -> x*y), 0.0D, (acc, v) -> acc + v)
        |          / (sqrt(aggregate(transform(embedding, x -> cast(x as double)), 0.0D, (acc, v) -> acc + v*v))
        |          * sqrt(aggregate(transform(embedding, x -> cast(x as double)), 0.0D, (acc, v) -> acc + v*v))) END AS c
        |FROM vecs_rw WHERE vec_id = 1""".stripMargin)
    assert(q.queryExecution.optimizedPlan.toString.contains("cosinesimilarity"))
    assert(math.abs(q.head.getDouble(1) - 1.0) < 1e-9) // self-cosine
  }
}
