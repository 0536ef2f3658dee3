package graft.plans

import graft.SparkSpec
import graft.functions.JsonFunctions.jsonGet
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** [[JsonFast]]/[[JsonGetScalar]] — the codegen JSON scalar getter
  * must agree with `get_json_object` (the expression it replaces in
  * the §2.8-json hot path) on every value shape, and must survive
  * both codegen and interpreted evaluation. */
class JsonExpressionsSpec extends SparkSpec {

  private def fast(json: String, key: String): String = {
    val r = JsonFast.getScalar(
      if (json == null) null else UTF8String.fromString(json),
      UTF8String.fromString(key))
    if (r == null) null else r.toString
  }

  test("scalar shapes: numbers, strings, booleans, whitespace") {
    assert(fast("""{"k": 76}""", "k") == "76")
    assert(fast("""{"k":-3.5e2}""", "k") == "-3.5e2")
    assert(fast("""{"a":"x","k":"hi there"}""", "k") == "hi there")
    assert(fast("""{ "k" : true }""", "k") == "true")
    assert(fast("""{"k":false,"z":1}""", "k") == "false")
  }

  test("misses: absent key, null literal, malformed, non-object") {
    assert(fast("""{"a":1}""", "k") == null)
    assert(fast("""{"k":null}""", "k") == null)
    assert(fast("""{"k":1""", "missing") == null)
    assert(fast("""[1,2,3]""", "k") == null)
    assert(fast("", "k") == null)
    assert(fast(null, "k") == null)
  }

  test("nested containers are skipped; container values returned raw") {
    assert(fast("""{"a":{"k":9},"k":1}""", "k") == "1")
    assert(fast("""{"a":[{"k":9},2],"k":"v"}""", "k") == "v")
    assert(fast("""{"k":{"x":[1,2]},"b":0}""", "k") == """{"x":[1,2]}""")
    assert(fast("""{"k":[1,"a,b",3]}""", "k") == """[1,"a,b",3]""")
  }

  test("escapes in values and keys; keys containing braces") {
    assert(fast("""{"k":"a\"b"}""", "k") == "a\"b")
    assert(fast("""{"k":"line\nnext\t\\"}""", "k") == "line\nnext\t\\")
    assert(fast("""{"k":"A한"}""", "k") == "A한")
    assert(fast("""{"a":"}{","k":5}""", "k") == "5")
    assert(fast("""{"k":7}""", "k") == "7")
    assert(fast("""{"k\"q":7}""", "k\"q") == "7")
  }

  test("agrees with get_json_object row-for-row (codegen path)") {
    import spark.implicits._
    val rows = Seq(
      """{"k": 76}""", """{"k":-1}""", """{"k":null}""", """{"a":2}""",
      """{"k":"s"}""", """{"x":{"k":3},"k":4}""", """not json""", null,
      """{"k":"Ab"}""", """{ "k" :  12 , "z": "y"}""")
    val df = rows.toDF("j")
      .select(col("j"), jsonGet(col("j"), "k").as("fast"),
        get_json_object(col("j"), "$.k").as("jackson"))
    val bad = df.filter(not(col("fast") <=> col("jackson"))).collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("whole-stage codegen stays intact around the expression") {
    val df = spark.range(10)
      .select(concat(lit("""{"k":"""), col("id"), lit("}")).as("j"))
      .select(jsonGet(col("j"), "k").cast("int").as("k"))
      .agg(sum("k"))
    // execute first: AQE only materializes the codegen annotations in
    // the final plan
    assert(df.collect().head.getLong(0) == 45L)
    val p = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators inside a WholeStageCodegen
    // stage; a CodegenFallback expression would strip it from the
    // Project (get_json_object does exactly that)
    assert("""\*\(\d+\) Project \[cast\(jsongetscalar""".r
      .findFirstIn(p).isDefined, p)
  }
}
