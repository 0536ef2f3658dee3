package graft.functions

import org.apache.spark.sql.Column

/** Column front door for the codegen JSON expressions
  * ([[graft.plans.JsonGetScalar]]). */
object JsonFunctions {

  /** Fast scalar field extraction: `jsonGet(col, "k")` ≡
    * `get_json_object(col, "$.k")` on valid JSON objects, but stays
    * inside whole-stage codegen and skips the per-row Jackson parser
    * (~50 ns vs ~3 µs on flat event-props objects). */
  def jsonGet(json: Column, key: String): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.functions.lit
    ColumnBridge.column(graft.plans.JsonGetScalar(
      ColumnBridge.expression(json), ColumnBridge.expression(lit(key))))
  }
}
