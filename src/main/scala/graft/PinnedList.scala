package graft

/** Maintenance tool behind PINNED.md: prints the exact set of
  * VALUES-pinned oracles (the same predicate PinnedOracleSpec replays)
  * so the doc's table can be diffed against reality in O(1).
  * `sbt "runMain graft.PinnedList"`. */
object PinnedList {
  /** THE VALUES-pin predicate — single source of truth (r12 advisory:
    * PinnedOracleSpec carried a verbatim copy; a drifted copy would
    * make the PINNED.md guard and the replay spec audit different
    * sets). A real recomputation oracle may still carry a VALUES seed
    * table inside a WITH (SketchOracleSql's LSH constants). */
  def isPinned(sql: String): Boolean =
    sql.contains("FROM (VALUES") && !sql.startsWith("WITH")

  def pinnedOracles: Map[String, String] =
    SparkEntry.oracleSql.filter { case (_, sql) => isPinned(sql) }

  def pinnedNames: Seq[String] = pinnedOracles.keys.toSeq.sorted

  def main(args: Array[String]): Unit = {
    println("PINNED_LIST=" + pinnedNames.mkString(","))
    println(s"COUNTS=${pinnedNames.size}/${SparkEntry.oracleSql.size}")
  }
}
