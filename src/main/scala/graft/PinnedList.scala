package graft

/** Maintenance tool behind PINNED.md: prints the exact set of
  * VALUES-pinned oracles (the same predicate PinnedOracleSpec replays)
  * so the doc's table can be diffed against reality in O(1).
  * `sbt "runMain graft.PinnedList"`. */
object PinnedList {
  def pinnedNames: Seq[String] =
    SparkEntry.oracleSql.filter { case (_, sql) =>
      sql.contains("FROM (VALUES") && !sql.startsWith("WITH")
    }.keys.toSeq.sorted

  def main(args: Array[String]): Unit = {
    println("PINNED_LIST=" + pinnedNames.mkString(","))
    println(s"COUNTS=${pinnedNames.size}/${SparkEntry.oracleSql.size}")
  }
}
