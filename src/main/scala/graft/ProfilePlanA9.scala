package graft
object ProfilePlanA9 {
  def main(args: Array[String]): Unit = {
    val s = Sessions.local("8")
    val df = SparkEntry.queries("a9_longest_run")(s, "/root/testdata/sf0.01")
    val p = df.queryExecution.executedPlan.toString
    println("=== scan lines ===")
    p.linesIterator.filter(l => l.contains("FileScan") || l.contains("PushedFilters")).foreach(l => println(l.trim.take(400)))
    println("=== exchanges: " + "Exchange".r.findAllIn(p).length + " reused: " + "ReusedExchange".r.findAllIn(p).length)
    println(p.take(4000))
    s.stop()
  }
}
