package graft
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    names.split(",").foreach { name =>
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        if (sys.env.contains("SPARK_GRAFT_SHOW")) df.show(100, truncate = false)
        else df.write.mode("overwrite").format("noop").save()
        println(s"RUNONE $name OK ${(System.nanoTime()-t0)/1e9}s")
      } catch { case e: Throwable =>
        println(s"RUNONE $name FAIL: ${e.getClass.getName}: ${e.getMessage}")
        var c = e.getCause
        while (c != null) { println(s"  cause: ${c.getClass.getName}: ${c.getMessage}"); c = c.getCause }
      }
    }
    spark.stop()
  }
}
