package graft

/** Ad-hoc per-query profiler: runs the named queries twice (cold/warm) and
  * prints timings + the formatted physical plan when SPARK_GRAFT_EXPLAIN=1.
  */
object BenchDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) fn(spark, sfDir).explain("formatted")
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val n = df.count()
        println(f"[benchdbg] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
        // the POST-execution plan shows what AQE actually ran (reused
        // stages, chosen join strategies) — the static explain does not.
        // count() executes a SEPARATE aggregate plan, leaving df's own
        // executedPlan un-finalized (isFinalPlan=false), so drive df's
        // OWN plan first — via the noop sink, which computes every column
        // of every row without pulling the result to the driver (a
        // collect() here could OOM the driver on a large-result query)
        if (i == 1 && sys.env.contains("SPARK_GRAFT_EXPLAIN_EXECUTED")) {
          df.write.format("noop").mode("overwrite").save()
          println(df.queryExecution.executedPlan.toString)
        }
      }
    }
    spark.stop()
  }
}
