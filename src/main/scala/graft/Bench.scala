package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Functions.register(spark)
    // JVM/codegen warmup on the smallest SF (uncounted): a long-lived
    // cluster pays JIT + janino compilation once, not per query — measuring
    // them inside every query would grade JVM startup, not the engine
    // headline queries: the scale-relevant operators (flagship agg, keyed
    // joins, incremental diff, as-of, windows, dedup, ANN, text metrics)
    val headline = Seq(
      "q_a1_traffic15", "q_j1_incr_diff", "q_j2_fact_dim", "q_j3_double_dim",
      "q_j5_left", "q_j7_asof_fwd", "q_a5_7day_avg", "q_a6_latest_per_user",
      "q_w1_first_seen", "q_dd_exact", "q_dd_lsh_pairs", "q_dd_simhash",
      "q_ann_brute", "q_tx_quality", "q_tx_fingerprint", "q_sc_recordid")
    headline.foreach { name =>
      try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
