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
    // headline queries: the scale-relevant operators (flagship agg, keyed
    // joins, incremental diff, as-of, windows, dedup, ANN, text metrics)
    val headline = Seq(
      "q_a1_traffic15", "q_j1_incr_diff", "q_j2_fact_dim", "q_j3_double_dim",
      "q_j5_left", "q_j7_asof_fwd", "q_a5_7day_avg", "q_a6_latest_per_user",
      "q_w1_first_seen", "q_dd_exact", "q_dd_lsh_pairs", "q_dd_simhash",
      "q_ann_brute", "q_tx_quality", "q_tx_fingerprint", "q_sc_recordid")
    // Run each query twice AT THE MEASURED SF and report run 2: a long-lived
    // cluster pays JIT + janino codegen + parquet footer reads once, not per
    // query, and AQE picks different physical plans per SF — so warming at a
    // smaller SF would compile the wrong code and run 1 would grade the JVM,
    // not the engine.
    def attempt(name: String): Boolean =
      try { SparkEntry.queries(name)(spark, sfDir).count(); true }
      catch {
        case e: Throwable =>
          System.err.println(s"bench: $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
          false
      }
    val results = headline.map { name =>
      val warmOk = attempt(name)
      val t0 = System.nanoTime()
      val ok = warmOk && attempt(name)
      name -> (if (ok) Some((System.nanoTime() - t0) / 1e9) else None)
    }
    val failed = results.collect { case (n, None) => n }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v.fold("null")(_.toString) }
      .mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
