package graft

import org.apache.spark.sql.SparkSession

/** Smoke runner: exercises SparkEntry.entry the way the driver does
  * (rows > 0 on sf0.001) and prints the plan + row count.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val df = SparkEntry.entry(spark)
    df.explain("formatted")
    val n = df.count()
    println(s"[smoke] entry rows = $n")
    assert(n > 0, "entry must return rows")
    spark.stop()
  }
}
