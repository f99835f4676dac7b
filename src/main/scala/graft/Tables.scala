package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table loader for the driver's synthetic parquet tables.
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's vectorized
  * reader rejects outright; it is read via the `nanosAsLong` escape hatch and
  * floored to microseconds with exact integer division (`div`, not `/` — a
  * double-precision divide of an ~1.7e18 nanosecond epoch would wobble at the
  * microsecond boundary).
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Exception => () } // static conf in some environments
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
