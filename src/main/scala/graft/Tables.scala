package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table loader for the driver's synthetic parquet tables.
  *
  * `events.ts` has been written two ways across testdata generations:
  * TIMESTAMP(NANOS) (which Spark's vectorized reader rejects — read via the
  * `nanosAsLong` escape hatch and floored to microseconds with exact integer
  * division; `div`, not `/`, because a double-precision divide of an ~1.7e18
  * nanosecond epoch would wobble at the microsecond boundary) and plain
  * TIMESTAMP(MICROS) without UTC adjustment (which reads natively as
  * TIMESTAMP_NTZ). Both normalize to the session-UTC TimestampType the rest
  * of the engine expects; the branch keys off the READ schema, not a config.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Exception => () } // static conf in some environments
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => // nanos-as-long layout
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ => // native timestamp layout; NTZ aligns with the UTC session
          raw.withColumn("ts", col("ts").cast("timestamp"))
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
