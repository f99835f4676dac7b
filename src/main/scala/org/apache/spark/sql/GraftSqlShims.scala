package org.apache.spark.sql

/** The one `private[sql]` seam a V1 streaming `Source` cannot avoid: the
  * micro-batch engine asserts that `Source.getBatch` returns a DataFrame
  * whose logical plan carries `isStreaming = true`, and the only public
  * constructor for such a frame is `internalCreateDataFrame` — package-
  * private to `org.apache.spark.sql`. Every out-of-tree V1 source (Bahir
  * MQTT, spark-redis, pre-DSv2 Kafka) ships exactly this shim; it holds
  * no logic beyond the call.
  */
object GraftSqlShims {

  /** Re-wrap a fully-planned batch DataFrame as a streaming one: the rows
    * are the batch plan's execution, the flag satisfies the micro-batch
    * engine's `isStreaming` assertion.
    */
  def asStreamingDataFrame(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse, for a V1 `Sink.addBatch`: pin the micro-batch's
    * incremental execution as a plain batch DataFrame (the ForeachBatchSink
    * re-wrap), so a sink may run ordinary multi-pass batch logic over it.
    */
  def asBatchDataFrame(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
