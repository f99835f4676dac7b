package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.current_date
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.apps.EtlRun
import graft.catalog.CatalogStore

/** Streaming variant of the EtlRun catalog gate (SURVEY §2.9; the batch
  * form is `graft.apps.EtlRun`): candidate items arrive as files, each
  * micro-batch runs the same catalog anti-join diff, and novel items are
  * processed and recorded.
  *
  * Exactly-once across restarts holds at TWO layers, deliberately
  * redundant:
  *   1. the file-source checkpoint prevents re-reading files a completed
  *      batch consumed (a restart resumes from the offset log);
  *   2. the catalog gate (IncrementalDiff + latest-wins upsert on the PK)
  *      makes any replayed or duplicated item a no-op — so even losing the
  *      checkpoint entirely, or a crash between a batch's `process` and its
  *      offset commit, cannot double-process an item.
  *
  * Layer 2 is what the reference's compare loop provides
  * (`support/last_update.py`, `docs/appendix_testing.md:76-87`); layer 1 is
  * what Structured Streaming adds on top.
  */
object StreamingEtlRun {

  /** Drain all currently-available item files through the catalog gate
    * (Trigger.AvailableNow), then return. Call again after new files arrive
    * — or on restart after a crash — with the same `checkpoint`.
    */
  def run(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      catalog: CatalogStore,
      repository: String,
      dataSource: String,
      checkpoint: String,
      sameDayCancel: Boolean = true,
      today: Column = current_date())(process: DataFrame => Unit): Unit = {
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        EtlRun.run(spark, batch, catalog, repository, dataSource,
          sameDayCancel = sameDayCancel, today = today)(process)
        ()
      }
      .start()
    q.awaitTermination()
  }
}
