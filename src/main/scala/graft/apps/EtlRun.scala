package graft.apps

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.CatalogStore
import graft.incr.IncrementalDiff
import graft.model.Schemas

/** The reference's compare-loop lifecycle (`support/etl_app.py:222-285` +
  * `support/last_update.py`) as one library call: list candidate items,
  * subtract what the catalog already has (J1), hand only the novel items to
  * the stage's `process` function, then record them — giving every stage
  * exactly-once-per-item semantics and making reruns no-ops (the
  * reference's idempotency ritual, `docs/appendix_testing.md:76-87`).
  */
object EtlRun {

  /** @param sourceItems candidate items: `id_base`, `id_ext`,
    *                    `collection_date` (+ any payload columns, e.g. path)
    * @param process     receives the to-do items; runs the stage's real work
    * @return number of items processed this run
    */
  def run(
      spark: SparkSession,
      sourceItems: DataFrame,
      catalog: CatalogStore,
      repository: String,
      dataSource: String,
      pointer: Column = lit(null).cast("string"),
      force: Boolean = false,
      sameDayCancel: Boolean = true,
      today: Column = current_date())(process: DataFrame => Unit): Long = {

    val target =
      if (catalog.exists)
        catalog.read()
          .filter(col("repository") === repository && col("data_source") === dataSource)
          .select("id_base", "id_ext", "collection_date", "collection_end")
      else
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Schemas.catalog.filter(f =>
            Seq("id_base", "id_ext", "collection_date", "collection_end").contains(f.name))))

    val src = sourceItems.withColumn("collection_end", lit(null).cast("timestamp"))
    val todo = IncrementalDiff
      .diff(src, target, Seq("id_base", "id_ext"), "collection_date",
        Some("collection_end"), force = force, sameDayCancel = sameDayCancel, today = today)
      .cache()
    val n = todo.count()
    if (n > 0) {
      process(todo)
      val entries = todo.select(
        lit(repository).as("repository"),
        lit(dataSource).as("data_source"),
        col("id_base").cast("string").as("id_base"),
        col("id_ext").cast("string").as("id_ext"),
        pointer.as("pointer"),
        col("collection_date").cast("timestamp").as("collection_date"),
        col("collection_end").cast("timestamp").as("collection_end"),
        current_timestamp().as("processing_date"),
        lit(null).cast("string").as("metadata"))
      catalog.upsert(entries)
    }
    todo.unpersist()
    n
  }
}
