package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max statistics and scan pruning — the data-skipping layer
  * a lakehouse table format (Delta/Iceberg file stats, parquet footer
  * min/max) provides, re-expressed over the plain partitioned-parquet lake.
  *
  * Reference analog: the catalog's date-range listing
  * (`atd_data_lake/support/catalog.py:212-236`) prunes *days* before any
  * file is opened; this generalizes the idea to arbitrary numeric columns at
  * FILE granularity, so a 100 TB scan with a selective range predicate opens
  * only the files whose [min, max] can contain matches.
  *
  * The stats build is one distributed scan (`input_file_name` groupBy —
  * build once, persist, query many); at query time pruning touches only the
  * stats table (one row per file, driver-bounded the same way the catalog's
  * partition list is). Pruning is CONSERVATIVE: a file is dropped only when
  * its [min, max] cannot intersect the predicate, and [[readPruned]]
  * re-applies the exact predicate after the pruned scan — so results are
  * always exactly equal to the full-scan filter, stats merely cut I/O.
  * Columns with all-null files stay un-prunable for those files (null
  * min/max keeps the file).
  */
object DataSkipping {

  /** One distributed pass over the lake: per-file row count and min/max for
    * each of `cols` (numeric or string). Output: `file`, `cnt`,
    * `min_<c>` / `max_<c>` per column — one row per data file.
    */
  def scanStats(spark: SparkSession, root: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one stats column")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(root)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("cnt"), aggs: _*)
  }

  /** Persist / reload the stats table (the build-once half of
    * build-once/query-many).
    */
  def save(stats: DataFrame, path: String): Unit =
    stats.write.mode("overwrite").parquet(path)
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Files whose `[min_c, max_c]` intersects `[lo, hi]` — the candidate set
    * for a `c BETWEEN lo AND hi` scan. Null stats (all-null file for `c`)
    * keep the file: pruning must never be optimistic.
    */
  def pruneFiles(stats: DataFrame, c: String, lo: Double, hi: Double): Seq[String] =
    stats.filter(
        col(s"min_$c").isNull || col(s"max_$c").isNull ||
        (col(s"min_$c") <= hi && col(s"max_$c") >= lo))
      .select("file").collect().map(_.getString(0)).toSeq

  /** Range scan through the stats index: read only candidate files, then
    * re-apply the exact predicate — result is identical to
    * `spark.read.parquet(root).filter(c between lo and hi)`, I/O is not.
    */
  def readPruned(
      spark: SparkSession,
      root: String,
      stats: DataFrame,
      c: String,
      lo: Double,
      hi: Double): DataFrame = {
    val files = pruneFiles(stats, c, lo, hi)
    val base =
      if (files.isEmpty)
        // all files pruned: empty result with the lake's schema
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          spark.read.parquet(root).schema)
      else
        // basePath keeps partition-directory columns on per-file reads
        spark.read.option("basePath", root).parquet(files: _*)
    base.filter(col(c) >= lo && col(c) <= hi)
  }
}
