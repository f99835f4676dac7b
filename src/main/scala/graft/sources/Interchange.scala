package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Columnar/text interchange formats beyond parquet: ORC and JSON-lines.
  *
  * Reference analog: the lake's payloads arrive and leave as CSV, JSON
  * documents, and zip archives (`atd_data_lake/support/storage.py`,
  * `publish.py`) — parquet is the internal form, interchange formats are the
  * edges. Here the edges are kept columnar where possible:
  *
  *   - ORC is the "other warehouse" columnar format — same predicate
  *     pushdown/column pruning story as parquet (min/max stripe stats), so a
  *     100 TB ORC lake scans with the same selectivity. Spark's native
  *     vectorized ORC reader handles it with zero extra dependencies.
  *   - JSON-lines is the ingest/export format of practically every corpus
  *     pipeline. It is SCHEMALESS on disk, so reads take an explicit schema:
  *     types are restored deterministically AND the schema-inference
  *     pre-scan (a full extra pass over 100 TB) never runs.
  */
object Interchange {

  def writeOrc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Explicit-schema JSONL read: no inference scan, stable types. Fields
    * missing in a line surface as nulls; extra fields are ignored —
    * corpus-ingest semantics where ragged records are data, not errors.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
