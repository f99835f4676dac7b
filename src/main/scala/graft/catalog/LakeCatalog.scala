package graft.catalog

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The data-lake catalog: which (repository × data_source × id_base × id_ext
  * × collection_date) items exist, with pointers and metadata. Re-expresses
  * the reference's PostgreSQL/PostgREST catalog
  * (`docs/tech_architecture.md:119-161`, DDL `docs/appendix_catalog.md:77-99`,
  * client `support/catalog.py`) as a Spark-managed columnar table with
  * latest-wins MERGE semantics on the natural PK
  * (`support/catalog.py:283-314` upserts on the same key).
  *
  * Storage: a parquet directory swapped atomically on each upsert
  * (copy-on-write). On a Delta/Iceberg-enabled cluster `upsert` becomes a
  * single `MERGE INTO` and `query` gets data skipping; the API is the stable
  * part. The compare/diff workload reads the catalog through [[query]]'s
  * pushed-down filters, so at 100 TB the catalog scan prunes on
  * `repository`/`data_source` partition columns.
  */
object LakeCatalog {

  val PK: Seq[String] = Seq("repository", "data_source", "id_base", "id_ext", "collection_date")

  /** Latest-wins dedup on `pk`, ordered by `versionCol` descending — the
    * relational core of a MERGE upsert. Callers guarantee (pk, version)
    * uniqueness; ties would be non-deterministic.
    */
  def merge(allBatches: DataFrame, pk: Seq[String], versionCol: String): DataFrame = {
    val w = Window.partitionBy(pk.map(col): _*).orderBy(col(versionCol).desc)
    allBatches
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}

/** A parquet-backed catalog instance rooted at `path`. */
class LakeCatalog(spark: SparkSession, path: String) {

  private def tablePath: Path = Paths.get(path, "current")

  def exists: Boolean = Files.exists(tablePath)

  def read(): DataFrame = spark.read.parquet(tablePath.toString)

  /** Upsert a batch: latest `processing_date` wins per PK. */
  def upsert(batch: DataFrame): Unit = {
    val merged =
      if (!exists) LakeCatalog.merge(batch, LakeCatalog.PK, "processing_date")
      else
        LakeCatalog.merge(
          read().unionByName(batch, allowMissingColumns = true),
          LakeCatalog.PK,
          "processing_date")
    val tmp = Paths.get(path, s"staging-${java.util.UUID.randomUUID()}")
    merged.write.mode("overwrite").parquet(tmp.toString)
    // swap: parquet readers resolve the directory at query time, so replace
    // `current` only after the new version is fully written
    val old = Paths.get(path, s"old-${java.util.UUID.randomUUID()}")
    if (exists) Files.move(tablePath, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, tablePath, StandardCopyOption.ATOMIC_MOVE)
    if (Files.exists(old)) {
      Files.walk(old).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
  }

  /** Filtered catalog listing (reference `support/catalog.py:212-236` —
    * repository/data_source/base/ext + date-range query, ordered). Filters
    * push down to the parquet scan; no pagination needed.
    */
  def query(
      repository: String,
      dataSource: Option[String] = None,
      base: Option[String] = None,
      extLike: Option[String] = None,
      dateFrom: Option[java.sql.Timestamp] = None,
      dateTo: Option[java.sql.Timestamp] = None,
      latestFirst: Boolean = false): DataFrame = {
    var df = read().filter(col("repository") === repository)
    dataSource.foreach(ds => df = df.filter(col("data_source") === ds))
    base.foreach(b => df = df.filter(col("id_base") === b))
    extLike.foreach(p => df = df.filter(col("id_ext").like(p)))
    dateFrom.foreach(d => df = df.filter(col("collection_date") >= lit(d)))
    dateTo.foreach(d => df = df.filter(col("collection_date") < lit(d)))
    val ord =
      if (latestFirst) Seq(col("collection_date").desc, col("id_base"), col("id_ext"))
      else Seq(col("collection_date"), col("id_base"), col("id_ext"))
    df.orderBy(ord: _*)
  }
}
