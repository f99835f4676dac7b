package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The catalog contract the ETL loop programs against ([[graft.apps.EtlRun]],
  * [[graft.streaming.StreamingEtlRun]]): which (repository × data_source ×
  * id_base × id_ext × collection_date) items exist, upserted latest-wins on
  * that natural PK. Re-expresses the reference's catalog client surface
  * (`support/catalog.py:212-314` — query + upsert are the only operations any
  * stage uses) so storage backends swap freely:
  *
  *   - [[LakeCatalog]]: partitioned parquet with per-partition lease locks —
  *     the reference-compatible copy-on-write backend.
  *   - [[SnapshotCatalog]]: the same API carried by [[SnapshotLake]] manifest
  *     commits — optimistic, lock-free, with snapshot isolation and time
  *     travel.
  */
trait CatalogStore {

  /** True once at least one batch has been committed. */
  def exists: Boolean

  /** The full current catalog in [[graft.model.Schemas.catalog]] column
    * order. Filters on `repository`/`data_source` prune to partitions in
    * both backends.
    */
  def read(): DataFrame

  /** MERGE a batch: latest `processing_date` wins per PK ([[LakeCatalog.PK]]).
    * Concurrent same-partition writers must not lose updates (each backend
    * documents its mechanism).
    */
  def upsert(batch: DataFrame): Unit

  /** Commit audit trail — "who wrote what when": one row per audited
    * write, (version: long, op: string, committed_at: epoch-millis long,
    * partitions: int), version monotone in commit order. Ops: "upsert"
    * (PK-grain merge), "commit" (partition-grain replace), "delete".
    * Audit IO must never fail a committed write, so the trail is
    * best-effort by contract, and the backends degrade differently when a
    * sidecar is lost (crash or IO failure between commit point and audit
    * write): [[SnapshotCatalog]]'s versions are the authoritative manifest
    * numbers, so the affected commit still appears, as op "unknown";
    * [[LakeCatalog]] has no record besides the sidecar, so that commit is
    * absent from history and later ordinal versions shift — its versions
    * identify rows within one stable history, not across sidecar loss.
    */
  def history(): DataFrame

  /** Filtered catalog listing (reference `support/catalog.py:212-236` —
    * repository/data_source/base/ext + date-range query, ordered). The
    * repository/data_source filters prune partitions; the rest push down to
    * the parquet scan; no pagination needed.
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
