package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The catalog API carried by [[SnapshotLake]] manifest commits — snapshot
  * isolation and time travel for catalog writers, no locks, no lease
  * heartbeats, no stale-holder takeover.
  *
  * [[LakeCatalog]] serializes same-partition writers through lease lock
  * files because its partition swap is destructive (the old version is
  * replaced in place). Here every upsert is a [[SnapshotLake.upsert]]
  * optimistic transaction: the merge happens against the exact manifest the
  * writer read, the atomic `CREATE_NEW` of the next manifest version is the
  * compare-and-swap, and a loser re-reads/re-merges/retries — so a crashed
  * writer leaves only unreferenced data directories for [[vacuum]], never a
  * lock another writer must time out on. Readers resolve a manifest once and
  * keep a consistent snapshot for the whole query, even while commits land.
  *
  * The reference gets these guarantees from PostgreSQL MVCC
  * (`support/catalog.py:283-314` upserts in a transaction); on a lakehouse
  * cluster this class maps to Delta/Iceberg `MERGE INTO` with the same
  * optimistic commit protocol. Same PK, partition grain, and merge semantics
  * as [[LakeCatalog]] — the two backends are interchangeable behind
  * [[CatalogStore]] (spec-asserted: identical results batch-for-batch).
  */
class SnapshotCatalog(spark: SparkSession, path: String) extends CatalogStore {

  /** The underlying versioned store (exposed for stats/pruned reads). */
  val lake = new SnapshotLake(spark, path)

  def exists: Boolean = lake.latestVersion.isDefined

  /** MERGE a batch as one snapshot commit; returns the committed version
    * (monotone — each upsert is one manifest version, enabling
    * "as of version N" audits of catalog history).
    */
  def commit(batch: DataFrame): Long =
    lake.upsert(batch, LakeCatalog.PK, "processing_date", LakeCatalog.PartitionCols)

  def upsert(batch: DataFrame): Unit = { commit(batch); () }

  def read(): DataFrame = readAt(None)

  /** Time travel: the catalog as of `version` (default latest). A version is
    * immutable once written, so "which items existed when stage X ran" is
    * answerable forever (until [[vacuum]] drops the version).
    */
  def readAt(version: Option[Long]): DataFrame = {
    val schema = graft.model.Schemas.catalog
    if (!exists)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      lake.read(LakeCatalog.PartitionCols, version)
        .select(schema.fieldNames.map(col): _*)
  }

  def versions: Seq[Long] = lake.versions

  /** Catalog commit audit: (version, op, committed_at, partitions) per
    * live version — "when did stage X's upsert land, touching what".
    */
  def history(): DataFrame = {
    import spark.implicits._
    lake.history.toDF("version", "op", "committed_at", "partitions")
  }

  /** Bound time travel: keep the last `keepLast` versions, reclaim data
    * directories no kept manifest references (see [[SnapshotLake.vacuum]]'s
    * in-flight-writer retention guard).
    */
  def vacuum(keepLast: Int = 1, minAgeMs: Long = 3600000L): Unit =
    lake.vacuum(keepLast, minAgeMs)

  /** Table maintenance: bin-pack each partition's accumulated small upsert
    * files (every upsert rewrites its touched partitions into fresh dirs,
    * so hot partitions fragment over time) into ~`targetBytes` files, as a
    * normal snapshot commit — see [[SnapshotLake.optimize]].
    */
  def optimize(targetBytes: Long = 128L * 1024 * 1024): Long =
    lake.optimize(targetBytes)

  /** Change data feed between two catalog versions ([[SnapshotLake
    * .changes]] with the catalog's PK): which catalog entries a sync
    * consumer must reprocess, computed only over partitions whose manifest
    * entry moved.
    */
  def changes(fromVersion: Long, toVersion: Long): DataFrame =
    lake.changes(fromVersion, toVersion, LakeCatalog.PK, LakeCatalog.PartitionCols)

  /** Catalog-level incremental consumption: unacknowledged entry changes +
    * the version to [[ackConsumer]] once processed — downstream syncs
    * consume catalog updates like a log ([[SnapshotLake.changesForConsumer]]
    * with the catalog's PK).
    */
  def changesForConsumer(id: String): (DataFrame, Long) =
    lake.changesForConsumer(id, LakeCatalog.PK, LakeCatalog.PartitionCols)

  def ackConsumer(id: String, version: Long): Unit = lake.ackConsumer(id, version)

  def consumerOffset(id: String): Option[Long] = lake.consumerOffset(id)
}
