package graft.catalog

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

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
  * Storage: parquet partitioned by `(repository, data_source)` — the two
  * columns every catalog access filters on (`support/catalog.py:212-236`
  * always binds repository + data_source). An upsert merges and rewrites
  * ONLY the partitions present in the batch; all other partitions' files are
  * untouched (byte-identical across unrelated upserts). This is the Delta
  * `MERGE INTO`-with-partition-pruning shape: on a Delta/Iceberg cluster
  * `upsert` becomes a transactional MERGE behind the same API, and `query`
  * gets data skipping on top of the partition pruning it already has here.
  *
  * Concurrency: partition swaps are atomic per (repository, data_source), so
  * concurrent stages touching DIFFERENT sources run fully in parallel — the
  * common case, since each ETL stage owns one (repository, data_source)
  * cell. Writers to the SAME partition serialize through a per-partition
  * lock file (atomic create; see `withPartitionLocks`), so no batch is ever
  * lost to a read-merge-swap race. The reference gets the same guarantee
  * from PostgreSQL; on an object store a lakehouse table format's
  * optimistic commit replaces the lock.
  */
object LakeCatalog {

  val PK: Seq[String] = Seq("repository", "data_source", "id_base", "id_ext", "collection_date")

  /** The physical partition columns — a prefix of the PK. */
  val PartitionCols: Seq[String] = Seq("repository", "data_source")

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

/** A parquet-backed catalog instance rooted at `path`.
  *
  * @param lockLeaseMs partition-lock lease: a holder heartbeats its lock's
  *   mtime while writing; a lock not refreshed for this long is presumed
  *   abandoned (crashed holder) and taken over. Must comfortably exceed the
  *   heartbeat interval (lease/4) plus worst-case GC/FS stall.
  */
class LakeCatalog(spark: SparkSession, path: String, lockLeaseMs: Long = 30000L)
    extends CatalogStore {

  private def tablePath: Path = Paths.get(path, "current")

  private def listDir(dir: Path, prefix: String): Seq[Path] = {
    val s = Files.list(dir)
    try s.iterator().asScala.filter(_.getFileName.toString.startsWith(prefix)).toList
    finally s.close()
  }

  private def deleteRecursively(dir: Path): Unit = {
    val s = Files.walk(dir)
    try s.sorted(java.util.Comparator.reverseOrder()).forEach(p => Files.delete(p))
    finally s.close()
  }

  def exists: Boolean =
    Files.exists(tablePath) && listDir(tablePath, "").nonEmpty

  /** Read the whole catalog. Filters on `repository`/`data_source` prune to
    * partition directories; the stable column order is the declared schema's
    * (partition discovery would otherwise append partition columns last).
    */
  def read(): DataFrame =
    spark.read
      .option("basePath", tablePath.toString)
      .schema(graft.model.Schemas.catalog)
      .parquet(tablePath.toString)
      .select(graft.model.Schemas.catalog.fieldNames.map(col): _*)

  /** Serialize read-merge-swap per touched partition set: without this, two
    * concurrent upserts into the SAME partition both merge against the old
    * state and the later swap silently drops the earlier batch. Lock
    * acquisition is an atomic file create (works on any filesystem with
    * atomic create — local, NFS; on object stores a lakehouse table format's
    * optimistic commit replaces this). Locks order by name to stay
    * deadlock-free across multi-partition batches.
    *
    * Liveness (the reference gets this from PostgreSQL's session locks,
    * `support/catalog_postgrest.py:73-84`): each lock is a LEASE, not a
    * tombstone. The holder writes a unique token into the lock file and a
    * daemon heartbeat refreshes the file's mtime every `lockLeaseMs / 4`;
    * a contender finding a lock whose mtime is older than `lockLeaseMs`
    * presumes the holder crashed and claims the stale lock with an
    * `ATOMIC_MOVE` to a unique name — renames are atomic, so exactly one
    * contender wins the takeover and the rest loop back to the create race.
    * Fencing: takeover alone can't stop a stalled-but-ALIVE holder from
    * finishing its in-flight upsert and silently overwriting the new
    * holder's merge, so `body` receives a `fence` callback that throws
    * unless every lock still carries this holder's token — the upsert calls
    * it immediately before the partition swap, shrinking the lost-update
    * window from the whole merge duration to the few renames after the
    * check (a filesystem has no transactional compare-and-swap; a lakehouse
    * format's optimistic commit is the airtight version of this fence).
    *
    * Release is a token-guarded ATOMIC_MOVE-then-delete: the lock is first
    * renamed to a private name (atomic, so it cannot race a takeover), its
    * token re-checked, and only then deleted. A plain check-then-delete
    * could delete a SUCCESSOR's lock: between the check and the delete a
    * contender may take over the stale name and a third writer re-create
    * it. If the private rename turns out to have displaced a successor's
    * lock, it is moved back (best effort — if that fails the successor's
    * own fence aborts its commit rather than losing an update).
    */
  private def withPartitionLocks[A](touched: Seq[(String, String)])(body: (() => Unit) => A): A = {
    val locksDir = Paths.get(path, "locks")
    Files.createDirectories(locksDir)
    // partition values are path-encoded in the lock name (a value containing
    // a separator must not escape the locks directory)
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val locks = touched.map { case (r, d) => locksDir.resolve(s"${enc(r)}__${enc(d)}.lock") }
      .sortBy(_.toString)
    val token = java.util.UUID.randomUUID().toString.getBytes("UTF-8")
    def holds(l: Path): Boolean =
      try java.util.Arrays.equals(Files.readAllBytes(l), token)
      catch { case _: java.io.IOException => false }
    // already-acquired locks heartbeat while later ones are still being
    // awaited, so lock 1 can't expire during a contended wait on lock 2
    val acquired = new java.util.concurrent.CopyOnWriteArrayList[Path]()
    @volatile var beating = true
    val heartbeat = new Thread(() => {
      while (beating) {
        acquired.forEach { l =>
          if (holds(l)) {
            try Files.setLastModifiedTime(
              l, java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
            catch { case _: java.io.IOException => () }
          }
        }
        try Thread.sleep(math.max(lockLeaseMs / 4, 10))
        catch { case _: InterruptedException => () }
      }
    }, s"graft-catalog-lock-heartbeat")
    heartbeat.setDaemon(true)
    heartbeat.start()
    try {
      locks.foreach { l =>
        val deadline = System.nanoTime() + 120L * 1000000000L
        var held = false
        while (!held) {
          try {
            Files.createFile(l) // the atomic claim
            Files.write(l, token) // advisory identity for heartbeat/release
            held = true
          } catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              val stale =
                try System.currentTimeMillis() - Files.getLastModifiedTime(l).toMillis > lockLeaseMs
                catch { case _: java.io.IOException => false } // vanished: retry create
              if (stale) {
                // takeover: exactly one contender's move succeeds
                val claimed = locksDir.resolve(
                  s"${l.getFileName}.stale-${java.util.UUID.randomUUID()}")
                try {
                  Files.move(l, claimed, StandardCopyOption.ATOMIC_MOVE)
                  Files.deleteIfExists(claimed)
                } catch { case _: java.io.IOException => () } // lost the race
              } else if (System.nanoTime() > deadline) {
                throw new IllegalStateException(s"timed out acquiring catalog lock $l")
              } else Thread.sleep(50)
          }
        }
        acquired.add(l)
      }
      val fence = () => acquired.forEach { l =>
        if (!holds(l))
          throw new java.util.ConcurrentModificationException(
            s"catalog lock $l was taken over (holder presumed dead after " +
              s"${lockLeaseMs} ms stall); aborting commit to avoid a lost update")
      }
      body(fence)
    } finally {
      beating = false
      heartbeat.interrupt()
      acquired.forEach { l =>
        if (holds(l)) {
          val mine = l.resolveSibling(s"${l.getFileName}.release-${java.util.UUID.randomUUID()}")
          try {
            Files.move(l, mine, StandardCopyOption.ATOMIC_MOVE)
            if (java.util.Arrays.equals(Files.readAllBytes(mine), token)) Files.delete(mine)
            else {
              // the rename displaced a successor's lock (takeover + re-create
              // landed between holds() and move): put it back. Retry briefly —
              // deleting outright forces the successor to abort at its
              // commit-time fence a whole merge that could have succeeded,
              // while leaving the private rename in place is strictly worse
              // than either (the partition looks unlocked but isn't released)
              var restored = false
              var attempt = 0
              while (!restored && attempt < 5) {
                try { Files.move(mine, l, StandardCopyOption.ATOMIC_MOVE); restored = true }
                catch {
                  case _: java.io.IOException =>
                    attempt += 1
                    // preserve the caller's interrupt: this runs in its
                    // finally block during task cancellation, and eating
                    // the flag would both spin the backoff and un-cancel it
                    try Thread.sleep(20)
                    catch { case _: InterruptedException => Thread.currentThread().interrupt() }
                }
              }
              if (!restored) Files.deleteIfExists(mine)
            }
          } catch { case _: java.io.IOException => () } // already gone
        }
      }
    }
  }

  /** Upsert a batch: latest `processing_date` wins per PK. Rewrites only the
    * `(repository, data_source)` partitions present in the batch; concurrent
    * upserts serialize per partition (see [[withPartitionLocks]]), so
    * same-partition writers cannot lose updates and different-partition
    * writers proceed in parallel.
    */
  def upsert(batch: DataFrame): Unit = {
    // the touched-partition set is tiny by construction: one entry per
    // (layer × sensor source), not per item
    val touched = batch.select(LakeCatalog.PartitionCols.map(col): _*)
      .distinct().collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSeq
    withPartitionLocks(touched) { fence =>
      val merged =
        if (!exists) LakeCatalog.merge(batch, LakeCatalog.PK, "processing_date")
        else {
          val touchedPred = touched
            .map { case (r, d) => col("repository") === r && col("data_source") === d }
            .reduce(_ || _)
          LakeCatalog.merge(
            // partition-pruned scan: only touched partitions are read
            read().filter(touchedPred).unionByName(batch, allowMissingColumns = true),
            LakeCatalog.PK,
            "processing_date")
        }
      val tmp = Paths.get(path, s"staging-${java.util.UUID.randomUUID()}")
      merged.write.mode("overwrite")
        .partitionBy(LakeCatalog.PartitionCols: _*)
        .parquet(tmp.toString)
      // swap each staged partition directory into `current/`; parquet readers
      // resolve directories at query time, so each partition flips only after
      // its new version is fully written
      // commit fence: abort if any lock was taken over while merging (a
      // stalled holder must not swap over a successor's committed state)
      fence()
      Files.createDirectories(tablePath)
      val trash = Paths.get(path, s"old-${java.util.UUID.randomUUID()}")
      Files.createDirectories(trash)
      listDir(tmp, "repository=").foreach { repoDir =>
        listDir(repoDir, "data_source=").foreach { leaf =>
          val destRepo = tablePath.resolve(repoDir.getFileName.toString)
          Files.createDirectories(destRepo)
          val dest = destRepo.resolve(leaf.getFileName.toString)
          if (Files.exists(dest))
            Files.move(
              dest,
              trash.resolve(s"${repoDir.getFileName}__${leaf.getFileName}"),
              StandardCopyOption.ATOMIC_MOVE)
          Files.move(leaf, dest, StandardCopyOption.ATOMIC_MOVE)
        }
      }
      Seq(trash, tmp).foreach(deleteRecursively)
      writeAudit("upsert", touched.size)
    }
  }

  private def auditDir: Path = Paths.get(path, "audit")

  /** Best-effort audit sidecar — one uniquely-named file per committed
    * write, timestamp-prefixed so lexicographic order IS commit order
    * (same contract as [[SnapshotLake]]'s `.info` files: an IO failure
    * here must not fail the committed write it describes).
    */
  private def writeAudit(op: String, partitions: Int): Unit =
    try {
      Files.createDirectories(auditDir)
      val at = System.currentTimeMillis()
      Files.write(
        auditDir.resolve(f"$at%013d-${java.util.UUID.randomUUID()}.json"),
        s"""{"op":"$op","committed_at":$at,"partitions":$partitions}""".getBytes("UTF-8"))
    } catch { case _: java.io.IOException => () }

  /** Commit audit trail over the audit sidecars; versions are ordinals in
    * commit-time order (this backend has no manifest versions). Catalogs
    * written before auditing existed have an empty history — their commits
    * left no sidecars to report — and a commit whose best-effort sidecar
    * write failed is likewise absent (see the [[CatalogStore.history]]
    * contract: only the snapshot backend can surface such commits as
    * "unknown", because its manifest numbers are the authoritative record).
    */
  def history(): DataFrame = {
    import spark.implicits._
    val rows: Seq[(Long, String, Long, Int)] =
      if (!Files.isDirectory(auditDir)) Seq.empty
      else listDir(auditDir, "").sortBy(_.getFileName.toString).zipWithIndex.map {
        case (p, i) =>
          val parsed =
            try {
              val s = new String(Files.readAllBytes(p), "UTF-8")
              def field(k: String) = s.split(s""""$k":""", 2) match {
                case Array(_, rest) => Some(rest.takeWhile(c => c != ',' && c != '}').trim)
                case _ => None
              }
              for {
                op <- field("op").map(_.stripPrefix("\"").stripSuffix("\""))
                at <- field("committed_at").map(_.toLong)
                np <- field("partitions").map(_.toInt)
              } yield (i + 1L, op, at, np)
            } catch { case _: Exception => None }
          parsed.getOrElse((i + 1L, "unknown", 0L, 0))
      }
    rows.toDF("version", "op", "committed_at", "partitions")
  }

  // `query` (filtered catalog listing) comes from [[CatalogStore]].
}
