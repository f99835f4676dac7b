package graft.sinks

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Small-file compaction for the partitioned-parquet lake ([[Sinks.writeLake]]).
  *
  * Every incremental append (reference: one ETL run per collection day,
  * `atd_data_lake/etl_app.py` main loop) lands task-count parquet files in
  * each touched `year=/month=/day=/data_source=` leaf; after months of runs a
  * leaf holds hundreds of KB-sized files and the 100 TB scan pays an open()
  * per file instead of streaming MB-sized row groups. Compaction bin-packs
  * each leaf back to `targetBytes`-sized files.
  *
  * Shape: the PLANNER is driver-side but bounded — one stat entry per leaf
  * directory (≈ days × sources, not items); the REWRITE is a Spark job per
  * selected leaf (distributed read → `coalesce(ceil(bytes/target))` → write),
  * and leaves are rewritten independently so a 1000-executor cluster runs
  * many leaf jobs concurrently via its scheduler. Data content is preserved
  * exactly — same rows, same schema, no shuffle (coalesce merges read splits
  * without repartitioning).
  *
  * Commit per leaf mirrors [[graft.catalog.LakeCatalog.upsert]]'s swap: write
  * to a staging dir under `root/_compact` (invisible to partition discovery),
  * then two ATOMIC_MOVEs (old leaf → path-preserving trash, staged → leaf).
  * A crash at any point leaves the lake readable-or-recoverable: [[recover]]
  * (run automatically at the start of each pass) restores a leaf stranded in
  * trash and drops stale staging copies. A reader can still race the brief
  * window between the two moves on a plain filesystem; a lakehouse table
  * format's snapshot commit ([[graft.catalog.SnapshotLake]]) is the airtight
  * version, and this operator maps 1:1 onto its rewrite-files action.
  */
object Compact {

  /** Per-leaf-partition file statistics (the compaction planner's input,
    * also useful as a lake-health report).
    */
  final case class LeafStats(dir: String, files: Int, bytes: Long)

  /** What one compaction pass did. */
  final case class Report(rewritten: Seq[LeafStats], skipped: Seq[LeafStats]) {
    def rewrittenDirs: Set[String] = rewritten.map(_.dir).toSet
  }

  private def isDataFile(p: Path): Boolean = {
    val n = p.getFileName.toString
    n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_")
  }

  /** `Files.list` with the stream CLOSED — the raw stream holds a directory
    * fd open until closed, and a planner walking thousands of leaves would
    * exhaust the process fd limit.
    */
  private def listDir(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try s.iterator().asScala.toSeq
    finally s.close()
  }

  private def dataFiles(leaf: Path): Seq[Path] =
    listDir(leaf).filter(isDataFile)

  /** All leaf directories (directories containing at least one data file)
    * under `root`, found by a bounded recursive walk over partition dirs.
    * `_`/`.`-prefixed directories are skipped — Spark's file index ignores
    * them too, which is what makes `_compact` a safe staging area.
    */
  def leaves(root: String): Seq[Path] = {
    def walk(dir: Path): Seq[Path] = {
      val children = listDir(dir)
      val subdirs = children.filter { p =>
        val n = p.getFileName.toString
        Files.isDirectory(p) && !n.startsWith("_") && !n.startsWith(".")
      }
      val here = if (children.exists(isDataFile)) Seq(dir) else Seq.empty
      here ++ subdirs.flatMap(walk)
    }
    val r = Paths.get(root)
    if (Files.isDirectory(r)) walk(r) else Seq.empty
  }

  def leafStats(root: String): Seq[LeafStats] =
    leaves(root).map { leaf =>
      val fs = dataFiles(leaf)
      LeafStats(leaf.toString, fs.size, fs.map(Files.size).sum)
    }.sortBy(_.dir)

  /** Compact every leaf whose data files are both numerous (> `minFiles`)
    * and small on average (< `targetBytes / 2`) — a leaf of already
    * target-sized files is left byte-identical. Returns what was rewritten.
    *
    * @param targetBytes output file size to pack toward (cluster-realistic
    *                    values are 128–1024 MB; tests use small ones)
    */
  /** @param sortBy re-sort rows within each packed file during the rewrite —
    *   merging a z-ordered or linearly-sorted leaf with `coalesce` alone
    *   interleaves its runs and destroys row-group min/max locality, so a
    *   clustered lake should compact with its cluster key here (the rewrite
    *   was already paying the I/O; the in-file sort is the cheap part)
    */
  def compact(
      spark: SparkSession,
      root: String,
      targetBytes: Long,
      minFiles: Int = 2,
      sortBy: Seq[String] = Nil): Report = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    recover(root)
    // staging and trash live under root/_compact: the underscore prefix is
    // invisible to Spark's partition discovery AND to leaves(), so a crash
    // mid-rewrite never surfaces duplicate rows or mangled partition values
    // to readers — recover() reconciles leftovers on the next run
    val work = Paths.get(root, "_compact")
    Files.createDirectories(work)
    val (todo, keep) = leafStats(root).partition { s =>
      s.files > minFiles && s.bytes / s.files < targetBytes / 2
    }
    todo.foreach { s =>
      val leaf = Paths.get(s.dir)
      val rel = Paths.get(root).relativize(leaf)
      val nOut = math.max(1, math.ceil(s.bytes.toDouble / targetBytes).toInt)
      val staged = work.resolve(s"staging-${java.util.UUID.randomUUID()}")
      val trash = work.resolve(s"old-${java.util.UUID.randomUUID()}")
      val packed = spark.read.parquet(s.dir).coalesce(nOut)
      (if (sortBy.nonEmpty) packed.sortWithinPartitions(sortBy.map(org.apache.spark.sql.functions.col): _*)
       else packed)
        .write.mode("overwrite").parquet(staged.toString)
      // carry only data files into the final leaf (no _SUCCESS markers)
      listDir(staged).filterNot(isDataFile).foreach(Files.deleteIfExists(_))
      // trash preserves the leaf's relative path so recover() can restore
      // it if the swap is interrupted between the two moves
      Files.createDirectories(trash.resolve(rel).getParent)
      Files.move(leaf, trash.resolve(rel), StandardCopyOption.ATOMIC_MOVE)
      Files.move(staged, leaf, StandardCopyOption.ATOMIC_MOVE)
      deleteRecursively(trash)
    }
    Report(todo, keep)
  }

  /** Reconcile an interrupted previous run: a trashed leaf whose original
    * path is missing moves back (the crash hit between the two swap moves);
    * everything else under `_compact` is a stale copy and is dropped.
    */
  def recover(root: String): Unit = {
    val work = Paths.get(root, "_compact")
    if (!Files.isDirectory(work)) return
    listDir(work).filter(_.getFileName.toString.startsWith("old-")).foreach { trash =>
      // find the trashed leaf dir(s): deepest dirs containing data files
      def walk(d: Path): Seq[Path] = {
        val children = listDir(d)
        val here = if (children.exists(isDataFile)) Seq(d) else Seq.empty
        here ++ children.filter(Files.isDirectory(_)).flatMap(walk)
      }
      walk(trash).foreach { trashedLeaf =>
        val rel = trash.relativize(trashedLeaf)
        val original = Paths.get(root).resolve(rel)
        if (!Files.exists(original)) {
          Files.createDirectories(original.getParent)
          Files.move(trashedLeaf, original, StandardCopyOption.ATOMIC_MOVE)
        }
      }
      deleteRecursively(trash)
    }
    listDir(work).filter(_.getFileName.toString.startsWith("staging-"))
      .foreach(deleteRecursively)
  }

  private def deleteRecursively(dir: Path): Unit =
    if (Files.exists(dir)) {
      val s = Files.walk(dir)
      try s.sorted(java.util.Comparator.reverseOrder()).forEach(p => Files.delete(p))
      finally s.close()
    }
}
