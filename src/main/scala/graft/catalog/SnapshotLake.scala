package graft.catalog

import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Versioned partitioned store with ATOMIC manifest commits — the lakehouse
  * table-format core (Delta/Iceberg-style snapshot isolation) built from
  * primitives the plain filesystem guarantees, complementing
  * [[LakeCatalog]]'s reference-compatible lease-locked upsert:
  *
  *   - Data files are IMMUTABLE: each commit writes its partitions into
  *     fresh uniquely-named directories and never touches existing ones.
  *   - A commit is ONE atomic file create of `manifests/v<N>.json`, mapping
  *     every live partition to its data directory. Readers resolve a
  *     manifest first, then read exactly its directories — they can never
  *     observe a half-commit, and a long query keeps seeing its snapshot
  *     even while later commits land (snapshot isolation without locks).
  *   - Writers race on the version number OPTIMISTICALLY: if `v<N>` already
  *     exists the loser re-reads the new latest manifest, re-merges its own
  *     partition mapping on top, and retries at `N+1`. Disjoint-partition
  *     writers both land; same-partition writers serialize by
  *     last-commit-wins at partition grain.
  *   - Old manifests stay readable (time travel) until [[vacuum]] drops
  *     unreferenced data directories.
  *
  * Commit grain is the PARTITION (a commit replaces every partition present
  * in its batch), matching the reference's per-(day × source) rewrite unit
  * (`atd_data_lake/support/storage.py:58-88`); [[LakeCatalog.merge]]
  * provides PK-grain latest-wins on top when needed.
  */
class SnapshotLake(spark: SparkSession, root: String) {

  private def manifestsDir = Paths.get(root, "manifests")
  private def dataDir = Paths.get(root, "data")

  private def manifestPath(v: Long): Path = manifestsDir.resolve(f"v$v%08d.json")

  private def infoPath(v: Long): Path = manifestsDir.resolve(f"v$v%08d.info")

  /** Advisory commit metadata, written AFTER the version is won (the
    * manifest create is the commit point; a crash between the two leaves a
    * valid commit with no info row — [[history]] reports op "unknown").
    * Best-effort: an IO failure here must not fail a committed write.
    */
  private def writeInfo(v: Long, op: String, partitions: Int): Unit =
    try Files.write(
      infoPath(v),
      s"""{"op":"$op","committed_at":${System.currentTimeMillis()},"partitions":$partitions}"""
        .getBytes("UTF-8"))
    catch { case _: java.io.IOException => () }

  /** Commit audit trail: one row per live version — (version, op,
    * committed_at epoch-millis, touched partition count). Ops: "commit"
    * (partition-grain replace), "upsert" (PK-grain merge), "delete"
    * (predicate rewrite); "unknown" for versions whose info sidecar is
    * missing (pre-feature commits, or a crash between manifest and info
    * writes).
    */
  def history: Seq[(Long, String, Long, Int)] = versions.map { v =>
    val parsed =
      try {
        val s = new String(Files.readAllBytes(infoPath(v)), "UTF-8")
        def field(k: String) = s.split(s""""$k":""", 2) match {
          case Array(_, rest) => Some(rest.takeWhile(c => c != ',' && c != '}').trim)
          case _ => None
        }
        for {
          op <- field("op").map(_.stripPrefix("\"").stripSuffix("\""))
          at <- field("committed_at").map(_.toLong)
          np <- field("partitions").map(_.toInt)
        } yield (v, op, at, np)
      } catch { case _: Exception => None }
    parsed.getOrElse((v, "unknown", 0L, 0))
  }

  /** Iceberg-style `files` metadata view of a snapshot: one row per live
    * data FILE — `(partitionCols..., file, bytes, rows)` — resolved from
    * the version's manifest, with sizes from the filesystem and row counts
    * from parquet footers. Footer reads run in ONE distributed job (the
    * [[graft.sources.DataSkipping.footerStatsAll]] discipline); the driver
    * touches only the metadata-bounded path list. The operational
    * companion to [[history]]: small-file skew, partition balance, and
    * OPTIMIZE effectiveness all read straight off it, without scanning a
    * byte of data.
    */
  /** Whether `version` (default latest) carries pending deletion vectors.
    * Metadata-only answers (footer row counts, file lists) are EXACT only
    * when this is false — the DSv2 aggregate pushdown's gate.
    */
  def hasDeletionVectors(version: Option[Long] = None): Boolean = {
    val v = version.orElse(latestVersion).getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    dvDirsOf(readMeta(v)).nonEmpty
  }

  def files(partitionCols: Seq[String], version: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val v = version.orElse(latestVersion).getOrElse(
      throw new IllegalArgumentException(s"lake at $root has no versions"))
    require(Files.exists(manifestPath(v)),
      s"version $v does not exist (or was vacuumed) at $root")
    val entries = readManifest(v).toSeq
    val paths: Seq[(Seq[String], String, Long)] = entries.flatMap { case (key, dir) =>
      val values = partValuesOf(key)
      val d = Paths.get(resolveDir(dir))
      val listing = Files.list(d)
      try listing.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .map(p => (values, p.toString, Files.size(p)))
        .toList
      finally listing.close()
    }
    val counted = spark.createDataset(paths.map { case (vals, f, b) => (vals, f, b) })
      .repartition(math.min(paths.size.max(1), 64))
      .mapPartitions { it =>
        val conf = new org.apache.hadoop.conf.Configuration() // once per task
        it.map { case (vals, f, b) =>
          val meta = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
            conf, new org.apache.hadoop.fs.Path(f),
            org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
          var rows = 0L
          val bit = meta.getBlocks.iterator()
          while (bit.hasNext) rows += bit.next().getRowCount
          (vals, f, b, rows)
        }
      }
      .toDF("_values", "file", "bytes", "rows")
    partitionCols.zipWithIndex
      .foldLeft(counted) { case (df, (c, i)) =>
        df.withColumn(c, col("_values").getItem(i))
      }
      .select((partitionCols.map(col) ++ Seq(col("file"), col("bytes"), col("rows"))): _*)
  }

  // ------------------------------------------------- incremental consumers

  private def consumersDir = Paths.get(root, "consumers")

  private def consumerPath(id: String): Path = {
    require(id.nonEmpty && id.forall(c => c.isLetterOrDigit || c == '-' || c == '_'),
      s"consumer id '$id' must be [A-Za-z0-9_-]+ (it names a file)")
    consumersDir.resolve(id)
  }

  /** The version this consumer has acknowledged, if any. */
  def consumerOffset(id: String): Option[Long] = {
    val p = consumerPath(id)
    if (!Files.exists(p)) None
    else Some(new String(Files.readAllBytes(p), "UTF-8").trim.toLong)
  }

  /** Everything this consumer has NOT yet acknowledged, plus the version
    * to acknowledge once processed — downstream incremental pipelines
    * consume the lake like a log:
    *
    *   - first call (no offset): the full current snapshot, every row
    *     tagged `_change = "insert"` — the bootstrap read;
    *   - subsequent calls: the [[changes]] CDF delta from the acknowledged
    *     version to the current latest;
    *   - caught up: a zero-row frame with the CDF schema.
    *
    * Delivery is AT-LEAST-ONCE by construction: a crash between processing
    * and [[ackConsumer]] replays the same delta — pair the downstream
    * write with [[commitIfNew]] (or any idempotent sink keyed on
    * (consumer, version)) for exactly-once end to end. The returned
    * version is a SNAPSHOT pin: commits landing after this call are
    * simply the next delta.
    */
  def changesForConsumer(
      id: String,
      pk: Seq[String],
      partitionCols: Seq[String]): (DataFrame, Long) = {
    val latest = latestVersion.getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    def canon(df: DataFrame): DataFrame = {
      val cols = df.columns.filterNot(_ == "_change").toSeq
      val ordered = pk.filter(cols.contains) ++ cols.filterNot(pk.contains)
      df.select((col("_change") +: ordered.map(col)): _*)
    }
    consumerOffset(id) match {
      case None =>
        (canon(read(partitionCols, Some(latest)).withColumn("_change", lit("insert"))),
          latest)
      case Some(v) if v == latest =>
        (canon(read(partitionCols, Some(latest)).limit(0).withColumn("_change", lit(""))),
          latest)
      case Some(v) =>
        require(v < latest, s"consumer '$id' offset $v is ahead of latest $latest")
        (changes(v, latest, pk, partitionCols), latest)
    }
  }

  /** Acknowledge `version` for this consumer. Offsets only move FORWARD —
    * a stale acknowledger (a zombie of a crashed consumer run) cannot
    * rewind a successor — and the write is atomic (temp + ATOMIC_MOVE),
    * so readers never observe a torn offset.
    */
  def ackConsumer(id: String, version: Long): Unit = {
    require(versions.contains(version),
      s"cannot ack version $version — it does not exist at $root")
    Files.createDirectories(consumersDir)
    // the forward-only check and the move must be ONE critical section: a
    // plain check-then-rename would let a zombie of a crashed run ack an
    // old version AFTER its successor advanced, rewinding the offset and
    // re-delivering a delta. A per-consumer OS file lock serializes
    // acknowledgers on this host; an object-store deployment swaps this
    // for a conditional put, behind the same method. The lock file
    // PERSISTS by design (one dot-prefixed empty file per consumer,
    // bounded by consumer count): deleting it after release is the
    // classic unlink race — a second acknowledger can still hold the
    // deleted inode while a third recreates the path, leaving two
    // processes "holding" different locks.
    val lockPath = consumersDir.resolve(s".$id.lock")
    val ch = java.nio.channels.FileChannel.open(lockPath,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    try {
      val lock = ch.lock()
      try {
        require(consumerOffset(id).forall(_ <= version),
          s"cannot rewind consumer '$id' from ${consumerOffset(id).get} to $version")
        val tmp = Files.createTempFile(consumersDir, s".$id", ".tmp")
        Files.write(tmp, version.toString.getBytes("UTF-8"))
        Files.move(tmp, consumerPath(id),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } finally lock.release()
    } finally ch.close()
  }

  /** Incremental partition-grain replication into another lake — the
    * CORRECT composition of the consumer offset machinery with
    * [[commitIfNew]]'s exactly-once watermark. What replicates is the
    * SOURCE SNAPSHOT of every changed partition (whole partitions, never
    * the row delta): replaying a row-grain CDF delta through a
    * partition-replacing commit would silently drop the UNCHANGED rows of
    * a partially-changed partition and could never express deletes.
    * Partition removals propagate as (idempotent) deletes on the
    * destination.
    *
    * One call consumes everything unacknowledged, applies, and acks.
    * Crash anywhere and the replay is harmless: the delete is a no-op on
    * already-removed partitions and the commit is a no-op behind the
    * (consumerId, source-version) watermark — at-least-once consume +
    * idempotent apply = exactly-once end to end. Returns the acknowledged
    * source version.
    */
  def replicateTo(
      dst: SnapshotLake,
      consumerId: String,
      partitionCols: Seq[String]): Long = {
    val latest = latestVersion.getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    val from = consumerOffset(consumerId)
    if (from.contains(latest)) return latest
    val manifest = readManifest(latest)
    val changedKeys: Set[String] = from match {
      case None => manifest.keySet // bootstrap: everything
      case Some(v) => changedPartitions(v, latest)
    }
    val liveChanged = manifest.filter { case (k, _) => changedKeys.contains(k) }
    val removed = changedKeys -- manifest.keySet
    if (removed.nonEmpty && dst.latestVersion.isDefined) {
      val pred = removed.toSeq.sorted.map { key =>
        partitionCols.zip(partValuesOf(key))
          .map { case (c, v) => col(c).cast("string") === lit(v) }
          .reduce(_ && _)
      }.reduce(_ || _)
      dst.deleteWhere(pred, partitionCols)
    }
    if (liveChanged.nonEmpty)
      dst.commitIfNew(consumerId, latest,
        readEntries(liveChanged.toSeq.sorted, partitionCols, readMeta(latest)),
        partitionCols)
    ackConsumer(consumerId, latest)
    latest
  }

  /** [[commit]] gated by a [[graft.ops.Validate]] suite: the batch lands
    * ONLY if every check passes; otherwise nothing is staged and the
    * failing report is in the exception — the write-side quality gate
    * (CHECK constraints on a lakehouse table).
    */
  def commitValidated(
      batch: DataFrame,
      partitionCols: Seq[String],
      checks: Seq[graft.ops.Validate.Check]): Long = {
    // pin the batch ONCE: validating and then re-evaluating a
    // non-deterministic plan (sampling, a concurrently-changing source)
    // could commit rows the validation never saw
    val pinned = batch.localCheckpoint(true)
    val report = graft.ops.Validate.report(pinned, checks).collect()
    val failed = report.filter(!_.getBoolean(5))
    require(failed.isEmpty,
      "batch rejected by validation: " + failed.map(r =>
        s"${r.getString(0)} (${r.getLong(3)} violations)").mkString("; "))
    commit(pinned, partitionCols)
  }

  /** Decode a manifest key back to partition VALUES. limit -1: a trailing
    * empty segment (an empty-string value in the LAST partition column)
    * must survive the split — the default drops it and the value would
    * read back as NULL.
    */
  private def partValuesOf(key: String): Seq[String] =
    key.split("/", -1).toSeq.map(java.net.URLDecoder.decode(_, "UTF-8"))

  /** value-encoded partition key, e.g. `status=F` (URL-encoded values). */
  private def keyOf(values: Seq[String]): String =
    values.map(java.net.URLEncoder.encode(_, "UTF-8")).mkString("/")

  /** Manifests store data directories RELATIVE to the lake root
    * (`data/<uuid>`), so the whole lake can be relocated/copied and opened
    * from any spelling of `root` (absolute, relative, through a symlink).
    * Absolute entries written by earlier versions still resolve as-is.
    */
  private def resolveDir(d: String): String = {
    val p = Paths.get(d)
    if (p.isAbsolute) d else Paths.get(root).resolve(p).toString
  }

  /** Distinct partition-value tuples of `batch`. NULL partition values are
    * rejected outright: a NULL would stringify to "null" (colliding with
    * the literal string) and its rows would match no equality predicate at
    * write time — silently vanishing. Callers coalesce to a sentinel first.
    */
  private def touchedPartitions(
      batch: DataFrame, partitionCols: Seq[String]): Seq[Seq[String]] =
    // cast-to-string FIRST so key rendering is exactly what the Hive-layout
    // staging write renders into directory names (one stringification rule
    // everywhere, Spark's). NOTE this is a manifest-key CONTRACT: lakes
    // written before the one-job staging change rendered non-string
    // partition values via Row.get.toString, which differs for TIMESTAMP
    // columns ('…00:00:00.0' vs '…00:00:00') — such lakes (none exist in
    // this repo's history) would need a one-time key rewrite
    batch.select(partitionCols.map(c => col(c).cast("string")): _*)
      .distinct().collect()
      .map { r =>
        partitionCols.indices.map { i =>
          if (r.isNullAt(i))
            throw new IllegalArgumentException(
              s"NULL value in partition column '${partitionCols(i)}' — " +
                "coalesce partition columns to a sentinel before committing")
          val v = r.getString(i)
          // reserved: the Hive-layout staging write renders BOTH null and ""
          // as this directory name; NULL is rejected above and "" therefore
          // round-trips unambiguously — but the literal string itself would
          // alias with "" and silently mis-key its partition
          if (v == "__HIVE_DEFAULT_PARTITION__")
            throw new IllegalArgumentException(
              s"partition column '${partitionCols(i)}' carries the reserved " +
                "value '__HIVE_DEFAULT_PARTITION__' — recode it before committing")
          v
        }
      }.toSeq

  /** Stage every partition of `df` in ONE Spark job: a Hive-layout
    * `partitionBy` write into a transient staging directory, whose leaf
    * directories are then renamed (cheap same-FS metadata moves) into the
    * uniquely-named immutable `data/<uuid>` dirs the manifests reference.
    * Replaces the former one-job-per-partition driver loop — a commit
    * touching P partitions cost P full passes over the batch; now it costs
    * one, regardless of P. Partition columns travel as strings (the
    * manifest-key contract) and are dropped from the data files, exactly as
    * before. Returns key → root-relative dir for every partition that had
    * rows; partitions with no rows produce no entry.
    */
  private def stagePartitioned(
      df: DataFrame, partitionCols: Seq[String]): Map[String, String] = {
    val staging = dataDir.resolve(s"_stage-${java.util.UUID.randomUUID()}")
    df.withColumns(partitionCols.map(c => c -> col(c).cast("string")).toMap)
      .write.partitionBy(partitionCols: _*).parquet(staging.toString)
    // walk the Hive tree: one level per partition column, `col=value` names
    def leaves(dir: Path, depth: Int): Seq[(List[String], Path)] =
      if (depth == 0) Seq((Nil, dir))
      else {
        val s = Files.list(dir)
        val subs = try s.iterator().asScala.filter(Files.isDirectory(_)).toList finally s.close()
        subs.flatMap { sub =>
          val name = sub.getFileName.toString
          val eq = name.indexOf('=')
          if (eq < 0) Nil // _temporary leftovers etc — not a partition dir
          else {
            // NULL partition values are rejected before staging, so Hive's
            // default-partition name can only mean the empty string (which
            // the writer renders the same way)
            val raw = name.substring(eq + 1)
            val value =
              if (raw == "__HIVE_DEFAULT_PARTITION__") ""
              else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
                .unescapePathName(raw)
            leaves(sub, depth - 1).map { case (vs, p) => (value :: vs, p) }
          }
        }
      }
    val dirs = leaves(staging, partitionCols.size).map { case (values, p) =>
      val name = java.util.UUID.randomUUID().toString
      Files.move(p, dataDir.resolve(name))
      keyOf(values) -> s"data/$name"
    }.toMap
    deleteRecursively(staging)
    dirs
  }

  /** Stage one immutable uniquely-named directory per touched partition —
    * shared by every commit path, so write details (layout, options) can
    * never diverge between batch and streaming. One Spark job total
    * ([[stagePartitioned]]); every touched partition must surface (a
    * non-deterministic batch whose rows shifted between the touched-set
    * collect and the staging write fails loudly here instead of committing
    * a partition-less manifest entry).
    */
  private def stageDirs(
      batch: DataFrame,
      partitionCols: Seq[String],
      touched: Seq[Seq[String]]): Map[String, String] = {
    val dirs = stagePartitioned(batch, partitionCols)
    val expected = touched.map(keyOf).toSet
    if (dirs.keySet != expected) {
      dirs.values.foreach(d => deleteRecursively(Paths.get(resolveDir(d))))
      throw new IllegalStateException(
        s"staged partitions [${dirs.keySet.toSeq.sorted.mkString(",")}] != touched " +
          s"[${expected.toSeq.sorted.mkString(",")}] — the batch re-evaluated to a " +
          "different row set between planning and staging; cache or checkpoint " +
          "non-deterministic inputs before committing")
    }
    dirs
  }

  /** Refresh staged directories' mtime so a long retry loop cannot age them
    * past [[vacuum]]'s `minAgeMs` retention guard while the commit is still
    * in flight — called immediately before each CAS attempt.
    */
  private def touchDirs(dirs: Iterable[String]): Unit =
    dirs.foreach { d =>
      try Files.setLastModifiedTime(
        Paths.get(resolveDir(d)),
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
      catch { case _: java.io.IOException => () }
    }

  private def deleteRecursively(dir: java.nio.file.Path): Unit =
    if (Files.exists(dir)) {
      val w = Files.walk(dir)
      try w.sorted(java.util.Comparator.reverseOrder()).forEach(p => Files.deleteIfExists(p))
      finally w.close()
    }

  def versions: Seq[Long] = {
    if (!Files.isDirectory(manifestsDir)) return Seq.empty
    val s = Files.list(manifestsDir)
    try s.iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toLong)
      .toSeq.sorted
    finally s.close()
  }

  def latestVersion: Option[Long] = versions.lastOption

  /** manifest = partitionKey → (partition values, data dir), plus
    * transaction watermarks. Stored as simple sorted `key<TAB>dir` lines
    * inside a .json-named file for driver-tool friendliness; values
    * re-derive from the key. Transaction lines use the reserved prefix
    * `#txn<TAB>appId<TAB>batchId` — a genuine partition key can never
    * start with `#` (values are URL-encoded, `#` ⇒ `%23`) — and ride the
    * SAME atomic manifest create as the data they gate, which is what
    * makes [[commitIfNew]] exactly-once.
    */
  private val TxnPrefix = "#txn"

  /** Schema-evolution metadata lines: `#meta<TAB>key<TAB>value` (key and
    * value URL-encoded). Versioned WITH the manifest — time travel reads
    * each version under its own mapping — and carried forward by every
    * commit path exactly like the txn watermarks.
    */
  private val MetaPrefix = "#meta"

  /** One file read → (partition map, appId → batch-id watermarks,
    * schema-evolution meta).
    */
  private def readManifestAndTxns(
      v: Long): (Map[String, String], Map[String, Long], Map[String, String]) = {
    val lines = Files.readAllLines(manifestPath(v)).asScala.filter(_.nonEmpty)
    val (txnLines, rest) = lines.partition(_.startsWith(TxnPrefix + "\t"))
    val (metaLines, dataLines) = rest.partition(_.startsWith(MetaPrefix + "\t"))
    val data = dataLines.map { line =>
      val Array(k, d) = line.split("\t", 2)
      k -> d
    }.toMap
    val txns = txnLines.map { line =>
      val Array(_, app, b) = line.split("\t", 3)
      java.net.URLDecoder.decode(app, "UTF-8") -> b.toLong
    }.toMap
    val meta = metaLines.map { line =>
      val Array(_, k, value) = line.split("\t", 3)
      java.net.URLDecoder.decode(k, "UTF-8") ->
        java.net.URLDecoder.decode(value, "UTF-8")
    }.toMap
    (data, txns, meta)
  }

  private def readManifest(v: Long): Map[String, String] = readManifestAndTxns(v)._1

  /** appId → highest committed batch id, as of manifest `v`. */
  private def readTxns(v: Long): Map[String, Long] = readManifestAndTxns(v)._2

  /** Schema-evolution meta as of manifest `v` (empty on pre-feature lakes). */
  private def readMeta(v: Long): Map[String, String] = readManifestAndTxns(v)._3

  // ---- rename-safe column mapping (Delta/Iceberg column-mapping shape) --
  //
  // Parquet files keep their PHYSICAL column names forever (immutable data,
  // zero-rewrite renames); the manifest's meta carries physical→logical
  // renames ("colmap") and hidden physicals ("dropped"). Reads translate
  // physical→logical after the scan; writes translate logical→physical
  // before staging, so every data file — pre- and post-rename — stores one
  // consistent physical schema and mergeSchema keeps working.

  /** physical → logical renames, parsed from meta ("p=l;p=l", URL-encoded
    * components).
    */
  private def colMapOf(meta: Map[String, String]): Map[String, String] =
    meta.get("colmap").filter(_.nonEmpty).fold(Map.empty[String, String]) {
      _.split(";").map { pair =>
        val Array(p, l) = pair.split("=", 2)
        java.net.URLDecoder.decode(p, "UTF-8") -> java.net.URLDecoder.decode(l, "UTF-8")
      }.toMap
    }

  /** Physical names hidden from every read (lazy column drop). */
  private def droppedOf(meta: Map[String, String]): Set[String] =
    meta.get("dropped").filter(_.nonEmpty).fold(Set.empty[String]) {
      _.split(";").map(java.net.URLDecoder.decode(_, "UTF-8")).toSet
    }

  // ---- zero-rewrite type widening (the other half of the Delta/Iceberg
  // schema-evolution contract) -------------------------------------------
  //
  // Meta key "typemap": `phys=catalogString;...` — each entry promotes a
  // physical column's LOGICAL type to a strictly wider one (byte→short→
  // int→long, float→double). Data files are never rewritten: old files
  // keep their narrow physical type, new batches store the wide one, and
  // reads reconcile by handing the scan an EXPLICIT read schema at the
  // wide type — Spark's parquet reader up-converts narrow file columns
  // into a wider requested type natively (vectorized, no post-scan cast).

  /** physical name → widened logical type, parsed from meta. */
  private def typeMapOf(
      meta: Map[String, String]): Map[String, org.apache.spark.sql.types.DataType] =
    meta.get("typemap").filter(_.nonEmpty).fold(
      Map.empty[String, org.apache.spark.sql.types.DataType]) {
      _.split(";").map { pair =>
        val Array(p, t) = pair.split("=", 2)
        java.net.URLDecoder.decode(p, "UTF-8") ->
          org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseDataType(
            java.net.URLDecoder.decode(t, "UTF-8"))
      }.toMap
    }

  private def metaWithTypes(
      meta: Map[String, String],
      typeMap: Map[String, org.apache.spark.sql.types.DataType]): Map[String, String] = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    if (typeMap.isEmpty) meta - "typemap"
    else meta + ("typemap" -> typeMap.toSeq.sortBy(_._1)
      .map { case (p, t) => s"${enc(p)}=${enc(t.catalogString)}" }.mkString(";"))
  }

  /** Lossless widening lattice: strictly-increasing rank within one numeric
    * family. Everything else (narrowing, cross-family, decimals, strings)
    * is NOT a widening — callers refuse loudly.
    */
  private def widenRank(dt: org.apache.spark.sql.types.DataType): Option[(String, Int)] = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType => Some(("integral", 1))
      case ShortType => Some(("integral", 2))
      case IntegerType => Some(("integral", 3))
      case LongType => Some(("integral", 4))
      case FloatType => Some(("fractional", 1))
      case DoubleType => Some(("fractional", 2))
      case _ => None
    }
  }

  private def widensTo(
      from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): Boolean = (from, to) match {
    // decimal → decimal is lossless iff neither the integer digits
    // (precision − scale) nor the scale shrink, and something actually
    // grows — the Delta/Iceberg decimal-widening rule
    case (f: org.apache.spark.sql.types.DecimalType,
          t: org.apache.spark.sql.types.DecimalType) =>
      t.precision - t.scale >= f.precision - f.scale && t.scale >= f.scale &&
        (t.precision > f.precision || t.scale > f.scale)
    case _ =>
      (widenRank(from), widenRank(to)) match {
        case (Some((fa, fr)), Some((ta, tr))) => fa == ta && fr < tr
        case _ => false
      }
  }

  /** The multi-dir parquet scan every read path shares. Without widened
    * types this is the plain mergeSchema scan; with them, file footers can
    * legitimately DISAGREE on a column's type (pre-widen files are narrow,
    * post-widen files wide), which mergeSchema refuses — so the merged
    * schema is built here instead, resolving each mapped column to its
    * widened type (after checking every file-level type actually widens to
    * it), and handed to the scan as an explicit read schema. Absent
    * columns still read as NULL (the schema-evolution contract), and the
    * parquet reader up-converts narrow columns in place.
    *
    * DROPPED physicals are excluded from the explicit read schema here,
    * not just post-scan: a widened-then-dropped column's files disagree on
    * type forever (pre-widen narrow, post-widen wide) and its typemap
    * entry is pruned at drop time — requiring those footers to agree (or
    * letting mergeSchema try) would make the lake unreadable at latest.
    * Skipping the column means its bytes are never read at all, which is
    * also the I/O the lazy drop should have been saving.
    */
  private def scanDirs(paths: Seq[String], meta: Map[String, String]): DataFrame = {
    val tmap = typeMapOf(meta)
    val dropped = droppedOf(meta)
    if (tmap.isEmpty && dropped.isEmpty) {
      if (paths.size == 1) spark.read.parquet(paths.head)
      else spark.read.option("mergeSchema", "true").parquet(paths: _*)
    } else {
      // one footer-schema fetch per path, but CONCURRENT — a widened lake
      // with hundreds of partition dirs (or readPruned's per-file paths)
      // must not pay sequential driver round-trips on every read. Results
      // re-zip with `paths` so the merged field order stays deterministic.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: scala.concurrent.ExecutionContext = SnapshotLake.footerEc
      val schemas = Await.result(
        Future.traverse(paths.toList)(p => Future(spark.read.parquet(p).schema)),
        Duration.Inf)
      val merged = scala.collection.mutable.LinkedHashMap
        .empty[String, org.apache.spark.sql.types.DataType]
      for ((p, schema) <- paths.zip(schemas);
           f <- schema.fields if !dropped.contains(f.name)) {
        val target = tmap.getOrElse(f.name, f.dataType)
        require(f.dataType == target || widensTo(f.dataType, target),
          s"column '${f.name}' stored as ${f.dataType.catalogString} under $p " +
            s"cannot be read at ${target.catalogString} — not a lossless widening")
        merged.get(f.name) match {
          case None => merged += f.name -> target
          case Some(prev) => require(prev == target,
            s"column '${f.name}' has conflicting types across files " +
              s"(${prev.catalogString} vs ${target.catalogString}) with no " +
              "widening registered — widenColumn first")
        }
      }
      val readSchema = org.apache.spark.sql.types.StructType(merged.toSeq.map {
        case (n, t) => org.apache.spark.sql.types.StructField(n, t, nullable = true)
      })
      spark.read.schema(readSchema).parquet(paths: _*)
    }
  }

  private def metaWith(
      meta: Map[String, String],
      colMap: Map[String, String],
      dropped: Set[String]): Map[String, String] = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val base = meta - "colmap" - "dropped"
    val withMap =
      if (colMap.isEmpty) base
      else base + ("colmap" -> colMap.toSeq.sorted
        .map { case (p, l) => s"${enc(p)}=${enc(l)}" }.mkString(";"))
    if (dropped.isEmpty) withMap
    else withMap + ("dropped" -> dropped.toSeq.sorted.map(enc).mkString(";"))
  }

  // ---- deletion vectors (zero-rewrite row-level deletes — the Iceberg
  // position-delete / Delta DV shape) -------------------------------------
  //
  // Meta key "dv": ";"-joined URL-encoded directories, each holding a
  // parquet relation `(__dv_file, __dv_pos)` of deleted row positions.
  // Rows are addressed by `<data-dir-leaf>/<file-name>` + the parquet
  // row index — leaf-relative like vacuum's liveness rule, so relocating
  // the lake (or opening it through another path spelling) can never
  // detach the deletes from their files. Reads anti-join the scan against
  // the union of DV relations; data files never rewrite. Versioned with
  // the manifest: time travel before the DV commit sees the rows.

  private def dvDirsOf(meta: Map[String, String]): Seq[String] =
    meta.get("dv").filter(_.nonEmpty).fold(Seq.empty[String]) {
      _.split(";").toSeq.map(java.net.URLDecoder.decode(_, "UTF-8"))
    }

  private def metaWithDvs(meta: Map[String, String], dirs: Seq[String]): Map[String, String] = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    if (dirs.isEmpty) meta - "dv"
    else meta + ("dv" -> dirs.map(enc).mkString(";"))
  }

  // ---- self-describing partition columns --------------------------------
  //
  // The manifest's partition keys encode VALUES, not column names — every
  // API read takes `partitionCols` from the caller. Meta key "partcols"
  // records the names at commit time so schema-free consumers (the
  // `spark.read.format("graft")` DataSourceV2 surface) can resolve a lake
  // from its path alone. Informational: API reads never consult it, and a
  // pre-feature lake simply lacks the key (the provider then requires an
  // explicit option).

  private def metaWithPartCols(
      meta: Map[String, String], partitionCols: Seq[String]): Map[String, String] =
    meta + ("partcols" -> partitionCols
      .map(java.net.URLEncoder.encode(_, "UTF-8")).mkString(";"))

  /** The partition column names recorded by the latest (or given) version's
    * commit — None for lakes written before the feature.
    */
  def partitionColumns(version: Option[Long] = None): Option[Seq[String]] = {
    val v = version.orElse(latestVersion).getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    readMeta(v).get("partcols").filter(_.nonEmpty)
      .map(_.split(";").toSeq.map(java.net.URLDecoder.decode(_, "UTF-8")))
  }

  /** The relocation-stable row address: `<dir-leaf>/<file-name>` from the
    * scan's metadata column (full paths would break on lake relocation —
    * the vacuum leaf-name lesson applied to row identity).
    */
  private def dvFileKey: org.apache.spark.sql.Column =
    concat_ws("/",
      element_at(split(col("_metadata.file_path"), "/"), -2),
      element_at(split(col("_metadata.file_path"), "/"), -1))

  /** Scan output with DVs applied (anti-join on the stable row address) —
    * a no-op when the version carries none. `exposeRowIds` keeps the
    * `__dv_file`/`__dv_pos` columns for the delete-collection path.
    */
  private def applyDvs(
      scanned: DataFrame, meta: Map[String, String],
      exposeRowIds: Boolean = false): DataFrame = {
    val dvDirs = dvDirsOf(meta)
    if (dvDirs.isEmpty && !exposeRowIds) scanned
    else {
      val withIds = scanned.select(col("*"),
        dvFileKey.as("__dv_file"),
        col("_metadata.row_index").as("__dv_pos"))
      val filtered =
        if (dvDirs.isEmpty) withIds
        else withIds.join(
          spark.read.parquet(dvDirs.map(resolveDir): _*)
            .select(col("__dv_file"), col("__dv_pos")),
          Seq("__dv_file", "__dv_pos"), "left_anti")
      if (exposeRowIds) filtered else filtered.drop("__dv_file", "__dv_pos")
    }
  }

  /** Physical names a batch may no longer (re)introduce as logical column
    * names: renamed-away originals and dropped columns. Reusing one would
    * collide with the retired data still stored under that name in old
    * files (mergeSchema would resurrect it) — the v1 contract REFUSES the
    * reuse instead of allocating synthetic physical names.
    */
  private def retiredOf(meta: Map[String, String]): Set[String] = {
    val mapping = colMapOf(meta)
    (mapping.keySet.filterNot(p => mapping(p) == p) ++ droppedOf(meta)) --
      mapping.values.toSet
  }

  // ---- manifest-level partition stats (Delta-style log data skipping) --
  //
  // At commit time the staged parquet FOOTERS' min/max get promoted into
  // `#meta stats:<dir-leaf>` lines, so partition-grain pruning later costs
  // ZERO file I/O — the driver answers "which partitions can contain
  // c ∈ [lo, hi]" from the manifest alone. Numeric columns only (the
  // range-prune surface), capped; a partition with no stats entry is
  // always a candidate (pruning must only ever EXCLUDE on positive
  // evidence), which also covers pre-feature manifests and optimize
  // rewrites. Values never leave the JVM, so Double.toString round-trips
  // are exact.

  private val StatsKeyPrefix = "stats:"
  private val MaxStatsCols = 32

  /** Per-DV-dir leaf index: meta key `dvleaves:<dv-dir-leaf>` → the
    * `;`-joined DATA-dir leaves its addresses point into. Lets
    * [[foldDvs]] keep untouched DV dirs BY REFERENCE across a link-merge
    * (zero read, zero write) instead of re-folding the whole DV relation
    * on every merge — a dir whose recorded leaf set is disjoint from the
    * replaced leaves cannot need re-keying. A dir WITHOUT an entry
    * (legacy manifests) is conservatively re-folded, which also writes
    * its index — self-healing. Bounded: one small entry per live DV dir,
    * pruned with the dir in [[writeManifestAtomic]].
    */
  private val DvLeavesPrefix = "dvleaves:"

  private def dvLeafName(d: String): String = Paths.get(d).getFileName.toString

  /** The distinct data-dir leaves a DV address frame points into — a
    * bounded collect (≤ live partition count) that prices one index entry.
    */
  private def dvAddressedLeaves(addrs: DataFrame): Seq[String] =
    addrs.select(element_at(split(col("__dv_file"), "/"), 1).as("l"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted

  private def dvLeavesEntry(dvDir: String, leaves: Seq[String]): (String, String) =
    (DvLeavesPrefix + dvLeafName(dvDir)) -> leaves.mkString(";")

  /** Footer-derived per-dir stats meta for freshly staged dirs: one footer
    * job over the staged files (their stats already exist in the footers —
    * this promotes, it does not rescan data).
    */
  private def dirStats(newDirs: Map[String, String]): Map[String, String] = {
    if (newDirs.isEmpty) return Map.empty
    val resolved = newDirs.values.toSeq.sorted.map(resolveDir)
    // ONE driver footer read picks the numeric columns (no Spark job —
    // the job-count budget of a 50-partition commit is pinned by spec),
    // then ONE distributed footer job covers every staged file
    val firstFile = resolved.iterator
      .flatMap(d => graft.sources.DataSkipping.listParquetFiles(Paths.get(d)).headOption)
      .nextOption()
    if (firstFile.isEmpty) return Map.empty
    val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      new org.apache.hadoop.conf.Configuration(),
      new org.apache.hadoop.fs.Path(firstFile.get),
      org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val numeric = footer.getFileMetaData.getSchema.getFields.asScala
      .filter(f => f.isPrimitive && Set(INT32, INT64, FLOAT, DOUBLE)
        .contains(f.asPrimitiveType().getPrimitiveTypeName))
      .map(_.getName).take(MaxStatsCols).toSeq
    if (numeric.isEmpty) return Map.empty
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val perFile = graft.sources.DataSkipping.footerStatsAll(spark, resolved, numeric)
      .collect()
    // dir grain (min of file mins, max of file maxes) on the driver —
    // bounded by the staged FILE count, the pruneFiles collect discipline
    perFile.groupBy(r =>
      r.getString(0).split("/").dropRight(1).last).flatMap { case (leaf, rows) =>
      val parts = numeric.flatMap { c =>
        val mins = rows.flatMap(r => Option(r.getAs[java.lang.Double](s"min_$c")))
        val maxs = rows.flatMap(r => Option(r.getAs[java.lang.Double](s"max_$c")))
        if (mins.isEmpty || maxs.isEmpty) None
        else Some(s"${enc(c)}=${mins.map(_.doubleValue).min}:${maxs.map(_.doubleValue).max}")
      }
      if (parts.isEmpty) None
      else Some((StatsKeyPrefix + leaf) -> parts.mkString(";"))
    }.toMap
  }

  /** Parse one partition's stats meta value → col → (min, max). */
  private def parseStats(value: String): Map[String, (Double, Double)] =
    value.split(";").filter(_.nonEmpty).map { entry =>
      val Array(c, range) = entry.split("=", 2)
      val Array(mn, mx) = range.split(":", 2)
      java.net.URLDecoder.decode(c, "UTF-8") -> (mn.toDouble, mx.toDouble)
    }.toMap

  /** Partition KEYS of `version` that may contain rows with `c ∈ [lo, hi]`
    * — answered from the manifest's stats meta alone, zero file I/O. A
    * partition with no stats (pre-feature commits, optimize rewrites,
    * all-null columns) is always a candidate: pruning excludes only on
    * positive footer evidence. `c` is a LOGICAL name.
    */
  def prunePartitions(
      c: String, lo: Double, hi: Double,
      version: Option[Long] = None): Seq[String] = {
    val v = version.orElse(latestVersion).getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    val (m, _, meta) = readManifestAndTxns(v)
    val physC = colMapOf(meta).map(_.swap).getOrElse(c, c)
    m.toSeq.sorted.collect {
      case (key, d) =>
        val leaf = Paths.get(d).getFileName.toString
        val excluded = meta.get(StatsKeyPrefix + leaf)
          .flatMap(s => parseStats(s).get(physC))
          .exists { case (mn, mx) => mn > hi || mx < lo }
        (key, excluded)
    }.collect { case (key, false) => key }
  }

  /** Post-scan translation: hide dropped physicals, alias mapped physicals
    * to their logical names. Unmapped columns pass through.
    */
  private def logicalize(df: DataFrame, meta: Map[String, String]): DataFrame =
    if (meta.isEmpty) df
    else {
      val mapping = colMapOf(meta)
      val dropped = droppedOf(meta)
      val kept = df.columns.filterNot(dropped.contains)
      df.select(kept.map(c => col(c).as(mapping.getOrElse(c, c))).toSeq: _*)
    }

  /** Pre-stage translation: batches arrive in LOGICAL names; rename each
    * mapped logical back to its stable physical name, refusing columns
    * that would reuse a retired physical.
    */
  private def physicalize(df: DataFrame, meta: Map[String, String]): DataFrame =
    if (meta.isEmpty) df
    else {
      val reverse = colMapOf(meta).map(_.swap)
      val retired = retiredOf(meta)
      val bad = df.columns.filter(c => retired.contains(c) && !reverse.contains(c))
      require(bad.isEmpty,
        s"column(s) ${bad.mkString(", ")} reuse retired physical name(s): a " +
          "renamed-away or dropped column's storage name stays reserved (old " +
          "files still hold its data and mergeSchema would resurrect it). " +
          "Pick a different logical name, or restore the old schema first.")
      // widened columns: new files store the WIDE type uniformly (a batch
      // still arriving at the pre-widen narrow type up-casts losslessly
      // here), so footer stats and later scans see one post-widen type.
      // Only LOSSLESS up-casts are applied — a batch with an unrelated
      // type is refused, never silently coerced.
      val tmap = typeMapOf(meta)
      df.select(df.columns.map { c =>
        val phys = reverse.getOrElse(c, c)
        val base = tmap.get(phys) match {
          case None => col(c)
          case Some(target) =>
            val bt = df.schema(c).dataType
            require(bt == target || widensTo(bt, target),
              s"batch column '$c' is ${bt.catalogString}, but the column is " +
                s"widened to ${target.catalogString} — only the registered type " +
                "or a type that losslessly widens to it may be written")
            col(c).cast(target)
        }
        base.as(phys)
      }.toSeq: _*)
    }

  // txns and meta are deliberately NOT defaulted: every commit path must
  // decide what happens to the watermarks and the column mapping — a
  // forgotten argument would silently erase every stream's exactly-once
  // state, or silently undo every rename/drop
  private def writeManifestAtomic(
      v: Long, m: Map[String, String], txns: Map[String, Long],
      meta: Map[String, String]): Boolean = {
    // stats meta is keyed by data-dir leaf; entries for dirs this manifest
    // no longer references are dead weight — prune them HERE so no commit
    // path can accumulate stale stats
    val liveLeaves = m.values.map(d => Paths.get(d).getFileName.toString).toSet
    val liveDvLeaves = dvDirsOf(meta).map(dvLeafName).toSet
    val prunedMeta = meta.filter { case (k, _) =>
      (!k.startsWith(StatsKeyPrefix) ||
        liveLeaves.contains(k.stripPrefix(StatsKeyPrefix))) &&
      (!k.startsWith(DvLeavesPrefix) ||
        liveDvLeaves.contains(k.stripPrefix(DvLeavesPrefix)))
    }
    val dataLines = m.toSeq.sorted.map { case (k, d) => s"$k\t$d" }
    val txnLines = txns.toSeq.sortBy(_._1).map { case (a, b) =>
      s"$TxnPrefix\t${java.net.URLEncoder.encode(a, "UTF-8")}\t$b"
    }
    val metaLines = prunedMeta.toSeq.sorted.map { case (k, value) =>
      s"$MetaPrefix\t${java.net.URLEncoder.encode(k, "UTF-8")}\t${java.net.URLEncoder.encode(value, "UTF-8")}"
    }
    val body = (dataLines ++ txnLines ++ metaLines).mkString("\n")
    // The commit point must be atomic in CONTENT, not just in name: a plain
    // CREATE_NEW write is two observable steps (create, then fill), so a
    // crash or IO error mid-write — or a concurrent reader racing the write
    // — could surface a truncated manifest as latestVersion, and a retrying
    // committer would then merge against the truncated base, silently
    // dropping partitions. Instead the body lands fully (fsync'd) in an
    // unpublished temp file, and PUBLICATION is one hard-link creation:
    // link() fails atomically if v<N> exists, preserving the CAS, and a
    // published manifest is always complete.
    // bounded retry: a concurrent vacuum can sweep the temp between fsync
    // and link (its staging grace window is generous but not transactional);
    // the link then throws NoSuchFile and a fresh temp simply repeats the
    // publish — the CAS semantics live entirely in createLink
    var attempts = 0
    while (true) {
      attempts += 1
      val tmp = Files.createTempFile(manifestsDir, ".stage-", ".tmp")
      try {
        val ch = java.nio.channels.FileChannel.open(tmp, StandardOpenOption.WRITE)
        try {
          ch.write(java.nio.ByteBuffer.wrap(body.getBytes("UTF-8")))
          ch.force(true)
        } finally ch.close()
        Files.createLink(manifestPath(v), tmp)
        return true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => return false
        case e: java.nio.file.NoSuchFileException if attempts < 3 => () // swept; retry
      } finally {
        Files.deleteIfExists(tmp)
      }
    }
    false // unreachable
  }

  /** The last batch id committed under `appId`, or None if that stream has
    * never committed here. Readable by monitoring; [[commitIfNew]] is the
    * race-safe consumer.
    */
  def lastTxn(appId: String): Option[Long] =
    latestVersion.flatMap(v => readTxns(v).get(appId))

  /** Scan a set of manifest entries as ONE multi-path read. The naive
    * per-partition plan (one `spark.read.parquet` + per-partition
    * `withColumn` literals folded with `unionByName`) builds O(partitions)
    * scan nodes — thousands at a real table's day×source grain. Here every
    * directory feeds a single FileScan (`mergeSchema` carries the lakehouse
    * schema-evolution contract — columns absent in older partitions read as
    * NULL), and partition values re-attach via a broadcast join against the
    * manifest's own (dir → values) mapping, keyed on the data directory's
    * unique leaf name recovered from `input_file_name()`. The single-entry
    * case skips the join entirely (plain literal columns).
    */
  private def readEntries(
      entries: Seq[(String, String)], partitionCols: Seq[String],
      meta: Map[String, String],
      exposeRowIds: Boolean = false): DataFrame = {
    require(entries.nonEmpty, "no manifest entries to read")
    def valuesOf(key: String): Seq[String] = partValuesOf(key)
    if (entries.size == 1) {
      val (key, dir) = entries.head
      partitionCols.zip(valuesOf(key))
        .foldLeft(logicalize(
          applyDvs(scanDirs(Seq(resolveDir(dir)), meta), meta, exposeRowIds), meta)) {
          case (df, (c, value)) => df.withColumn(c, lit(value))
        }
    } else {
      val resolved = entries.map { case (k, d) => (k, resolveDir(d)) }
      val dirCol = "__graft_part_dir"
      val hasDvs = dvDirsOf(meta).nonEmpty || exposeRowIds
      // with DVs active, the dir column derives from the scan's metadata
      // column IN the same projection that captures the row address —
      // input_file_name() is only well-defined directly over the scan, and
      // the DV path puts an anti-JOIN between the scan and the partition
      // attach, which would corrupt it
      val scanned0 = scanDirs(resolved.map(_._2), meta)
      val scanned =
        if (hasDvs)
          applyDvs(
            scanned0.select(col("*"),
              element_at(split(col("_metadata.file_path"), "/"), -2).as(dirCol)),
            meta, exposeRowIds)
        else
          scanned0.withColumn(dirCol, element_at(split(input_file_name(), "/"), -2))
      val base = logicalize(scanned, meta)
      val dataCols = base.columns.toSeq.filterNot(_ == dirCol)
      val dimSchema = org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField(
          dirCol, org.apache.spark.sql.types.StringType, nullable = false) +:
        partitionCols.map(c => org.apache.spark.sql.types.StructField(
          c, org.apache.spark.sql.types.StringType, nullable = false)))
      val dimRows = resolved.map { case (key, dir) =>
        org.apache.spark.sql.Row.fromSeq(
          Paths.get(dir).getFileName.toString +: valuesOf(key))
      }
      val dim = spark.createDataFrame(dimRows.asJava, dimSchema)
      base
        .join(broadcast(dim), Seq(dirCol))
        .select((dataCols ++ partitionCols).map(col): _*)
    }
  }

  /** Commit `batch`: every `partitionCols` combination present in it is
    * (re)placed as a whole; all other partitions carry over from the latest
    * manifest. Returns the committed version. Safe under concurrent
    * committers (optimistic retry; disjoint partitions never lose updates).
    */
  def commit(batch: DataFrame, partitionCols: Seq[String]): Long = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    Files.createDirectories(manifestsDir)
    Files.createDirectories(dataDir)
    // one immutable directory per touched partition, written before any
    // manifest race — losers retry only the (cheap) manifest merge
    val touched = touchedPartitions(batch, partitionCols)
    // an empty batch on a FRESH lake would commit a data-less manifest that
    // wedges read()/statsFor; there is nothing to commit either way
    require(touched.nonEmpty, "batch has no rows — nothing to commit")
    // batches arrive in LOGICAL names; files store physical ones (the
    // column-mapping contract). Meta is read once at staging time — a
    // rename racing a concurrent writer should quiesce writers first,
    // same as the lakehouse formats.
    val stageMeta = latestVersion.map(readMeta).getOrElse(Map.empty)
    val newDirs = stageDirs(physicalize(batch, stageMeta), partitionCols, touched)
    val stats = dirStats(newDirs)
    var committed = -1L
    while (committed < 0) {
      val v = latestVersion
      val (base, txns, meta) = v.map(readManifestAndTxns)
        .getOrElse((Map.empty[String, String], Map.empty[String, Long], Map.empty[String, String]))
      val next = v.getOrElse(0L) + 1
      // keep staged dirs inside vacuum's retention window while we race
      touchDirs(newDirs.values)
      // watermarks and column mapping carry forward untouched
      if (writeManifestAtomic(next, base ++ newDirs, txns,
          metaWithPartCols(meta, partitionCols) ++ stats)) committed = next
      // else: another writer took `next`; loop re-reads and re-merges
    }
    writeInfo(committed, "commit", newDirs.size)
    committed
  }

  /** Exactly-once [[commit]] for at-least-once producers (Structured
    * Streaming `foreachBatch`, retried jobs): the commit lands only if
    * `batchId` is NEWER than `appId`'s recorded watermark, and the
    * watermark update rides the same atomic manifest create as the data —
    * there is no state of the world with the data committed but the
    * watermark missing (or vice versa). A replayed batch (crash before the
    * checkpoint advanced, speculative rerun) returns None and stages
    * nothing; a race between two attempts of the SAME batch resolves to
    * exactly one winner through the optimistic version loop. An EMPTY
    * batch returns None without committing (no data needs replay
    * protection, and a data-less first commit would wedge `read`). This is
    * the lakehouse `txn`/appId idempotent-sink pattern.
    *
    * CHECKPOINT-LOSS CAVEAT (inherent to the pattern, exactly as in the
    * lakehouse formats): batch ids are meaningful only RELATIVE TO ONE
    * CHECKPOINT lineage. If the producer's checkpoint is lost and the
    * source replays from scratch, ids restart at 0 and this watermark
    * rejects them — including any NEW data bundled into those replayed
    * batches. Recovering from checkpoint loss therefore requires either a
    * fresh `appId` (plus downstream dedup of the re-delivered old rows) or
    * repositioning the source past the already-committed data. Never reuse
    * an old `appId` with a fresh checkpoint and expect new rows to land.
    */
  def commitIfNew(
      appId: String,
      batchId: Long,
      batch: DataFrame,
      partitionCols: Seq[String]): Option[Long] = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    // cheap pre-check before staging any data (re-checked under the race)
    if (lastTxn(appId).exists(_ >= batchId)) return None
    Files.createDirectories(manifestsDir)
    Files.createDirectories(dataDir)
    val touched = touchedPartitions(batch, partitionCols)
    if (touched.isEmpty) return None
    val stageMeta = latestVersion.map(readMeta).getOrElse(Map.empty)
    val newDirs = stageDirs(physicalize(batch, stageMeta), partitionCols, touched)
    val stats = dirStats(newDirs)
    var result: Option[Option[Long]] = None
    while (result.isEmpty) {
      val v = latestVersion
      val (base, txns, meta) = v.map(readManifestAndTxns)
        .getOrElse((Map.empty[String, String], Map.empty[String, Long], Map.empty[String, String]))
      if (txns.get(appId).exists(_ >= batchId)) {
        // lost the race to another attempt of this very batch: discard our
        // staged dirs (vacuum would get them; eager is kinder)
        newDirs.values.foreach(d => deleteRecursively(Paths.get(resolveDir(d))))
        result = Some(None)
      } else {
        val next = v.getOrElse(0L) + 1
        touchDirs(newDirs.values)
        if (writeManifestAtomic(next, base ++ newDirs, txns + (appId -> batchId),
            metaWithPartCols(meta, partitionCols) ++ stats)) {
          writeInfo(next, "commit", newDirs.size)
          result = Some(Some(next))
        }
      }
    }
    result.get
  }

  /** PK-grain latest-wins upsert with snapshot-isolated OPTIMISTIC
    * transactions — [[LakeCatalog.merge]] semantics carried by manifest
    * commits instead of lease locks. Unlike raw [[commit]] (partition-grain
    * last-writer-wins), concurrent SAME-partition upserts serialize
    * correctly: each attempt merges against the exact manifest it read,
    * commits only if that manifest is still latest (CREATE_NEW on the next
    * version is the compare-and-swap), and a loser deletes its staged
    * directories, re-reads, re-merges and retries — so the winner's rows are
    * folded in, not overwritten, and `versionCol` decides PK ties
    * deterministically regardless of commit order. No locks, no fencing, no
    * stale-holder takeover: a crashed writer leaves only unreferenced
    * directories for [[vacuum]].
    */
  def upsert(
      batch: DataFrame,
      pk: Seq[String],
      versionCol: String,
      partitionCols: Seq[String]): Long = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    // the merge is scoped to the batch's touched partitions, so a PK row
    // whose partition value changed would leave its stale copy behind in the
    // untouched old partition; requiring the partition columns inside the PK
    // makes "a PK never moves between partitions" structural
    require(partitionCols.forall(pk.contains),
      s"partition columns ${partitionCols.mkString(",")} must all be part of " +
        s"the PK ${pk.mkString(",")} — otherwise a PK row that changes " +
        "partition value duplicates across partitions")
    Files.createDirectories(manifestsDir)
    Files.createDirectories(dataDir)
    val touched = touchedPartitions(batch, partitionCols)
    require(touched.nonEmpty, "batch has no rows — nothing to upsert")
    val touchedKeys = touched.map(keyOf).toSet
    var committed = -1L
    while (committed < 0) {
      val base = latestVersion
      val (baseManifest, txns, meta) =
        base.map(readManifestAndTxns)
          .getOrElse((Map.empty[String, String], Map.empty[String, Long], Map.empty[String, String]))
      val existing = baseManifest.view.filterKeys(touchedKeys).toMap
      // evolving schemas merge with NULLs for absent columns, same as
      // read(); `current` comes back LOGICAL (readEntries applies the
      // column mapping), so it unions cleanly with the logical batch
      val current = Option.when(existing.nonEmpty)(
        readEntries(existing.toSeq.sorted, partitionCols, meta))
      val merged = LakeCatalog.merge(
        current.fold(batch)(c =>
          c.unionByName(batch.withColumns(
            // partition values travel as strings in the manifest key; align
            // the batch's so PK comparisons see one type
            partitionCols.map(c => c -> col(c).cast("string")).toMap),
            allowMissingColumns = true)),
        pk, versionCol)
      val newDirs = stageDirs(physicalize(merged, meta), partitionCols, touched)
      val next = base.getOrElse(0L) + 1
      touchDirs(newDirs.values)
      if (writeManifestAtomic(next, baseManifest ++ newDirs, txns,
          metaWithPartCols(meta, partitionCols) ++ dirStats(newDirs))) {
        committed = next
        writeInfo(committed, "upsert", newDirs.size)
      } else {
        // conflict: the merge is stale — drop staged dirs and retry
        newDirs.values.foreach(d => deleteRecursively(Paths.get(resolveDir(d))))
      }
    }
    committed
  }

  /** Row-grain MERGE with merge-on-read semantics — the deletion-vector
    * composition of [[upsert]] (the Delta/Iceberg merge-on-read contract):
    * matched PKs' current rows are DV-deleted (their data bytes never
    * rewrite) and the batch's winning rows APPEND, so merge cost tracks
    * the rows CHANGED, not the partition bytes touched — [[upsert]]
    * rewrites every touched partition wholesale. Latest-wins on
    * `versionCol` like [[upsert]], with the deterministic tie rule "the
    * batch wins on equal versions"; a batch row older than the table's
    * row neither lands nor deletes — against duplicate-PK table rows (a
    * legal lake state via [[commit]]/[[append]]) the gate is the per-PK
    * MAX table version, and a winning batch row displaces ALL of its
    * PK's duplicates at once. One atomic manifest commit carries
    * both sides, under the same optimistic CAS loop as [[deleteWhereDv]]:
    * a racing DV delete, upsert, or optimize fails the CAS and forces a
    * full rescan-and-retry — never a lost update.
    *
    * Mechanics under the one-directory-per-partition manifest: each
    * touched existing partition's new directory HARD-LINKS the old files
    * (an O(files) metadata operation — the filesystem-lake analog of
    * Delta's add-file log action; row bytes are never copied) and adopts
    * the staged batch files; existing DV addresses under a replaced leaf
    * (and the freshly matched addresses) are re-keyed to the new leaf in
    * one folded DV relation, so deletes stay attached to their files.
    * Time travel before the merge sees the old rows; [[changes]] across
    * it reports exactly the upserted PKs; [[optimize]] materializes the
    * pending deletes physically. Returns the committed version, or the
    * current one when every batch row lost (a no-op merge).
    *
    * `broadcastBatch` (default true) ships the batch's (pk, version)
    * projection to every scan task so the table side NEVER shuffles to
    * align PKs — the right plan whenever the batch is small against the
    * table, which is what merge-on-read is for. A batch too large to
    * broadcast sets it false and pays a keyed shuffle join instead.
    */
  def upsertDv(
      batch: DataFrame,
      pk: Seq[String],
      versionCol: String,
      partitionCols: Seq[String],
      broadcastBatch: Boolean = true): Long =
    upsertDvGated(batch, pk, versionCol, partitionCols, broadcastBatch, None).get

  /** Exactly-once [[upsertDv]] for at-least-once producers — the streaming
    * CDC-apply sink (`foreachBatch` merging a change stream into the lake):
    * the merge lands only if `batchId` is NEWER than `appId`'s recorded
    * watermark, and the watermark update rides the SAME atomic manifest
    * create as the merge itself — no state of the world with the rows
    * merged but the watermark missing, or vice versa ([[commitIfNew]]'s
    * txn discipline on the merge-on-read path). A replayed batch returns
    * None and stages nothing.
    *
    * Unlike [[commitIfNew]]'s empty-batch rule, a batch whose every row
    * LOSES the version comparison still records its watermark (a
    * metadata-only commit): "didn't land" is only stable while the table
    * rows that beat it survive — replaying it after a later DV delete of
    * those rows would resurrect data the merge had correctly discarded.
    * Same checkpoint-loss caveat as [[commitIfNew]].
    */
  def upsertDvIfNew(
      appId: String,
      batchId: Long,
      batch: DataFrame,
      pk: Seq[String],
      versionCol: String,
      partitionCols: Seq[String],
      broadcastBatch: Boolean = true): Option[Long] = {
    if (lastTxn(appId).exists(_ >= batchId)) return None
    upsertDvGated(batch, pk, versionCol, partitionCols, broadcastBatch,
      Some(appId -> batchId))
  }

  /** Link-merge staged partition directories with their existing ones:
    * old files re-enter the new directory by HARD LINK (O(files) metadata,
    * zero byte copy — the FS-lake analog of Delta's add-file action under
    * the one-dir-per-partition manifest), staged files adopt in place, a
    * staged key with no existing dir keeps its staged dir as-is. Returns
    * the new key→dir map plus the old-leaf → new-leaf map every DV address
    * under a replaced leaf must re-key through.
    */
  private def linkMergeDirs(
      stagedNew: Map[String, String],
      existing: Map[String, String]): (Map[String, String], Map[String, String]) = {
    val newDirs: Map[String, String] = stagedNew.map { case (key, sdir) =>
      existing.get(key) match {
        case None => key -> sdir // brand-new partition: staged dir as-is
        case Some(oldDir) =>
          val name = java.util.UUID.randomUUID().toString
          val nd = dataDir.resolve(name)
          Files.createDirectories(nd)
          def adopt(src: Path, link: Boolean): Unit = {
            val s = Files.list(src)
            try s.iterator().asScala.filter(Files.isRegularFile(_)).foreach { f =>
              val dst = nd.resolve(f.getFileName.toString)
              require(!Files.exists(dst),
                s"file name collision merging $src into $nd: ${f.getFileName}")
              if (link)
                try Files.createLink(dst, f)
                catch { case _: UnsupportedOperationException => Files.copy(f, dst) }
              else Files.move(f, dst)
            } finally s.close()
          }
          adopt(Paths.get(resolveDir(oldDir)), link = true)
          val sp = Paths.get(resolveDir(sdir))
          adopt(sp, link = false)
          deleteRecursively(sp)
          key -> s"data/$name"
      }
    }
    val leafMap: Map[String, String] = stagedNew.keysIterator.flatMap { k =>
      existing.get(k).map(od => Paths.get(od).getFileName.toString ->
        Paths.get(newDirs(k)).getFileName.toString)
    }.toMap
    (newDirs, leafMap)
  }

  /** Fold the DV relation for a link-merge commit: existing deletes
    * re-keyed WHERE THEIR LEAF WAS REPLACED plus any freshly displaced
    * addresses — ONE new DV directory; every DV dir whose recorded leaf
    * index ([[DvLeavesPrefix]]) is disjoint from the replaced leaves
    * carries BY REFERENCE, unread and unwritten, so merge DV cost tracks
    * the TOUCHED partitions' accumulated deletes, never the lake-wide
    * pile. Dirs without an index (legacy) re-fold conservatively and come
    * out indexed. Returns the new dir list plus the new dir's index
    * entry; the caller commits both and cleans up
    * `returned.toSet -- dvDirsOf(meta).toSet` on CAS failure.
    */
  private def foldDvs(
      meta: Map[String, String],
      leafMap: Map[String, String],
      displaced: Option[DataFrame]): (Seq[String], Map[String, String]) = {
    val oldDvDirs = dvDirsOf(meta)
    def idxOf(d: String): Option[Set[String]] =
      meta.get(DvLeavesPrefix + dvLeafName(d))
        .map(_.split(";").filter(_.nonEmpty).toSet)
    val replaced = leafMap.keySet
    // keep by reference: indexed AND provably disjoint from every
    // replaced leaf (no replacement at all keeps everything)
    val (keep, touch) =
      if (leafMap.isEmpty) (oldDvDirs, Seq.empty[String])
      else oldDvDirs.partition(d =>
        idxOf(d).exists(_.intersect(replaced).isEmpty))
    val mustFold = displaced.isDefined || touch.nonEmpty
    if (!mustFold) return (oldDvDirs, Map.empty)
    val parts = touch.headOption.map(_ =>
      spark.read.parquet(touch.map(resolveDir): _*)
        .select(col("__dv_file"), col("__dv_pos"))).toSeq ++ displaced.toSeq
    val all = parts.reduce(_ union _)
    val translated =
      if (leafMap.isEmpty) all
      else {
        val leaf = element_at(split(col("__dv_file"), "/"), 1)
        val file = element_at(split(col("__dv_file"), "/"), 2)
        val mapLit = map(leafMap.toSeq.sortBy(_._1)
          .flatMap { case (o, n) => Seq(lit(o), lit(n)) }: _*)
        all.withColumn("__dv_file",
          concat_ws("/", coalesce(element_at(mapLit, leaf), leaf), file))
      }
    val name = java.util.UUID.randomUUID().toString
    val newDir = s"data/$name"
    translated.distinct().write.parquet(resolveDir(newDir))
    val written = spark.read.parquet(resolveDir(newDir))
    if (written.isEmpty) {
      deleteRecursively(dataDir.resolve(name))
      (keep, Map.empty)
    } else
      (keep :+ newDir, Map(dvLeavesEntry(newDir, dvAddressedLeaves(written))))
  }

  private def upsertDvGated(
      batch: DataFrame,
      pk: Seq[String],
      versionCol: String,
      partitionCols: Seq[String],
      broadcastBatch: Boolean,
      gate: Option[(String, Long)]): Option[Long] = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    require(partitionCols.forall(pk.contains),
      s"partition columns ${partitionCols.mkString(",")} must all be part of " +
        s"the PK ${pk.mkString(",")} — otherwise a PK row that changes " +
        "partition value duplicates across partitions")
    require(!partitionCols.contains(versionCol),
      "versionCol cannot be a partition column")
    Files.createDirectories(manifestsDir)
    Files.createDirectories(dataDir)
    // fold within-batch duplicate PKs first, then PIN the result: the
    // match scan, the DV write, and the staging write must all see the
    // SAME rows — a re-evaluating non-deterministic batch could DV-delete
    // a row whose replacement never lands
    val b = LakeCatalog.merge(
      batch.withColumns(
        partitionCols.map(c => c -> col(c).cast("string")).toMap),
      pk, versionCol).localCheckpoint(true)
    val touched = touchedPartitions(b, partitionCols)
    require(touched.nonEmpty, "batch has no rows — nothing to upsert")
    val touchedKeys = touched.map(keyOf).toSet
    var committed = -1L
    while (committed < 0) {
      val baseOpt = latestVersion
      val (m, txns, meta) = baseOpt.map(readManifestAndTxns)
        .getOrElse((Map.empty[String, String], Map.empty[String, Long],
          Map.empty[String, String]))
      // replay / same-batch race check under the freshest manifest (top of
      // the round — nothing is staged yet, so returning stages nothing)
      gate.foreach { case (appId, batchId) =>
        if (txns.get(appId).exists(_ >= batchId)) return None
      }
      val existing = m.view.filterKeys(touchedKeys).toMap
      // ---- match scan: ONE pass over the touched EXISTING partitions
      // (pk + versionCol + row address only — column-pruned), joined
      // against the BROADCAST batch keys so the table side never shuffles.
      // NULL-safe PK alignment (partition components are non-null by
      // commit-time rejection; other PK components may legitimately be
      // NULL and must still match themselves). The matched set — bounded
      // by the batch's PK count (times any duplicate-PK table rows a
      // raw-commit lake may hold) — is pinned once and answers BOTH
      // downstream questions: who wins, and which addresses displace.
      def pkCond(l: String, r: String) =
        pk.map(c => col(s"$l.$c") <=> col(s"$r.$c")).reduce(_ && _)
      val matched: Option[DataFrame] = Option.when(existing.nonEmpty) {
        val t0 = readEntries(existing.toSeq.sorted, partitionCols, meta,
          exposeRowIds = true)
        // a table committed without the version column merges like
        // [[upsert]]'s unionByName-with-NULLs: its rows carry no version,
        // so any batch row wins
        val tVer = if (t0.columns.contains(versionCol)) col(versionCol)
          else lit(null)
        val t = t0.select(pk.map(col) ++ Seq(tVer.as("__t_ver"),
            col("__dv_file"), col("__dv_pos")): _*)
        val bv0 = b.select(pk.map(col) :+ col(versionCol).as("__b_ver"): _*)
        val bv = if (broadcastBatch) broadcast(bv0) else bv0
        t.alias("t").join(bv.alias("b"), pkCond("t", "b"))
          .select(pk.map(c => col(s"t.$c").as(c)) ++ Seq(col("__t_ver"),
            col("__b_ver"), col("__dv_file"), col("__dv_pos")): _*)
          .localCheckpoint(true)
      }
      // batch rows that WIN: unmatched, or at least the newest table
      // version of their PK (max over the matched rows — a winning batch
      // row displaces ALL duplicate table rows of its PK)
      val winners = (matched match {
        case None => b
        case Some(mt) =>
          val tv = mt.groupBy(pk.map(col): _*).agg(max(col("__t_ver")).as("__t_ver"))
          b.alias("b").join(tv.alias("t"), pkCond("b", "t"), "left")
            .filter(col("__t_ver").isNull ||
              col(s"b.$versionCol") >= col("__t_ver"))
            .select(b.columns.map(c => col(s"b.$c")).toSeq: _*)
      }).localCheckpoint(true)
      // ---- stage the winning rows (one Spark job, Hive layout)
      val touchedW = touchedPartitions(winners, partitionCols)
      if (touchedW.isEmpty) {
        // every batch row lost. Ungated: a pure no-op. Gated: the
        // watermark must still advance (see the upsertDvIfNew contract) —
        // a metadata-only commit under the same CAS
        gate match {
          case None => return Some(baseOpt.get)
          case Some((appId, batchId)) =>
            val next = baseOpt.getOrElse(0L) + 1
            if (writeManifestAtomic(next, m, txns + (appId -> batchId), meta)) {
              writeInfo(next, "dvupsert", 0)
              return Some(next)
            }
            // CAS lost: fall through to the next round's re-read
        }
      } else {
        val stagedNew = stageDirs(physicalize(winners, meta), partitionCols, touchedW)
        // ---- merged directories (hard-link merge) + DV re-keying: a
        // partition the batch only LOST against stays by reference (absent
        // from stagedNew); DV addresses are keyed `<dir-leaf>/<file>`, so
        // deletes riding the linked files must re-key or they detach
        val (newDirs, leafMap) = linkMergeDirs(stagedNew, existing)
        val oldDvDirs = dvDirsOf(meta)
        // displaced addresses: ALL table rows of a PK, but ONLY when the
        // batch row beats the per-PK MAX table version — the same gate
        // `winners` applies. Gating per-table-row instead would let a
        // LOSING batch row (older than the PK's newest table row) delete
        // the PK's older duplicates while its own row never lands,
        // silently shrinking the table. max() ignores NULLs, so a PK
        // whose every table row lacks the version column yields NULL →
        // any batch row wins, matching the unionByName-with-NULLs rule.
        val displaced: Option[DataFrame] = matched.map { mt =>
          val w = Window.partitionBy(pk.map(col): _*)
          mt.withColumn("__pk_max_ver", max(col("__t_ver")).over(w))
            .filter(col("__pk_max_ver").isNull ||
              col("__b_ver") >= col("__pk_max_ver"))
            .select(col("__dv_file"), col("__dv_pos"))
        }
        val (newDvList, dvIdx) = foldDvs(meta, leafMap, displaced)
        // ---- one atomic commit carries the merged dirs AND the folded DVs
        val next = baseOpt.getOrElse(0L) + 1
        val stats = dirStats(newDirs)
        touchDirs(newDirs.values ++ (newDvList.toSet -- oldDvDirs.toSet))
        if (writeManifestAtomic(next, m ++ newDirs, txns ++ gate.toMap,
            metaWithDvs(
              metaWithPartCols(meta, partitionCols) ++ stats ++ dvIdx,
              newDvList))) {
          committed = next
          writeInfo(committed, "dvupsert", newDirs.size)
        } else {
          // stale merge: drop this round's dirs (unlinking a merged dir only
          // removes the link names — the old dir's files are untouched)
          (newDirs.values.toSet ++ (newDvList.toSet -- oldDvDirs.toSet))
            .foreach(d => deleteRecursively(Paths.get(resolveDir(d))))
        }
      }
    }
    Some(committed)
  }

  /** True ROW-APPEND (SQL `INSERT INTO` semantics) — the third write grain
    * next to [[commit]] (partition REPLACE) and [[upsertDv]] (PK merge):
    * the batch's rows ADD to their partitions, existing rows keep, nothing
    * deletes. Zero rewrite via the same hard-link merge as [[upsertDv]]
    * (old files re-enter the new directory as links, staged files adopt;
    * existing DV addresses re-key across the leaf replacement), one atomic
    * manifest commit, the [[upsert]] optimistic CAS loop. Cost tracks the
    * batch plus O(files) metadata — never partition bytes.
    *
    * This is the operation `INSERT INTO ... USING graft` maps to
    * ([[graft.sources.GraftLakeProvider]]); using [[commit]] there would
    * silently REPLACE every touched partition.
    */
  def append(batch: DataFrame, partitionCols: Seq[String]): Long =
    appendGated(batch, partitionCols, gate = None).get

  /** Exactly-once row-append — [[append]] under the [[commitIfNew]] txn
    * watermark: a replayed `(appId, batchId)` is a no-op (None), so a
    * streaming sink replaying a micro-batch after a crash cannot
    * double-append its rows. The watermark rides the append's own atomic
    * manifest create; same checkpoint-loss caveat as [[commitIfNew]].
    */
  def appendIfNew(
      appId: String,
      batchId: Long,
      batch: DataFrame,
      partitionCols: Seq[String]): Option[Long] = {
    if (lastTxn(appId).exists(_ >= batchId)) return None
    appendGated(batch, partitionCols, Some(appId -> batchId))
  }

  private def appendGated(
      batch: DataFrame,
      partitionCols: Seq[String],
      gate: Option[(String, Long)]): Option[Long] = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    Files.createDirectories(manifestsDir)
    Files.createDirectories(dataDir)
    val touched = touchedPartitions(batch, partitionCols)
    require(touched.nonEmpty, "batch has no rows — nothing to append")
    val touchedKeys = touched.map(keyOf).toSet
    var committed = -1L
    while (committed < 0) {
      val baseOpt = latestVersion
      val (m, txns, meta) = baseOpt.map(readManifestAndTxns)
        .getOrElse((Map.empty[String, String], Map.empty[String, Long],
          Map.empty[String, String]))
      // replay check under the freshest manifest, BEFORE staging anything
      gate.foreach { case (appId, batchId) =>
        if (txns.get(appId).exists(_ >= batchId)) return None
      }
      val existing = m.view.filterKeys(touchedKeys).toMap
      val stagedNew = stageDirs(physicalize(batch, meta), partitionCols, touched)
      val (newDirs, leafMap) = linkMergeDirs(stagedNew, existing)
      val oldDvDirs = dvDirsOf(meta)
      val (newDvList, dvIdx) = foldDvs(meta, leafMap, displaced = None)
      val next = baseOpt.getOrElse(0L) + 1
      val stats = dirStats(newDirs)
      touchDirs(newDirs.values ++ (newDvList.toSet -- oldDvDirs.toSet))
      if (writeManifestAtomic(next, m ++ newDirs, txns ++ gate.toMap,
          metaWithDvs(
            metaWithPartCols(meta, partitionCols) ++ stats ++ dvIdx,
            newDvList))) {
        committed = next
        writeInfo(committed, "append", newDirs.size)
      } else {
        (newDirs.values.toSet ++ (newDvList.toSet -- oldDvDirs.toSet))
          .foreach(d => deleteRecursively(Paths.get(resolveDir(d))))
      }
    }
    Some(committed)
  }

  /** Transactional row deletion (the GDPR/right-to-erasure lake op):
    * rewrite every live partition without the matching rows, committed as
    * one atomic manifest — readers see all deletions or none, and earlier
    * snapshots still contain the rows until [[vacuum]] reclaims them (run
    * `vacuum(1)` after a legal-erasure delete for physical removal). Same
    * optimistic loop as [[upsert]].
    *
    * Partitions the predicate cannot touch are NOT rewritten: one pruned
    * candidate scan (a single multi-path read whose pushed-down predicate
    * lets parquet skip row groups via footer stats) finds the partitions
    * that actually contain matching rows; every other partition carries over
    * BY REFERENCE — same directory, zero rewrite I/O — so a selective delete
    * on a 100 TB lake costs the candidate scan plus the rewrite of only the
    * partitions it hit. Candidate partitions whose rewrite is row-free drop
    * out of the manifest entirely.
    */
  def deleteWhere(predicate: org.apache.spark.sql.Column, partitionCols: Seq[String]): Long = {
    var committed = -1L
    while (committed < 0) {
      val base = latestVersion.getOrElse(
        throw new IllegalStateException(s"no commits at $root"))
      val (baseManifest, baseTxns, meta) = readManifestAndTxns(base)
      // DELETE WHERE semantics: remove only rows where the predicate is
      // TRUE — a NULL-evaluating predicate (e.g. equality against a NULL
      // column) keeps its row, exactly as SQL DELETE would. The predicate
      // is written in LOGICAL names; readEntries surfaces logical columns.
      val hit = coalesce(predicate, lit(false))
      val candidates = readEntries(baseManifest.toSeq.sorted, partitionCols, meta)
        .filter(hit)
        .select(partitionCols.map(col): _*).distinct().collect()
        .map(r => keyOf(partitionCols.indices.map(i => String.valueOf(r.get(i)))))
        .toSet
      // ONE rewrite job over exactly the candidate partitions (the former
      // one-job-per-candidate driver loop made a selective delete's latency
      // linear in candidate count): read them together, drop matching rows,
      // stage Hive-layout. A candidate absent from the staged map lost all
      // its rows — it drops out of the manifest entirely.
      val staged: Map[String, String] =
        if (candidates.isEmpty) Map.empty
        else stagePartitioned(
          physicalize(readEntries(
            baseManifest.filter { case (k, _) => candidates.contains(k) }.toSeq.sorted,
            partitionCols, meta).filter(!hit), meta),
          partitionCols)
      val rewritten: Map[String, Option[String]] = baseManifest.map { case (key, dirIn) =>
        if (!candidates.contains(key)) key -> Some(dirIn) // untouched: by reference
        else key -> staged.get(key)
      }
      val next = base + 1
      val manifest = rewritten.collect { case (k, Some(d)) => k -> d }
      if (manifest.isEmpty)
        throw new IllegalStateException("deleteWhere would empty the lake; refusing to commit")
      if (writeManifestAtomic(next, manifest, baseTxns,
        metaWithPartCols(meta, partitionCols) ++ dirStats(staged))) {
        committed = next
        writeInfo(committed, "delete", candidates.size)
      } else candidates.foreach(k => rewritten(k).foreach(
        d => deleteRecursively(Paths.get(resolveDir(d)))))
    }
    committed
  }

  /** Row-level delete WITHOUT rewriting any data — deletion vectors (the
    * Iceberg position-delete / Delta DV shape), the scale path next to
    * [[deleteWhere]]'s whole-partition rewrite: cost tracks the rows
    * DELETED (one scan to find them + one small parquet write of their
    * addresses), not the partitions touched. Matching rows' stable
    * addresses (`<dir-leaf>/<file>` + parquet row index) land in a DV
    * relation; every read at or after this version anti-joins the scan
    * against it. Time travel before the commit still sees the rows;
    * [[deleteWhere]]/[[optimize]]/[[upsert]] rewrites MATERIALIZE pending
    * deletes for the partitions they touch (they read through the DV
    * filter). Same SQL DELETE semantics as [[deleteWhere]]: NULL
    * predicates keep their rows. A predicate matching nothing is a no-op
    * (no new version). [[changes]] across a DV commit conservatively
    * diffs every partition (the manifest map is unchanged — row loss is
    * only visible in the data).
    */
  def deleteWhereDv(
      predicate: org.apache.spark.sql.Column, partitionCols: Seq[String]): Long = {
    var committed = -1L
    while (committed < 0) {
      val base = latestVersion.getOrElse(
        throw new IllegalStateException(s"no commits at $root"))
      val (m, txns, meta) = readManifestAndTxns(base)
      val hit = coalesce(predicate, lit(false))
      Files.createDirectories(dataDir)
      val name = java.util.UUID.randomUUID().toString
      val dvDir = s"data/$name"
      readEntries(m.toSeq.sorted, partitionCols, meta, exposeRowIds = true)
        .filter(hit)
        .select(col("__dv_file"), col("__dv_pos"))
        .write.parquet(resolveDir(dvDir))
      val written = spark.read.parquet(resolveDir(dvDir))
      if (written.isEmpty) {
        deleteRecursively(dataDir.resolve(name))
        return base // nothing matched — a no-op, not a new version
      }
      touchDirs(Seq(dvDir))
      if (writeManifestAtomic(base + 1, m, txns,
          metaWithDvs(meta + dvLeavesEntry(dvDir, dvAddressedLeaves(written)),
            dvDirsOf(meta) :+ dvDir))) {
        committed = base + 1
        writeInfo(committed, "dvdelete", 0)
      } else deleteRecursively(dataDir.resolve(name))
    }
    committed
  }

  /** Fold an accumulation of deletion-vector commits into ONE compacted DV
    * relation (a new commit; the old dirs become vacuum-reclaimable once
    * their manifests age out). Dead addresses — rows whose files are no
    * longer referenced by the LATEST manifest because a rewrite
    * materialized their deletes — are dropped during the fold, so the DV
    * relation every read anti-joins shrinks back to what still matters.
    * Returns the new version (or the current one when there is nothing to
    * compact).
    */
  def compactDeletes(): Long = {
    var committed = -1L
    while (committed < 0) {
      val base = latestVersion.getOrElse(
        throw new IllegalStateException(s"no commits at $root"))
      val (m, txns, meta) = readManifestAndTxns(base)
      val dvDirs = dvDirsOf(meta)
      if (dvDirs.size <= 1) return base
      // live addresses only: a DV row whose dir-leaf is no longer in the
      // manifest points at vacuumed/rewritten data — dead weight
      val liveLeaves = m.values.map(d => Paths.get(d).getFileName.toString).toSeq
      val folded = spark.read.parquet(dvDirs.map(resolveDir): _*)
        .select(col("__dv_file"), col("__dv_pos")).distinct()
        .filter(element_at(split(col("__dv_file"), "/"), 1).isin(liveLeaves: _*))
      val name = java.util.UUID.randomUUID().toString
      val newDir = s"data/$name"
      folded.write.parquet(resolveDir(newDir))
      val writtenBack = spark.read.parquet(resolveDir(newDir))
      val (newDvs, idx) =
        if (writtenBack.isEmpty) {
          deleteRecursively(dataDir.resolve(name))
          (Seq.empty[String], Map.empty[String, String])
        } else
          (Seq(newDir), Map(dvLeavesEntry(newDir, dvAddressedLeaves(writtenBack))))
      touchDirs(newDvs)
      if (writeManifestAtomic(base + 1, m, txns, metaWithDvs(meta ++ idx, newDvs))) {
        committed = base + 1
        writeInfo(committed, "dvcompact", 0)
      } else deleteRecursively(dataDir.resolve(name))
    }
    committed
  }

  /** Small-file compaction as a TRANSACTION — the lakehouse OPTIMIZE.
    * Each live partition whose file count exceeds its bin-packed target
    * (`ceil(bytes / targetBytes)`, planned from file SIZES alone — no data
    * scan) is rewritten into that many files and the new layout is
    * committed as one new manifest version. Content is unchanged, only
    * file boundaries move; earlier snapshots stay readable until [[vacuum]]
    * reclaims the loose files. Partitions already at their packed count
    * carry over BY REFERENCE, so steady-state optimize cost tracks the
    * small-file backlog, not the table. (In-place dir compaction is
    * [[graft.sinks.Compact]]; this is the immutable-snapshot form.)
    *
    * Concurrency: an optimize must never clobber data committed while it
    * was rewriting. The merge substitutes a rewritten directory ONLY where
    * the latest manifest still references the exact directory the rewrite
    * read (the [[upsert]] CAS discipline); a partition replaced mid-flight
    * keeps the concurrent writer's directory and this rewrite of stale
    * bytes is discarded. If every rewrite was overtaken, nothing commits.
    *
    * Returns the committed version (or the current latest when there was
    * nothing to do).
    *
    * With `zorderCols` set, every live partition is rewritten z-order
    * clustered on those columns ([[graft.ops.ZOrder.writeZOrdered]] — the
    * OPTIMIZE ZORDER BY form): each output file covers one contiguous
    * z-range, so [[readPruned]]/[[statsFor]] consumers skip most files on
    * any of the clustered dimensions. Z-ordering rewrites even
    * already-packed partitions (clustering changes layout, not just file
    * count); the columns must exist with non-null values in every live
    * partition's schema.
    */
  def optimize(
      targetBytes: Long = 128L * 1024 * 1024,
      zorderCols: Seq[String] = Seq.empty): Long = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val base = latestVersion.getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    val baseManifest = readManifest(base)
    val baseMeta = readMeta(base)
    // plan from file SIZES alone (driver-side metadata listing, no data scan)
    val plan: Seq[(String, Path, Int)] = baseManifest.toSeq.sorted.flatMap {
      case (key, dirIn) =>
        val dir = Paths.get(resolveDir(dirIn))
        val files = {
          val s = Files.list(dir)
          try s.iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
          finally s.close()
        }
        val total = files.map(Files.size).sum
        val numOut = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
        if (zorderCols.isEmpty && files.size <= numOut) None
        else Some((key, dir, numOut))
    }
    // per-dir rewrites keep each partition's exact packed file count, its
    // own (possibly pre-evolution) schema, and the z-order clustering — but
    // run through a BOUNDED pool of concurrent Spark jobs (the Delta
    // OPTIMIZE shape) instead of a driver-sequential loop, so a small-file
    // backlog across many partitions compacts at pool parallelism, not one
    // tiny job at a time
    val rewrites: Map[String, String] =
      if (plan.isEmpty) Map.empty
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(8, plan.size))
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutorService(pool)
        try {
          val fs = plan.map { case (key, dir, numOut) =>
            scala.concurrent.Future {
              val name = java.util.UUID.randomUUID().toString
              // read THROUGH the deletion vectors: a raw rewrite would
              // resurrect DV-deleted rows — optimize is exactly where
              // pending deletes materialize physically
              val src = applyDvs(spark.read.parquet(dir.toString), baseMeta)
              if (zorderCols.nonEmpty)
                graft.ops.ZOrder.writeZOrdered(
                  src, zorderCols, dataDir.resolve(name).toString, numOut)
              else
                src.coalesce(numOut).write.parquet(dataDir.resolve(name).toString)
              key -> s"data/$name"
            }
          }
          scala.concurrent.Await.result(
            scala.concurrent.Future.sequence(fs),
            scala.concurrent.duration.Duration.Inf).toMap
        } finally pool.shutdown()
      }
    if (rewrites.isEmpty) return base
    var committed = -1L
    while (committed < 0) {
      val v = latestVersion.getOrElse(base)
      val (m, txns, meta) = readManifestAndTxns(v)
      // a deletion-vector commit racing this optimize leaves the partition
      // map unchanged (so the dir compare below can't see it) but our
      // rewrites materialized only the OLD vectors — committing them would
      // silently drop the newer deletes' effect on the rewritten dirs.
      // Bail out; the caller re-runs optimize against the new state.
      if (dvDirsOf(meta) != dvDirsOf(baseMeta)) {
        rewrites.values.foreach(d => deleteRecursively(Paths.get(resolveDir(d))))
        return v
      }
      val merged = m.map { case (k, d) =>
        if (baseManifest.get(k).contains(d)) k -> rewrites.getOrElse(k, d)
        else k -> d // partition replaced since we planned: keep theirs
      }
      if (merged == m) {
        // every rewrite overtaken (or its partition deleted): discard all
        rewrites.values.foreach(d => deleteRecursively(Paths.get(resolveDir(d))))
        return v
      }
      // an OPTIMIZE rewrite preserves rows exactly (modulo materialized
      // DV deletes, which only REMOVE rows), so the old dir's partition
      // stats stay at-least-as-wide for the new dir — carrying them is
      // conservative-correct for pruning (writeManifestAtomic drops the
      // old-leaf entries as unreferenced)
      val carriedStats = rewrites.flatMap { case (k, newDir) =>
        if (!merged.get(k).contains(newDir)) None
        else for {
          oldDir <- baseManifest.get(k)
          stats <- meta.get(StatsKeyPrefix + Paths.get(oldDir).getFileName.toString)
        } yield (StatsKeyPrefix + Paths.get(newDir).getFileName.toString) -> stats
      }
      touchDirs(rewrites.values)
      if (writeManifestAtomic(v + 1, merged, txns, meta ++ carriedStats)) {
        committed = v + 1
        val applied = rewrites.count { case (k, d) => merged.get(k).contains(d) }
        writeInfo(committed, "optimize", applied)
        // rewrites that lost their partition to a concurrent writer are
        // stale bytes nothing references — reclaim them eagerly
        rewrites.foreach { case (k, d) =>
          if (!merged.get(k).contains(d))
            deleteRecursively(Paths.get(resolveDir(d)))
        }
      }
    }
    committed
  }

  /** Partition keys whose data directory differs between two versions
    * (added, removed, or replaced) — a pure manifest compare, no data I/O.
    * Directories are immutable, so a differing dir is the EXACT condition
    * for "this partition may contain changed rows". Conservative across an
    * [[optimize]] boundary (rewritten dirs hold identical rows — the row
    * diff then correctly reports nothing).
    */
  def changedPartitions(fromVersion: Long, toVersion: Long): Set[String] = {
    val a = manifestForChanges(fromVersion)
    val b = manifestForChanges(toVersion)
    // a deletion-vector commit changes ROWS without touching the partition
    // map — when the DV sets differ, every partition is conservatively
    // changed (the row-level diff then reports exactly the deleted rows)
    if (readMeta(fromVersion).getOrElse("dv", "") != readMeta(toVersion).getOrElse("dv", ""))
      a.keySet ++ b.keySet
    else (a.keySet ++ b.keySet).filter(k => a.get(k) != b.get(k))
  }

  /** Manifest read for the change feed, failing with a NAMED error when the
    * requested version has been reclaimed by [[vacuum]] (which drops old
    * manifests past `keepLast`) — a raw missing-file error here would read
    * as corruption, and silently returning empty would make the feed claim
    * "no changes" against a baseline that no longer exists.
    */
  private def manifestForChanges(v: Long): Map[String, String] = {
    if (!Files.exists(manifestPath(v)))
      throw new IllegalStateException(
        s"version $v is not available at $root — vacuumed (or never committed); " +
          s"live versions: [${versions.mkString(",")}]. A change feed cannot be " +
          "computed from a reclaimed snapshot; re-baseline from a full read of a " +
          "live version")
    readManifest(v)
  }

  /** Change data feed between two versions: row-level deltas computed ONLY
    * over [[changedPartitions]] — untouched partitions are never scanned,
    * so the cost tracks what changed, not the table. Returns the full row
    * plus `_change` ∈ insert / delete / update_pre / update_post (the
    * Delta CDF vocabulary): `insert` rows exist only at `toVersion`,
    * `delete` only at `fromVersion`, and a PK present in both with ANY
    * non-PK difference emits its before image as `update_pre` and after
    * image as `update_post`. PK-identical rows are suppressed.
    *
    * Rows are matched on `pk` (which must include the partition columns —
    * the [[upsert]] "rows never move between partitions" contract) and
    * compared as whole structs; under schema evolution a column absent at
    * `fromVersion` reads as NULL there, so rows gaining a value surface as
    * updates — exactly what a downstream consumer must reprocess.
    */
  def changes(
      fromVersion: Long,
      toVersion: Long,
      pk: Seq[String],
      partitionCols: Seq[String]): DataFrame = {
    require(pk.nonEmpty, "need a primary key to align rows across versions")
    require(partitionCols.forall(pk.contains),
      s"pk (${pk.mkString(",")}) must include every partition column " +
        s"(${partitionCols.mkString(",")}) — rows must not move between partitions")
    // every branch (and [[changesForConsumer]]'s bootstrap) returns the
    // SAME column order — (_change, pk..., dataCols...) — so positional
    // consumers can union bootstrap and delta frames safely
    def canon(df: DataFrame): DataFrame = {
      val cols = df.columns.filterNot(_ == "_change").toSeq
      val ordered = pk.filter(cols.contains) ++ cols.filterNot(pk.contains)
      df.select((col("_change") +: ordered.map(col)): _*)
    }
    val changed = changedPartitions(fromVersion, toVersion)
    if (changed.isEmpty)
      return canon(read(partitionCols, Some(toVersion)).limit(0)
        .withColumn("_change", lit("")))
    def side(v: Long): Option[DataFrame] = {
      // each version reads under ITS OWN column mapping, so a rename
      // between the two versions still aligns rows by logical name
      val entries = readManifest(v).filter { case (k, _) => changed.contains(k) }
      if (entries.isEmpty) None
      else Some(readEntries(entries.toSeq.sorted, partitionCols, readMeta(v)))
    }
    val oldS = side(fromVersion)
    val newS = side(toVersion)
    (oldS, newS) match {
      case (None, None) => // unreachable: changed non-empty implies a side
        canon(read(partitionCols, Some(toVersion)).limit(0).withColumn("_change", lit("")))
      case (None, Some(n)) => canon(n.withColumn("_change", lit("insert")))
      case (Some(o), None) => canon(o.withColumn("_change", lit("delete")))
      case (Some(oRaw), Some(n)) =>
        // a widen between the versions leaves the old side narrow — up-cast
        // it to the new side's type so the PK join and struct compares
        // align (lossless by the widenColumn contract; rows differing only
        // in representation stay suppressed)
        val o = oRaw.schema.fields.foldLeft(oRaw) { (d, f) =>
          n.schema.fields.find(_.name == f.name) match {
            case Some(nf) if nf.dataType != f.dataType && widensTo(f.dataType, nf.dataType) =>
              d.withColumn(f.name, col(f.name).cast(nf.dataType))
            case _ => d
          }
        }
        // align schemas (evolution: missing columns read as NULL)
        val allCols = (o.columns ++ n.columns).distinct.toSeq
        def pad(df: DataFrame) = allCols.foldLeft(df)((d, c) =>
          if (d.columns.contains(c)) d else d.withColumn(c, lit(null)))
        val dataCols = allCols.filterNot(pk.contains)
        val rowStruct = (df: DataFrame) => struct(dataCols.map(df.apply): _*)
        val po = pad(o).alias("o")
        val pn = pad(n).alias("n")
        val joinCond = pk.map(c => col(s"o.$c") <=> col(s"n.$c")).reduce(_ && _)
        val joined = po.join(pn, joinCond, "full_outer")
        // side-presence probe: partition columns are non-null by commit-time
        // rejection, so a NULL here means "row absent on this side" even
        // when other PK components are legitimately NULL
        val oPk = col(s"o.${partitionCols.head}")
        val nPk = col(s"n.${partitionCols.head}")
        val oRow = struct((pk ++ dataCols).map(c => col(s"o.$c").as(c)): _*)
        val nRow = struct((pk ++ dataCols).map(c => col(s"n.$c").as(c)): _*)
        // NULL-safe struct compare: <=> over the whole data payload; rows
        // identical across versions drop here (optimize-only boundaries
        // then emit zero events)
        val same = rowStruct(po) <=> rowStruct(pn)
        val tagged = joined
          .filter(oPk.isNull || nPk.isNull || !same)
          .select(
            when(oPk.isNull, array(struct(lit("insert").as("_change"), nRow.as("r"))))
              .when(nPk.isNull, array(struct(lit("delete").as("_change"), oRow.as("r"))))
              .otherwise(array(
                struct(lit("update_pre").as("_change"), oRow.as("r")),
                struct(lit("update_post").as("_change"), nRow.as("r"))))
              .as("_evs"))
        canon(tagged
          .select(explode(col("_evs")).as("_ev"))
          .select(col("_ev._change").as("_change"), col("_ev.r.*")))
    }
  }

  /** Delta-style RESTORE: make `version`'s content the LATEST state again
    * as a NEW commit whose manifest references that version's immutable
    * data directories — zero data I/O, pure metadata, exactly the
    * by-reference carry-over [[optimize]] uses. History is append-only
    * (the rollback is itself a commit, auditable via [[history]]), the
    * restored directories become live again so [[vacuum]] keeps them, and
    * [[changes]] across the restore boundary reports precisely the rows
    * that reverted. Exactly-once watermarks carry forward from the CURRENT
    * latest, not the restored version — a restore moves data back, never
    * the idempotence clock (replaying an already-committed batch after a
    * restore must still be a no-op).
    *
    * Restoring a vacuumed version fails with the same named error as the
    * change feed ([[manifestForChanges]]) — its data is gone.
    */
  /** SCD Type-2 materialization from the version history: one row per
    * (primary key × value incarnation) with `valid_from_version` /
    * `valid_to_version` (NULL = still current) — the
    * slowly-changing-dimension view warehouses keep by hand, derived here
    * mechanically from the lake's own commits. "When did this device's
    * config change, and what was it before" becomes a plain filter.
    *
    * Construction: the FIRST live version's full snapshot opens every
    * initial interval; each subsequent version contributes only its
    * [[changes]] delta (manifest-diff pruned — cost tracks what changed,
    * never the table), where inserts/update-posts OPEN intervals and
    * deletes CLOSE them. One keyed window (`lead` over version per PK)
    * then assigns each interval its end. History length bounds the driver
    * loop; vacuumed spans fail with the named [[manifestForChanges]]
    * error, the CDF contract.
    */
  def scd2(pk: Seq[String], partitionCols: Seq[String]): DataFrame = {
    val vs = versions
    require(vs.nonEmpty, s"no commits at $root")
    val base = read(partitionCols, Some(vs.head))
      .withColumn("_v", lit(vs.head))
      .withColumn("_kind", lit("open"))
    val steps = vs.sliding(2).collect { case Seq(a, b) =>
      changes(a, b, pk, partitionCols)
        .filter(col("_change").isin("insert", "update_post", "delete"))
        .withColumn("_v", lit(b))
        .withColumn("_kind",
          when(col("_change") === "delete", lit("close")).otherwise(lit("open")))
        .drop("_change")
    }.toSeq
    val all = steps.foldLeft(base)(_.unionByName(_, allowMissingColumns = true))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pk.map(col): _*).orderBy(col("_v"))
    all
      .withColumn("_valid_to", lead(col("_v"), 1).over(w))
      .filter(col("_kind") === "open")
      .drop("_kind")
      .withColumnRenamed("_v", "valid_from_version")
      .withColumnRenamed("_valid_to", "valid_to_version")
  }

  /** Shallow (zero-copy) clone: start a NEW lake at `dstRoot` whose first
    * manifest references this lake's data directories by ABSOLUTE path —
    * no data I/O, the Delta `SHALLOW CLONE` shape. The clone then lives
    * its own life: commits/upserts/deletes at the clone stage fresh
    * directories under ITS root and only re-reference the source for
    * partitions still untouched — the experiment-on-production-data
    * workflow without a copy. Stream watermarks carry over, so a producer
    * replaying into the clone keeps exactly-once semantics from the clone
    * point.
    *
    * THE SHARED-DATA CAVEAT (inherent to shallow clones everywhere):
    * `vacuum` on the SOURCE only knows the source's own manifests — it can
    * reclaim directories the clone still references, after which clone
    * reads of those partitions fail loudly (path not found), never
    * silently empty. Vacuum at the CLONE is safe: reclamation is rooted at
    * the clone's `data/` dir, which contains only directories the clone
    * itself staged. Cloning a vacuumed version fails with the
    * [[manifestForChanges]] named error.
    */
  def cloneTo(dstRoot: String, version: Option[Long] = None): Long = {
    val v = version.orElse(latestVersion).getOrElse(
      throw new IllegalStateException(s"cannot clone: no commits at $root"))
    val src = manifestForChanges(v)
    require(src.nonEmpty, s"empty manifest v$v")
    val absolute = src.map { case (k, d) => k -> resolveDir(d) }
    // deletion vectors reference by-path too: absolute them the same way
    val srcMeta = readMeta(v)
    val cloneMeta = metaWithDvs(srcMeta, dvDirsOf(srcMeta).map(resolveDir))
    val txns = readTxns(v)
    val dst = new SnapshotLake(spark, dstRoot)
    require(dst.latestVersion.isEmpty,
      s"clone target $dstRoot already has commits — refusing to overwrite a live lake")
    Files.createDirectories(dst.manifestsDir)
    Files.createDirectories(dst.dataDir)
    require(dst.writeManifestAtomic(1L, absolute, txns, cloneMeta),
      s"clone target $dstRoot gained a concurrent commit — aborting")
    dst.writeInfo(1L, "clone", absolute.size)
    1L
  }

  def restore(version: Long): Long = {
    val target = manifestForChanges(version)
    require(target.nonEmpty, s"empty manifest v$version")
    var committed = -1L
    while (committed < 0) {
      val latest = latestVersion.getOrElse(
        throw new IllegalStateException(s"no commits at $root"))
      val txns = readTxns(latest)
      touchDirs(target.values)
      // the restored version's SCHEMA comes back with its data: reading
      // the restore under the latest mapping would mis-name pre-rename
      // physicals
      if (writeManifestAtomic(latest + 1, target, txns, readMeta(version))) {
        committed = latest + 1
        writeInfo(committed, "restore", target.size)
      }
    }
    committed
  }

  /** Rename a data column WITHOUT rewriting any data (Delta/Iceberg
    * column-mapping semantics): a new metadata-only commit maps the
    * column's stable PHYSICAL name to the new LOGICAL name. Reads at or
    * after this version surface `newName`; time travel before it still
    * surfaces `oldName`; batches committed after it use `newName`
    * (translated back to the physical name at staging, so every data file
    * keeps one consistent physical schema). The old name's STORAGE stays
    * reserved — reintroducing it as a new column is refused until the
    * rename is reverted (rename back, or [[restore]]) — because old files
    * still hold its data and mergeSchema would resurrect it under the new
    * column. Renaming PARTITION columns is out of scope (their names are
    * caller-supplied at read time, not stored).
    */
  def renameColumn(oldName: String, newName: String): Long = {
    require(oldName != newName, s"rename to the same name: $oldName")
    require(newName.nonEmpty && !newName.contains("\t") && !newName.contains("\n"),
      s"invalid column name: '$newName'")
    var committed = -1L
    while (committed < 0) {
      val v = latestVersion.getOrElse(
        throw new IllegalStateException(s"no commits at $root"))
      val (m, txns, meta) = readManifestAndTxns(v)
      val mapping = colMapOf(meta)
      val dropped = droppedOf(meta)
      // current logical schema: footer-only inference over the live dirs
      val physCols = scanDirs(m.values.toSeq.sorted.map(resolveDir), meta)
        .columns.toSet -- dropped
      val logicalCols = physCols.map(p => mapping.getOrElse(p, p))
      require(logicalCols.contains(oldName),
        s"unknown column '$oldName' — logical columns: ${logicalCols.toSeq.sorted.mkString(", ")}")
      require(!logicalCols.contains(newName),
        s"column '$newName' already exists")
      val physical = mapping.collectFirst { case (p, l) if l == oldName => p }
        .getOrElse(oldName)
      // renaming BACK to this column's own physical name releases its own
      // reservation — only OTHER retired names stay off-limits
      require(physical == newName || !retiredOf(meta).contains(newName),
        s"'$newName' is a retired physical name (renamed away or dropped) — " +
          "its storage is still reserved by old data files")
      // renaming back to the physical name removes the mapping entirely
      val newMapping =
        if (physical == newName) mapping - physical
        else mapping - physical + (physical -> newName)
      if (writeManifestAtomic(v + 1, m, txns, metaWith(meta, newMapping, dropped))) {
        committed = v + 1
        writeInfo(committed, "rename", 0)
      }
    }
    committed
  }

  /** Hide a data column from every read at or after this version — a lazy,
    * zero-rewrite drop: the data stays in existing files (time travel
    * before this version still reads it; [[deleteWhere]]/[[optimize]]
    * rewrites shed it physically). The name's storage stays reserved, like
    * a renamed-away column.
    */
  def dropColumn(name: String): Long = {
    var committed = -1L
    while (committed < 0) {
      val v = latestVersion.getOrElse(
        throw new IllegalStateException(s"no commits at $root"))
      val (m, txns, meta) = readManifestAndTxns(v)
      val mapping = colMapOf(meta)
      val dropped = droppedOf(meta)
      val physCols = scanDirs(m.values.toSeq.sorted.map(resolveDir), meta)
        .columns.toSet -- dropped
      val logicalCols = physCols.map(p => mapping.getOrElse(p, p))
      require(logicalCols.contains(name),
        s"unknown column '$name' — logical columns: ${logicalCols.toSeq.sorted.mkString(", ")}")
      require(logicalCols.size > 1, s"refusing to drop the last data column '$name'")
      val physical = mapping.collectFirst { case (p, l) if l == name => p }
        .getOrElse(name)
      // a dropped column's widening entry is dead metadata — strip it. Safe
      // even when pre-widen (narrow) and post-widen (wide) files coexist:
      // scanDirs excludes dropped physicals from the explicit read schema,
      // so their footers are never asked to agree and their bytes are never
      // read (the physical name stays reserved via `dropped` regardless)
      val prunedTypes = metaWithTypes(meta, typeMapOf(meta) - physical)
      if (writeManifestAtomic(v + 1, m, txns,
          metaWith(prunedTypes, mapping - physical, dropped + physical))) {
        committed = v + 1
        writeInfo(committed, "drop", 0)
      }
    }
    committed
  }

  /** Widen a data column's type WITHOUT rewriting any data — the other
    * half of the Delta/Iceberg schema-evolution contract next to
    * [[renameColumn]]/[[dropColumn]]: a metadata-only commit registers the
    * wider logical type; reads at or after this version surface it (the
    * parquet scan up-converts old narrow files in place via an explicit
    * read schema), new batches store it physically, and time travel before
    * this version still reads the narrow type. Only lossless widenings are
    * accepted — byte→short→int→long within integrals, float→double within
    * fractionals, decimal(p,s)→decimal(p′,s′) when neither the integer
    * digits nor the scale shrink; narrowing or cross-family changes are
    * REFUSED loudly
    * (they would corrupt silently on overflow/precision loss). `to` is a
    * catalog type string (`"bigint"`, `"double"`, ...).
    */
  def widenColumn(name: String, to: String): Long = {
    val target = org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseDataType(to)
    var committed = -1L
    while (committed < 0) {
      val v = latestVersion.getOrElse(
        throw new IllegalStateException(s"no commits at $root"))
      val (m, txns, meta) = readManifestAndTxns(v)
      val mapping = colMapOf(meta)
      val dropped = droppedOf(meta)
      val schema = scanDirs(m.values.toSeq.sorted.map(resolveDir), meta).schema
      val physFields = schema.fields.filterNot(f => dropped.contains(f.name))
      val logicalCols = physFields.map(f => mapping.getOrElse(f.name, f.name)).toSet
      require(logicalCols.contains(name),
        s"unknown column '$name' — logical columns: ${logicalCols.toSeq.sorted.mkString(", ")}")
      val physical = mapping.collectFirst { case (p, l) if l == name => p }
        .getOrElse(name)
      // current logical type: scanDirs already surfaces prior widenings
      val current = schema(physical).dataType
      require(current != target,
        s"column '$name' is already ${target.catalogString}")
      require(widensTo(current, target),
        s"cannot widen '$name' from ${current.catalogString} to ${target.catalogString}: " +
          "only lossless numeric widenings are supported (byte->short->int->long, " +
          "float->double) — narrowing and cross-family changes would corrupt silently")
      val newTypes = typeMapOf(meta) + (physical -> target)
      if (writeManifestAtomic(v + 1, m, txns,
          metaWith(metaWithTypes(meta, newTypes), mapping, dropped))) {
        committed = v + 1
        writeInfo(committed, "widen", 0)
      }
    }
    committed
  }

  /** logical name → widened type in effect at `version` — the inspection
    * surface for tooling and specs, mirroring [[columnMapping]].
    */
  def typeMapping(
      version: Option[Long] = None): Map[String, org.apache.spark.sql.types.DataType] = {
    val v = version.orElse(latestVersion).getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    val meta = readMeta(v)
    val mapping = colMapOf(meta)
    typeMapOf(meta).map { case (p, t) => mapping.getOrElse(p, p) -> t }
  }

  /** logical → physical column mapping in effect at `version` (identity
    * entries omitted) plus the hidden physical names — the inspection
    * surface for tooling and specs.
    */
  def columnMapping(version: Option[Long] = None): (Map[String, String], Set[String]) = {
    val v = version.orElse(latestVersion).getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    val meta = readMeta(v)
    (colMapOf(meta).map(_.swap), droppedOf(meta))
  }

  /** Read a snapshot (default: latest). Partition values come back as
    * string columns named after `partitionCols` given at commit time —
    * callers re-cast as needed (mirrors partition-directory discovery).
    */
  def read(partitionCols: Seq[String], version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion).getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    val m = readManifest(v)
    require(m.nonEmpty, s"empty manifest v$v")
    readEntries(m.toSeq.sorted, partitionCols, readMeta(v))
  }

  /** Snapshot read over the manifest-entry SUBSET selected by partition
    * values and dir-grain stats — the DSv2 pushdown seam
    * ([[graft.sources.GraftLakeProvider]]): `keepPartition` decides each
    * entry from its decoded partition VALUES (zero I/O — the manifest key
    * carries them), then `ranges` excludes surviving directories whose
    * manifest min/max stats prove the conjunctive `col ∈ [lo, hi]`
    * predicates can never match (same positive-evidence-only rule as
    * [[prunePartitions]]: a dir with no stats for a column is always a
    * candidate). Equivalent to `read(...).filter(...)` minus the
    * directories never opened; callers re-apply exact predicates.
    */
  def readWhere(
      partitionCols: Seq[String],
      keepPartition: Seq[String] => Boolean,
      ranges: Map[String, (Double, Double)] = Map.empty,
      version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion).getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    val (m, _, meta) = readManifestAndTxns(v)
    require(m.nonEmpty, s"empty manifest v$v")
    val reverse = colMapOf(meta).map(_.swap)
    val kept = m.toSeq.sorted.filter { case (key, dir) =>
      keepPartition(partValuesOf(key)) && {
        val leaf = Paths.get(dir).getFileName.toString
        val stats = meta.get(StatsKeyPrefix + leaf)
          .map(parseStats).getOrElse(Map.empty[String, (Double, Double)])
        ranges.forall { case (c, (lo, hi)) =>
          stats.get(reverse.getOrElse(c, c))
            .forall { case (mn, mx) => !(mn > hi || mx < lo) }
        }
      }
    }
    if (kept.isEmpty) {
      // nothing survives: an empty frame with the exact read() schema
      val anyDir = resolveDir(m.values.head)
      val base = logicalize(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        scanDirs(Seq(anyDir), meta).schema), meta)
      partitionCols.foldLeft(base)((df, c) =>
        df.withColumn(c, lit(null).cast("string")))
    } else readEntries(kept, partitionCols, meta)
  }

  /** Per-file min/max stats for a snapshot's data files, read from parquet
    * FOOTERS (no data scan) — [[graft.sources.DataSkipping.footerStats]]
    * over exactly the directories the manifest references. Data files are
    * immutable, so stats for a version never go stale; persist with
    * `DataSkipping.save` for build-once/query-many.
    */
  def statsFor(cols: Seq[String], version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion).getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    // footers hold PHYSICAL names; callers ask in logical ones
    val reverse = colMapOf(readMeta(v)).map(_.swap)
    // ONE distributed footer job across every manifest directory — not one
    // job (and one plan node) per partition
    graft.sources.DataSkipping.footerStatsAll(
      spark, readManifest(v).values.toSeq.sorted.map(resolveDir),
      cols.map(c => reverse.getOrElse(c, c)))
  }

  /** Snapshot range scan through footer stats: only candidate files of the
    * version's manifest are opened, the exact predicate re-applies, and the
    * result equals `read(...).filter(c between lo and hi)` minus the
    * partition columns (per-file reads bypass the manifest's partition
    * attachment; project them in via [[read]] when needed).
    */
  def readPruned(
      cols: Seq[String],
      c: String,
      lo: Double,
      hi: Double,
      version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion).getOrElse(
      throw new IllegalStateException(s"no commits at $root"))
    val meta = readMeta(v)
    val reverse = colMapOf(meta).map(_.swap)
    val physC = reverse.getOrElse(c, c)
    // partition-grain pre-prune from the MANIFEST stats (zero file I/O),
    // then file-grain pruning from the candidates' footers
    val m = readManifest(v)
    val candKeys = prunePartitions(c, lo, hi, Some(v)).toSet
    if (candKeys.isEmpty) {
      val anyDir = resolveDir(m.values.head)
      return logicalize(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        scanDirs(Seq(anyDir), meta).schema), meta)
    }
    val candDirs = m.toSeq.sorted.collect {
      case (k, d) if candKeys.contains(k) => resolveDir(d)
    }
    val stats = graft.sources.DataSkipping.footerStatsAll(
      spark, candDirs, cols.map(cc => reverse.getOrElse(cc, cc)))
    val files = graft.sources.DataSkipping.pruneFiles(stats, physC, lo, hi)
    if (files.isEmpty) {
      val anyDir = resolveDir(readManifest(v).values.head)
      logicalize(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        scanDirs(Seq(anyDir), meta).schema), meta)
    } else
      // mixed-schema file sets (post-evolution versions) must merge, not
      // sample one file's schema nondeterministically; per-file reads
      // bypass readEntries, so the logical translation applies here
      logicalize(applyDvs(scanDirs(files, meta), meta), meta)
        .filter(col(c) >= lo && col(c) <= hi)
  }

  /** Drop data directories referenced by NO manifest among the kept ones,
    * then drop the old manifests. `keepLast` bounds time travel.
    *
    * @param minAgeMs retention guard for IN-FLIGHT writers: a committer
    *   stages its data directories BEFORE winning the manifest race, so an
    *   unreferenced directory younger than this may belong to a commit that
    *   is about to land — deleting it would commit a manifest pointing at
    *   nothing. Only directories whose mtime is older than `minAgeMs` are
    *   reclaimed (the lakehouse retention-window rule); crashed writers'
    *   leftovers age past it and are swept on a later vacuum.
    */
  def vacuum(keepLast: Int = 1, minAgeMs: Long = 3600000L): Unit = {
    require(keepLast >= 1, "must keep at least the latest version")
    val all = versions
    val (drop, keep) = all.splitAt(math.max(0, all.size - keepLast))
    // liveness compares the directory's unique LEAF name (every data dir is
    // data/<uuid>), never full path strings — immune to how `root` is
    // spelled (relative vs absolute, symlinks) and to legacy absolute
    // manifest entries, so relocating the lake or opening it via another
    // path can never make live data look unreferenced
    val live = keep.flatMap { v =>
      val (m, _, meta) = readManifestAndTxns(v)
      m.values ++ dvDirsOf(meta) // deletion-vector dirs are as live as data
    }.map(d => Paths.get(d).getFileName.toString).toSet
    val cutoff = System.currentTimeMillis() - minAgeMs
    if (Files.isDirectory(dataDir)) {
      val s = Files.list(dataDir)
      val dirs = try s.iterator().asScala.toSeq finally s.close()
      dirs.filterNot(d => live.contains(d.getFileName.toString))
        .filter { d =>
          try Files.getLastModifiedTime(d).toMillis < cutoff
          catch { case _: java.io.IOException => false }
        }
        .foreach(deleteRecursively)
    }
    // crashed committers may also leave unpublished manifest staging files.
    // These get a grace FLOOR independent of minAgeMs: an in-flight
    // committer sits between fsync and createLink for milliseconds, and a
    // minAgeMs=0 sweep (legitimate for data dirs under test) must not
    // yank the temp out from under it — the temps are bytes-sized, so
    // retaining them ten minutes costs nothing
    val stageCutoff =
      System.currentTimeMillis() - math.max(minAgeMs, 600000L)
    if (Files.isDirectory(manifestsDir)) {
      val s = Files.list(manifestsDir)
      try s.iterator().asScala
        .filter(_.getFileName.toString.startsWith(".stage-"))
        .filter { p =>
          try Files.getLastModifiedTime(p).toMillis < stageCutoff
          catch { case _: java.io.IOException => false }
        }
        .foreach(p => Files.deleteIfExists(p))
      finally s.close()
    }
    drop.foreach { v =>
      Files.deleteIfExists(manifestPath(v))
      Files.deleteIfExists(infoPath(v))
    }
  }
}

object SnapshotLake {
  /** Bounded pool for concurrent footer-schema fetches in `scanDirs` —
    * driver-side metadata I/O, so a small fixed pool (not the global EC,
    * which query code must never saturate).
    */
  private[catalog] lazy val footerEc: scala.concurrent.ExecutionContextExecutorService =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(
        16,
        (r: Runnable) => {
          val t = new Thread(r, "graft-footer-schema")
          t.setDaemon(true)
          t
        }))
}
