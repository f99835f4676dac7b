package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.catalog.SnapshotLake

/** Row-grain MERGE via deletion vectors (merge-on-read): matched PKs
  * DV-delete, winning batch rows append, old partition files re-enter by
  * hard link — merge cost tracks rows changed, never partition bytes.
  */
class UpsertDvSpec extends SparkSpec {

  import spark.implicits._

  private def fresh(): (SnapshotLake, String) = {
    val root = Files.createTempDirectory("graft_dvu").toString
    (new SnapshotLake(spark, root), root)
  }

  // every row carries a version column — the merge-on-read PK contract
  private def seed(lake: SnapshotLake): Long =
    lake.commit(
      Seq((1L, "a", 10.0, 1L, "p1"), (2L, "b", 20.0, 1L, "p1"),
        (3L, "c", 30.0, 1L, "p2"), (4L, "d", 40.0, 1L, "p2"),
        (5L, "e", 50.0, 1L, "p3"))
        .toDF("id", "name", "score", "ver", "part"),
      Seq("part"))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Double)] =
    df.select("id", "name", "score").as[(Long, String, Double)].collect().toSet

  private def filesOf(lake: SnapshotLake, v: Long): Set[String] =
    lake.files(Seq("part"), Some(v)).select("file")
      .collect().map(_.getString(0)).toSet

  test("merge updates matched rows, inserts new PKs, keeps the rest; time travel intact") {
    val (lake, _) = fresh()
    val v1 = seed(lake)
    val v2 = lake.upsertDv(
      Seq((2L, "b2", 21.0, 2L, "p1"),   // update in p1
        (6L, "f", 60.0, 2L, "p2"),      // insert into existing p2
        (7L, "g", 70.0, 2L, "p4"))      // insert creating a new partition
        .toDF("id", "name", "score", "ver", "part"),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part"))
    assert(v2 == v1 + 1, "one atomic commit for the whole merge")
    assert(rows(lake.read(Seq("part"))) == Set(
      (1L, "a", 10.0), (2L, "b2", 21.0), (3L, "c", 30.0), (4L, "d", 40.0),
      (5L, "e", 50.0), (6L, "f", 60.0), (7L, "g", 70.0)))
    // time travel before the merge sees the pre-image
    assert(rows(lake.read(Seq("part"), Some(v1))) == Set(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0),
      (5L, "e", 50.0)))
    // untouched p3 carried BY REFERENCE (identical file paths)
    val f1 = filesOf(lake, v1).filter(_.contains("part")) // all files
    assert(filesOf(lake, v2).intersect(f1).nonEmpty)
  }

  test("zero data rewrite: old parquet files re-enter the merged dir as hard links") {
    val (lake, root) = fresh()
    val v1 = seed(lake)
    val oldFiles = filesOf(lake, v1)
    lake.upsertDv(
      Seq((2L, "b2", 21.0, 2L, "p1")).toDF("id", "name", "score", "ver", "part"),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part"))
    val newFiles = filesOf(lake, lake.latestVersion.get)
    // p1's old file names persist under the NEW leaf (linked, not copied):
    // same file name, different dir, same inode (fileKey)
    val p1Old = oldFiles.filterNot(newFiles.contains)
    assert(p1Old.nonEmpty, "p1's directory must have been replaced")
    val linked = p1Old.toSeq.flatMap { op =>
      val fname = Paths.get(op).getFileName.toString
      newFiles.find(np => Paths.get(np).getFileName.toString == fname && np != op)
        .map(op -> _)
    }
    assert(linked.size == p1Old.size, "every old p1 file must re-enter by name")
    for ((op, np) <- linked) {
      val ko = Files.readAttributes(Paths.get(op), classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey
      val kn = Files.readAttributes(Paths.get(np), classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey
      assert(ko == kn, s"expected a hard link (same inode): $op vs $np")
    }
  }

  test("latest-wins: stale batch rows neither land nor delete; equal version -> batch wins") {
    val (lake, _) = fresh()
    seed(lake)
    val before = lake.latestVersion.get
    // ver=0 < table's 1: the whole batch loses — a NO-OP, no new version
    val got = lake.upsertDv(
      Seq((2L, "stale", 0.0, 0L, "p1")).toDF("id", "name", "score", "ver", "part"),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part"))
    assert(got == before, "an all-losing merge must not commit a version")
    assert(rows(lake.read(Seq("part"))).contains((2L, "b", 20.0)))
    // mixed batch: the stale row is dropped, the fresh one lands
    lake.upsertDv(
      Seq((2L, "stale", 0.0, 0L, "p1"), (1L, "a2", 11.0, 1L, "p1"))
        .toDF("id", "name", "score", "ver", "part"),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part"))
    val r = rows(lake.read(Seq("part")))
    assert(r.contains((2L, "b", 20.0)) && r.contains((1L, "a2", 11.0)),
      "equal version ties go to the batch; older versions keep the table row")
  }

  test("duplicate-PK table rows: a LOSING batch row neither lands nor deletes ANY duplicate") {
    // a raw-commit + append lake legally holds duplicate-PK rows. The
    // displacement gate must be the per-PK MAX table version (the same
    // gate `winners` uses) — gating per-table-row would let a batch row
    // at v3 against table duplicates {v1, v5} LOSE (never land) yet
    // DV-delete the v1 row, silently shrinking the table.
    val (lake, _) = fresh()
    lake.commit(
      Seq((1L, "old-v1", 10.0, 1L, "p1"), (9L, "keep", 90.0, 1L, "p1"))
        .toDF("id", "name", "score", "ver", "part"),
      Seq("part"))
    lake.append(
      Seq((1L, "new-v5", 15.0, 5L, "p1")).toDF("id", "name", "score", "ver", "part"),
      Seq("part"))
    // batch: pk=1 at v3 (loses to v5) + an unrelated winner (so the merge commits)
    lake.upsertDv(
      Seq((1L, "mid-v3", 13.0, 3L, "p1"), (9L, "keep2", 91.0, 2L, "p1"))
        .toDF("id", "name", "score", "ver", "part"),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part"))
    val out = rows(lake.read(Seq("part")))
    assert(out == Set((1L, "old-v1", 10.0), (1L, "new-v5", 15.0), (9L, "keep2", 91.0)),
      s"both duplicates of pk=1 must survive a losing batch row: $out")
    // and a WINNING batch row displaces ALL duplicates of its PK at once
    lake.upsertDv(
      Seq((1L, "final-v9", 19.0, 9L, "p1")).toDF("id", "name", "score", "ver", "part"),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part"))
    val out2 = rows(lake.read(Seq("part")))
    assert(out2 == Set((1L, "final-v9", 19.0), (9L, "keep2", 91.0)),
      s"a winning batch row must displace every duplicate of its PK: $out2")
  }

  test("within-batch duplicate PKs fold by versionCol before merging") {
    val (lake, _) = fresh()
    seed(lake)
    lake.upsertDv(
      Seq((3L, "old", 31.0, 2L, "p2"), (3L, "newest", 32.0, 5L, "p2"))
        .toDF("id", "name", "score", "ver", "part"),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part"))
    val out = lake.read(Seq("part")).filter(col("id") === 3L).collect()
    assert(out.length == 1 && out.head.getAs[String]("name") == "newest")
  }

  test("repeated merges on the same PK stack correctly (DV addresses re-key across leaves)") {
    val (lake, _) = fresh()
    seed(lake)
    lake.upsertDv(Seq((2L, "b2", 21.0, 2L, "p1")).toDF("id", "name", "score", "ver", "part"),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part"))
    lake.upsertDv(Seq((2L, "b3", 22.0, 3L, "p1")).toDF("id", "name", "score", "ver", "part"),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part"))
    lake.upsertDv(Seq((1L, "a2", 12.0, 2L, "p1")).toDF("id", "name", "score", "ver", "part"),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part"))
    val p1 = lake.read(Seq("part")).filter(col("part") === "p1")
    assert(rows(p1) == Set((1L, "a2", 12.0), (2L, "b3", 22.0)),
      "each merge must see exactly the prior merge's survivors")
    assert(lake.read(Seq("part")).count() == 5L)
  }

  test("merge composes with a prior DV delete: its addresses survive the leaf replacement") {
    val (lake, _) = fresh()
    seed(lake)
    // DV-delete id=1 (p1), then merge into p1 — the delete's address rides
    // a file that re-keys to the merged dir's leaf
    lake.deleteWhereDv(col("id") === 1L, Seq("part"))
    lake.upsertDv(Seq((2L, "b2", 21.0, 2L, "p1")).toDF("id", "name", "score", "ver", "part"),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part"))
    assert(rows(lake.read(Seq("part"))) == Set(
      (2L, "b2", 21.0), (3L, "c", 30.0), (4L, "d", 40.0), (5L, "e", 50.0)),
      "the pre-merge DV delete must stay applied after the merge replaces p1's leaf")
  }

  test("CDF across the merge boundary: exactly update_pre/update_post + insert, nothing else") {
    val (lake, _) = fresh()
    val v1 = seed(lake)
    val v2 = lake.upsertDv(
      Seq((2L, "b2", 21.0, 2L, "p1"), (6L, "f", 60.0, 2L, "p3"))
        .toDF("id", "name", "score", "ver", "part"),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part"))
    val delta = lake.changes(v1, v2, pk = Seq("id", "part"), partitionCols = Seq("part"))
      .select("_change", "id", "name").as[(String, Long, String)].collect().toSet
    assert(delta == Set(
      ("update_pre", 2L, "b"), ("update_post", 2L, "b2"), ("insert", 6L, "f")),
      s"got $delta")
  }

  test("concurrent merge + DV delete on the same partition: both land (OCC serializes)") {
    val (lake, _) = fresh()
    seed(lake)
    val t1 = new Thread(() => lake.upsertDv(
      Seq((2L, "b2", 21.0, 2L, "p1")).toDF("id", "name", "score", "ver", "part"),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part")))
    val t2 = new Thread(() => lake.deleteWhereDv(col("id") === 4L, Seq("part")))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert(rows(lake.read(Seq("part"))) == Set(
      (1L, "a", 10.0), (2L, "b2", 21.0), (3L, "c", 30.0), (5L, "e", 50.0)),
      "neither the merge nor the delete may be lost")
  }

  test("concurrent merges on the same partition, different PKs: no lost update") {
    val (lake, _) = fresh()
    seed(lake)
    val t1 = new Thread(() => lake.upsertDv(
      Seq((1L, "a2", 11.0, 2L, "p1")).toDF("id", "name", "score", "ver", "part"),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part")))
    val t2 = new Thread(() => lake.upsertDv(
      Seq((2L, "b2", 21.0, 2L, "p1")).toDF("id", "name", "score", "ver", "part"),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part")))
    t1.start(); t2.start(); t1.join(); t2.join()
    val p1 = lake.read(Seq("part")).filter(col("part") === "p1")
    assert(rows(p1) == Set((1L, "a2", 11.0), (2L, "b2", 21.0)))
  }

  test("optimize after a merge materializes the pending deletes; content unchanged") {
    val (lake, _) = fresh()
    seed(lake)
    lake.upsertDv(Seq((2L, "b2", 21.0, 2L, "p1")).toDF("id", "name", "score", "ver", "part"),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part"))
    val before = rows(lake.read(Seq("part")))
    lake.optimize(targetBytes = 1L, zorderCols = Seq("id")) // force rewrite of all
    assert(rows(lake.read(Seq("part"))) == before)
    // materialized: the rewritten p1 dir holds exactly 2 live rows; the DV
    // addresses for its old leaf are now dead (compactDeletes would shed them)
    lake.compactDeletes()
    assert(rows(lake.read(Seq("part"))) == before)
  }

  test("vacuum after a merge: old dirs reclaim, linked rows survive") {
    val (lake, _) = fresh()
    seed(lake)
    lake.upsertDv(Seq((2L, "b2", 21.0, 2L, "p1")).toDF("id", "name", "score", "ver", "part"),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part"))
    val before = rows(lake.read(Seq("part")))
    lake.vacuum(keepLast = 1, minAgeMs = 0L)
    assert(rows(lake.read(Seq("part"))) == before,
      "reclaiming the pre-merge dirs must not lose the linked rows")
  }

  test("merge on an empty lake is a plain first commit; schema contracts enforced") {
    val (lake, _) = fresh()
    val v = lake.upsertDv(
      Seq((1L, "a", 10.0, 1L, "p1")).toDF("id", "name", "score", "ver", "part"),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part"))
    assert(v == 1L && rows(lake.read(Seq("part"))) == Set((1L, "a", 10.0)))
    // partition cols must be part of the pk
    val e = intercept[IllegalArgumentException](lake.upsertDv(
      Seq((1L, "a", 10.0, 1L, "p1")).toDF("id", "name", "score", "ver", "part"),
      pk = Seq("id"), versionCol = "ver", partitionCols = Seq("part")))
    assert(e.getMessage.contains("PK"))
  }

  test("merge composes with rename + widen: mixed narrow/wide files share one merged dir") {
    import org.apache.spark.sql.types._
    // after widenColumn, a merged directory holds LINKED pre-widen (narrow)
    // files next to freshly staged (wide) files — the one layout no other
    // path produces. scanDirs' explicit read schema must reconcile it, and
    // the footer-stats path must stay at least conservative-correct.
    val (lake, _) = fresh()
    lake.commit(
      Seq((1L, "a", 10, 1L, "p1"), (2L, "b", 20, 1L, "p1"))
        .toDF("id", "name", "cnt", "ver", "part"),
      Seq("part"))
    lake.renameColumn("name", "title")
    lake.widenColumn("cnt", "bigint")
    lake.upsertDv(
      Seq((2L, "b2", Int.MaxValue.toLong + 9L, 2L, "p1"),
        (3L, "c", 30L, 2L, "p1"))
        .toDF("id", "title", "cnt", "ver", "part"),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part"))
    val out = lake.read(Seq("part"))
    assert(out.schema("cnt").dataType == LongType)
    assert(out.select("id", "title", "cnt").as[(Long, String, Long)].collect().toSet ==
      Set((1L, "a", 10L), (2L, "b2", Int.MaxValue.toLong + 9L), (3L, "c", 30L)))
    // pruned reads answer correctly over the mixed-type merged dir
    val pruned = lake.readPruned(Seq("id", "cnt"), "cnt", 5.0, 25.0)
    assert(pruned.select("id").as[Long].collect().toSet == Set(1L),
      "readPruned must still return exactly the in-range rows")
    val wide = lake.readPruned(Seq("id", "cnt"), "cnt", 2.0e9, 3.0e9)
    assert(wide.select("id").as[Long].collect().toSet == Set(2L),
      "beyond-int values in the staged wide file must be found")
  }

  test("upsertDvIfNew: exactly-once CDC apply — replays no-op, all-losing batches still watermark") {
    val (lake, _) = fresh()
    seed(lake)
    val pk = Seq("id", "part")
    def batch(rows: (Long, String, Double, Long, String)*) =
      rows.toDF("id", "name", "score", "ver", "part")
    // batch 0 applies
    val v1 = lake.upsertDvIfNew("cdc", 0L, batch((2L, "b2", 21.0, 2L, "p1")),
      pk, "ver", Seq("part"))
    assert(v1.isDefined)
    // the SAME batch replayed (crash before the producer checkpoint
    // advanced): rejected, no version, no data change
    val latestBefore = lake.latestVersion.get
    assert(lake.upsertDvIfNew("cdc", 0L, batch((2L, "b2-replay", 99.0, 9L, "p1")),
      pk, "ver", Seq("part")).isEmpty)
    assert(lake.latestVersion.get == latestBefore)
    assert(rows(lake.read(Seq("part"))).contains((2L, "b2", 21.0)))
    // an ALL-LOSING newer batch still advances the watermark (metadata-only
    // commit): replaying it after the beating row is DV-deleted must NOT
    // resurrect its rows
    val v3 = lake.upsertDvIfNew("cdc", 1L, batch((2L, "stale", 0.0, 1L, "p1")),
      pk, "ver", Seq("part"))
    assert(v3.isDefined, "the watermark must land even when no row does")
    assert(rows(lake.read(Seq("part"))).contains((2L, "b2", 21.0)))
    lake.deleteWhereDv(col("id") === 2L, Seq("part"))
    assert(lake.upsertDvIfNew("cdc", 1L, batch((2L, "stale", 0.0, 1L, "p1")),
      pk, "ver", Seq("part")).isEmpty,
      "a replay of the watermarked batch must not resurrect deleted rows")
    assert(!rows(lake.read(Seq("part"))).exists(_._1 == 2L))
    // a genuinely newer batch lands; another consumer's ids are independent
    assert(lake.upsertDvIfNew("cdc", 2L, batch((6L, "f", 60.0, 2L, "p1")),
      pk, "ver", Seq("part")).isDefined)
    assert(lake.upsertDvIfNew("other", 0L, batch((7L, "g", 70.0, 2L, "p2")),
      pk, "ver", Seq("part")).isDefined)
    assert(rows(lake.read(Seq("part"))).filter(r => r._1 >= 6L) ==
      Set((6L, "f", 60.0), (7L, "g", 70.0)))
  }

  test("streaming CDC apply: foreachBatch + upsertDvIfNew is exactly-once across a restart replay") {
    val (lake, _) = fresh()
    seed(lake)
    val src = Files.createTempDirectory("graft_cdc_src_").toString
    val ckpt = Files.createTempDirectory("graft_cdc_ck_").toString
    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("id LONG, name STRING, score DOUBLE, ver LONG, part STRING")
        .parquet(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          lake.upsertDvIfNew("stream", batchId, batch,
            Seq("id", "part"), "ver", Seq("part"))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Seq((2L, "b2", 21.0, 2L, "p1"), (6L, "f", 60.0, 2L, "p2"))
      .toDF("id", "name", "score", "ver", "part")
      .write.mode("append").parquet(src)
    runOnce()
    val afterWave1 = rows(lake.read(Seq("part")))
    assert(afterWave1.contains((2L, "b2", 21.0)) && afterWave1.contains((6L, "f", 60.0)))
    val vAfter1 = lake.latestVersion.get
    // LOSE the checkpoint: the source replays batch 0 from scratch — the
    // lake watermark rejects it (the documented checkpoint-loss semantics)
    val ck2 = Files.createTempDirectory("graft_cdc_ck2_").toString
    val q2 = spark.readStream
      .schema("id LONG, name STRING, score DOUBLE, ver LONG, part STRING")
      .parquet(src)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        lake.upsertDvIfNew("stream", batchId, batch,
          Seq("id", "part"), "ver", Seq("part"))
        ()
      }
      .option("checkpointLocation", ck2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    assert(lake.latestVersion.get == vAfter1, "the replayed batch must not commit")
    assert(rows(lake.read(Seq("part"))) == afterWave1)
    // a second wave through the ORIGINAL checkpoint lands exactly once
    Seq((2L, "b3", 22.0, 3L, "p1")).toDF("id", "name", "score", "ver", "part")
      .write.mode("append").parquet(src)
    runOnce()
    val finalRows = rows(lake.read(Seq("part")))
    assert(finalRows.contains((2L, "b3", 22.0)) && !finalRows.contains((2L, "b2", 21.0)))
  }

  test("append: rows ADD to their partitions (nothing replaces), zero rewrite, DVs survive") {
    val (lake, _) = fresh()
    val v1 = seed(lake)
    val oldFiles = filesOf(lake, v1)
    // a pending DV delete whose address rides a file the append will re-link
    lake.deleteWhereDv(col("id") === 1L, Seq("part"))
    lake.append(
      Seq((6L, "f", 60.0, 1L, "p1"), (7L, "g", 70.0, 1L, "p4"))
        .toDF("id", "name", "score", "ver", "part"),
      Seq("part"))
    val out = rows(lake.read(Seq("part")))
    assert(out == Set((2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0),
      (5L, "e", 50.0), (6L, "f", 60.0), (7L, "g", 70.0)),
      s"existing rows keep, appended rows add, the DV delete stays applied: $out")
    // zero rewrite: every old file name re-enters (p1 linked, others by ref)
    val newNames = filesOf(lake, lake.latestVersion.get)
      .map(p => Paths.get(p).getFileName.toString)
    val oldNames = oldFiles.map(p => Paths.get(p).getFileName.toString)
    assert(oldNames.subsetOf(newNames), "append must never drop or rewrite an old file")
    // appending the same partition twice stacks correctly
    lake.append(Seq((8L, "h", 80.0, 1L, "p1")).toDF("id", "name", "score", "ver", "part"),
      Seq("part"))
    assert(lake.read(Seq("part")).count() == 7L)
  }

  private def dvDirsOf(root: String): Seq[String] = {
    val mdir = Paths.get(root, "manifests")
    val s = Files.list(mdir)
    val mf = try {
      val it = scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator()).asScala
      it.toSeq.filter(_.getFileName.toString.endsWith(".json"))
        .maxBy(_.getFileName.toString)
    } finally s.close()
    def dec(x: String) = java.net.URLDecoder.decode(x, "UTF-8")
    new String(Files.readAllBytes(mf), "UTF-8").linesIterator
      .map(_.split("\t"))
      .collectFirst { case Array("#meta", k, v) if dec(k) == "dv" => dec(v) }
      .toSeq.flatMap(_.split(";").filter(_.nonEmpty).map(dec))
  }

  private def md5sOf(root: String, dir: String): Map[String, String] = {
    val p = Paths.get(root).resolve(dir)
    val s = Files.list(p)
    try {
      val it = scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator()).asScala
      it.filter(f => !Files.isDirectory(f)).map { f =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(Files.readAllBytes(f))
        f.getFileName.toString -> d.map("%02x".format(_)).mkString
      }.toMap
    } finally s.close()
  }

  test("merges DISJOINT from a DV dir's partitions keep it BY REFERENCE, byte-identical") {
    val (lake, root) = fresh()
    seed(lake)
    // a DV addressing ONLY p1
    lake.deleteWhereDv(col("id") === 1L, Seq("part"))
    val dv1 = dvDirsOf(root)
    assert(dv1.size == 1)
    val bytesBefore = md5sOf(root, dv1.head)
    // merge into p2 — disjoint from the DV's recorded leaves: the dir must
    // survive AS IS (same manifest path, same bytes), unread and unwritten
    lake.upsertDv(
      Seq((3L, "c2", 31.0, 2L, "p2")).toDF("id", "name", "score", "ver", "part"),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part"))
    val dv2 = dvDirsOf(root)
    assert(dv2.contains(dv1.head),
      s"a disjoint merge must keep the DV dir by reference: $dv1 -> $dv2")
    assert(md5sOf(root, dv1.head) == bytesBefore, "and byte-identical")
    assert(rows(lake.read(Seq("part"))) == Set(
      (2L, "b", 20.0), (3L, "c2", 31.0), (4L, "d", 40.0), (5L, "e", 50.0)),
      "the kept DV still applies, the merge landed")
    // a merge TOUCHING p1 must re-key that dir (leaf replaced) — it folds
    lake.upsertDv(
      Seq((2L, "b2", 21.0, 2L, "p1")).toDF("id", "name", "score", "ver", "part"),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part"))
    val dv3 = dvDirsOf(root)
    assert(!dv3.contains(dv1.head),
      s"a merge into the DV's partition must fold/re-key it: $dv3")
    assert(rows(lake.read(Seq("part"))) == Set(
      (2L, "b2", 21.0), (3L, "c2", 31.0), (4L, "d", 40.0), (5L, "e", 50.0)),
      "id=1 stays deleted through the re-key; id=2 updated")
  }

  test("merge cost artifact: only changed rows' bytes are written, not partition bytes") {
    // structural form of the ScaleProbe claim: after a 1-row merge into a
    // 1000-row partition, the NEW bytes on disk (non-linked files) hold only
    // the merged row + the DV addresses
    val (lake, _) = fresh()
    val big = spark.range(1000).select(
      col("id"), concat(lit("n"), col("id")).as("name"),
      col("id").cast("double").as("score"), lit(1L).as("ver"), lit("p1").as("part"))
    val v1 = lake.commit(big, Seq("part"))
    val oldNames = filesOf(lake, v1).map(p => Paths.get(p).getFileName.toString)
    lake.upsertDv(Seq((7L, "n7x", 7.5, 2L, "p1")).toDF("id", "name", "score", "ver", "part"),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part"))
    val newFiles = filesOf(lake, lake.latestVersion.get)
    val freshFiles = newFiles.filterNot(p => oldNames.contains(Paths.get(p).getFileName.toString))
    val freshBytes = freshFiles.map(p => Files.size(Paths.get(p))).sum
    val totalBytes = newFiles.map(p => Files.size(Paths.get(p))).sum
    assert(freshBytes < totalBytes / 4,
      s"fresh bytes $freshBytes should be a small fraction of $totalBytes")
    val out = lake.read(Seq("part"))
    assert(out.count() == 1000L)
    assert(out.filter(col("id") === 7L).head().getAs[String]("name") == "n7x")
  }
}
