package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.SnapshotLake

/** Snapshot-isolated versioned lake: partition-grain overwrite semantics,
  * time travel, optimistic concurrent commits without lost updates, and
  * vacuum keeping exactly the live data.
  */
class SnapshotLakeSpec extends SparkSpec {

  private def fresh(): (SnapshotLake, String) = {
    val dir = Files.createTempDirectory("graft_snap").toString
    (new SnapshotLake(spark, dir), dir)
  }

  private def batch(status: String*)(pointer: String) = {
    import spark.implicits._
    Tables(spark, "/root/testdata/sf0.001", "orders")
      .filter(col("o_orderstatus").isin(status: _*))
      .select(col("o_orderkey"), col("o_orderstatus"), lit(pointer).as("pointer"))
  }

  test("commits replace whole partitions; time travel reads old snapshots") {
    val (lake, _) = fresh()
    val v1 = lake.commit(batch("F", "O", "P")("first"), Seq("o_orderstatus"))
    val v2 = lake.commit(batch("F")("second"), Seq("o_orderstatus"))
    assert(v1 === 1L && v2 === 2L)

    val latest = lake.read(Seq("o_orderstatus"))
    val byStatus = latest.groupBy("o_orderstatus", "pointer").count()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(byStatus === Set(("F", "second"), ("O", "first"), ("P", "first")))

    val old = lake.read(Seq("o_orderstatus"), Some(v1))
    assert(old.select("pointer").distinct().collect().map(_.getString(0)).toSet === Set("first"))
    // row counts preserved exactly per snapshot
    assert(old.count() === batch("F", "O", "P")("x").count())
    assert(latest.count() === old.count())
  }

  test("concurrent disjoint-partition commits both land (optimistic retry)") {
    val (lake, _) = fresh()
    lake.commit(batch("F", "O")("base"), Seq("o_orderstatus"))
    val t1 = new Thread(() => lake.commit(batch("F")("writer1"), Seq("o_orderstatus")))
    val t2 = new Thread(() => lake.commit(batch("O")("writer2"), Seq("o_orderstatus")))
    t1.start(); t2.start(); t1.join(); t2.join()

    val got = lake.read(Seq("o_orderstatus"))
      .groupBy("o_orderstatus", "pointer").count()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("F", "writer1"), ("O", "writer2")),
      "neither concurrent writer may lose its partition")
    assert(lake.versions === Seq(1L, 2L, 3L), "both commits must take distinct versions")
  }

  test("a reader's resolved snapshot is immune to later commits") {
    val (lake, _) = fresh()
    val v1 = lake.commit(batch("F")("first"), Seq("o_orderstatus"))
    val snapshot = lake.read(Seq("o_orderstatus"), Some(v1)) // resolve BEFORE the next commit
    lake.commit(batch("F")("second"), Seq("o_orderstatus"))
    assert(snapshot.select("pointer").distinct().collect().map(_.getString(0)).toSet
      === Set("first"))
  }

  test("concurrent same-partition PK upserts serialize: no lost update, versionCol wins ties") {
    import spark.implicits._
    val (lake, _) = fresh()
    def rows(ids: Range, pointer: String, ver: Long) =
      ids.map(i => (i.toLong, "p", pointer, ver)).toDF("id", "part", "pointer", "ver")

    lake.upsert(rows(1 to 200, "base", 1L), Seq("id", "part"), "ver", Seq("part"))
    // A updates 1..100 at ver 2, B updates 50..150 at ver 3 — whatever the
    // commit order, the loser re-merges against the winner, so B's higher
    // version must win the 50..100 overlap and NEITHER write may vanish
    val a = new Thread(() =>
      lake.upsert(rows(1 to 100, "A", 2L), Seq("id", "part"), "ver", Seq("part")))
    val b = new Thread(() =>
      lake.upsert(rows(50 to 150, "B", 3L), Seq("id", "part"), "ver", Seq("part")))
    a.start(); b.start(); a.join(); b.join()

    val got = lake.read(Seq("part")).select("id", "pointer")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size === 200)
    (1 to 49).foreach(i => assert(got(i.toLong) === "A", s"id $i"))
    (50 to 150).foreach(i => assert(got(i.toLong) === "B", s"id $i"))
    (151 to 200).foreach(i => assert(got(i.toLong) === "base", s"id $i"))
    assert(lake.versions.size === 3, "both upserts must commit distinct versions")
  }

  test("deleteWhere removes rows atomically; time travel keeps them until vacuum") {
    val (lake, _) = fresh()
    val v1 = lake.commit(batch("F", "O")("keep"), Seq("o_orderstatus"))
    val before = lake.read(Seq("o_orderstatus")).count()
    val v2 = lake.deleteWhere(col("o_orderkey") % 10 === 0, Seq("o_orderstatus"))

    val after = lake.read(Seq("o_orderstatus"))
    assert(after.filter(col("o_orderkey") % 10 === 0).count() === 0L)
    assert(after.count() < before)
    // the pre-delete snapshot still has the rows (until vacuum)
    assert(lake.read(Seq("o_orderstatus"), Some(v1)).count() === before)
    lake.vacuum(keepLast = 1, minAgeMs = 0L)
    assert(lake.versions === Seq(v2))
    assert(lake.read(Seq("o_orderstatus")).count() === after.count())
  }

  test("deleteWhere drops now-empty partitions and refuses to empty the lake") {
    val (lake, _) = fresh()
    lake.commit(batch("F", "O")("x"), Seq("o_orderstatus"))
    lake.deleteWhere(col("o_orderstatus") === "F", Seq("o_orderstatus"))
    val statuses = lake.read(Seq("o_orderstatus"))
      .select("o_orderstatus").distinct().collect().map(_.getString(0)).toSet
    assert(statuses === Set("O"))
    intercept[IllegalStateException] {
      lake.deleteWhere(lit(true), Seq("o_orderstatus"))
    }
  }

  test("footer-stats pruned snapshot reads equal the exact filter, per version") {
    val (lake, _) = fresh()
    val v1 = lake.commit(batch("F", "O")("first"), Seq("o_orderstatus"))
    lake.commit(batch("F")("second"), Seq("o_orderstatus"))

    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select("o_orderkey").collect().map(_.getLong(0)).toSet

    val lo = 100d; val hi = 2000d
    val latestPruned = keys(lake.readPruned(Seq("o_orderkey"), "o_orderkey", lo, hi))
    val latestFull = keys(lake.read(Seq("o_orderstatus"))
      .filter(col("o_orderkey") >= lo && col("o_orderkey") <= hi))
    assert(latestPruned === latestFull && latestPruned.nonEmpty)

    val v1Pruned = keys(lake.readPruned(Seq("o_orderkey"), "o_orderkey", lo, hi, Some(v1)))
    val v1Full = keys(lake.read(Seq("o_orderstatus"), Some(v1))
      .filter(col("o_orderkey") >= lo && col("o_orderkey") <= hi))
    assert(v1Pruned === v1Full)

    // out-of-range predicate prunes every file and returns an empty frame
    assert(lake.readPruned(Seq("o_orderkey"), "o_orderkey", 1e12, 2e12).count() === 0L)
  }

  test("vacuum's retention window protects young unreferenced dirs (in-flight commits)") {
    val (lake, dir) = fresh()
    lake.commit(batch("F")("v1"), Seq("o_orderstatus"))
    lake.commit(batch("F")("v2"), Seq("o_orderstatus"))
    val dataDir = java.nio.file.Paths.get(dir, "data")
    def dirCount() = {
      val s = Files.list(dataDir); try s.count() finally s.close()
    }
    assert(dirCount() === 2)
    // default retention: the young unreferenced v1 dir survives —
    // vacuum cannot tell it from a commit that is about to land
    lake.vacuum(keepLast = 1)
    assert(dirCount() === 2, "young unreferenced dir must survive the retention window")
    // age it past the window: reclaimed on the next pass
    val s2 = Files.list(dataDir)
    try s2.forEach(p => Files.setLastModifiedTime(
      p, java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 7200000L)))
    finally s2.close()
    lake.vacuum(keepLast = 1)
    assert(dirCount() === 1)
    assert(lake.read(Seq("o_orderstatus")).select("pointer").distinct()
      .collect().map(_.getString(0)).toSet === Set("v2"))
  }

  test("NULL partition values are rejected; NULL-predicate rows survive deleteWhere") {
    import spark.implicits._
    val (lake, _) = fresh()
    intercept[IllegalArgumentException] {
      lake.commit(
        Seq((1L, "p", "x"), (2L, null.asInstanceOf[String], "y"))
          .toDF("id", "part", "v"),
        Seq("part"))
    }
    // SQL DELETE semantics: predicate NULL (email IS NULL here) keeps the row
    lake.commit(
      Seq((1L, "p", "a@b.c"), (2L, "p", null.asInstanceOf[String]), (3L, "p", "x@y.z"))
        .toDF("id", "part", "email"),
      Seq("part"))
    lake.deleteWhere(col("email") === "a@b.c", Seq("part"))
    val ids = lake.read(Seq("part")).select("id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(2L, 3L), "the NULL-email row must survive the delete")
  }

  test("vacuum drops unreferenced data but keeps surviving snapshots readable") {
    val (lake, dir) = fresh()
    lake.commit(batch("F")("v1"), Seq("o_orderstatus"))
    lake.commit(batch("F")("v2"), Seq("o_orderstatus"))
    val v3 = lake.commit(batch("O")("v3"), Seq("o_orderstatus"))
    lake.vacuum(keepLast = 1, minAgeMs = 0L)
    assert(lake.versions === Seq(v3))
    val got = lake.read(Seq("o_orderstatus"))
      .select("pointer").distinct().collect().map(_.getString(0)).toSet
    assert(got === Set("v2", "v3"), "latest manifest references v2's F dir and v3's O dir")
    // only live data dirs remain on disk
    val s = Files.list(java.nio.file.Paths.get(dir, "data"))
    val nDirs = try s.count() finally s.close()
    assert(nDirs === 2, "exactly the two referenced partition dirs survive")
  }

  test("commitIfNew: replayed batches land exactly once; racing attempts pick one winner") {
    val (lake, _) = fresh()
    // batch 0 commits, a replay of batch 0 is a no-op returning None
    assert(lake.commitIfNew("appA", 0L, batch("F")("b0"), Seq("o_orderstatus")).isDefined)
    assert(lake.commitIfNew("appA", 0L, batch("F")("b0-replay"), Seq("o_orderstatus")).isEmpty)
    assert(lake.lastTxn("appA") === Some(0L))
    val afterReplay = lake.read(Seq("o_orderstatus"))
      .select("pointer").distinct().collect().map(_.getString(0)).toSet
    assert(afterReplay === Set("b0"), "a replayed batch must not overwrite or duplicate")

    // a LATER batch commits; an OLD batch arriving late (out-of-order
    // replay after checkpoint loss) is rejected by the watermark
    assert(lake.commitIfNew("appA", 1L, batch("O")("b1"), Seq("o_orderstatus")).isDefined)
    assert(lake.commitIfNew("appA", 0L, batch("P")("b0-late"), Seq("o_orderstatus")).isEmpty)
    assert(lake.lastTxn("appA") === Some(1L))

    // watermarks are per-app: a different stream's batch 0 still lands,
    // and normal commits/upserts carry all watermarks forward
    assert(lake.commitIfNew("appB", 0L, batch("P")("appB-b0"), Seq("o_orderstatus")).isDefined)
    lake.commit(batch("F")("manual"), Seq("o_orderstatus"))
    assert(lake.lastTxn("appA") === Some(1L) && lake.lastTxn("appB") === Some(0L))

    // concurrent attempts of the SAME batch: exactly one wins
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val attempts = (0 until 4).map(i =>
      Future(lake.commitIfNew("appC", 7L, batch("O")(s"c$i"), Seq("o_orderstatus"))))
    val winners = Await.result(Future.sequence(attempts), 180.seconds).flatten
    assert(winners.size === 1, s"exactly one attempt of batch 7 may commit, got $winners")
  }

  test("snapshotSink: a real stream drains exactly-once; checkpoint loss does not duplicate") {
    import org.apache.spark.sql.functions.col
    val (lake, _) = fresh()
    val srcDir = Files.createTempDirectory("graft_sink_src").toString
    val cp1 = Files.createTempDirectory("graft_sink_cp1").toString
    batch("F", "O")("wave1").write.mode("overwrite").parquet(srcDir)

    val schema = batch("F")("x").schema
    def drain(cp: String): Unit = {
      val q = graft.streaming.Streaming.snapshotSink(
        spark.readStream.schema(schema).parquet(srcDir),
        lake, Seq("o_orderstatus"), "sinkApp", cp)
      q.awaitTermination()
    }
    drain(cp1)
    val n1 = lake.read(Seq("o_orderstatus")).count()
    assert(n1 === batch("F", "O")("x").count())

    // rerun with the SAME checkpoint: nothing new, no recommit
    val vBefore = lake.latestVersion
    drain(cp1)
    assert(lake.latestVersion === vBefore, "an already-drained stream must commit nothing")

    // TOTAL checkpoint loss: the source replays from scratch under a fresh
    // checkpoint — batch ids restart at 0, which the app watermark rejects
    drain(Files.createTempDirectory("graft_sink_cp2").toString)
    assert(lake.read(Seq("o_orderstatus")).count() === n1,
      "checkpoint loss must not duplicate rows")
    assert(lake.latestVersion === vBefore)
  }

  test("schema evolution: later commits may add columns; older partitions read as NULL") {
    import org.apache.spark.sql.functions.col
    val (lake, _) = fresh()
    lake.commit(batch("F")("old"), Seq("o_orderstatus"))
    // the next commit carries an extra column the first partition lacks
    lake.commit(batch("O")("new").withColumn("quality", lit(0.9)), Seq("o_orderstatus"))
    val all = lake.read(Seq("o_orderstatus"))
    assert(all.columns.contains("quality"))
    assert(all.filter(col("o_orderstatus") === "F" && col("quality").isNull).count() ===
      batch("F")("x").count(), "pre-evolution rows surface the new column as NULL")
    assert(all.filter(col("o_orderstatus") === "O" && col("quality") === 0.9).count() ===
      batch("O")("x").count())
    // PK upsert across the evolution boundary merges instead of failing
    lake.upsert(batch("F")("upd").withColumn("quality", lit(0.5)),
      Seq("o_orderkey", "o_orderstatus"), "pointer", Seq("o_orderstatus"))
    val f = lake.read(Seq("o_orderstatus")).filter(col("o_orderstatus") === "F")
    assert(f.filter(col("quality") === 0.5).count() === batch("F")("x").count())
  }

  test("empty batches: commitIfNew is a None no-op (lake stays unborn); commit/upsert refuse") {
    val (lake, _) = fresh()
    val empty = batch("F")("x").limit(0)
    // a no-data micro-batch before ANY real data must not wedge the lake
    // with a data-less first manifest
    assert(lake.commitIfNew("app", 0L, empty, Seq("o_orderstatus")).isEmpty)
    assert(lake.latestVersion.isEmpty, "no manifest may exist after an empty batch")
    intercept[IllegalArgumentException] { lake.commit(empty, Seq("o_orderstatus")) }
    intercept[IllegalArgumentException] {
      lake.upsert(empty, Seq("o_orderkey", "o_orderstatus"), "pointer", Seq("o_orderstatus"))
    }
    // partition columns outside the PK are structurally rejected: the merge
    // is partition-scoped, so a moving PK would duplicate across partitions
    intercept[IllegalArgumentException] {
      lake.upsert(batch("F")("x"), Seq("o_orderkey"), "pointer", Seq("o_orderstatus"))
    }
    // real data afterwards lands normally and reads fine
    assert(lake.commitIfNew("app", 1L, batch("F")("b1"), Seq("o_orderstatus")).isDefined)
    assert(lake.read(Seq("o_orderstatus")).count() === batch("F")("x").count())
  }

  private def manifestEntries(dir: String, v: Long): Map[String, String] = {
    val p = java.nio.file.Paths.get(dir, "manifests", f"v$v%08d.json")
    scala.jdk.CollectionConverters.ListHasAsScala(Files.readAllLines(p)).asScala
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l => val Array(k, d) = l.split("\t", 2); k -> d }.toMap
  }

  test("manifests are root-relative: any root spelling works and vacuum keeps live data") {
    val (lake, dir) = fresh()
    lake.commit(batch("F")("v1"), Seq("o_orderstatus"))
    lake.commit(batch("O")("v2"), Seq("o_orderstatus"))
    assert(manifestEntries(dir, 2L).values.forall(d => !d.startsWith("/")),
      "manifest entries must be root-relative")
    val n = lake.read(Seq("o_orderstatus")).count()

    // reopen through a DIFFERENT spelling of the same root — reads resolve,
    // and vacuum must not mistake live dirs for unreferenced ones
    val respelled = new SnapshotLake(spark, dir + "/./")
    assert(respelled.read(Seq("o_orderstatus")).count() === n)
    respelled.vacuum(keepLast = 2, minAgeMs = 0L)
    assert(respelled.read(Seq("o_orderstatus")).count() === n,
      "vacuum through an alternate root spelling must keep all live data")

    // relocate the whole lake: relative manifests make it portable
    val moved = Files.move(
      java.nio.file.Paths.get(dir), java.nio.file.Paths.get(dir + "_moved"))
    val atNewHome = new SnapshotLake(spark, moved.toString)
    assert(atNewHome.read(Seq("o_orderstatus")).count() === n)
  }

  test("a leftover manifest staging file never surfaces as a version; vacuum sweeps it") {
    val (lake, dir) = fresh()
    lake.commit(batch("F")("v1"), Seq("o_orderstatus"))
    val stale = java.nio.file.Paths.get(dir, "manifests", ".stage-crashed.tmp")
    Files.write(stale, "half-writ".getBytes("UTF-8"))
    // a crashed committer's leftover is OLD by the time vacuum sees it;
    // a FRESH temp (a committer between fsync and link right now) must
    // survive even a minAgeMs=0 sweep — staging files have a grace floor
    val freshTmp = java.nio.file.Paths.get(dir, "manifests", ".stage-inflight.tmp")
    Files.write(freshTmp, "publishing".getBytes("UTF-8"))
    Files.setLastModifiedTime(stale,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 3600000L))
    assert(lake.versions === Seq(1L), "staging temp must be invisible to version listing")
    assert(lake.read(Seq("o_orderstatus")).count() === batch("F")("x").count())
    lake.commit(batch("O")("v2"), Seq("o_orderstatus")) // commits still land
    lake.vacuum(keepLast = 2, minAgeMs = 0L)
    assert(!Files.exists(stale), "aged staging temp must be reclaimed")
    assert(Files.exists(freshTmp), "in-flight staging temp must survive the sweep")
  }

  test("read plans ONE scan over hundreds of partitions, not a per-partition union") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_snap_many").toString
    // author the partition layout with a single partitionBy write, then
    // point one manifest at the 500 leaf directories
    (0 until 500).map(i => (i.toLong, s"p$i")).toDF("id", "p")
      .repartition(8).write.partitionBy("p")
      .parquet(java.nio.file.Paths.get(root, "data").toString)
    Files.createDirectories(java.nio.file.Paths.get(root, "manifests"))
    val entries = (0 until 500).map(i => s"p$i\tdata/p=p$i").sorted
    Files.write(java.nio.file.Paths.get(root, "manifests", "v00000001.json"),
      entries.mkString("\n").getBytes("UTF-8"))

    val lake = new SnapshotLake(spark, root)
    val out = lake.read(Seq("p"))
    // one parquet relation + the broadcast (dir → partition values) dim; the
    // old per-partition union had 500 scan leaves here
    val leaves = out.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.size <= 2, s"expected one scan + one local dim, got ${leaves.size} leaves")
    assert(out.count() === 500L)
    val row7 = out.filter(col("p") === "p7").select("id").collect()
    assert(row7.map(_.getLong(0)).toSeq === Seq(7L),
      "partition values must round-trip through the dir-name join")
  }

  test("deleteWhere rewrites only touched partitions; the rest carry over by reference") {
    val (lake, dir) = fresh()
    lake.commit(batch("F", "O", "P")("x"), Seq("o_orderstatus"))
    val before = manifestEntries(dir, 1L)
    lake.deleteWhere(
      col("o_orderstatus") === "F" && col("o_orderkey") % 2 === 0,
      Seq("o_orderstatus"))
    val after = manifestEntries(dir, 2L)
    assert(after("O") === before("O") && after("P") === before("P"),
      "partitions the predicate cannot touch must keep their exact data dirs")
    assert(after("F") !== before("F"), "the hit partition must be rewritten")
    val got = lake.read(Seq("o_orderstatus"))
    assert(got.filter(col("o_orderstatus") === "F" && col("o_orderkey") % 2 === 0).count() === 0L)
    assert(got.filter(col("o_orderstatus") === "O").count() === batch("O")("x").count())
  }

  private def parquetFiles(dir: String, relDir: String): Seq[String] = {
    val p = java.nio.file.Paths.get(dir, relDir)
    val s = Files.list(p)
    try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator()).asScala
      .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSeq
    finally s.close()
  }

  test("optimize bin-packs small files transactionally; content and history survive") {
    val (lake, dir) = fresh()
    // force a small-file mess: 8 files per partition
    lake.commit(batch("F", "O")("x").repartition(8), Seq("o_orderstatus"))
    val before = manifestEntries(dir, 1L)
    assert(parquetFiles(dir, before("F")).size === 8)
    val contentBefore = lake.read(Seq("o_orderstatus"))
      .collect().map(_.toString).sorted.toSeq

    val v = lake.optimize(targetBytes = 1L << 30) // everything fits one file
    assert(v === 2L)
    val after = manifestEntries(dir, 2L)
    assert((after("F") !== before("F")) && (after("O") !== before("O")))
    assert(parquetFiles(dir, after("F")).size === 1, "8 small files pack to 1")
    assert(lake.read(Seq("o_orderstatus"))
      .collect().map(_.toString).sorted.toSeq === contentBefore,
      "optimize must not change a single row")
    // time travel still reads the pre-optimize layout
    assert(lake.read(Seq("o_orderstatus"), Some(1L)).count() === contentBefore.size.toLong)
    // already-packed partitions carry over by reference: second run no-ops
    assert(lake.optimize(targetBytes = 1L << 30) === 2L,
      "nothing left to pack — no new version")
    // history records the maintenance op
    assert(lake.history.map(_._2).contains("optimize"))
  }

  test("optimize(zorderCols) clusters files: per-file spans shrink, content survives") {
    val (lake, dir) = fresh()
    lake.commit(batch("F")("x").repartition(8), Seq("o_orderstatus"))
    val contentBefore = lake.read(Seq("o_orderstatus"))
      .collect().map(_.toString).sorted.toSeq
    // small target -> several z-ordered output files
    val v = lake.optimize(targetBytes = 2048L, zorderCols = Seq("o_orderkey"))
    assert(v === 2L)
    assert(lake.read(Seq("o_orderstatus"))
      .collect().map(_.toString).sorted.toSeq === contentBefore)
    val stats = lake.statsFor(Seq("o_orderkey"))
      .collect().map(r => (r.getDouble(r.fieldIndex("min_o_orderkey")),
        r.getDouble(r.fieldIndex("max_o_orderkey"))))
    assert(stats.length >= 3, s"expected several clustered files, got ${stats.length}")
    val globalSpan = stats.map(_._2).max - stats.map(_._1).min
    val meanSpan = stats.map(s => s._2 - s._1).sum / stats.length
    assert(meanSpan < globalSpan / 2.0,
      s"z-ordered files must each cover a narrow key range " +
        s"(mean $meanSpan vs global $globalSpan)")
  }

  test("changes(): version-to-version CDF emits exactly the row deltas, pruned by manifest") {
    import spark.implicits._
    val (lake, _) = fresh()
    def rows(ver: Long, data: Seq[(Long, String, String)]) =
      data.toDF("id", "part", "payload").withColumn("ver", lit(ver))
    val v1 = lake.upsert(
      rows(1L, Seq((1L, "a", "one"), (2L, "a", "two"), (3L, "b", "three"), (9L, "c", "nine"))),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part"))
    // v2: update id 2, insert id 4 (same partition), delete nothing in 'a';
    // partition 'b' and 'c' untouched
    val v2 = lake.upsert(
      rows(2L, Seq((2L, "a", "TWO"), (4L, "a", "four"))),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part"))
    assert(lake.changedPartitions(v1, v2) === Set("a"))

    val got = lake.changes(v1, v2, pk = Seq("id", "part"), partitionCols = Seq("part"))
      .collect().map(r => (r.getString(0), r.getLong(r.fieldIndex("id")),
        r.getString(r.fieldIndex("payload")))).toSet
    assert(got === Set(
      ("update_pre", 2L, "two"), ("update_post", 2L, "TWO"),
      ("insert", 4L, "four")),
      s"unchanged rows (1, 3, 9) must be suppressed; got $got")

    // deleteWhere shows up as deletes; the untouched partitions still prune
    val v3 = lake.deleteWhere(col("id") === 4L, Seq("part"))
    val dels = lake.changes(v2, v3, Seq("id", "part"), Seq("part"))
      .collect().map(r => (r.getString(0), r.getLong(r.fieldIndex("id")))).toSet
    assert(dels === Set(("delete", 4L)))

    // an optimize-only boundary changes dirs but zero rows → zero events
    val v4 = lake.optimize(targetBytes = 1L << 30)
    if (v4 > v3)
      assert(lake.changes(v3, v4, Seq("id", "part"), Seq("part")).count() === 0L,
        "optimize moves bytes, not rows — the CDF must be empty")

    // identity: no version gap, no events
    assert(lake.changes(v2, v2, Seq("id", "part"), Seq("part")).count() === 0L)
  }

  test("changes() across schema evolution: rows gaining a column surface as updates") {
    import spark.implicits._
    val (lake, _) = fresh()
    val v1 = lake.commit(
      Seq((1L, "a"), (2L, "a")).toDF("id", "part"), Seq("part"))
    val v2 = lake.commit(
      Seq((1L, "a", "x"), (2L, "a", null.asInstanceOf[String])).toDF("id", "part", "extra"),
      Seq("part"))
    val got = lake.changes(v1, v2, Seq("id", "part"), Seq("part"))
      .collect().map(r => (r.getString(0), r.getLong(r.fieldIndex("id")))).toSet
    // id 1 gained a value (NULL → x): update pair; id 2 stayed NULL: suppressed
    assert(got === Set(("update_pre", 1L), ("update_post", 1L)))
  }

  test("optimize never clobbers a concurrent commit to the same partition") {
    val (lake, dir) = fresh()
    lake.commit(batch("F", "O")("old").repartition(6), Seq("o_orderstatus"))
    // simulate the race: plan+rewrite happened against v1, but a writer
    // replaces partition F before optimize's manifest merge runs — the
    // interleaving is deterministic here because optimize re-reads the
    // latest manifest inside its CAS loop
    val t = new Thread(() => lake.optimize(targetBytes = 1L << 30))
    lake.commit(batch("F")("new"), Seq("o_orderstatus"))
    t.start(); t.join()

    val got = lake.read(Seq("o_orderstatus"))
      .groupBy("o_orderstatus", "pointer").count()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got.contains(("F", "new")),
      "the concurrent writer's F partition must survive the optimize")
    assert(!got.contains(("F", "old")),
      "optimize must never resurrect the pre-commit F bytes")
    assert(got.contains(("O", "old")))
  }

  /** Run `body` while counting Spark jobs: (result, jobs started, max jobs
    * in flight at once). The listener bus is async, so counters are read
    * only after they have been quiescent for half a second.
    */
  private def withJobStats[T](body: => T): (T, Int, Int) = {
    val started = new java.util.concurrent.atomic.AtomicInteger(0)
    val running = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxConc = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        started.incrementAndGet()
        val r = running.incrementAndGet()
        maxConc.getAndUpdate(m => math.max(m, r))
      }
      override def onJobEnd(
          j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        running.decrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val out = body
      var last = -1
      var stable = 0
      while (stable < 5) {
        Thread.sleep(100)
        val s = started.get()
        if (s == last) stable += 1 else { stable = 0; last = s }
      }
      (out, started.get(), maxConc.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("commit and deleteWhere stage 50 partitions in one job each — job count is bounded") {
    import spark.implicits._
    val (lake, _) = fresh()
    val df = (0 until 2000).map(i => (i.toLong, s"p${i % 50}", s"payload$i"))
      .toDF("id", "part", "payload")
    val (_, commitJobs, _) = withJobStats(lake.commit(df, Seq("part")))
    assert(commitJobs <= 12,
      s"commit of 50 partitions ran $commitJobs jobs — staging must be one " +
        "partitionBy job, not one job per partition")
    // the delete touches EVERY partition (ids 0..999 cover all 50 residues)
    // and keeps rows in every partition; before batching this was 50+ jobs
    val (_, delJobs, _) = withJobStats(
      lake.deleteWhere(col("id") < 1000, Seq("part")))
    assert(delJobs <= 12,
      s"deleteWhere across 50 candidate partitions ran $delJobs jobs")
    val got = lake.read(Seq("part"))
    assert(got.count() === 1000L)
    assert(got.filter(col("id") < 1000).count() === 0L)
    assert(got.select("part").distinct().count() === 50L)
  }

  test("optimize compacts a 40-partition backlog with overlapping bounded-pool jobs") {
    import spark.implicits._
    val (lake, _) = fresh()
    val df = (0 until 4000).map(i => (i.toLong, s"p${i % 40}", s"x$i"))
      .toDF("id", "part", "payload")
    lake.commit(df.repartition(8), Seq("part")) // ~8 small files per partition
    val before = lake.read(Seq("part")).select("id", "part", "payload")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val (v, _, maxConc) = withJobStats(lake.optimize(targetBytes = 1L << 30))
    assert(v === 2L)
    assert(maxConc >= 2,
      s"40 per-partition rewrites never overlapped (max in flight $maxConc) — " +
        "the bounded pool must run them concurrently, not driver-sequentially")
    val after = lake.read(Seq("part")).select("id", "part", "payload")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(after === before, "optimize must not change a single row")
  }

  test("the reserved Hive default-partition value is rejected; empty string round-trips") {
    import spark.implicits._
    val (lake, _) = fresh()
    val e = intercept[IllegalArgumentException] {
      lake.commit(Seq((1L, "__HIVE_DEFAULT_PARTITION__")).toDF("id", "part"), Seq("part"))
    }
    assert(e.getMessage.contains("reserved"), e.getMessage)
    // "" renders into the same directory name, but with NULL and the
    // literal both rejected it is unambiguous and must survive a round trip
    lake.commit(Seq((1L, ""), (2L, "p")).toDF("id", "part"), Seq("part"))
    val got = lake.read(Seq("part")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "", 2L -> "p"))
    lake.deleteWhere(col("id") === 2L, Seq("part"))
    assert(lake.read(Seq("part")).collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("restore: rollback is a by-reference commit; history, vacuum, and CDF agree") {
    import spark.implicits._
    val (lake, _) = fresh()
    def rows(p: String, pointer: String) =
      (0 until 5).map(i => (i.toLong, p, pointer)).toDF("id", "part", "pointer")
    lake.commit(rows("a", "v1"), Seq("part"))
    lake.commit(rows("a", "v2"), Seq("part"))
    lake.commit(rows("b", "v3"), Seq("part"))
    val v4 = lake.restore(1L)
    assert(v4 === 4L)
    // content is exactly v1's
    val got = lake.read(Seq("part")).select("part", "pointer").distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("a", "v1")))
    assert(lake.history.map(_._2).contains("restore"))
    // the restore boundary reports exactly the reverted rows
    val ch = lake.changes(3L, v4, Seq("id", "part"), Seq("part"))
    assert(ch.filter(col("_change") === "delete").count() === 5L, "partition b rows revert away")
    assert(ch.filter(col("_change") === "update_post")
      .select("pointer").distinct().collect().map(_.getString(0)).toSeq === Seq("v1"))
    // vacuum keeps the restored (re-referenced) dirs live
    lake.vacuum(keepLast = 1, minAgeMs = 0L)
    assert(lake.read(Seq("part")).select("pointer").distinct()
      .collect().map(_.getString(0)).toSeq === Seq("v1"))
    // restoring a vacuumed version fails with the named error
    val e = intercept[IllegalStateException](lake.restore(2L))
    assert(e.getMessage.contains("vacuumed"), e.getMessage)
  }

  test("changes()/changedPartitions against a vacuumed baseline fail loudly, not empty") {
    import spark.implicits._
    val (lake, _) = fresh()
    def rows(p: String, n: Int) =
      (0 until n).map(i => (i.toLong, p)).toDF("id", "part")
    lake.commit(rows("a", 5), Seq("part"))
    lake.commit(rows("b", 5), Seq("part"))
    lake.commit(rows("c", 5), Seq("part"))
    lake.vacuum(keepLast = 1, minAgeMs = 0L)
    val e = intercept[IllegalStateException] {
      lake.changes(1L, 3L, Seq("id", "part"), Seq("part"))
    }
    assert(e.getMessage.contains("vacuumed"), e.getMessage)
    assert(e.getMessage.contains("version 1"), e.getMessage)
    val e2 = intercept[IllegalStateException] {
      lake.changedPartitions(1L, 3L)
    }
    assert(e2.getMessage.contains("vacuumed"), e2.getMessage)
    // the surviving span still feeds the CDF normally
    assert(lake.changes(3L, 3L, Seq("id", "part"), Seq("part")).count() === 0L)
  }

  test("scd2: validity intervals from the commit history (insert, update, delete)") {
    import spark.implicits._
    val (lake, _) = fresh()
    def rows(ver: Long, t: (Long, String, String)*) =
      t.toSeq.toDF("id", "part", "val").withColumn("ver", lit(ver))
    // v1: A=a1, B=b1   v2: A→a2 (update), C=c1 (insert)   v3: delete B
    lake.upsert(rows(1L, (1L, "p", "a1"), (2L, "p", "b1")), Seq("id", "part"), "ver", Seq("part"))
    lake.upsert(rows(2L, (1L, "p", "a2"), (3L, "p", "c1")), Seq("id", "part"), "ver", Seq("part"))
    lake.deleteWhere(col("id") === 2L, Seq("part"))

    val got = lake.scd2(Seq("id", "part"), Seq("part"))
      .select(col("id"), col("val"), col("valid_from_version"),
        col("valid_to_version"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(got == Set(
      (1L, "a1", 1L, Some(2L)), // superseded by the v2 update
      (1L, "a2", 2L, None),     // current
      (2L, "b1", 1L, Some(3L)), // closed by the v3 delete
      (3L, "c1", 2L, None)),    // current since v2
      s"wrong interval table: $got")

    // the current slice (valid_to NULL) must equal the latest snapshot
    val current = got.filter(_._4.isEmpty).map(t => (t._1, t._2))
    val latest = lake.read(Seq("part")).select("id", "val")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(current == latest)
  }

  test("shallow clone: zero-copy reference, independent divergence, carried watermarks") {
    val (src, srcDir) = fresh()
    src.commit(batch("F", "O", "P")("first"), Seq("o_orderstatus"))
    src.commitIfNew("streamA", 7L, batch("F")("second"), Seq("o_orderstatus"))

    val dstDir = Files.createTempDirectory("graft_snap_clone").toString + "/lake"
    val cv = src.cloneTo(dstDir)
    assert(cv === 1L)
    val clone = new SnapshotLake(spark, dstDir)

    // content identical to the source snapshot, with ZERO data copied
    val srcRows = src.read(Seq("o_orderstatus")).collect().map(_.toString).sorted
    val cloneRows = clone.read(Seq("o_orderstatus")).collect().map(_.toString).sorted
    assert(cloneRows.toSeq == srcRows.toSeq)
    val cloneData = java.nio.file.Paths.get(dstDir, "data")
    val staged = { val s = Files.list(cloneData); try s.count() finally s.close() }
    assert(staged === 0L, "shallow clone must not stage any data directories")

    // watermarks carry: replaying the already-committed batch is a no-op
    assert(clone.lastTxn("streamA").contains(7L))
    assert(clone.commitIfNew("streamA", 7L, batch("F")("replay"), Seq("o_orderstatus")).isEmpty)

    // divergence: a commit at the clone stays at the clone
    clone.commit(batch("O")("cloned-edit"), Seq("o_orderstatus"))
    val after = clone.read(Seq("o_orderstatus"))
      .select("o_orderstatus", "pointer").distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(after === Set(("F", "second"), ("O", "cloned-edit"), ("P", "first")))
    val srcAfter = src.read(Seq("o_orderstatus"))
      .select("pointer").distinct().collect().map(_.getString(0)).toSet
    assert(srcAfter === Set("first", "second"), "source must not see clone edits")

    // vacuum at the CLONE only reclaims clone-staged dirs — source intact
    clone.vacuum(keepLast = 1, minAgeMs = 0L)
    assert(src.read(Seq("o_orderstatus")).count() > 0)
    assert(clone.read(Seq("o_orderstatus")).count() > 0)

    // refusal: cloning onto a live lake
    val e = intercept[IllegalArgumentException] { src.cloneTo(dstDir) }
    assert(e.getMessage.contains("refusing"), e.getMessage)
  }

  test("shallow clone caveats: vacuumed-version refusal; source vacuum breaks clone loudly") {
    val (src, _) = fresh()
    src.commit(batch("F")("v1"), Seq("o_orderstatus"))
    src.commit(batch("F")("v2"), Seq("o_orderstatus"))
    src.vacuum(keepLast = 1, minAgeMs = 0L)
    val e = intercept[IllegalStateException] {
      src.cloneTo(Files.createTempDirectory("graft_snap_cv").toString + "/lake", Some(1L))
    }
    assert(e.getMessage.contains("vacuumed"), e.getMessage)

    // clone latest, then vacuum the source past it: the shared-data caveat —
    // the clone's read must fail LOUDLY, never return silently empty
    val dst = Files.createTempDirectory("graft_snap_cx").toString + "/lake"
    src.cloneTo(dst)
    val clone = new SnapshotLake(spark, dst)
    assert(clone.read(Seq("o_orderstatus")).count() > 0)
    src.commit(batch("F")("v3"), Seq("o_orderstatus"))
    src.vacuum(keepLast = 1, minAgeMs = 0L) // reclaims v2's dir, still clone-referenced
    val broken = intercept[Exception] {
      clone.read(Seq("o_orderstatus")).collect()
    }
    assert(broken != null)
  }
  test("files() metadata view: per-file rows/bytes, time travel, optimize visibility") {
    import spark.implicits._
    val (lake, _) = fresh()
    val v1 = lake.commit(batch("F", "O")("first").repartition(4), Seq("o_orderstatus"))
    val f1 = lake.files(Seq("o_orderstatus"), Some(v1))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(f1.forall(_._3 > 0L), "every file has positive bytes")
    val rowsByPart = f1.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val expect = batch("F", "O")("first")
      .groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rowsByPart == expect, s"footer row counts must sum to the table: $rowsByPart vs $expect")
    assert(f1.groupBy(_._1).forall(_._2.length > 1), "repartition(4) left multiple files")

    lake.optimize(targetBytes = 1L << 30)
    val v2 = lake.latestVersion.get
    val f2 = lake.files(Seq("o_orderstatus"), Some(v2))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(f2.groupBy(_._1).forall(_._2.length == 1), "optimize bin-packs to one file")
    assert(f2.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap == expect,
      "optimize conserves rows")
    // the old layout stays visible through time travel
    assert(lake.files(Seq("o_orderstatus"), Some(v1)).count() == f1.length.toLong)
    intercept[IllegalArgumentException] { lake.files(Seq("o_orderstatus"), Some(999L)) }
  }
  test("incremental consumer: bootstrap, delta, caught-up, replay, monotone ack") {
    import spark.implicits._
    val (lake, _) = fresh()
    val v1 = lake.commit(batch("F", "O")("first"), Seq("o_orderstatus"))

    // bootstrap: full snapshot as inserts
    val (boot, ackV1) = lake.changesForConsumer("etl", Seq("o_orderkey", "o_orderstatus"),
      Seq("o_orderstatus"))
    assert(ackV1 == v1)
    assert(boot.filter(col("_change") =!= "insert").count() == 0)
    assert(boot.count() == batch("F", "O")("first").count())

    // crash before ack: the SAME bootstrap replays (at-least-once)
    val (replay, _) = lake.changesForConsumer("etl", Seq("o_orderkey", "o_orderstatus"),
      Seq("o_orderstatus"))
    assert(replay.count() == boot.count(), "unacknowledged delta must replay")

    lake.ackConsumer("etl", ackV1)
    // caught up: zero rows
    val (empty, sameV) = lake.changesForConsumer("etl", Seq("o_orderkey", "o_orderstatus"),
      Seq("o_orderstatus"))
    assert(sameV == v1 && empty.count() == 0)

    // a second commit becomes the next delta, and equals the direct CDF
    val v2 = lake.commit(batch("F")("second"), Seq("o_orderstatus"))
    val (delta, ackV2) = lake.changesForConsumer("etl", Seq("o_orderkey", "o_orderstatus"),
      Seq("o_orderstatus"))
    assert(ackV2 == v2)
    val direct = lake.changes(v1, v2, Seq("o_orderkey", "o_orderstatus"), Seq("o_orderstatus"))
    assert(delta.select("o_orderkey", "_change").collect().toSet ==
      direct.select("o_orderkey", "_change").collect().toSet)
    lake.ackConsumer("etl", ackV2)

    // two independent consumers have independent offsets
    assert(lake.consumerOffset("other").isEmpty)
    intercept[IllegalArgumentException] { lake.ackConsumer("etl", v1) } // no rewind
    intercept[IllegalArgumentException] { lake.ackConsumer("etl", 999L) }
    intercept[IllegalArgumentException] { lake.consumerOffset("../evil") }
  }

  test("commitValidated: a failing check rejects the batch atomically, a passing one lands") {
    import graft.ops.Validate._
    val (lake, dir) = fresh()
    val good = batch("F")("first")
    lake.commitValidated(good, Seq("o_orderstatus"), Seq(NotNull("pointer")))
    assert(lake.read(Seq("o_orderstatus")).count() == good.count())
    val bad = good.withColumn("pointer",
      when(col("o_orderkey") % 10 === 0, lit(null).cast("string")).otherwise(col("pointer")))
    val e = intercept[IllegalArgumentException] {
      lake.commitValidated(bad, Seq("o_orderstatus"), Seq(NotNull("pointer")))
    }
    assert(e.getMessage.contains("not_null(pointer)"), e.getMessage)
    assert(lake.latestVersion.contains(1L), "rejected batch must not create a version")
    assert(lake.read(Seq("o_orderstatus")).filter(col("pointer").isNull).count() == 0)
  }
  test("replicateTo: partial-partition change, deletes, replay — exactly once") {
    import spark.implicits._
    val (src, _) = fresh()
    val (dst, _) = fresh()

    // bootstrap
    src.commit(batch("F", "O")("first"), Seq("o_orderstatus"))
    src.replicateTo(dst, "repl", Seq("o_orderstatus"))
    assert(dst.read(Seq("o_orderstatus")).count() == batch("F", "O")("first").count())

    // PARTIAL change of partition F: only odd keys move to "second" — the
    // row-delta-through-partition-commit antipattern would drop the even
    // rows; whole-partition snapshot replication must keep them
    val fAll = batch("F")("first")
    val fMixed = fAll.withColumn("pointer",
      when(col("o_orderkey") % 2 === 1, lit("second")).otherwise(col("pointer")))
    src.commit(fMixed, Seq("o_orderstatus"))
    src.replicateTo(dst, "repl", Seq("o_orderstatus"))
    val fAtDst = dst.read(Seq("o_orderstatus")).filter(col("o_orderstatus") === "F")
    assert(fAtDst.count() == fAll.count(), "unchanged rows of the partition must survive")
    assert(fAtDst.filter(col("o_orderkey") % 2 === 1 && col("pointer") =!= "second")
      .count() == 0)
    assert(fAtDst.filter(col("o_orderkey") % 2 === 0 && col("pointer") =!= "first")
      .count() == 0)

    // partition REMOVAL propagates as a delete
    src.deleteWhere(col("o_orderstatus") === "O", Seq("o_orderstatus"))
    src.replicateTo(dst, "repl", Seq("o_orderstatus"))
    assert(dst.read(Seq("o_orderstatus")).filter(col("o_orderstatus") === "O").count() == 0)

    // replay safety: a zombie that re-runs the SAME round after a
    // simulated crash-before-ack cannot duplicate or resurrect anything
    val v4 = src.commit(batch("P")("third"), Seq("o_orderstatus"))
    src.replicateTo(dst, "repl", Seq("o_orderstatus"))
    val settled = dst.read(Seq("o_orderstatus")).collect().toSet
    // zombie: wind the consumer world back by replaying apply directly
    assert(dst.commitIfNew("repl", v4,
      batch("P")("third"), Seq("o_orderstatus")).isEmpty, "watermark blocks the replay")
    assert(dst.read(Seq("o_orderstatus")).collect().toSet == settled)
    // caught-up call is a no-op returning the same version
    assert(src.replicateTo(dst, "repl", Seq("o_orderstatus")) == v4)
  }
}
