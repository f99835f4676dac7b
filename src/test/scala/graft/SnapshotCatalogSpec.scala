package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.apps.EtlRun
import graft.catalog.{LakeCatalog, SnapshotCatalog}

/** The catalog API over SnapshotLake manifest commits: identical merge
  * results to the lock-based backend, snapshot-isolated same-partition
  * concurrency without locks, time travel over catalog history, and drop-in
  * use by the ETL loop.
  */
class SnapshotCatalogSpec extends SparkSpec {

  import spark.implicits._

  private def batch(source: String, lo: Int, n: Int, stamp: String, ptr: String) = {
    val rows = (lo until lo + n).map(i =>
      ("raw", source, s"base_$i", "x.txt", s"${ptr}_$i",
        Timestamp.valueOf("2020-01-15 00:00:00"), null.asInstanceOf[Timestamp],
        Timestamp.valueOf(stamp), null.asInstanceOf[String]))
    rows.toDF(graft.model.Schemas.catalog.fieldNames: _*)
  }

  private def snapshot(cat: graft.catalog.CatalogStore): Set[(String, String, String)] =
    cat.read().select("data_source", "id_base", "pointer")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  test("snapshot backend merges exactly like the lock backend, batch for batch") {
    val lockCat = new LakeCatalog(spark, Files.createTempDirectory("graft_sc_lock").toString)
    val snapCat = new SnapshotCatalog(spark, Files.createTempDirectory("graft_sc_snap").toString)
    val batches = Seq(
      batch("bt", 0, 30, "2020-02-01 00:00:00", "v1"),
      batch("wt", 0, 20, "2020-02-01 00:00:00", "v1"),
      // overlaps bt 10..29 with a LATER processing_date → overrides
      batch("bt", 10, 25, "2020-02-02 00:00:00", "v2"),
      // overlaps bt 0..14 with an EARLIER processing_date → must lose
      batch("bt", 0, 15, "2020-01-20 00:00:00", "v0"))
    batches.foreach { b => lockCat.upsert(b); snapCat.upsert(b) }
    assert(snapshot(lockCat) === snapshot(snapCat))
    // and the merge outcome itself is right: v2 rows beat v1 beat v0
    val got = snapCat.read().filter(col("data_source") === "bt")
      .select("id_base", "pointer")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got("base_5") === "v1_5", "earlier-stamped v0 must not override v1")
    assert(got("base_12") === "v2_12")
    assert(got("base_34") === "v2_34")
  }

  test("time travel: each upsert is one version; old versions stay readable") {
    val cat = new SnapshotCatalog(spark, Files.createTempDirectory("graft_sc_tt").toString)
    val v1 = cat.commit(batch("bt", 0, 10, "2020-02-01 00:00:00", "v1"))
    val v2 = cat.commit(batch("bt", 5, 10, "2020-02-02 00:00:00", "v2"))
    assert(cat.versions === Seq(v1, v2))
    assert(cat.readAt(Some(v1)).count() === 10)
    assert(cat.readAt(Some(v1)).filter(col("pointer").startsWith("v2")).count() === 0)
    val latest = cat.read()
    assert(latest.count() === 15)
    assert(latest.filter(col("pointer").startsWith("v2")).count() === 10)
    // query() filters work over the trait surface
    assert(cat.query("raw", dataSource = Some("bt"), base = Some("base_7")).count() === 1)
  }

  test("concurrent SAME-partition upserts all land without locks") {
    val cat = new SnapshotCatalog(spark, Files.createTempDirectory("graft_sc_conc").toString)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (0 until 4).map(w =>
      Future(cat.commit(batch("bt", w * 100, 25, "2020-02-01 00:00:00", s"w$w"))))
    val versions = Await.result(Future.sequence(fs), 180.seconds)
    assert(versions.toSet.size === 4, "every writer must win a distinct version")
    assert(cat.read().count() === 100, "no writer's disjoint batch may be lost")
    // losers' abandoned staging directories are reclaimable, winners' are not
    cat.vacuum(keepLast = 1, minAgeMs = 0L)
    assert(cat.read().count() === 100)
  }

  test("changes(): catalog CDF names exactly the entries a sync consumer must reprocess") {
    val cat = new SnapshotCatalog(spark, Files.createTempDirectory("graft_sc_cdf").toString)
    val v1 = cat.commit(batch("bt", 0, 10, "2020-02-01 00:00:00", "v1"))
    // 5 overridden (later stamp), 3 new, wt untouched elsewhere
    val v2 = cat.commit(batch("bt", 5, 8, "2020-02-02 00:00:00", "v2"))
    val got = cat.changes(v1, v2)
      .groupBy("_change").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("update_pre" -> 5L, "update_post" -> 5L, "insert" -> 3L),
      s"5..9 override, 10..12 insert; got $got")
  }

  test("EtlRun drop-in: exactly-once item gating over the snapshot backend") {
    val cat = new SnapshotCatalog(spark, Files.createTempDirectory("graft_sc_etl").toString)
    val day1 = Seq(
      ("austin", "unmatched.txt", Timestamp.valueOf("2020-01-15 00:00:00")),
      ("austin", "matched.txt", Timestamp.valueOf("2020-01-15 00:00:00")))
      .toDF("id_base", "id_ext", "collection_date")
    val processed = scala.collection.mutable.ArrayBuffer.empty[Long]
    def stage(df: org.apache.spark.sql.DataFrame): Unit = processed += df.count()
    assert(EtlRun.run(spark, day1, cat, "rawjson", "bt")(stage) == 2)
    assert(EtlRun.run(spark, day1, cat, "rawjson", "bt")(stage) == 0)
    assert(EtlRun.run(spark, day1, cat, "rawjson", "bt", force = true)(stage) == 2)
    assert(processed.sum == 4)
    // catalog history: one version per non-empty run
    assert(cat.versions.size === 2)
  }

  test("history records one audited row per commit; vacuum drops old audit rows") {
    val cat = new SnapshotCatalog(spark, Files.createTempDirectory("graft_sc_hist").toString)
    val t0 = System.currentTimeMillis()
    cat.commit(batch("bt", 0, 10, "2020-02-01 00:00:00", "v1"))
    cat.commit(batch("bt", 5, 10, "2020-02-02 00:00:00", "v2"))
    val h = cat.history().orderBy("version").collect()
    assert(h.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(h.forall(_.getString(1) == "upsert"))
    assert(h.forall(r => r.getLong(2) >= t0 && r.getLong(2) <= System.currentTimeMillis()))
    assert(h.forall(_.getInt(3) === 1))
    // raw partition-grain commits + deletes audit with their own ops
    cat.lake.commit(
      batch("wt", 0, 5, "2020-02-03 00:00:00", "v3"),
      graft.catalog.LakeCatalog.PartitionCols)
    cat.lake.deleteWhere(col("id_base") === "base_0", graft.catalog.LakeCatalog.PartitionCols)
    val ops = cat.history().orderBy("version").collect().map(_.getString(1)).toSeq
    assert(ops === Seq("upsert", "upsert", "commit", "delete"))
    cat.vacuum(keepLast = 1, minAgeMs = 0L)
    assert(cat.history().count() === 1L)
  }

  test("history is a CatalogStore surface: both backends answer who wrote what when") {
    val backends: Seq[graft.catalog.CatalogStore] = Seq(
      new LakeCatalog(spark, Files.createTempDirectory("graft_hist_lock").toString),
      new SnapshotCatalog(spark, Files.createTempDirectory("graft_hist_snap").toString))
    val t0 = System.currentTimeMillis()
    backends.foreach { cat =>
      assert(cat.history().count() === 0L, "empty catalog, empty audit")
      cat.upsert(batch("bt", 0, 10, "2020-02-01 00:00:00", "v1"))
      // second upsert touches TWO partitions
      cat.upsert(
        batch("bt", 5, 10, "2020-02-02 00:00:00", "v2")
          .unionByName(batch("wt", 0, 5, "2020-02-02 00:00:00", "v2")))
      val h = cat.history().orderBy("version").collect()
      assert(h.map(_.getLong(0)).toSeq === Seq(1L, 2L), "versions monotone from 1")
      assert(h.map(_.getString(1)).toSeq === Seq("upsert", "upsert"))
      assert(h.forall(r => r.getLong(2) >= t0 && r.getLong(2) <= System.currentTimeMillis()))
      assert(h.map(_.getInt(3)).toSeq === Seq(1, 2), "touched-partition counts audited")
    }
  }

  test("StreamingEtlRun drop-in: the snapshot backend gates a real stream exactly-once") {
    val src = Files.createTempDirectory("graft_scetl_src_").toString
    val ckpt = Files.createTempDirectory("graft_scetl_ck_").toString
    val cat = new SnapshotCatalog(spark, Files.createTempDirectory("graft_scetl_cat_").toString)

    var processed = 0L
    def stage(df: org.apache.spark.sql.DataFrame): Unit = processed += df.count()
    def items(rows: (String, String, String)*) =
      rows.toSeq.map { case (b, e, d) => (b, e, Timestamp.valueOf(d)) }
        .toDF("id_base", "id_ext", "collection_date")
    val schema = items().schema
    def run(checkpoint: String = ckpt): Unit =
      graft.streaming.StreamingEtlRun.run(
        spark, src, schema, cat, "rawjson", "gs", checkpoint)(stage)

    items(("siteA", "counts.json", "2020-01-15 00:00:00"),
      ("siteB", "counts.json", "2020-01-15 00:00:00"))
      .write.mode("append").parquet(src)
    run()
    assert(processed == 2 && cat.read().count() == 2)
    // replayed item in a NEW file: the checkpoint can't gate it, the
    // snapshot catalog's anti-join does
    items(("siteA", "counts.json", "2020-01-15 00:00:00"),
      ("siteC", "counts.json", "2020-01-16 00:00:00"))
      .write.mode("append").parquet(src)
    run()
    assert(processed == 3 && cat.read().count() == 3)
    // checkpoint loss: full source replay, zero novel items
    run(Files.createTempDirectory("graft_scetl_ck2_").toString)
    assert(processed == 3 && cat.read().count() == 3)
    // and the catalog history audited one upsert per NON-EMPTY novel batch
    assert(cat.history().filter(col("op") === "upsert").count() === cat.versions.size.toLong)
  }
  test("catalog consumers ride the lake's offset machinery") {
    val cat = new SnapshotCatalog(spark, Files.createTempDirectory("graft_catcons").toString)
    cat.upsert(batch("bt", 0, 3, "2020-02-01 00:00:00", "p1"))
    val (boot, v1) = cat.changesForConsumer("sync")
    assert(boot.count() == 3 &&
      boot.filter(col("_change") =!= "insert").count() == 0)
    cat.ackConsumer("sync", v1)
    cat.upsert(batch("bt", 0, 1, "2020-02-02 00:00:00", "p2"))
    val (delta, v2) = cat.changesForConsumer("sync")
    assert(v2 > v1 && delta.count() > 0)
    assert(cat.consumerOffset("sync").contains(v1))
    cat.ackConsumer("sync", v2)
    assert(cat.consumerOffset("sync").contains(v2))
  }
}
