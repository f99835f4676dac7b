package graft

import java.nio.file.Files
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.apps.EtlRun
import graft.catalog.LakeCatalog
import graft.ops.Perfmet

/** The reference's core correctness ritual (docs/appendix_testing.md:76-87):
  * run a stage twice — the second run must process 0 items; `-F` must force
  * reprocessing; newly-arrived items process incrementally.
  */
class EtlRunSpec extends SparkSpec {

  import spark.implicits._

  private def items(rows: (String, String, String)*) =
    rows.toSeq.map { case (b, e, d) => (b, e, Timestamp.valueOf(d)) }
      .toDF("id_base", "id_ext", "collection_date")

  test("idempotency: second run processes 0; force reprocesses; new items increment") {
    val dir = Files.createTempDirectory("graft_etl_").toString
    val cat = new LakeCatalog(spark, dir)
    val processed = scala.collection.mutable.ArrayBuffer.empty[Long]
    def stage(df: org.apache.spark.sql.DataFrame): Unit = processed += df.count()

    val day1 = items(
      ("austin", "unmatched.txt", "2020-01-15 00:00:00"),
      ("austin", "matched.txt", "2020-01-15 00:00:00"))

    assert(EtlRun.run(spark, day1, cat, "rawjson", "bt")(stage) == 2)
    // run 2: nothing new
    assert(EtlRun.run(spark, day1, cat, "rawjson", "bt")(stage) == 0)
    // force: everything again
    assert(EtlRun.run(spark, day1, cat, "rawjson", "bt", force = true)(stage) == 2)
    // new day arrives: only it processes
    val twoDays = day1.unionByName(items(("austin", "unmatched.txt", "2020-01-16 00:00:00")))
    assert(EtlRun.run(spark, twoDays, cat, "rawjson", "bt")(stage) == 1)
    // same-day cancel: today's still-filling item is skipped
    val withToday = twoDays.unionByName(items(("austin", "unmatched.txt", "2020-06-15 00:00:00")))
    assert(EtlRun.run(spark, withToday, cat, "rawjson", "bt",
      today = lit("2020-06-15").cast("date"))(stage) == 0)
    // different repository tracks independently
    assert(EtlRun.run(spark, day1, cat, "ready", "bt")(stage) == 2)
    assert(processed.sum == 7)
  }

  test("catalog upsert is partition-scoped: unrelated partitions' files untouched") {
    val dir = Files.createTempDirectory("graft_etl_part_").toString
    val cat = new LakeCatalog(spark, dir)
    def stage(df: org.apache.spark.sql.DataFrame): Unit = ()

    // seed two data sources and two repositories → 3 physical partitions
    val day1 = items(("austin", "unmatched.txt", "2020-01-15 00:00:00"))
    assert(EtlRun.run(spark, day1, cat, "rawjson", "bt")(stage) == 1)
    assert(EtlRun.run(spark, day1, cat, "rawjson", "wt")(stage) == 1)
    assert(EtlRun.run(spark, day1, cat, "ready", "bt")(stage) == 1)

    def fingerprint(sub: String): Map[String, String] = {
      val root = java.nio.file.Paths.get(dir, "current", sub)
      val s = Files.walk(root)
      try s.iterator().asScala.filter(Files.isRegularFile(_)).map { p =>
        root.relativize(p).toString ->
          java.util.Base64.getEncoder.encodeToString(
            java.security.MessageDigest.getInstance("MD5").digest(Files.readAllBytes(p)))
      }.toMap
      finally s.close()
    }
    val btBefore = fingerprint("repository=rawjson/data_source=bt")
    val readyBefore = fingerprint("repository=ready/data_source=bt")
    assert(btBefore.nonEmpty && readyBefore.nonEmpty)

    // new wt day: only the (rawjson, wt) partition may be rewritten
    val twoDays = day1.unionByName(items(("austin", "unmatched.txt", "2020-01-16 00:00:00")))
    assert(EtlRun.run(spark, twoDays, cat, "rawjson", "wt")(stage) == 1)

    assert(fingerprint("repository=rawjson/data_source=bt") == btBefore)
    assert(fingerprint("repository=ready/data_source=bt") == readyBefore)
    // the touched partition did change and holds both days
    assert(cat.read().filter(
      col("repository") === "rawjson" && col("data_source") === "wt").count() == 2)
    // and the full catalog still reads coherently across partitions
    assert(cat.read().count() == 4)
  }

  test("concurrent upserts to different partitions do not conflict") {
    val dir = Files.createTempDirectory("graft_etl_conc_").toString
    val cat = new LakeCatalog(spark, dir)
    def batch(source: String, n: Int) = {
      val rows = (1 to n).map(i =>
        ("raw", source, s"base_$i", "x.txt", s"p_$i",
          Timestamp.valueOf("2020-01-15 00:00:00"), null.asInstanceOf[Timestamp],
          Timestamp.valueOf(s"2020-02-0${1 + i % 9} 00:00:00"), null.asInstanceOf[String]))
      rows.toDF(graft.model.Schemas.catalog.fieldNames: _*)
    }
    // each ETL stage owns one (repository, data_source) cell — the common
    // concurrency pattern; partition-scoped swaps mean these never touch
    // each other's files
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = Seq("bt", "wt", "gs").map(src => Future(cat.upsert(batch(src, 40))))
    Await.result(Future.sequence(fs), 120.seconds)
    assert(cat.read().count() == 120)
    assert(cat.read().groupBy("data_source").count().count() == 3)
    // a second wave over the same partitions (serial per partition) merges
    Seq("bt", "wt", "gs").foreach(src => cat.upsert(batch(src, 10)))
    assert(cat.read().count() == 120) // latest-wins, no duplicates
  }

  test("concurrent upserts to the SAME partition serialize — no lost updates") {
    val dir = Files.createTempDirectory("graft_etl_same_").toString
    val cat = new LakeCatalog(spark, dir)
    def batch(lo: Int, n: Int) = {
      val rows = (lo until lo + n).map(i =>
        ("raw", "bt", s"base_$i", "x.txt", s"p_$i",
          Timestamp.valueOf("2020-01-15 00:00:00"), null.asInstanceOf[Timestamp],
          Timestamp.valueOf("2020-02-01 00:00:00"), null.asInstanceOf[String]))
      rows.toDF(graft.model.Schemas.catalog.fieldNames: _*)
    }
    // without the per-partition lock, both writers read the same prior
    // state and the later swap drops the earlier batch
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (0 until 4).map(w => Future(cat.upsert(batch(w * 100, 25))))
    Await.result(Future.sequence(fs), 180.seconds)
    assert(cat.read().count() == 100) // all four disjoint batches survived
    // and the lock files were released
    val locks = Files.list(java.nio.file.Paths.get(dir, "locks"))
    try assert(!locks.iterator().hasNext) finally locks.close()
  }

  test("a crashed holder's stale lock is taken over after the lease expires") {
    val dir = Files.createTempDirectory("graft_etl_stale_").toString
    val cat = new LakeCatalog(spark, dir, lockLeaseMs = 1000)
    def batch(lo: Int, n: Int) = {
      val rows = (lo until lo + n).map(i =>
        ("raw", "bt", s"base_$i", "x.txt", s"p_$i",
          Timestamp.valueOf("2020-01-15 00:00:00"), null.asInstanceOf[Timestamp],
          Timestamp.valueOf("2020-02-01 00:00:00"), null.asInstanceOf[String]))
      rows.toDF(graft.model.Schemas.catalog.fieldNames: _*)
    }
    cat.upsert(batch(0, 5))
    // simulate a holder that died mid-upsert: its lock file exists, carries
    // a foreign token, and its heartbeat stopped well past the lease
    val locksDir = java.nio.file.Paths.get(dir, "locks")
    Files.createDirectories(locksDir)
    val dead = locksDir.resolve("raw__bt.lock")
    Files.write(dead, "token-of-a-dead-holder".getBytes("UTF-8"))
    Files.setLastModifiedTime(dead,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 10000))
    // the next writer takes the lease over instead of wedging until the
    // 120 s acquisition timeout; nothing from the first batch is lost
    val t0 = System.nanoTime()
    cat.upsert(batch(100, 5))
    assert((System.nanoTime() - t0) / 1e9 < 60, "takeover should not wait out the full timeout")
    assert(cat.read().count() == 10)
    // and release left no lock files behind (stale claim included)
    val locks = Files.list(locksDir)
    try assert(!locks.iterator().hasNext) finally locks.close()
  }

  test("a stalled holder whose lock was taken over aborts at the commit fence") {
    val dir = Files.createTempDirectory("graft_etl_fence_").toString
    val cat = new LakeCatalog(spark, dir)
    def batch(lo: Int, n: Int, slowMs: Int = 0) = {
      val rows = (lo until lo + n).map(i =>
        ("raw", "bt", s"base_$i", "x.txt", s"p_$i",
          Timestamp.valueOf("2020-01-15 00:00:00"), null.asInstanceOf[Timestamp],
          Timestamp.valueOf("2020-02-01 00:00:00"), null.asInstanceOf[String]))
      val df = rows.toDF(graft.model.Schemas.catalog.fieldNames: _*)
      if (slowMs == 0) df
      else {
        val slow = org.apache.spark.sql.functions.udf((s: String) => {
          Thread.sleep(slowMs.toLong); true
        })
        df.filter(slow(org.apache.spark.sql.functions.col("id_base")))
      }
    }
    cat.upsert(batch(0, 5))
    val lock = java.nio.file.Paths.get(dir, "locks", "raw__bt.lock")

    // writer A merges slowly (stall simulated by a sleeping predicate);
    // while it merges, its lock is usurped — as a contender's takeover +
    // re-create would after a lease expiry — so A's commit fence must abort
    // the swap instead of overwriting the usurper's state
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val a = Future(cat.upsert(batch(100, 40, slowMs = 100)))
    val deadline = System.nanoTime() + 30L * 1000000000L
    while (!Files.exists(lock) && System.nanoTime() < deadline) Thread.sleep(10)
    assert(Files.exists(lock), "writer A never acquired the lock")
    Thread.sleep(100)
    Files.write(lock, "token-of-the-usurper".getBytes("UTF-8"))

    intercept[java.util.ConcurrentModificationException] {
      Await.result(a, 120.seconds)
    }
    // A neither committed its batch nor deleted the usurper's lock
    assert(cat.read().count() == 5)
    assert(Files.exists(lock) &&
      new String(Files.readAllBytes(lock), "UTF-8") == "token-of-the-usurper")
    Files.delete(lock)
  }

  test("a LIVE holder outlasting the lease is not taken over (heartbeat)") {
    val dir = Files.createTempDirectory("graft_etl_beat_").toString
    // lease far shorter than an upsert's several-second runtime: only the
    // mtime heartbeat keeps concurrent same-partition writers serialized
    val cat = new LakeCatalog(spark, dir, lockLeaseMs = 700)
    def batch(lo: Int, n: Int) = {
      val rows = (lo until lo + n).map(i =>
        ("raw", "bt", s"base_$i", "x.txt", s"p_$i",
          Timestamp.valueOf("2020-01-15 00:00:00"), null.asInstanceOf[Timestamp],
          Timestamp.valueOf("2020-02-01 00:00:00"), null.asInstanceOf[String]))
      rows.toDF(graft.model.Schemas.catalog.fieldNames: _*)
    }
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (0 until 3).map(w => Future(cat.upsert(batch(w * 100, 20))))
    Await.result(Future.sequence(fs), 180.seconds)
    // a false takeover would let two writers merge against the same prior
    // state and silently drop a batch
    assert(cat.read().count() == 60)
  }

  test("perfmet: sensor obs, 7-day expected, latest, gap fill") {
    val events = Tables(spark, "/root/testdata/sf0.001", "events")
    val obs = Perfmet.sensorObs(events, "user_id", "ts")
    assert(obs.columns.toSeq ==
      Seq("sensor_name", "collection_date", "data", "min_timestamp", "max_timestamp"))

    val expected = Perfmet.expectedValues(obs)
    // trailing average over ≤7 days can never exceed the running max
    val bad = expected.join(
      obs.groupBy("sensor_name").agg(max("data").as("mx")), Seq("sensor_name"))
      .filter(col("expected") > col("mx") + 1e-9)
    assert(bad.count() == 0)

    val latest = Perfmet.latestPerSensor(obs)
    assert(latest.groupBy("sensor_name").count().filter(col("count") > 1).count() == 0)

    // gap fill: a phantom sensor gets a -1 row for the day
    val sensors = obs.select("sensor_name")
      .union(Seq(99999L).toDF("sensor_name")).distinct()
    val day = obs.agg(max("collection_date")).head().getDate(0)
    val filled = Perfmet.fillGaps(obs, sensors, lit(day.toString))
    val phantom = filled.filter(col("sensor_name") === 99999L)
    assert(phantom.count() == 1)
    assert(phantom.select("data").as[Double].head() == -1.0)

    val range = Perfmet.jobRange(events, "ts", representsDay = true).head()
    assert(range.getTimestamp(1).after(range.getTimestamp(0)))
  }
}
