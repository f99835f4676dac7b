package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.catalog.SnapshotLake

/** `df.writeStream.format("graft")` — the lake as an exactly-once
  * streaming sink: each micro-batch lands through a txn-watermarked write
  * (`appendIfNew` by default, `upsertDvIfNew` with pk + versionCol), so
  * engine-level batch replay after a crash cannot duplicate rows. Paired
  * with the graft source this is lake→lake replication in one line.
  */
class StreamingLakeSinkSpec extends SparkSpec {

  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_sink_lake").toString

  test("append sink: micro-batches row-append; a replayed batchId lands nothing twice") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = freshRoot()
    val ckpt = Files.createTempDirectory("graft_sink_ckpt1").toString
    val mem = MemoryStream[(Long, String, String)]
    val q = mem.toDF().toDF("id", "name", "part")
      .writeStream.format("graft")
      .option("partitionCols", "part").option("appId", "sink-append-1")
      .option("checkpointLocation", ckpt)
      .start(root)
    try {
      mem.addData((1L, "a", "p1"), (2L, "b", "p2"))
      q.processAllAvailable()
      mem.addData((3L, "c", "p1")) // second batch APPENDS into p1
      q.processAllAvailable()
    } finally q.stop()
    val lake = new SnapshotLake(spark, root)
    val got = lake.read(Seq("part")).select("id", "name")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")),
      s"both batches must land, the second adding (not replacing) p1: $got")
    // the watermark IS exactly-once: replaying the last batch by hand no-ops
    val before = lake.latestVersion.get
    val replayed = lake.appendIfNew("sink-append-1", 1L,
      Seq((3L, "c", "p1")).toDF("id", "name", "part"), Seq("part"))
    assert(replayed.isEmpty && lake.latestVersion.get == before,
      "a replayed (appId, batchId) must be a no-op")
    // restart on the same checkpoint with NO new data: nothing re-lands
    val q2 = mem.toDF().toDF("id", "name", "part")
      .writeStream.format("graft")
      .option("partitionCols", "part").option("appId", "sink-append-1")
      .option("checkpointLocation", ckpt)
      .start(root)
    try q2.processAllAvailable() finally q2.stop()
    assert(lake.read(Seq("part")).count() == 3L, "restart must not duplicate")
  }

  test("merge sink (pk + versionCol): upserts land exactly-once per batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = freshRoot()
    val lake = new SnapshotLake(spark, root)
    lake.commit(
      Seq((1L, "a", 1L, "p1"), (2L, "b", 1L, "p1"))
        .toDF("id", "name", "ver", "part"), Seq("part"))
    val ckpt = Files.createTempDirectory("graft_sink_ckpt2").toString
    val mem = MemoryStream[(Long, String, Long, String)]
    val q = mem.toDF().toDF("id", "name", "ver", "part")
      .writeStream.format("graft")
      .option("pk", "id,part").option("versionCol", "ver")
      .option("checkpointLocation", ckpt)
      .start(root)
    try {
      mem.addData((1L, "a2", 2L, "p1"), (9L, "z", 2L, "p9"))
      q.processAllAvailable()
      mem.addData((1L, "stale", 0L, "p1")) // loses latest-wins, lands nothing
      q.processAllAvailable()
    } finally q.stop()
    val got = lake.read(Seq("part")).select("id", "name")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a2"), (2L, "b"), (9L, "z")),
      s"update + insert land, the stale row neither lands nor deletes: $got")
  }

  test("lake→lake streaming replication: source CDF into a merge sink, one line") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val srcRoot = freshRoot()
    val dstRoot = freshRoot()
    val src = new SnapshotLake(spark, srcRoot)
    src.commit(
      Seq((1L, "a", 1L, "p1"), (2L, "b", 1L, "p1"), (3L, "c", 1L, "p2"))
        .toDF("id", "name", "ver", "part"), Seq("part"))
    val ckpt = Files.createTempDirectory("graft_sink_ckpt3").toString
    def mirror(): Unit = {
      val q = spark.readStream.format("graft").option("pk", "id,part").load(srcRoot)
        .filter(col("_change").isin("insert", "update_post")).drop("_change")
        .writeStream.format("graft")
        .option("pk", "id,part").option("versionCol", "ver")
        .option("partitionCols", "part") // dst starts empty: no meta yet
        .option("checkpointLocation", ckpt)
        .start(dstRoot)
      try q.processAllAvailable() finally q.stop()
    }
    mirror() // bootstrap
    src.commit(Seq((1L, "a2", 2L, "p1"), (2L, "b", 1L, "p1"))
      .toDF("id", "name", "ver", "part"), Seq("part"))
    mirror() // delta after restart — resumes from the checkpoint
    val dst = new SnapshotLake(spark, dstRoot)
    assert(dst.read(Seq("part")).select("id", "name").as[(Long, String)]
      .collect().toSet == Set((1L, "a2"), (2L, "b"), (3L, "c")),
      "the mirror must equal the source's latest content")
    val v = dst.latestVersion.get
    mirror() // third run, nothing new: no version moves
    assert(dst.latestVersion.get == v, "an empty resume must write nothing")
  }

  test("refusals: Complete mode, pk without versionCol") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF().toDF("id", "part")
    val eC = intercept[Exception](
      df.groupBy("part").count().writeStream.format("graft")
        .outputMode("complete")
        .option("checkpointLocation", Files.createTempDirectory("c").toString)
        .start(freshRoot()))
    assert(eC.getMessage.contains("Complete"), eC.getMessage)
    val eP = intercept[Exception](
      df.writeStream.format("graft").option("pk", "id")
        .option("checkpointLocation", Files.createTempDirectory("c").toString)
        .start(freshRoot()))
    assert(eP.getMessage.contains("versionCol"), eP.getMessage)
  }
}
