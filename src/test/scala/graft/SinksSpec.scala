package graft

import java.nio.file.Files
import java.sql.Timestamp

import scala.collection.mutable

import graft.sinks.Sinks

class SinksSpec extends SparkSpec {

  import spark.implicits._

  test("K1 writeLake lays out year/month/day/data_source partitions") {
    val dir = Files.createTempDirectory("graft_lake_").toString
    val df = Seq(
      (Timestamp.valueOf("2020-01-15 08:00:00"), "r1", 5),
      (Timestamp.valueOf("2020-01-16 09:00:00"), "r2", 7))
      .toDF("ts", "reader", "n")
    Sinks.writeLake(df, "ts", "bt", dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 2)
    // partition pruning path exists
    val pruned = back.filter($"year" === 2020 && $"day" === 15)
    assert(pruned.count() == 1)
    assert(Files.exists(java.nio.file.Paths.get(
      dir, "year=2020", "month=1", "day=15", "data_source=bt")))
  }

  test("envelope assembly reproduces document form") {
    val df = Seq(
      ("unmatched", "2020-01-15", "r1", "a"),
      ("unmatched", "2020-01-15", "r2", "b"))
      .toDF("data_type", "collection_date", "reader_id", "dev_addr")
    val doc = Sinks.assembleEnvelope(
      df, Seq("data_type", "collection_date"), Seq("reader_id", "dev_addr"),
      sortCols = Seq("reader_id"))
    val json = doc.toJSON.collect().head
    assert(json.contains(""""header":{"data_type":"unmatched","collection_date":"2020-01-15"}"""))
    assert(json.contains(""""data":[{"reader_id":"r1","dev_addr":"a"},{"reader_id":"r2","dev_addr":"b"}]"""))
  }

  test("K3 buffered publisher chunks, throttles per partition, and retries") {
    val collected = SinksSpec.sink
    collected.clear()
    SinksSpec.failures.set(2) // first two calls fail → retry path
    val df = (1 to 25).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
    Sinks.publishBuffered(df, SinksSpec.TestConnector, chunkSize = 10,
      maxCallsPerSec = 1000.0, maxRetries = 5)
    assert(collected.map(_.size).sorted == mutable.ArrayBuffer(5, 10, 10))
    assert(collected.flatten.map(_("id").asInstanceOf[Int]).toSet == (1 to 25).toSet)
  }

  test("K4 CSV publisher writes headered output") {
    val dir = Files.createTempDirectory("graft_csv_").toString + "/out"
    Sinks.writeCsv(Seq((1, "a"), (2, "b")).toDF("id", "v").coalesce(1), dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.columns.toSeq == Seq("id", "v"))
    assert(back.count() == 2)
  }
}

object SinksSpec {
  // local-mode: executors share the JVM, so a static buffer observes writes
  val sink: mutable.ArrayBuffer[Seq[Map[String, Any]]] = mutable.ArrayBuffer.empty
  val failures = new java.util.concurrent.atomic.AtomicInteger(0)

  object TestConnector extends Sinks.Connector {
    def writeChunk(rows: Seq[Map[String, Any]]): Unit = {
      if (failures.getAndDecrement() > 0) throw new RuntimeException("transient")
      failures.compareAndSet(-1, 0)
      sink.synchronized { sink += rows }
    }
  }
}
