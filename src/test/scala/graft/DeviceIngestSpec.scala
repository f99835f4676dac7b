package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.functions._

import graft.sources.DeviceIngest

/** S8 ingest-client logic against a deterministic fake transport: chunk
  * assembly across ranged reads, transient-failure retry with resume at the
  * failed offset, the counts.json date listing, and the distributed
  * per-device fetch.
  */
/** Serves byte payloads from a map; every (path, offset) fails on its first
  * attempt when `flaky`, succeeding on retry — so a download only completes
  * if retry + offset resume both work. Top-level (not an inner class) so
  * executor closures don't drag the spec instance along.
  */
class FakeTransport(objects: Map[String, Array[Byte]], flaky: Boolean)
    extends DeviceIngest.Transport {
  private val attempts = new ConcurrentHashMap[String, Integer]()
  override def fetch(path: String, offset: Long, maxBytes: Int): Array[Byte] = {
    if (flaky) {
      val k = s"$path@$offset"
      val n = attempts.merge(k, 1, (a, b) => a + b)
      if (n == 1) throw new java.io.IOException(s"transient failure at $k")
    }
    val data = objects.getOrElse(path, throw new java.io.FileNotFoundException(path))
    val from = math.min(offset, data.length.toLong).toInt
    val to = math.min(from + maxBytes.toLong, data.length.toLong).toInt
    java.util.Arrays.copyOfRange(data, from, to)
  }
}

object DeviceIngestFixture {
  val day1: Array[Byte] = Array.tabulate[Byte](2500)(i => (i % 251).toByte)
  val objects: Map[String, Array[Byte]] = Map(
    "counts.json" -> """["2020-01-15", "2020-01-16", "2020-01-15"]""".getBytes("UTF-8"),
    "counts/bydate/2020-01-15" -> day1,
    "counts/bydate/2020-01-16" -> "small".getBytes("UTF-8"))
}

class DeviceIngestSpec extends SparkSpec {

  import DeviceIngestFixture.{day1, objects}

  test("chunked download reassembles exactly, including multi-chunk payloads") {
    val t = new FakeTransport(objects, flaky = false)
    val got = DeviceIngest.download(t, "counts/bydate/2020-01-15", chunkBytes = 1000)
    assert(got.toSeq == day1.toSeq) // 3 chunks: 1000 + 1000 + 500
    assert(DeviceIngest.download(t, "counts/bydate/2020-01-16", chunkBytes = 1000)
      .toSeq == "small".getBytes("UTF-8").toSeq)
  }

  test("transient failures retry and resume at the failed offset") {
    val t = new FakeTransport(objects, flaky = true)
    val got = DeviceIngest.download(t, "counts/bydate/2020-01-15", chunkBytes = 1000)
    assert(got.toSeq == day1.toSeq)
  }

  test("retries are bounded: a permanently failing path surfaces the error") {
    val dead = new DeviceIngest.Transport {
      override def fetch(p: String, o: Long, m: Int): Array[Byte] =
        throw new java.io.IOException("down")
    }
    intercept[java.io.IOException] {
      DeviceIngest.download(dead, "anything", maxRetries = 2)
    }
  }

  test("counts.json date list parses, dedups and sorts") {
    val t = new FakeTransport(objects, flaky = true)
    val dates = DeviceIngest.availableDates(t)
    assert(dates.map(_.toString) == Seq("2020-01-15", "2020-01-16"))
    assert(DeviceIngest.dayArchivePath(dates.head) == "counts/bydate/2020-01-15")
  }

  test("distributed per-device fetch attaches payloads in executors") {
    import spark.implicits._
    val devices = Seq(
      ("dev1", "counts/bydate/2020-01-15"),
      ("dev2", "counts/bydate/2020-01-16"))
      .toDF("device_id", "path")
    val got = DeviceIngest.fetchPerDevice(
      devices, "path",
      () => new FakeTransport(DeviceIngestFixture.objects, flaky = true),
      chunkBytes = 1000)
    val sizes = got.select(col("device_id"), length(col("payload")))
      .as[(String, Int)].collect().toMap
    assert(sizes == Map("dev1" -> 2500, "dev2" -> 5))
  }
}
