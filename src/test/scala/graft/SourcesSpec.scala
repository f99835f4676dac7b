package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.model.Schemas
import graft.sources.Sources

/** Scan operators (SURVEY §2.1) against on-the-fly fixtures shaped per
  * FIXTURES.md A1-A5.
  */
class SourcesSpec extends SparkSpec {

  import spark.implicits._

  private def tmpDir(): Path = Files.createTempDirectory("graft_src_")

  test("S1/S2 dateDirScan parses, dedups and bounds filename dates") {
    val dir = tmpDir()
    Seq(
      "Austin_bt_01-15-2020.txt", "Austin_bt_01-16-2020.txt",
      "Austin_bt_01-15-2020.txt.bak", // wrong postfix boundary → has extra suffix, skipped
      "Austin_bt_garbage.txt", // unparseable date → skipped
      "other_file.csv")
      .foreach(n => Files.writeString(dir.resolve(n), "x"))
    val got = Sources
      .dateDirScan(spark, dir.toString, "Austin_bt_", "MM-dd-yyyy", ".txt", "austin", "unmatched.txt")
      .select("collection_date").as[java.sql.Date].collect().map(_.toString).toSeq
    assert(got == Seq("2020-01-15", "2020-01-16"))
  }

  test("S3 headerless CSV with declared bt schema") {
    val dir = tmpDir()
    Files.writeString(dir.resolve("bt.txt"),
      "01/15/2020 08:00:01 AM,10.0.0.1,01/15/2020 08:00:00 AM,r1,AbC=\n" +
        "01/15/2020 08:00:02 AM,10.0.0.2,01/15/2020 08:00:01 AM,r2,DeF=\n")
    val df = Sources.headerlessCsv(spark, Schemas.btUnmatchedRaw, dir.resolve("bt.txt").toString)
    assert(df.columns.toSeq == Seq(
      "host_timestamp", "ip_address", "field_timestamp", "reader_id", "dev_addr"))
    assert(df.count() == 2)
  }

  test("S5 zipScan unpacks flat and nested archives in executors") {
    val dir = tmpDir()
    def zipBytes(entries: (String, Array[Byte])*): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val z = new ZipOutputStream(bos)
      entries.foreach { case (n, b) =>
        z.putNextEntry(new ZipEntry(n)); z.write(b); z.closeEntry()
      }
      z.close(); bos.toByteArray
    }
    val inner = zipBytes("guid1.csv" -> "8,s,80000.5,360,S\n".getBytes)
    val outer = zipBytes(
      "00-11-22/2020-01-15.zip" -> inner, // layout B: nested date zip
      "00-11-22/readme.txt" -> "hi".getBytes)
    val f = new FileOutputStream(dir.resolve("device.zip").toFile)
    f.write(outer); f.close()
    val got = Sources.zipScan(spark, dir.toString + "/*.zip")
      .select("entry", "text").as[(String, String)].collect().toMap
    assert(got.keySet == Set("00-11-22/2020-01-15.zip/guid1.csv", "00-11-22/readme.txt"))
    assert(got("00-11-22/2020-01-15.zip/guid1.csv").startsWith("8,s,"))
  }

  test("S6 GRIDSMART version sniffing selects the column set") {
    assert(Sources.gsSchemaFor("8,site1,80000.5,360").fieldNames.length == 14)
    assert(Sources.gsSchemaFor("7,site1,80000.5,360").fieldNames.length == 13)
    assert(Sources.gsSchemaFor("4,site1,20200115T080000").fieldNames.length == 16)
    intercept[IllegalArgumentException](Sources.gsSchemaFor("9,x"))
  }

  test("envelope JSON explodes to relational form with header broadcast") {
    val dir = tmpDir()
    Files.writeString(dir.resolve("doc.json"),
      """{"header": {"data_type": "unmatched", "collection_date": "2020-01-15"},
        |"data": [{"reader_id": "r1", "dev_addr": "a"},
        |          {"reader_id": "r2", "dev_addr": "b"}]}""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("header",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("data_type",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("collection_date",
            org.apache.spark.sql.types.StringType)))),
      org.apache.spark.sql.types.StructField("data",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("reader_id",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("dev_addr",
            org.apache.spark.sql.types.StringType)))))))
    val got = Sources.envelopeJson(
      spark, schema, Seq("data_type", "collection_date"), dir.resolve("doc.json").toString)
    assert(got.columns.toSeq == Seq("hdr_data_type", "hdr_collection_date", "reader_id", "dev_addr"))
    assert(got.count() == 2)
  }
}
