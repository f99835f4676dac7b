package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Scan-side operators (SURVEY §2.1).
  *
  * Design split: *file listing* (S1/S2) is a metadata operation done on the
  * driver through the Hadoop FileSystem API — at 100 TB the listing is
  * thousands of entries, not data, and the catalog (graft.catalog) is the
  * real index. *Data reads* are ordinary Spark scans with declared schemas,
  * so pushdown/pruning work. The zip source (S5) is the one genuinely
  * custom reader: executors unpack archive bytes with a flatMap, since
  * GRIDSMART ships zips of per-zone CSVs measured in tens of MB.
  */
object Sources {

  /** S1/S2 — date-directory scan: list `dir`, parse a date out of each
    * filename matching `prefix<date>postfix` with `datePattern` (a
    * java.time format), return (path, base, ext, date) rows sorted and
    * deduplicated (reference `util/date_dirs.py:55-75`,
    * `drivers/last_upd_fs.py:34-82`).
    */
  def dateDirScan(
      spark: SparkSession,
      dir: String,
      prefix: String,
      datePattern: String,
      postfix: String,
      base: String,
      ext: String): DataFrame = {
    import spark.implicits._
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fmt = java.time.format.DateTimeFormatter.ofPattern(datePattern)
    val files = fs.listStatus(new Path(dir)).toSeq.filter(_.isFile).map(_.getPath)
    val rows = files.flatMap { p =>
      val name = p.getName
      if (name.startsWith(prefix) && name.endsWith(postfix) &&
        name.length > prefix.length + postfix.length) {
        val datePart = name.substring(prefix.length, name.length - postfix.length)
        try {
          val d = java.time.LocalDate.parse(datePart, fmt)
          Some((p.toString, base, ext, java.sql.Date.valueOf(d)))
        } catch { case _: java.time.format.DateTimeParseException => None }
      } else None
    }
    // deterministic representative per date: several files can parse to the
    // same date (the reference keeps the last listed, `date_dirs.py:68-72`,
    // which is filesystem-order-dependent); min(path) is stable across runs
    rows
      .toDF("path", "id_base", "id_ext", "collection_date")
      .groupBy("collection_date")
      .agg(
        min(col("path")).as("path"),
        first(col("id_base")).as("id_base"),
        first(col("id_ext")).as("id_ext"))
      .select("path", "id_base", "id_ext", "collection_date")
      .orderBy("collection_date")
  }

  /** S3 — headerless CSV with a declared schema (reference bt readers,
    * `bt_json_standard.py:138-144`): `csv.DictReader(fieldnames=...)`
    * becomes a schema'd scan.
    */
  def headerlessCsv(spark: SparkSession, schema: StructType, paths: String*): DataFrame =
    spark.read.schema(schema).option("header", "false").csv(paths: _*)

  /** S4 — headered CSV (reference wt, `wt_json_standard.py:95-109`). */
  def headeredCsv(spark: SparkSession, schema: StructType, paths: String*): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(paths: _*)

  /** S5 — zip-archive scan: read archives as binary files, unpack entries in
    * executors, return one row per (archive, entryName, text) (reference
    * `drivers/devices/gs_investigate.py:16-92`, `util/zip_helper.py:12-80`).
    * Nested zips (the reference's "layout B", a zip of per-date zips) are
    * unpacked one level when `recurse`.
    *
    * Archives are tens of MB (reference `docs/appendix_testing.md:36-46`),
    * so per-entry byte arrays are safe; each archive is one task — scale-out
    * is per-archive, which matches the per-device-per-day ingest shape.
    */
  def zipScan(spark: SparkSession, glob: String, recurse: Boolean = true): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    bin.flatMap { case (path, bytes) =>
      unzipEntries(bytes).flatMap {
        case (name, data) if recurse && name.toLowerCase.endsWith(".zip") =>
          unzipEntries(data).map { case (inner, innerData) =>
            (path, s"$name/$inner", new String(innerData, "UTF-8"))
          }
        case (name, data) => Seq((path, name, new String(data, "UTF-8")))
      }
    }.toDF("archive", "entry", "text")
  }

  private def unzipEntries(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = ArrayBuffer.empty[(String, Array[Byte])]
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zis.getNextEntry
      while (e != null) {
        if (!e.isDirectory) out += ((e.getName, zis.readAllBytes()))
        e = zis.getNextEntry
      }
    } finally zis.close()
    out.toSeq
  }

  /** Parse CSV text rows (e.g. zip entries) with a declared schema. */
  def csvFromText(spark: SparkSession, text: Dataset[String], schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "false").csv(text)

  /** S6 — GRIDSMART count-version sniffing: the first value of the first
    * line selects the column set (reference
    * `GSJSONStandard.getAPIVersion/setDataColumns` `gs_json_standard.py:
    * 125-154`). Returns the matching schema for a sample line.
    */
  def gsSchemaFor(firstLine: String): StructType = {
    val version = firstLine.takeWhile(_ != ',').trim.toInt
    version match {
      case 8 => graft.model.Schemas.gsCountsV8
      case 7 => graft.model.Schemas.gsCountsV7
      case 4 => graft.model.Schemas.gsCountsV4
      case v => throw new IllegalArgumentException(s"unsupported GRIDSMART count_version $v")
    }
  }

  /** Document-envelope JSON reader: one `{"header":…, "data":[…]}` document
    * per file → relational rows with `header.*` columns broadcast onto the
    * exploded `data` array (SURVEY §1.1 — the exploded form is what all
    * computation uses; [[graft.sinks.Sinks.assembleEnvelope]] reverses it).
    */
  def envelopeJson(
      spark: SparkSession,
      schema: StructType,
      headerCols: Seq[String],
      paths: String*): DataFrame = {
    val docs = spark.read.schema(schema).option("multiLine", "true").json(paths: _*)
    val hdr = headerCols.map(h => col(s"header.$h").as(s"hdr_$h"))
    val exploded = docs.select(hdr :+ explode(col("data")).as("row"): _*)
    val names = headerCols.map(h => s"hdr_$h") :+ "row.*"
    exploded.select(names.head, names.tail: _*)
  }
}
