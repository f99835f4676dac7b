package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{ScanBuilder, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, WriteBuilder}
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.catalog.SnapshotLake

/** [[SnapshotLake]] as a Spark DataSourceV2 table — the pure-SQL read
  * surface next to the API one:
  *
  * {{{
  *   spark.read.format("graft").load(root)                       // latest
  *   spark.read.format("graft").option("version", 3).load(root)  // time travel
  *   CREATE TABLE t USING graft OPTIONS (path '<root>'); SELECT ... FROM t
  * }}}
  *
  * Resolution goes through the SAME `readEntries` seam as the API
  * ([[SnapshotLake.read]]): column mapping (renames), the typemap
  * (zero-rewrite widening), deletion vectors, and manifest snapshot
  * isolation are all inherited rather than re-implemented — the scan is
  * exposed to Spark through the [[V1Scan]] bridge, whose relation simply
  * IS the API read's RDD. Partition column names resolve from the lake's
  * own `partcols` meta (recorded at commit time); the `partitionCols`
  * option (comma-separated) overrides, and is required only for lakes
  * written before the meta existed. Writes stay API-only in v1.
  *
  * Registered via META-INF/services ([[DataSourceRegister]]), so
  * `format("graft")` resolves with no session configuration at all.
  */
class GraftLakeProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftLakeProvider.resolve(options).schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GraftLakeTable(schema, new CaseInsensitiveStringMap(properties))
}

private[sources] object GraftLakeProvider {

  /** One resolution seam for schema inference and execution: the API read
    * at the requested version with the recorded (or overridden) partition
    * column names.
    */
  def resolve(options: CaseInsensitiveStringMap): DataFrame = {
    val spark = SparkSession.active
    val raw = Option(options.get("path")).filter(_.nonEmpty).getOrElse(
      throw new IllegalArgumentException(
        "graft: no lake path — pass it via .load(<root>) or OPTIONS (path '<root>')"))
    // CREATE TABLE normalizes the location to a URI ("file:/tmp/x") —
    // resolve local-scheme URIs back to a filesystem path
    val path =
      if (raw.startsWith("file:")) java.nio.file.Paths.get(java.net.URI.create(raw)).toString
      else raw
    val lake = new SnapshotLake(spark, path)
    val version = Option(options.get("version")).map(_.toLong)
    val partCols = Option(options.get("partitioncols"))
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .orElse(lake.partitionColumns(version))
      .getOrElse(throw new IllegalArgumentException(
        s"graft: lake at $path predates the partcols meta — pass " +
          "option(\"partitionCols\", \"a,b\") explicitly"))
    lake.read(partCols, version)
  }

  /** The write seam: INSERT INTO → row-append, INSERT OVERWRITE →
    * partition-replace commit. Partition columns resolve exactly like the
    * read side (lake meta, option override); a write to an EMPTY lake
    * requires the option (there is no meta to read yet).
    */
  def write(options: CaseInsensitiveStringMap, data: DataFrame, overwrite: Boolean): Unit = {
    val spark = data.sparkSession
    val raw = Option(options.get("path")).filter(_.nonEmpty).getOrElse(
      throw new IllegalArgumentException(
        "graft: no lake path — pass it via OPTIONS (path '<root>')"))
    val path =
      if (raw.startsWith("file:")) java.nio.file.Paths.get(java.net.URI.create(raw)).toString
      else raw
    val lake = new SnapshotLake(spark, path)
    val partCols = Option(options.get("partitioncols"))
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .orElse(if (lake.versions.nonEmpty) lake.partitionColumns(None) else None)
      .getOrElse(throw new IllegalArgumentException(
        s"graft: cannot infer partition columns for a write to $path — pass " +
          "option(\"partitionCols\", \"a,b\") (required for an empty or " +
          "pre-partcols lake)"))
    if (overwrite) lake.commit(data, partCols)
    else if (lake.versions.isEmpty) lake.commit(data, partCols) // first write
    else lake.append(data, partCols)
    ()
  }
}

private class GraftLakeTable(
    tableSchema: StructType, options: CaseInsensitiveStringMap)
  extends Table with SupportsRead with SupportsWrite {

  override def name(): String = {
    val v = Option(options.get("version")).fold("")(v => s"@v$v")
    s"graft.`${options.get("path")}`$v"
  }

  override def schema(): StructType = tableSchema

  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE).asJava

  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder = {
    // merge CREATE TABLE-time options with read-time ones (read-time wins)
    val merged = new CaseInsensitiveStringMap(
      (options.asScala ++ caseInsensitive.asScala).asJava)
    () => new GraftLakeScan(tableSchema, merged)
  }

  /** SQL writes through the V1Write bridge, mapped to the lake's write
    * grains: `INSERT INTO` → [[graft.catalog.SnapshotLake.append]] (true
    * row-append — rows ADD, nothing replaces), `INSERT OVERWRITE` →
    * [[graft.catalog.SnapshotLake.commit]] (the partition-replace grain,
    * exactly dynamic-partition-overwrite semantics: only the partitions
    * the batch touches are replaced). Time-travel tables refuse writes.
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val merged = new CaseInsensitiveStringMap(
      (options.asScala ++ info.options().asScala).asJava)
    require(!merged.containsKey("version"),
      "graft: cannot write to a time-travel table (version option set)")
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): V1Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          (data: DataFrame, _: Boolean) => {
            val ow = overwrite
            GraftLakeProvider.write(merged, data, ow)
          }
      }
    }
  }
}

/** The [[V1Scan]] bridge: Spark plans a DSv2 relation, execution delegates
  * to a [[TableScan]] whose rows come from the API read itself — one seam,
  * zero re-implementation of mapping/widening/DV semantics.
  */
private class GraftLakeScan(
    tableSchema: StructType, options: CaseInsensitiveStringMap) extends V1Scan {

  override def readSchema(): StructType = tableSchema

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = tableSchema
      override def buildScan(): org.apache.spark.rdd.RDD[Row] = {
        // the TableScan contract: rows MUST match `schema`. A catalog
        // table captures its schema at CREATE time, but the lake keeps
        // evolving underneath (rename/widen/drop land as new versions) —
        // align the live read to the declared shape: lossless casts for
        // widened columns, NULLs for columns the snapshot no longer has.
        val df = GraftLakeProvider.resolve(options)
        val live = df.schema.fields.map(f => f.name -> f.dataType).toMap
        df.select(tableSchema.fields.toSeq.map { f =>
          live.get(f.name) match {
            case Some(t) if t == f.dataType =>
              org.apache.spark.sql.functions.col(f.name)
            case Some(t) if org.apache.spark.sql.catalyst.expressions.Cast
                .canUpCast(t, f.dataType) =>
              org.apache.spark.sql.functions.col(f.name).cast(f.dataType).as(f.name)
            case Some(t) =>
              // e.g. the column WIDENED after CREATE TABLE: a silent
              // narrowing cast would corrupt — make the staleness loud
              throw new IllegalArgumentException(
                s"graft: table schema declares ${f.name}: ${f.dataType.catalogString} " +
                  s"but the lake now holds ${t.catalogString} — the table's captured " +
                  "schema is stale after a widen; recreate the table (or read via " +
                  "spark.read.format(\"graft\"), which always infers the live schema)")
            case None =>
              org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)
          }
        }: _*).rdd
      }
    }.asInstanceOf[T]
}
