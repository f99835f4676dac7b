package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.catalog.SnapshotLake

/** A Spark [[TableCatalog]] over a DIRECTORY OF LAKES — the full SQL
  * catalog surface for [[SnapshotLake]] tables, on top of the
  * format("graft") provider:
  *
  * {{{
  *   spark.sql.catalog.lakes       = graft.sources.GraftCatalog
  *   spark.sql.catalog.lakes.root  = /data/lakes
  *
  *   CREATE TABLE lakes.t (id BIGINT, name STRING, part STRING)
  *     PARTITIONED BY (part)
  *   INSERT INTO lakes.t ...                  -- row-append
  *   SELECT * FROM lakes.t VERSION AS OF 3    -- time travel, SQL-native
  *   SELECT * FROM lakes.t TIMESTAMP AS OF '...'
  *   ALTER TABLE lakes.t RENAME COLUMN name TO title   -- zero-rewrite
  *   ALTER TABLE lakes.t ALTER COLUMN cnt TYPE BIGINT  -- zero-rewrite widen
  *   ALTER TABLE lakes.t DROP COLUMN name              -- metadata-only
  *   DELETE FROM lakes.t WHERE ...            -- deletion vectors
  *   DROP TABLE lakes.t
  * }}}
  *
  * Each table is one lake at `<root>/<name>` — the SAME layout the API
  * and `format("graft")` read, so every surface sees every write. Tables
  * resolve with their LIVE schema on each load (evolution tracks
  * automatically). `VERSION AS OF` maps to the manifest version;
  * `TIMESTAMP AS OF` resolves through [[SnapshotLake.history]]'s
  * committed-at clock (latest version at-or-before the timestamp).
  * `ALTER TABLE` maps onto the lake's zero-rewrite evolution ops
  * (renameColumn / widenColumn / dropColumn); anything else refuses by
  * name. A table created before its first INSERT persists its declared
  * schema + partitioning in a `.graft-table.json` sidecar that the first
  * commit supersedes.
  */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = _
  private var root: Path = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Paths.get(Option(options.get("root")).filter(_.nonEmpty).getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog '$name' needs spark.sql.catalog.$name.root = <directory of lakes>")))
    Files.createDirectories(root)
  }

  override def name(): String = catalogName

  private def tableDir(ident: Identifier): Path = {
    require(ident.namespace().isEmpty ||
      ident.namespace().sameElements(Array("default")),
      s"graft catalog is single-level: use $catalogName.<table>, " +
        s"got namespace ${ident.namespace().mkString(".")}")
    val n = ident.name()
    require(n.nonEmpty && !n.contains('/') && !n.contains(".."),
      s"illegal table name '$n'")
    root.resolve(n)
  }

  private def sidecar(dir: Path): Path = dir.resolve(".graft-table.json")

  private def isTable(dir: Path): Boolean =
    Files.isDirectory(dir.resolve("manifests")) || Files.exists(sidecar(dir))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val s = Files.list(root)
    try s.iterator().asScala
      .filter(d => Files.isDirectory(d) && isTable(d))
      .map(d => Identifier.of(namespace, d.getFileName.toString))
      .toArray.sortBy(_.name())
    finally s.close()
  }

  override def tableExists(ident: Identifier): Boolean = isTable(tableDir(ident))

  private def optionsFor(dir: Path, extra: Map[String, String]): CaseInsensitiveStringMap = {
    val lake = new SnapshotLake(SparkSession.active, dir.toString)
    val side: Map[String, String] =
      if (lake.versions.isEmpty && Files.exists(sidecar(dir))) {
        val s = new String(Files.readAllBytes(sidecar(dir)), "UTF-8")
        def field(k: String) = s.split(s""""$k":"""", 2) match {
          case Array(_, rest) => Some(rest.takeWhile(_ != '"'))
          case _ => None
        }
        field("partcols").filter(_.nonEmpty)
          .map(pc => Map("partitionCols" -> pc)).getOrElse(Map.empty)
      } else Map.empty
    new CaseInsensitiveStringMap(
      (Map("path" -> dir.toString) ++ side ++ extra).asJava)
  }

  private def schemaFor(dir: Path, opts: CaseInsensitiveStringMap): StructType = {
    val lake = new SnapshotLake(SparkSession.active, dir.toString)
    if (lake.versions.nonEmpty) GraftLakeProvider.resolve(opts).schema
    else {
      val s = new String(Files.readAllBytes(sidecar(dir)), "UTF-8")
      val ddl = s.split(""""schema":"""", 2) match {
        case Array(_, rest) => rest.takeWhile(_ != '"')
        case _ => throw new IllegalStateException(s"corrupt sidecar at ${sidecar(dir)}")
      }
      StructType.fromDDL(unescape(ddl))
    }
  }

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\u0022")
  private def unescape(s: String): String =
    s.replace("\\u0022", "\"").replace("\\\\", "\\")

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val opts = optionsFor(dir, Map.empty)
    new GraftLakeTable(schemaFor(dir, opts), opts)
  }

  /** `VERSION AS OF <v>` — the manifest version, verbatim. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft: VERSION AS OF takes a numeric lake version, got '$version'")
    }
    val opts = optionsFor(dir, Map("version" -> v.toString))
    new GraftLakeTable(schemaFor(dir, opts), opts)
  }

  /** `TIMESTAMP AS OF <ts>` — the latest version committed at or before
    * the timestamp (microseconds from Spark), off [[SnapshotLake.history]].
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val ms = timestamp / 1000L
    val lake = new SnapshotLake(SparkSession.active, dir.toString)
    val v = lake.history.filter { case (_, _, at, _) => at > 0 && at <= ms }
      .map(_._1).maxOption.getOrElse(throw new IllegalArgumentException(
        s"graft: no version of ${ident.name()} committed at or before " +
          s"timestamp $ms ms — earliest is " +
          lake.history.headOption.map(h => s"v${h._1} at ${h._3} ms").getOrElse("none")))
    val opts = optionsFor(dir, Map("version" -> v.toString))
    new GraftLakeTable(schemaFor(dir, opts), opts)
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): Table = {
    val dir = tableDir(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident)
    val partCols = partitions.toSeq.map {
      case t if t.name == "identity" && t.references.length == 1 =>
        t.references.head.fieldNames.mkString(".")
      case other => throw new IllegalArgumentException(
        s"graft: only identity PARTITIONED BY columns are supported, got $other")
    }
    require(partCols.forall(c => schema.fieldNames.contains(c)),
      s"partition columns ${partCols.mkString(",")} must appear in the schema")
    Files.createDirectories(dir)
    val json = s"""{"schema":"${esc(schema.toDDL)}","partcols":"${partCols.mkString(",")}"}"""
    Files.write(sidecar(dir), json.getBytes("UTF-8"))
    loadTable(ident)
  }

  /** `ALTER TABLE` mapped to the lake's ZERO-REWRITE evolution ops:
    * RENAME COLUMN → [[SnapshotLake.renameColumn]] (column mapping),
    * ALTER COLUMN TYPE → [[SnapshotLake.widenColumn]] (lossless typemap),
    * DROP COLUMN → [[SnapshotLake.dropColumn]] (metadata-only).
    * Anything else refuses by name.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val lake = new SnapshotLake(SparkSession.active, dir.toString)
    require(lake.versions.nonEmpty,
      s"graft: ALTER TABLE needs at least one commit — ${ident.name()} is empty")
    changes.foreach {
      case c: TableChange.RenameColumn =>
        require(c.fieldNames.length == 1, "graft: nested columns are not supported")
        lake.renameColumn(c.fieldNames.head, c.newName)
      case c: TableChange.UpdateColumnType =>
        require(c.fieldNames.length == 1, "graft: nested columns are not supported")
        lake.widenColumn(c.fieldNames.head, c.newDataType.catalogString)
      case c: TableChange.DeleteColumn =>
        require(c.fieldNames.length == 1, "graft: nested columns are not supported")
        lake.dropColumn(c.fieldNames.head)
      case other => throw new IllegalArgumentException(
        s"graft: unsupported ALTER TABLE change $other — supported: " +
          "RENAME COLUMN, ALTER COLUMN TYPE (lossless widen), DROP COLUMN")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    if (!isTable(dir)) return false
    val w = Files.walk(dir)
    try w.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => Files.deleteIfExists(f))
    finally w.close()
    true
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    val src = tableDir(from)
    val dst = tableDir(to)
    if (!isTable(src)) throw new NoSuchTableException(from)
    if (isTable(dst)) throw new TableAlreadyExistsException(to)
    Files.move(src, dst)
  }
}
