package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, GraftSqlShims, Row, SparkSession, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsDelete, SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, WriteBuilder}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Sink => V1Sink, Source => V1Source}
import org.apache.spark.sql.functions.{coalesce, col, lit, sum}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.catalog.SnapshotLake

/** [[SnapshotLake]] as a Spark DataSourceV2 table — the pure-SQL surface
  * next to the API one:
  *
  * {{{
  *   spark.read.format("graft").load(root)                       // latest
  *   spark.read.format("graft").option("version", 3).load(root)  // time travel
  *   CREATE TABLE t USING graft OPTIONS (path '<root>'); SELECT ... FROM t
  *   INSERT INTO t ...          -- row-append;  INSERT OVERWRITE -- partition replace
  *   DELETE FROM t WHERE ...    -- deletion-vector delete (zero rewrite)
  *   spark.readStream.format("graft").option("pk", "id,part").load(root)
  *   df.writeStream.format("graft").option("pk", "id,part")
  *     .option("versionCol", "ver").start(root)   -- exactly-once sink
  * }}}
  *
  * Resolution goes through the SAME `readEntries` seam as the API
  * ([[SnapshotLake.read]]): column mapping (renames), the typemap
  * (zero-rewrite widening), deletion vectors, and manifest snapshot
  * isolation are all inherited rather than re-implemented — the scan is
  * exposed to Spark through the [[V1Scan]] bridge, whose relation simply
  * IS the API read's RDD.
  *
  * The scan PUSHES DOWN, so a SQL query plans like the API path would:
  *   - partition pruning — filters on partition columns select manifest
  *     entries by their decoded key values; non-matching directories are
  *     never opened (or even listed);
  *   - stats skipping — numeric range/equality conjuncts consult the
  *     manifest's per-directory min/max stats ([[SnapshotLake.readWhere]]),
  *     the same evidence [[SnapshotLake.prunePartitions]] serves the API;
  *   - column pruning — the required-column set reaches the inner parquet
  *     scan's ReadSchema via a plain projection on the API read;
  *   - filter pushdown — translatable predicates re-apply on the inner
  *     DataFrame, so parquet row-group stats skip within surviving files.
  * Pruning is ADVISORY, never exactness-claimed: `pushFilters` returns
  * every filter as post-scan, so Spark re-evaluates them and a predicate
  * the translator cannot express is merely not exploited, never wrong.
  *
  * SQL DML maps to the lake's native write grains: `INSERT INTO` →
  * [[SnapshotLake.append]], `INSERT OVERWRITE` → [[SnapshotLake.commit]]
  * (dynamic-partition-overwrite), `DELETE FROM` → merge-on-read
  * [[SnapshotLake.deleteWhereDv]] (rows DV-delete; data bytes never
  * rewrite). `UPDATE`/`MERGE INTO` are NOT supported — Spark refuses them
  * by name at analysis time (the table does not implement
  * SupportsRowLevelOperations); use the API's `upsertDv` for row merges.
  * Time-travel tables (version option set) refuse all writes and deletes.
  *
  * Streaming reads replay the commit log: offsets are lake VERSIONS, each
  * micro-batch is the CDF delta [[SnapshotLake.changes]] between the
  * checkpointed version and the current latest (first batch: the full
  * snapshot tagged `insert`, or deltas from `startingVersion` when set) —
  * so `readStream → foreachBatch(upsertDvIfNew)` is exactly-once end to
  * end. Partition column names resolve from the lake's own `partcols`
  * meta (recorded at commit time); the `partitionCols` option overrides.
  *
  * Registered via META-INF/services ([[DataSourceRegister]]), so
  * `format("graft")` resolves with no session configuration at all.
  */
class GraftLakeProvider extends TableProvider with DataSourceRegister
    with StreamSourceProvider with StreamSinkProvider {

  override def shortName(): String = "graft"

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftLakeProvider.resolve(options).schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GraftLakeTable(schema, new CaseInsensitiveStringMap(properties))

  // ---- v1 streaming source (micro-batch over the commit log)

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty, "graft: streaming reads infer the CDF schema — drop .schema(...)")
    (shortName(), GraftLakeSource.cdfSchema(parameters))
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): V1Source =
    new GraftLakeSource(parameters)

  // ---- v1 streaming sink (exactly-once lake writes per micro-batch)

  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode): V1Sink = {
    require(outputMode != org.apache.spark.sql.streaming.OutputMode.Complete(),
      "graft: Complete output mode is not supported — the lake is a log, " +
        "not a replaceable aggregate; use append (row-append) or update " +
        "(pk + versionCol merge)")
    new GraftLakeSink(parameters)
  }
}

private[sources] object GraftLakeProvider {

  private def pathOf(get: String => String): String = {
    val raw = Option(get("path")).filter(_.nonEmpty).getOrElse(
      throw new IllegalArgumentException(
        "graft: no lake path — pass it via .load(<root>) or OPTIONS (path '<root>')"))
    // CREATE TABLE normalizes the location to a URI ("file:/tmp/x") —
    // resolve local-scheme URIs back to a filesystem path
    if (raw.startsWith("file:")) java.nio.file.Paths.get(java.net.URI.create(raw)).toString
    else raw
  }

  /** One resolution seam for every surface: the lake handle, the requested
    * version, and the partition column names (recorded `partcols` meta,
    * overridable via option — required only for pre-meta lakes).
    */
  def lakeOf(options: CaseInsensitiveStringMap): (SnapshotLake, Option[Long], Seq[String]) = {
    val path = pathOf(options.get)
    val lake = new SnapshotLake(SparkSession.active, path)
    val version = Option(options.get("version")).map(_.toLong)
    val partCols = Option(options.get("partitioncols"))
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .orElse(lake.partitionColumns(version))
      .getOrElse(throw new IllegalArgumentException(
        s"graft: lake at $path predates the partcols meta — pass " +
          "option(\"partitionCols\", \"a,b\") explicitly"))
    (lake, version, partCols)
  }

  /** Full snapshot read at the options' version — schema inference. An
    * EMPTY lake (no commits yet) resolves to a zero-column frame instead
    * of failing: the streaming-WRITE path must infer a table before the
    * v1 sink fallback, and its first micro-batch is what creates the
    * lake. Batch reads of an empty lake still fail loudly — at scan time.
    */
  def resolve(options: CaseInsensitiveStringMap): DataFrame = {
    val path = pathOf(options.get)
    val spark = SparkSession.active
    if (new SnapshotLake(spark, path).versions.isEmpty) return spark.emptyDataFrame
    val (lake, version, partCols) = lakeOf(options)
    lake.read(partCols, version)
  }

  /** Align a live read to a DECLARED column set: identity where types
    * match, lossless up-cast where the declaration is wider, NULL where
    * the snapshot no longer has the column, and a LOUD failure where the
    * lake widened past the declaration (a silent narrowing cast would
    * corrupt). Shared by the batch scan (catalog tables capture their
    * schema at CREATE time) and the streaming source (pinned at start).
    */
  def alignToDeclared(df: DataFrame, declared: StructType): DataFrame = {
    val live = df.schema.fields.map(f => f.name -> f.dataType).toMap
    df.select(declared.fields.toSeq.map { f =>
      live.get(f.name) match {
        case Some(t) if t == f.dataType => col(f.name)
        case Some(t) if org.apache.spark.sql.catalyst.expressions.Cast
            .canUpCast(t, f.dataType) =>
          col(f.name).cast(f.dataType).as(f.name)
        case Some(t) =>
          throw new IllegalArgumentException(
            s"graft: declared schema has ${f.name}: ${f.dataType.catalogString} " +
              s"but the lake now holds ${t.catalogString} — the captured schema " +
              "is stale after a widen; recreate the table / restart the stream " +
              "(or read via spark.read.format(\"graft\"), which always infers " +
              "the live schema)")
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }: _*)
  }

  /** The write seam: INSERT INTO → row-append, INSERT OVERWRITE →
    * partition-replace commit. Partition columns resolve exactly like the
    * read side (lake meta, option override); a write to an EMPTY lake
    * requires the option (there is no meta to read yet).
    */
  def write(options: CaseInsensitiveStringMap, data: DataFrame, overwrite: Boolean): Unit = {
    val path = pathOf(options.get)
    val lake = new SnapshotLake(data.sparkSession, path)
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

/** Translate Spark's data-source [[Filter]] tree into the three forms the
  * lake scan exploits: an exact [[Column]] (inner-DataFrame re-filter →
  * parquet row-group skipping), a three-valued evaluation over a
  * partition's decoded VALUES (manifest-entry pruning), and conjunctive
  * numeric ranges (manifest dir-stats skipping). Every translation is
  * conservative: untranslatable nodes yield None/unknown, which keeps
  * data rather than dropping it — Spark re-applies all filters post-scan.
  */
private[sources] object FilterPush {

  /** Exact Column translation, or None when ANY node is untranslatable
    * (a partial translation under Not/Or would change semantics).
    */
  def toColumnExact(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case And(l, r) => for { a <- toColumnExact(l); b <- toColumnExact(r) } yield a && b
    case Or(l, r) => for { a <- toColumnExact(l); b <- toColumnExact(r) } yield a || b
    case Not(c) => toColumnExact(c).map(!_)
    case _ => None
  }

  /** Three-valued evaluation against one partition's value map (partition
    * values are non-null STRINGS by the commit contract). None = unknown
    * (references a non-partition column, or an untranslatable shape); a
    * partition is pruned only on Some(false).
    */
  def pruneEval(f: Filter, vals: Map[String, String]): Option[Boolean] = f match {
    case EqualTo(a, v) => vals.get(a).map(_ == String.valueOf(v))
    case EqualNullSafe(a, v) => vals.get(a).map(_ == String.valueOf(v))
    case In(a, vs) => vals.get(a).map(x => vs.exists(v => String.valueOf(v) == x))
    case IsNull(a) => vals.get(a).map(_ => false) // partition values are non-null
    case IsNotNull(a) => vals.get(a).map(_ => true)
    case GreaterThan(a, v: String) => vals.get(a).map(_ > v)
    case GreaterThanOrEqual(a, v: String) => vals.get(a).map(_ >= v)
    case LessThan(a, v: String) => vals.get(a).map(_ < v)
    case LessThanOrEqual(a, v: String) => vals.get(a).map(_ <= v)
    case StringStartsWith(a, v) => vals.get(a).map(_.startsWith(v))
    case StringEndsWith(a, v) => vals.get(a).map(_.endsWith(v))
    case StringContains(a, v) => vals.get(a).map(_.contains(v))
    case And(l, r) => (pruneEval(l, vals), pruneEval(r, vals)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(a), Some(b)) => Some(a && b)
      case _ => None
    }
    case Or(l, r) => (pruneEval(l, vals), pruneEval(r, vals)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(a), Some(b)) => Some(a || b)
      case _ => None
    }
    case Not(c) => pruneEval(c, vals).map(!_)
    case _ => None
  }

  /** Conjunctive numeric ranges from the TOP-LEVEL filters (Spark splits
    * conjunctions before pushdown; nested Ands flatten here) — the input
    * to manifest dir-stats skipping. Bounds are inclusive supersets:
    * strict inequalities keep their bound (stats prune on evidence of
    * emptiness, the exact predicate re-applies later).
    */
  def ranges(filters: Seq[Filter], partCols: Set[String]): Map[String, (Double, Double)] = {
    def num(v: Any): Option[Double] = v match {
      case n: Number => Some(n.doubleValue)
      case _ => None
    }
    def walk(f: Filter): Seq[(String, (Double, Double))] = f match {
      case And(l, r) => walk(l) ++ walk(r)
      case EqualTo(a, v) if !partCols(a) => num(v).map(d => a -> (d, d)).toSeq
      case GreaterThan(a, v) if !partCols(a) =>
        num(v).map(d => a -> (d, Double.PositiveInfinity)).toSeq
      case GreaterThanOrEqual(a, v) if !partCols(a) =>
        num(v).map(d => a -> (d, Double.PositiveInfinity)).toSeq
      case LessThan(a, v) if !partCols(a) =>
        num(v).map(d => a -> (Double.NegativeInfinity, d)).toSeq
      case LessThanOrEqual(a, v) if !partCols(a) =>
        num(v).map(d => a -> (Double.NegativeInfinity, d)).toSeq
      case _ => Seq.empty
    }
    filters.flatMap(walk).groupBy(_._1).view.mapValues { rs =>
      (rs.map(_._2._1).max, rs.map(_._2._2).min)
    }.toMap
  }
}

private class GraftLakeTable(
    tableSchema: StructType, options: CaseInsensitiveStringMap)
  extends Table with SupportsRead with SupportsWrite with SupportsDelete {

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
    new GraftLakeScanBuilder(tableSchema, merged)
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

  /** SQL `DELETE FROM` → [[graft.catalog.SnapshotLake.deleteWhereDv]]:
    * matching rows join a new deletion-vector commit, data bytes never
    * rewrite, time travel before the delete sees them. Predicates outside
    * the translatable subset make `canDeleteWhere` false, which Spark
    * surfaces as a NAMED "cannot delete where" analysis error (never a
    * silent partial delete).
    */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    // version (time travel) is NOT checked here: deleteWhere raises the
    // NAMED time-travel refusal instead of Spark's generic cannot-delete
    filters.forall(f => FilterPush.toColumnExact(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(!options.containsKey("version"),
      "graft: cannot DELETE from a time-travel table (version option set)")
    val (lake, _, partCols) = GraftLakeProvider.lakeOf(options)
    val cond = filters.toSeq.flatMap(FilterPush.toColumnExact)
      .reduceOption(_ && _).getOrElse(lit(true))
    lake.deleteWhereDv(cond, partCols)
    ()
  }
}

/** DSv2 pushdown surface: Spark hands the scan its filter conjuncts and
  * the required-column set; both ride into [[GraftLakeScan]]. Every filter
  * returns as post-scan (pruning is advisory — see the provider doc), so
  * `pushedFilters` reports exactly the conjuncts the scan will exploit.
  */
private class GraftLakeScanBuilder(
    tableSchema: StructType, options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty
  private var sawFilters = false
  private var countGroupBy: Option[(Seq[String], Int)] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    sawFilters = filters.nonEmpty
    pushed = filters.filter(f => FilterPush.toColumnExact(f).isDefined)
    filters // Spark re-evaluates everything — the scan may return a superset
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** `COUNT(*)` (optionally GROUP BY partition columns) answers from
    * parquet FOOTER row counts plus the manifest — no data read at all,
    * at any scale. EXACT only when nothing post-filters and no deletion
    * vectors are pending, so anything else declines and the normal scan
    * runs. Filters always decline here: this builder reports every filter
    * as post-scan (advisory pruning), and a post-scan filter under a
    * pushed-down aggregate would drop rows the footers already counted.
    */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    analyzeCountPushdown(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean = {
    analyzeCountPushdown(agg) match {
      case some @ Some(_) => countGroupBy = some; true
      case None => false
    }
  }

  private def analyzeCountPushdown(agg: Aggregation): Option[(Seq[String], Int)] = {
    if (sawFilters) return None
    val counts = agg.aggregateExpressions.toSeq
    if (counts.isEmpty || !counts.forall(_.isInstanceOf[CountStar])) return None
    val groupCols = agg.groupByExpressions.toSeq.map {
      case f: NamedReference if f.fieldNames.length == 1 => f.fieldNames.head
      case _ => return None
    }
    try {
      val (lake, version, partCols) = GraftLakeProvider.lakeOf(options)
      if (lake.hasDeletionVectors(version)) return None
      if (!groupCols.forall(partCols.contains)) return None
      Some((groupCols, counts.size))
    } catch { case _: Exception => None }
  }

  override def build(): Scan = countGroupBy match {
    case Some((groupCols, nCounts)) =>
      new GraftLakeCountScan(groupCols, nCounts, options)
    case None => new GraftLakeScan(required, pushed, options)
  }
}

/** The metadata-only COUNT(*) scan: row counts come from parquet footers
  * (one distributed footer job over the manifest's files —
  * [[SnapshotLake.files]]), grouped by partition VALUES decoded from the
  * manifest keys. Zero data pages read — `SELECT count(*) FROM lake` costs
  * the same at 100 TB as at 100 MB.
  */
private class GraftLakeCountScan(
    groupCols: Seq[String], nCounts: Int,
    options: CaseInsensitiveStringMap) extends V1Scan {

  override def readSchema(): StructType = {
    val g = groupCols.map(c =>
      org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType))
    val cs = (0 until nCounts).map(i =>
      org.apache.spark.sql.types.StructField(
        s"count_$i", org.apache.spark.sql.types.LongType, nullable = false))
    StructType(g ++ cs)
  }

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = readSchema()
      override def buildScan(): org.apache.spark.rdd.RDD[Row] = {
        val (lake, version, partCols) = GraftLakeProvider.lakeOf(options)
        val f = lake.files(partCols, version)
        val counts = (0 until nCounts).map(i => sum(col("rows")).as(s"count_$i"))
        val out =
          if (groupCols.isEmpty)
            f.agg(coalesce(counts.head, lit(0L)).as("count_0"),
              counts.drop(1).map(c => coalesce(c, lit(0L))): _*)
          else
            f.groupBy(groupCols.map(col): _*).agg(counts.head, counts.drop(1): _*)
        out.rdd
      }
    }.asInstanceOf[T]
}

/** The [[V1Scan]] bridge: Spark plans a DSv2 relation, execution delegates
  * to a [[TableScan]] whose rows come from the API read itself — one seam,
  * zero re-implementation of mapping/widening/DV semantics. The pushed
  * state prunes BEFORE any file opens ([[SnapshotLake.readWhere]]) and the
  * required columns project on the inner DataFrame, so Catalyst prunes the
  * inner parquet ReadSchema too.
  */
private class GraftLakeScan(
    requiredSchema: StructType,
    pushed: Array[Filter],
    options: CaseInsensitiveStringMap) extends V1Scan {

  override def readSchema(): StructType = requiredSchema

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = requiredSchema
      override def buildScan(): org.apache.spark.rdd.RDD[Row] = {
        val (lake, version, partCols) = GraftLakeProvider.lakeOf(options)
        // manifest-grain pruning: partition values decide entries, dir
        // stats exclude directories — zero file I/O either way
        val keep: Seq[String] => Boolean = { vs =>
          val m = partCols.zip(vs).toMap
          !pushed.exists(f => FilterPush.pruneEval(f, m).contains(false))
        }
        val ranges = FilterPush.ranges(pushed.toSeq, partCols.toSet)
        val df = lake.readWhere(partCols, keep, ranges, version)
        // inner re-filter: parquet row-group stats skip inside surviving
        // files; filters may reference columns outside requiredSchema
        // (Spark includes post-scan filter columns in pruneColumns, but
        // filter before projecting anyway — order is free, Catalyst fuses)
        val filtered = pushed.toSeq.flatMap(FilterPush.toColumnExact)
          .foldLeft(df)(_ filter _)
        GraftLakeProvider.alignToDeclared(filtered, requiredSchema).rdd
      }
    }.asInstanceOf[T]
}

private object GraftLakeSource {

  def paramsMap(parameters: Map[String, String]): CaseInsensitiveStringMap =
    new CaseInsensitiveStringMap(parameters.asJava)

  def pkOf(parameters: Map[String, String]): Seq[String] =
    parameters.collectFirst { case (k, v) if k.equalsIgnoreCase("pk") => v }
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .filter(_.nonEmpty)
      .getOrElse(throw new IllegalArgumentException(
        "graft: streaming reads need option(\"pk\", \"col,...\") — the CDF " +
          "aligns rows across versions by primary key"))

  /** The stream's schema: `_change` + the CDF's canonical column order
    * (pk first, then data columns) — computed from a zero-row changes
    * frame so it matches [[SnapshotLake.changes]] exactly.
    */
  def cdfSchema(parameters: Map[String, String]): StructType = {
    val opts = paramsMap(parameters)
    val (lake, _, partCols) = GraftLakeProvider.lakeOf(opts)
    val v = lake.latestVersion.getOrElse(
      throw new IllegalStateException("graft: streaming read of an empty lake"))
    lake.changes(v, v, pkOf(parameters), partCols).schema
  }
}

/** Micro-batch source over the lake's commit log: offsets are lake
  * VERSIONS; batch (from, to] is the CDF delta [[SnapshotLake.changes]],
  * the first batch the full snapshot tagged `insert` (or deltas from
  * `startingVersion`). Restart resumes from the checkpointed version —
  * pair with an idempotent sink (`upsertDvIfNew`) for exactly-once.
  */
private class GraftLakeSource(parameters: Map[String, String]) extends V1Source {

  private val opts = GraftLakeSource.paramsMap(parameters)
  private val pk = GraftLakeSource.pkOf(parameters)
  private val startingVersion: Option[Long] =
    Option(opts.get("startingversion")).map(_.toLong)
  private val (lake, _, partCols) = GraftLakeProvider.lakeOf(opts)

  override val schema: StructType = GraftLakeSource.cdfSchema(parameters)

  override def getOffset: Option[V1Offset] =
    lake.latestVersion.map(v => GraftVersionOffset(v))

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val to = end.json.toLong
    val raw = start.map(_.json.toLong).orElse(startingVersion) match {
      case Some(from) if from >= to => // engine replay edge: empty delta
        lake.read(partCols, Some(to)).limit(0)
          .withColumn("_change", lit(""))
      case Some(from) => lake.changes(from, to, pk, partCols)
      case None => // bootstrap: the full snapshot at `to`, all inserts
        lake.read(partCols, Some(to)).withColumn("_change", lit("insert"))
    }
    // canonical order + pin to the schema declared at stream start
    val aligned = GraftLakeProvider.alignToDeclared(raw, schema)
    GraftSqlShims.asStreamingDataFrame(aligned)
  }

  override def stop(): Unit = ()
}

/** A lake version as a v1 streaming offset (JSON = the version number). */
private case class GraftVersionOffset(version: Long) extends V1Offset {
  override val json: String = version.toString
}

/** Micro-batch sink into the lake, EXACTLY-ONCE by construction: every
  * batch applies through a txn-watermarked write keyed on `(appId,
  * batchId)` — [[graft.catalog.SnapshotLake.appendIfNew]] (row-append,
  * the default) or [[graft.catalog.SnapshotLake.upsertDvIfNew]]
  * (merge-on-read CDC apply, when `pk` + `versionCol` options are set) —
  * so the engine's at-least-once batch replay after a crash lands zero
  * duplicate rows. `appId` defaults to the query's checkpoint location
  * (stable across restarts); set it explicitly when two queries share a
  * checkpoint root. With the graft SOURCE on the other end this is
  * lake→lake streaming replication end to end:
  *
  * {{{
  *   spark.readStream.format("graft").option("pk", "id,part").load(src)
  *     .filter(col("_change").isin("insert", "update_post")).drop("_change")
  *     .writeStream.format("graft")
  *     .option("pk", "id,part").option("versionCol", "ver")
  *     .option("checkpointLocation", ckpt).start(dst)
  * }}}
  */
private class GraftLakeSink(parameters: Map[String, String]) extends V1Sink {

  private val opts = GraftLakeSource.paramsMap(parameters)
  require(!opts.containsKey("version"),
    "graft: cannot stream-write to a time-travel table (version option set)")
  private val appId: String =
    Option(opts.get("appid")).orElse(Option(opts.get("checkpointlocation")))
      .getOrElse(throw new IllegalArgumentException(
        "graft: streaming writes need option(\"appId\", ...) or a " +
          "checkpointLocation — the exactly-once watermark key"))
  private val pkOpt: Option[Seq[String]] =
    Option(opts.get("pk"))
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty)).filter(_.nonEmpty)
  private val verOpt: Option[String] = Option(opts.get("versioncol"))
  require(pkOpt.isDefined == verOpt.isDefined,
    "graft: pk and versionCol come together — both for a merge sink, " +
      "neither for a row-append sink")

  override def addBatch(batchId: Long, data: org.apache.spark.sql.DataFrame): Unit = {
    // pin the incremental execution as a batch frame (multi-pass writers)
    val batch = GraftSqlShims.asBatchDataFrame(data)
    if (batch.isEmpty) return // nothing to land; replay of nothing is nothing
    val path = {
      val raw = Option(opts.get("path")).filter(_.nonEmpty).getOrElse(
        throw new IllegalArgumentException(
          "graft: no lake path — pass it via .start(<root>) or option(\"path\", ...)"))
      if (raw.startsWith("file:"))
        java.nio.file.Paths.get(java.net.URI.create(raw)).toString
      else raw
    }
    val lake = new SnapshotLake(batch.sparkSession, path)
    val partCols = Option(opts.get("partitioncols"))
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .orElse(if (lake.versions.nonEmpty) lake.partitionColumns(None) else None)
      .getOrElse(throw new IllegalArgumentException(
        s"graft: cannot infer partition columns for a streaming write to " +
          s"$path — pass option(\"partitionCols\", \"a,b\") (required for " +
          "an empty or pre-partcols lake)"))
    (pkOpt, verOpt) match {
      case (Some(pk), Some(ver)) =>
        lake.upsertDvIfNew(appId, batchId, batch, pk, ver, partCols)
      case _ =>
        lake.appendIfNew(appId, batchId, batch, partCols)
    }
    ()
  }
}
