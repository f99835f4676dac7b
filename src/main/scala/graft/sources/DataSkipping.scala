package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max statistics and scan pruning — the data-skipping layer
  * a lakehouse table format (Delta/Iceberg file stats, parquet footer
  * min/max) provides, re-expressed over the plain partitioned-parquet lake.
  *
  * Reference analog: the catalog's date-range listing
  * (`atd_data_lake/support/catalog.py:212-236`) prunes *days* before any
  * file is opened; this generalizes the idea to arbitrary numeric columns at
  * FILE granularity, so a 100 TB scan with a selective range predicate opens
  * only the files whose [min, max] can contain matches.
  *
  * The stats build is one distributed scan (`input_file_name` groupBy —
  * build once, persist, query many); at query time pruning touches only the
  * stats table (one row per file, driver-bounded the same way the catalog's
  * partition list is). Pruning is CONSERVATIVE: a file is dropped only when
  * its [min, max] cannot intersect the predicate, and [[readPruned]]
  * re-applies the exact predicate after the pruned scan — so results are
  * always exactly equal to the full-scan filter, stats merely cut I/O.
  * Columns with all-null files stay un-prunable for those files (null
  * min/max keeps the file).
  */
object DataSkipping {

  /** One distributed pass over the lake: per-file row count and min/max for
    * each of `cols` (numeric or string). Output: `file`, `cnt`,
    * `min_<c>` / `max_<c>` per column — one row per data file.
    */
  def scanStats(spark: SparkSession, root: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one stats column")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(root)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("cnt"), aggs: _*)
  }

  /** Persist / reload the stats table (the build-once half of
    * build-once/query-many).
    */
  def save(stats: DataFrame, path: String): Unit =
    stats.write.mode("overwrite").parquet(path)
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** The same stats table read from PARQUET FOOTERS instead of the data:
    * each task opens only the footer bytes of its files (row counts +
    * per-column-chunk min/max that every parquet writer already persisted),
    * so building the index over a 100 TB lake costs footer-I/O, not a full
    * scan. Footer reads are distributed — one partition of file paths per
    * task — and the driver holds only the file LIST (same bound as the
    * compaction planner).
    *
    * Numeric min/max come back as doubles (exact for int/long < 2^53, which
    * [[pruneFiles]]'s conservative intersection tolerates); a column chunk
    * written without statistics, an all-null file, or a non-numeric column
    * yields null stats and the file is simply never pruned — missing
    * metadata degrades to extra I/O, never to a wrong answer.
    */
  def footerStats(spark: SparkSession, root: String, cols: Seq[String]): DataFrame =
    footerStatsAll(spark, Seq(root), cols)

  /** [[footerStats]] across MANY roots as one distributed job — the shape a
    * manifest-driven caller ([[graft.catalog.SnapshotLake.statsFor]]) needs:
    * a snapshot references thousands of partition directories, and building
    * its stats must cost one job over the combined file list, not one job
    * per directory.
    */
  def footerStatsAll(
      spark: SparkSession, roots: Seq[String], cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one stats column")
    val files = roots.flatMap(r => listParquetFiles(java.nio.file.Paths.get(r)))
    require(files.nonEmpty, s"no parquet files under ${roots.mkString(",")}")
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("file", org.apache.spark.sql.types.StringType, false) +:
      org.apache.spark.sql.types.StructField("cnt", org.apache.spark.sql.types.LongType, false) +:
      cols.flatMap(c => Seq(
        org.apache.spark.sql.types.StructField(s"min_$c", org.apache.spark.sql.types.DoubleType, true),
        org.apache.spark.sql.types.StructField(s"max_$c", org.apache.spark.sql.types.DoubleType, true))))
    val colsB = cols // stable closure capture
    val rows = spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.size, 64)))
      .mapPartitions { paths =>
        val conf = new org.apache.hadoop.conf.Configuration()
        paths.map { p =>
          val meta = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
            conf, new org.apache.hadoop.fs.Path(p),
            org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
          val blocks = meta.getBlocks
          var cnt = 0L
          val it0 = blocks.iterator()
          while (it0.hasNext) cnt += it0.next().getRowCount
          val statVals = colsB.flatMap { c =>
            var lo: Option[Double] = None
            var hi: Option[Double] = None
            var usable = true
            val it = blocks.iterator()
            while (it.hasNext && usable) {
              val chunk = it.next().getColumns.iterator().asScala
                .find(_.getPath.toDotString == c)
              chunk.flatMap(ch => Option(ch.getStatistics)) match {
                case Some(s) if !s.isEmpty && s.hasNonNullValue =>
                  (numeric(s.genericGetMin()), numeric(s.genericGetMax())) match {
                    case (Some(mn), Some(mx)) =>
                      lo = Some(lo.fold(mn)(math.min(_, mn)))
                      hi = Some(hi.fold(mx)(math.max(_, mx)))
                    case _ => usable = false // non-numeric column
                  }
                case Some(s) if s.isEmpty || !s.hasNonNullValue =>
                  () // all-null chunk: contributes no bounds
                case _ => usable = false // chunk written without stats
              }
            }
            if (!usable) Seq(null, null)
            else Seq(lo.map(Double.box).orNull, hi.map(Double.box).orNull)
          }
          org.apache.spark.sql.Row.fromSeq(p +: Long.box(cnt) +: statVals)
        }
      }
    spark.createDataFrame(rows, schema)
  }

  private def numeric(v: Any): Option[Double] = v match {
    case i: java.lang.Integer => Some(i.toDouble)
    case l: java.lang.Long    => Some(l.toDouble)
    case f: java.lang.Float   => Some(f.toDouble)
    case d: java.lang.Double  => Some(d)
    case _                    => None
  }

  private[graft] def listParquetFiles(dir: java.nio.file.Path): Seq[String] = {
    val s = java.nio.file.Files.walk(dir)
    try s.iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        java.nio.file.Files.isRegularFile(p) &&
          n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_")
      }
      .map(_.toString).toSeq.sorted
    finally s.close()
  }

  /** Files whose `[min_c, max_c]` intersects `[lo, hi]` — the candidate set
    * for a `c BETWEEN lo AND hi` scan. A file is dropped only when
    * disjointness is PROVEN (`min > hi || max < lo` evaluates TRUE); any
    * NULL — null stats from an all-null file, or a type mismatch such as
    * string stats compared against numeric bounds — keeps the file, so
    * pruning degrades to extra I/O, never to a missing row.
    */
  def pruneFiles(stats: DataFrame, c: String, lo: Double, hi: Double): Seq[String] = {
    val numericStats = stats.schema(s"min_$c").dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    val candidates =
      if (!numericStats) stats // type mismatch: keep everything (ANSI would throw on the cast)
      else stats.filter(
        coalesce(!(col(s"min_$c") > hi || col(s"max_$c") < lo), lit(true)))
    candidates.select("file").collect().map(_.getString(0)).toSeq
  }

  /** Range scan through the stats index: read only candidate files, then
    * re-apply the exact predicate — result is identical to
    * `spark.read.parquet(root).filter(c between lo and hi)`, I/O is not.
    */
  def readPruned(
      spark: SparkSession,
      root: String,
      stats: DataFrame,
      c: String,
      lo: Double,
      hi: Double): DataFrame = {
    val files = pruneFiles(stats, c, lo, hi)
    val base =
      if (files.isEmpty)
        // all files pruned: empty result with the lake's schema
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          spark.read.parquet(root).schema)
      else
        // basePath keeps partition-directory columns on per-file reads
        spark.read.option("basePath", root).parquet(files: _*)
    base.filter(col(c) >= lo && col(c) <= hi)
  }

  // ------------------------------------------------------------- bloom

  /** md5-derived 60-bit hash of a string — the Scala-side twin of
    * [[graft.Functions.md5Bits]](_, 60) (same hex-prefix derivation), so
    * query-time probe positions match the build-time positions computed
    * inside Spark expressions bit-for-bit.
    */
  private[sources] def md5Bits60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Per-file Bloom bitsets for EQUALITY pruning on a (typically
    * high-cardinality string) column — the skipping dimension min/max
    * stats cannot provide: a uuid/clerk/url column's min..max spans
    * everything, but its bloom bits are dense and selective.
    *
    * Relational representation — `(file, word, bits)`, one row per
    * non-empty 64-bit word of each file's `bits`-wide filter — built with
    * ONE scan + two keyed aggregations, no UDF or driver state: distinct
    * (file, value) → `hashes` md5 positions each → per-(file, word)
    * `bit_or` of the position masks. Mergeable (bit_or again) and
    * persistable via [[save]]/[[load]] like the min/max stats.
    *
    * False positives only: a probe can keep a file the value is not in
    * (extra I/O), never drop one it is in — [[bloomPruneFiles]] keeps a
    * file iff EVERY probe bit is set, and a file absent from the stats
    * relation entirely (all-NULL column) contains no values and prunes.
    */
  def bloomStats(
      spark: SparkSession,
      roots: Seq[String],
      c: String,
      bits: Int = 8192,
      hashes: Int = 3): DataFrame = {
    require(bits >= 64 && bits % 64 == 0, s"bits must be a positive multiple of 64, got $bits")
    require(hashes >= 1, s"hashes must be >= 1, got $hashes")
    val values = spark.read.parquet(roots: _*)
      .select(input_file_name().as("file"), col(c).cast("string").as("v"))
      .filter(col("v").isNotNull)
      .distinct()
    val posCols = (0 until hashes).map(i =>
      (graft.Functions.md5Bits(concat(lit(s"bf$i:"), col("v")), 60) % bits).cast("int"))
    values
      .select(col("file"), explode(array(posCols: _*)).as("pos"))
      .select(col("file"), (col("pos") / 64).cast("int").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), pos % 64)").as("mask"))
      .groupBy(col("file"), col("word"))
      .agg(expr("bit_or(mask)").as("bits"))
  }

  /** Files that MIGHT contain `value`: every one of the value's probe
    * bits is set in the file's filter. Probe positions are computed on
    * the driver (`hashes` md5 calls); the membership test is one filter +
    * one tiny aggregate over the stats relation.
    */
  def bloomPruneFiles(
      stats: DataFrame,
      value: String,
      bits: Int = 8192,
      hashes: Int = 3): Seq[String] = {
    val need = (0 until hashes)
      .map(i => (md5Bits60(s"bf$i:$value") % bits).toInt)
      .distinct
      .map(p => (p / 64, 1L << (p % 64)))
      .groupBy(_._1)
      .map { case (w, ms) => w -> ms.map(_._2).reduce(_ | _) }
    val hitExpr = need
      .map { case (w, m) =>
        when(col("word") === w && (col("bits").bitwiseAND(m)) === m, 1)
          .otherwise(0)
      }
      .reduce[org.apache.spark.sql.Column](_ + _)
    stats
      .groupBy(col("file"))
      .agg(sum(hitExpr).as("_hits"))
      .filter(col("_hits") === need.size)
      .select("file")
      .collect()
      .map(_.getString(0))
      .toSeq
  }

  /** Equality scan through the bloom index: read only candidate files,
    * re-apply the exact predicate — identical result to a full
    * `filter(c === value)`, I/O proportional to the files that might
    * match.
    */
  def readBloomPruned(
      spark: SparkSession,
      roots: Seq[String],
      stats: DataFrame,
      c: String,
      value: String,
      bits: Int = 8192,
      hashes: Int = 3): DataFrame = {
    val files = bloomPruneFiles(stats, value, bits, hashes)
    val base =
      if (files.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          spark.read.parquet(roots: _*).schema)
      else spark.read.option("mergeSchema", "true").parquet(files: _*)
    base.filter(col(c).cast("string") === value)
  }
}
