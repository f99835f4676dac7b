package graft.catalog

import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance (IVM) over the lake's change
  * feed: a SUM/COUNT rollup of a [[SnapshotLake]] table kept up to date by
  * folding CDF deltas instead of re-scanning the table — the classic
  * retractable-aggregate algorithm (inserts add, deletes subtract,
  * updates are a pre-retraction plus a post-addition), which is exactly
  * what `_change ∈ insert/delete/update_pre/update_post` encodes.
  *
  * Reference analog: the reference recomputes its daily perfmet rollups
  * from scratch each run (`/root/reference/atd_data_lake/perfmet.py`);
  * this is that rollup maintained at delta cost — the difference between
  * re-scanning 100 TB and reading yesterday's few GB of changes.
  *
  * Exactly-once without a transaction coordinator:
  *
  *   1. read the unacknowledged delta via [[SnapshotLake.changesForConsumer]]
  *      (at-least-once);
  *   2. fold it into the state and write the NEW state to a
  *      version-suffixed directory, then flip a pointer file to it with an
  *      ATOMIC_MOVE — readers always see a complete state;
  *   3. acknowledge the version.
  *
  * A crash between (2) and (3) replays the same delta — but the pointer
  * already records `appliedVersion`, so the replay SKIPS the fold and only
  * re-acknowledges: apply-at-most-once on top of deliver-at-least-once =
  * exactly-once. (The same `commitIfNew` watermark idea, applied to a
  * state directory instead of a lake commit.)
  *
  * Scale shape: the refresh cost is ONE aggregation of the delta (keyed on
  * the group columns, map-side partial) plus one aggregation of
  * state ∪ delta-agg — both bounded by |delta| + |groups|, never by the
  * base table. Sums ride DECIMAL(28,6) so folding order can never change a
  * digit; groups whose count returns to zero are dropped, so deletes fully
  * reverse inserts.
  */
class MaterializedAgg(
    spark: SparkSession,
    lake: SnapshotLake,
    aggRoot: String,
    consumerId: String,
    pk: Seq[String],
    partitionCols: Seq[String],
    groupCols: Seq[String],
    sumCols: Seq[String]) {
  require(groupCols.nonEmpty, "need at least one group column")
  require(groupCols.intersect(sumCols).isEmpty, "a column cannot group and sum")

  private val rootPath = Paths.get(aggRoot)
  private val pointer = rootPath.resolve("_current")

  /** (state directory name, version it reflects), or None before the first
    * refresh. */
  private def current: Option[(String, Long)] = {
    if (!Files.exists(pointer)) None
    else {
      val Array(dir, v) =
        new String(Files.readAllBytes(pointer), "UTF-8").trim.split("@")
      Some((dir, v.toLong))
    }
  }

  /** The version the state reflects (None before the first refresh). */
  def appliedVersion: Option[Long] = current.map(_._2)

  /** The maintained rollup: `(groupCols…, cnt, <c>_sum…)`. Empty (zero
    * rows, full schema) before the first refresh. */
  def read(): DataFrame = current match {
    case Some((dir, _)) =>
      spark.read.parquet(rootPath.resolve(dir).toString)
    case None =>
      val zero = lake.read(partitionCols).limit(0)
      aggregate(zero.withColumn("_sign", lit(1L)))
  }

  /** Signed aggregation: `cnt = Σ sign`, `<c>_sum = Σ sign·c` through
    * DECIMAL(28,6). */
  private def aggregate(signed: DataFrame): DataFrame =
    signed.groupBy(groupCols.map(col): _*)
      .agg(sum(col("_sign")).as("cnt"),
        sumCols.map(c =>
          sum(col("_sign") * col(c).cast("decimal(28,6)"))
            .cast("decimal(28,6)").as(s"${c}_sum")): _*)

  /** Fold the unacknowledged delta into the state. Returns the version the
    * state now reflects. Safe to call any time: caught-up and
    * crash-replayed refreshes are no-ops (the second only re-acks).
    */
  def refresh(): Long = refreshImpl(ackAfterApply = true)

  /** [[refresh]] that CRASHES (by skipping the ack) after the state flip —
    * the test hook for the replay path. */
  private[graft] def refreshCrashBeforeAck(): Long = refreshImpl(ackAfterApply = false)

  private def refreshImpl(ackAfterApply: Boolean): Long = {
    // heal a crash that died between the state flip and the ack: the state
    // already reflects appliedVersion, so acknowledge it FIRST — otherwise
    // a delta read from the stale offset would overlap the applied range
    // and double-count it when commits landed after the crash
    appliedVersion.foreach { av =>
      if (lake.consumerOffset(consumerId).forall(_ < av))
        lake.ackConsumer(consumerId, av)
    }
    val (delta, version) = lake.changesForConsumer(consumerId, pk, partitionCols)
    val already = appliedVersion.contains(version)
    if (!already && appliedVersion.forall(_ < version)) {
      val signed = delta
        .filter(col("_change").isin("insert", "delete", "update_pre", "update_post"))
        .withColumn("_sign",
          when(col("_change").isin("insert", "update_post"), 1L).otherwise(-1L))
      val deltaAgg = aggregate(signed)
      val merged = current match {
        case None => deltaAgg
        case Some(_) =>
          // state rows re-enter the fold as (cnt, sums) with sign +1:
          // re-aggregating state ∪ delta sums cell-wise
          val state = read()
          val sumExprs = sumCols.map(c =>
            sum(col(s"${c}_sum")).cast("decimal(28,6)").as(s"${c}_sum"))
          state.unionByName(deltaAgg)
            .groupBy(groupCols.map(col): _*)
            .agg(sum(col("cnt")).as("cnt"), sumExprs: _*)
      }
      val next = merged.filter(col("cnt") =!= 0L)
      val dir = s"state-v$version"
      next.write.mode("overwrite").parquet(rootPath.resolve(dir).toString)
      val tmp = Files.createTempFile(rootPath, "._cur", ".tmp")
      Files.write(tmp, s"$dir@$version".getBytes("UTF-8"),
        StandardOpenOption.TRUNCATE_EXISTING)
      Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
    if (ackAfterApply) lake.ackConsumer(consumerId, version)
    version
  }

  /** Drop superseded state directories, keeping the current one plus the
    * `keepLast` most recent others (readers mid-scan on a superseded state
    * are the same live-reader caveat as [[SnapshotLake.vacuum]]).
    */
  def vacuumState(keepLast: Int = 1): Unit = {
    val keep = current.map(_._1).toSet
    val dirs = Option(rootPath.toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("state-v"))
      .sortBy(f => f.getName.stripPrefix("state-v").toLong)
    dirs.filterNot(f => keep(f.getName)).dropRight(keepLast).foreach { f =>
      Option(f.listFiles()).getOrElse(Array.empty).foreach(_.delete())
      f.delete()
    }
  }
}

object MaterializedAgg {
  /** Open (or initialize) a maintained rollup at `aggRoot`. */
  def apply(
      spark: SparkSession,
      lake: SnapshotLake,
      aggRoot: String,
      consumerId: String,
      pk: Seq[String],
      partitionCols: Seq[String],
      groupCols: Seq[String],
      sumCols: Seq[String]): MaterializedAgg = {
    Files.createDirectories(Paths.get(aggRoot))
    new MaterializedAgg(spark, lake, aggRoot, consumerId, pk, partitionCols,
      groupCols, sumCols)
  }
}
