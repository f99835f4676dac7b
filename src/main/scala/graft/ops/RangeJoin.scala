package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed interval joins: overlap (interval × interval) and containment
  * (point × interval) expressed as EQUI-joins so Catalyst plans a keyed
  * shuffle join instead of the broadcast-nested-loop / cartesian plan a raw
  * theta condition (`l.start < r.end AND r.start < l.end`) would get.
  *
  * Reference analog: the day-grained "collect range" scans
  * (`atd_data_lake/support/last_update.py:78-118`) intersect item date ranges
  * with a requested window by listing day buckets — the same
  * bucket-as-equi-key idea, generalized here to arbitrary epoch-aligned
  * bucket widths and both join shapes.
  *
  * How it scales: each interval is exploded into the `bucketWidth`-wide epoch
  * buckets it touches, the two sides are shuffled once on
  * `(keys…, bucket)`, and the true interval predicate runs as a post-join
  * filter inside the sort-merge join stage. An overlapping pair would match
  * in every bucket the overlap region spans, so the join keeps exactly the
  * bucket containing `max(lStart, rStart)` — the overlap's first instant —
  * which every overlapping pair shares and has exactly one of. Pairs are
  * therefore emitted exactly once with NO distinct/dedup shuffle.
  *
  * Cost model: explode factor per row is `len/bucketWidth + 1`; candidate
  * pairs are per-(key, bucket) products. Pick `bucketWidth` near the typical
  * interval length — wider buckets mean fewer duplicate rows but denser
  * buckets. At 100 TB both knobs (keys cardinality, bucket width) bound the
  * shuffle and no single task sees more than one (key, bucket) cell.
  *
  * Columns named by `lStart`/`lEnd`/`rStart`/`rEnd` are epoch LONGs (seconds
  * or any uniform unit); intervals are half-open `[start, end)`. Rows with
  * `end <= start` (empty intervals) overlap nothing and are filtered before
  * the explode — necessary for correctness, not just cost: the pairwise
  * predicate `lStart < rEnd && rStart < lEnd` only means "overlap" when both
  * intervals are nonempty. The two inputs must have disjoint column names
  * (alias before calling, as with any self-join).
  */
object RangeJoin {

  private val BucketCol = "__rj_bucket"

  /** Epoch-aligned bucket index of `c` — floor division robust to negative
    * epochs. The double divide is exact here: epochs are << 2^53 and the
    * quotient's distance to an integer is ≥ 1/bucketWidth, far above one ulp.
    */
  private def bucketOf(c: org.apache.spark.sql.Column, width: Long) =
    floor(c.cast("double") / width.toDouble).cast("long")

  /** All buckets the half-open interval `[start, end)` touches. */
  private def bucketsOf(start: org.apache.spark.sql.Column, end: org.apache.spark.sql.Column, width: Long) =
    sequence(bucketOf(start, width), bucketOf(end - lit(1L), width))

  /** Inner overlap join: all pairs with equal `leftKeys`/`rightKeys` whose
    * half-open intervals overlap (`lStart < rEnd && rStart < lEnd`). Output
    * carries every column of both inputs, one row per overlapping pair.
    */
  def overlap(
      left: DataFrame,
      right: DataFrame,
      lStart: String, lEnd: String,
      rStart: String, rEnd: String,
      leftKeys: Seq[String], rightKeys: Seq[String],
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(leftKeys.length == rightKeys.length, "key lists must align")
    val lb = left.filter(col(lStart) < col(lEnd))
      .withColumn(BucketCol, explode(bucketsOf(col(lStart), col(lEnd), bucketWidth)))
    val rb = right.filter(col(rStart) < col(rEnd))
      .withColumn(s"${BucketCol}_r", explode(bucketsOf(col(rStart), col(rEnd), bucketWidth)))
    val keyCond = leftKeys.zip(rightKeys)
      .map { case (lk, rk) => lb(lk) === rb(rk) }
      .foldLeft(lb(BucketCol) === rb(s"${BucketCol}_r"))(_ && _)
    val overlapCond = col(lStart) < col(rEnd) && col(rStart) < col(lEnd)
    // emit only in the bucket holding the overlap's first instant
    val emitOnce = bucketOf(greatest(col(lStart), col(rStart)), bucketWidth) === col(BucketCol)
    lb.join(rb, keyCond, "inner")
      .filter(overlapCond && emitOnce)
      .drop(BucketCol, s"${BucketCol}_r")
  }

  /** Inner containment join: each point row paired with every interval row
    * (equal keys) whose half-open interval contains the point
    * (`iStart <= point < iEnd`). A point lives in exactly one bucket, so no
    * emit-once filter is needed — each pair matches exactly once.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      iStart: String, iEnd: String,
      pointKeys: Seq[String], intervalKeys: Seq[String],
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(pointKeys.length == intervalKeys.length, "key lists must align")
    val pb = points.withColumn(BucketCol, bucketOf(col(pointCol), bucketWidth))
    val ib = intervals.filter(col(iStart) < col(iEnd))
      .withColumn(s"${BucketCol}_r", explode(bucketsOf(col(iStart), col(iEnd), bucketWidth)))
    val keyCond = pointKeys.zip(intervalKeys)
      .map { case (pk, ik) => pb(pk) === ib(ik) }
      .foldLeft(pb(BucketCol) === ib(s"${BucketCol}_r"))(_ && _)
    pb.join(ib, keyCond, "inner")
      .filter(col(iStart) <= col(pointCol) && col(pointCol) < col(iEnd))
      .drop(BucketCol, s"${BucketCol}_r")
  }
}
