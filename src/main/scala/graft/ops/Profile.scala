package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass data profiling: per-column row/null/distinct counts and
  * min/max — the table-health report a platform publishes next to every
  * dataset (and the first thing an ingest regression trips). Deliberately
  * exact: `count_distinct`, not HLL (the approximate twin is one
  * `approx_count_distinct` swap away and q_x_approx_distinct already
  * covers that contract), so the whole report is SQL-oracle-checkable.
  *
  * Output is long-format — one row per profiled column:
  * `(column, n_rows, n_nulls, n_distinct, min_str, max_str)` with min/max
  * rendered as strings (LONG and STRING columns render identically in
  * every engine; floating-point columns are the caller's job to round
  * first — engine float-to-string formats differ, the reason this op does
  * not cast doubles silently).
  *
  * Scale shape: ONE aggregate over the table computes every column's
  * metrics map-side-combinably (`count_distinct` rewrites to expand +
  * two-phase aggregate); the long format comes from exploding the single
  * result row, which is bounded by the column count. No per-column scans.
  */
object Profile {

  def describe(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"_cnt_$c"),
        count_distinct(col(c)).as(s"_dst_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    val total = count(lit(1)).as("_n")
    val one = df.agg(total, aggs: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("_n").as("n_rows"),
        (col("_n") - col(s"_cnt_$c")).as("n_nulls"),
        col(s"_dst_$c").as("n_distinct"),
        col(s"_min_$c").as("min_str"),
        col(s"_max_$c").as("max_str"))
    }
    one
      .select(explode(array(entries: _*)).as("e"))
      .select("e.column", "e.n_rows", "e.n_nulls", "e.n_distinct", "e.min_str", "e.max_str")
  }

  /** Equi-width histogram of a numeric column: `(bucket, cnt)` over
    * `buckets` equal bins spanning [min, max], the top edge closing into
    * the last bucket. Two passes — one bounds aggregate whose two scalars
    * become plan-time literals, one bucket `groupBy` (map-side combinable,
    * shuffle ≤ buckets rows). NULLs excluded; a constant column lands
    * whole in bucket 0. Bucket arithmetic is plain double ops mirrored by
    * the oracle.
    */
  def histogramEquiWidth(df: DataFrame, valueCol: String, buckets: Int): DataFrame = {
    require(buckets >= 1 && buckets <= 100000, s"buckets=$buckets out of [1, 100000]")
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("_v"))
    val bounds = vals.agg(min(col("_v")).as("lo"), max(col("_v")).as("hi")).head()
    if (bounds.isNullAt(0)) {
      // empty input: zero-row histogram with the right schema
      return vals.select(lit(0L).as("bucket"), lit(0L).as("cnt")).limit(0)
    }
    val lo = bounds.getDouble(0)
    val hi = bounds.getDouble(1)
    val bucket =
      if (hi == lo) lit(0L)
      else least(
        floor((col("_v") - lit(lo)) * lit(buckets) / (lit(hi) - lit(lo))),
        lit((buckets - 1).toDouble)).cast("long")
    vals.groupBy(bucket.as("bucket")).agg(count(lit(1)).as("cnt"))
  }
}
