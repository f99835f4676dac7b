package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
    * the oracle. NaNs are excluded like NULLs ([[psi]]'s convention): one
    * NaN would otherwise poison max() so hi=NaN, and `least(NaN, ...)`
    * silently lands every row in the last bucket — a degenerate histogram
    * with no error.
    */
  def histogramEquiWidth(df: DataFrame, valueCol: String, buckets: Int): DataFrame = {
    require(buckets >= 1 && buckets <= 100000, s"buckets=$buckets out of [1, 100000]")
    val vals = df.filter(col(valueCol).isNotNull && !isnan(col(valueCol).cast("double")))
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

  /** Fixed-grid bucket counts with EXPLICIT bounds — the mergeable quantile
    * sketch: because `[lo, hi)` is caller-fixed (not data-derived), counts
    * from disjoint batches/partitions/streams merge by plain addition, so
    * the sketch maintains under unions with O(buckets) state — the property
    * [[histogramEquiWidth]]'s data-derived bounds lack. Values clamp into
    * the edge buckets ([[psi]]'s out-of-range convention: the sketch never
    * drops a value it was told about). NULL/NaN excluded as always.
    */
  def gridCounts(
      df: DataFrame, valueCol: String, lo: Double, hi: Double, buckets: Int): DataFrame = {
    require(buckets >= 1 && buckets <= 100000, s"buckets=$buckets out of [1, 100000]")
    require(lo < hi, s"need lo < hi, got [$lo, $hi]")
    val vals = df.filter(col(valueCol).isNotNull && !isnan(col(valueCol).cast("double")))
      .select(col(valueCol).cast("double").as("_v"))
    val bucket = greatest(
      least(
        floor((col("_v") - lit(lo)) * lit(buckets) / (lit(hi) - lit(lo))),
        lit((buckets - 1).toDouble)),
      lit(0.0)).cast("long")
    vals.groupBy(bucket.as("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** Quantile estimates from a [[gridCounts]] sketch: for each requested
    * `q`, the smallest bucket whose cumulative count reaches `ceil(q·n)`
    * and that bucket's UPPER edge as the estimate — a value guaranteed ≥
    * the true q-quantile of the clamped data, with error bounded by one
    * grid width `(hi−lo)/buckets`. All arithmetic is the same IEEE op
    * sequence in both engines (`ceil(q·n)`, `lo + (b+1)·((hi−lo)/buckets)`),
    * so estimates oracle exactly.
    *
    * Scale shape: the sketch is ≤ buckets rows; the cumulative window and
    * the quantile probe run over that bounded relation — the corpus is
    * touched only by [[gridCounts]]' one map-side-combinable aggregate.
    */
  def quantilesFromCounts(
      counts: DataFrame, lo: Double, hi: Double, buckets: Int, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must lie in (0, 1]")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = counts.withColumn("_cum", sum(col("cnt")).over(w))
    val total = counts.agg(sum(col("cnt")).as("_n"))
    val qdf = total.select(explode(array(qs.map(lit): _*)).as("q"), col("_n"))
    val width = (hi - lo) / buckets
    cum
      .crossJoin(broadcast(qdf))
      .filter(col("_cum") >= ceil(col("q") * col("_n")))
      .groupBy(col("q"), col("_n"))
      .agg(min(col("bucket")).as("bucket"))
      .select(
        col("q"), col("_n").as("n"), col("bucket"),
        graft.Functions.roundHalfUp(
          lit(lo) + (col("bucket") + lit(1L)).cast("double") * lit(width), 9)
          .as("estimate"))
  }

  /** Merge two [[gridCounts]] sketches built with the SAME bounds and
    * bucket count: plain per-bucket addition — the additive law the fixed
    * grid buys (the [[graft.ops.Hll.mergeRegisters]] maintenance story
    * with `+` instead of `max`). Streaming quantile maintenance folds each
    * batch's counts into the persisted sketch with this.
    */
  def mergeGridCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("bucket")).agg(sum(col("cnt")).as("cnt"))

  /** [[gridCounts]] + [[quantilesFromCounts]] with explicit bounds in one
    * call — the self-contained form the oracle query uses.
    */
  def gridQuantiles(
      df: DataFrame, valueCol: String, lo: Double, hi: Double,
      buckets: Int, qs: Seq[Double]): DataFrame =
    quantilesFromCounts(gridCounts(df, valueCol, lo, hi, buckets), lo, hi, buckets, qs)

  /** Population Stability Index between a REFERENCE sample and a CURRENT
    * sample of the same numeric column — the standard ingest drift monitor
    * ("has this feed's distribution moved since the baseline"):
    * `PSI = Σ_b (p_b − q_b) · ln(p_b / q_b)` over `buckets` equal-width
    * bins fixed by the REFERENCE min/max (current values outside the
    * reference range clamp into the edge buckets), with Laplace smoothing
    * `(cnt + eps) / (n + buckets·eps)` so empty buckets stay finite.
    * Rule of thumb: < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted.
    *
    * Scale shape: two bucket aggregates (each shuffling ≤ buckets rows)
    * joined on the dense bucket spine. Each bucket's term is quantized to
    * integer picounits before the final sum, so the total is order-free
    * and exactly reproducible by the oracle (a raw double Σ would depend
    * on aggregation order).
    *
    * Output: one row `(n_ref, n_cur, psi)`; NULL psi when either side is
    * empty; a CONSTANT reference baseline refuses loudly (bucketing a
    * degenerate distribution would report total drift as stable).
    */
  def psi(
      ref: DataFrame,
      cur: DataFrame,
      valueCol: String,
      buckets: Int,
      eps: Double = 1e-6): DataFrame = {
    require(buckets >= 2 && buckets <= 100000, s"buckets=$buckets out of [2, 100000]")
    require(eps > 0.0, s"eps=$eps must be positive")
    val spark = ref.sparkSession
    // NaN is excluded like NULL on BOTH sides: it has no bucket, and a
    // single reference NaN would poison max() and misdiagnose the baseline
    // as constant
    val refVals = ref.filter(col(valueCol).isNotNull && !isnan(col(valueCol).cast("double")))
      .select(col(valueCol).cast("double").as("_v"))
    val curVals = cur.filter(col(valueCol).isNotNull && !isnan(col(valueCol).cast("double")))
      .select(col(valueCol).cast("double").as("_v"))
    val bounds = refVals.agg(min(col("_v")).as("lo"), max(col("_v")).as("hi")).head()
    if (bounds.isNullAt(0))
      return spark.range(1).select(
        lit(0L).as("n_ref"), lit(curVals.count()).as("n_cur"),
        lit(null).cast("double").as("psi"))
    val lo = bounds.getDouble(0)
    val hi = bounds.getDouble(1)
    // a constant baseline has no shape to compare against — every value of
    // BOTH sides would land in one bucket and total drift would read as
    // "stable". A drift monitor must fail loudly there, not reassure.
    require(hi > lo,
      s"reference distribution is constant at $lo — PSI is undefined on a " +
        "degenerate baseline; check the feed with Validate.AcceptedValues instead")
    def bucketOf(v: Column): Column =
      greatest(
        least(
          floor((v - lit(lo)) * lit(buckets) / (lit(hi) - lit(lo))),
          lit((buckets - 1).toDouble)),
        lit(0.0)).cast("long")
    def hist(vals: DataFrame, cntName: String): DataFrame =
      vals.groupBy(bucketOf(col("_v")).as("bucket")).agg(count(lit(1)).as(cntName))
    val spine = spark.range(buckets).select(col("id").as("bucket"))
    // ≤ buckets rows: collect ONCE — the only evaluation of either
    // histogram — then re-enter Spark over the literal cells so the term
    // arithmetic (log included) runs through the same engine expressions
    // the oracle mirrors
    val cells = spine
      .join(hist(refVals, "_cr"), Seq("bucket"), "left")
      .join(hist(curVals, "_cc"), Seq("bucket"), "left")
      .select(
        coalesce(col("_cr"), lit(0L)).as("cr"),
        coalesce(col("_cc"), lit(0L)).as("cc"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val nRef = cells.map(_._1).sum
    val nCur = cells.map(_._2).sum
    if (nRef == 0L || nCur == 0L)
      return spark.range(1).select(lit(nRef).as("n_ref"), lit(nCur).as("n_cur"),
        lit(null).cast("double").as("psi"))
    import spark.implicits._
    val p = (col("cr").cast("double") + lit(eps)) / lit(nRef.toDouble + buckets * eps)
    val q = (col("cc").cast("double") + lit(eps)) / lit(nCur.toDouble + buckets * eps)
    val term = (p - q) * log(p / q)
    cells.toDF("cr", "cc")
      .select(floor(term * lit(1e12) + lit(0.5)).cast("long").as("_t"))
      .agg(sum(col("_t")).as("_ts"))
      .select(
        lit(nRef).as("n_ref"), lit(nCur).as("n_cur"),
        graft.Functions.roundHalfUp(col("_ts").cast("double") / lit(1e12), 6).as("psi"))
  }

  /** [[psi]] over a CATEGORICAL column — population stability across
    * discrete classes (language mix, cluster membership, source mix)
    * instead of numeric buckets. The spine is the union of categories
    * observed on either side (a category present only in `cur` is drift,
    * not an error), NULL categories are excluded like NULL values, and
    * the same eps smoothing / picounit-quantized term sum keeps the
    * result order-free and oracle-exact. Cardinality is asserted ≤ 100000
    * — the same "the histogram must be driver-sized" bound as [[psi]].
    * Output: one row `(n_ref, n_cur, psi)`.
    */
  def psiCategorical(
      ref: DataFrame,
      cur: DataFrame,
      catCol: String,
      eps: Double = 1e-6): DataFrame = {
    require(eps > 0.0, s"eps=$eps must be positive")
    val spark = ref.sparkSession
    import spark.implicits._
    def counts(df: DataFrame, name: String) =
      df.filter(col(catCol).isNotNull)
        .select(col(catCol).cast("string").as("_cat"))
        .groupBy("_cat").agg(count(lit(1)).as(name))
    val cells = counts(ref, "_cr")
      .join(counts(cur, "_cc"), Seq("_cat"), "full_outer")
      .select(coalesce(col("_cr"), lit(0L)).as("cr"),
        coalesce(col("_cc"), lit(0L)).as("cc"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    require(cells.size <= 100000,
      s"${cells.size} categories — psiCategorical needs a driver-sized spine")
    val k = cells.size
    val nRef = cells.map(_._1).sum
    val nCur = cells.map(_._2).sum
    if (nRef == 0L || nCur == 0L || k == 0)
      return spark.range(1).select(lit(nRef).as("n_ref"), lit(nCur).as("n_cur"),
        lit(null).cast("double").as("psi"))
    val p = (col("cr").cast("double") + lit(eps)) / lit(nRef.toDouble + k * eps)
    val q = (col("cc").cast("double") + lit(eps)) / lit(nCur.toDouble + k * eps)
    val term = (p - q) * log(p / q)
    cells.toDF("cr", "cc")
      .select(floor(term * lit(1e12) + lit(0.5)).cast("long").as("_t"))
      .agg(sum(col("_t")).as("_ts"))
      .select(
        lit(nRef).as("n_ref"), lit(nCur).as("n_cur"),
        graft.Functions.roundHalfUp(col("_ts").cast("double") / lit(1e12), 6).as("psi"))
  }

  /** Embedding-space drift: assign BOTH corpora to a frozen `(cell, cv)`
    * centroid relation (6-decimal rounded cosine argmax, ties to the
    * lowest cell — the [[Prototype]] rule) and compare the cluster
    * membership mixes with [[psiCategorical]]. This is the monitor a
    * production embedding pipeline runs between model versions or data
    * snapshots: numeric PSI per dimension misses rotations that cluster
    * PSI catches.
    *
    * The centroids collect to the driver (nCells ≈ √n — the [[IvfIndex]]
    * bound) and the assignment is a LITERAL expression — per-row cosines
    * against embedded constant vectors, zero joins, zero shuffles (the
    * PCA literal-axes trick); the only exchanges are the two bounded
    * per-cell count aggregates.
    */
  def embeddingDrift(
      ref: DataFrame,
      cur: DataFrame,
      vecCol: String,
      centroids: DataFrame,
      eps: Double = 1e-6): DataFrame = {
    val cells: Seq[(Long, Seq[Double])] = centroids
      .select(col("cell").cast("long"), col("cv").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    require(cells.nonEmpty, "need at least one centroid")
    def assigned(df: DataFrame): DataFrame = {
      val v = col(vecCol).cast("array<double>")
      val scored = array(cells.map { case (c, cv) =>
        struct(
          (-graft.Functions.roundHalfUp(
            graft.Functions.vecCosine(v, typedlit(cv)), 6)).as("n"),
          lit(c).as("c"))
      }: _*)
      // lexicographic min of (-sim, cell) = highest sim, tie → lowest cell
      df.filter(v.isNotNull).select(array_min(scored)("c").as("cell"))
    }
    psiCategorical(assigned(ref), assigned(cur), "cell", eps)
  }
}
