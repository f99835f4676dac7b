package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.incr.IncrementalDiff
import graft.ops.{AsOf, Publish, TrafficAgg}

/** Time-series operator coverage over the `events` table: the flagship
  * 15-minute aggregation (SURVEY A1), incremental diff (J1), as-of joins
  * (J7/J8), windows (W1/W5/W6), and per-sensor health aggregates (A2-A6).
  *
  * Timestamp discipline: the synthetic `ts` carries nanoseconds, which Spark
  * floors to microseconds on read while other engines keep — so every query
  * that returns or *orders by* a timestamp first truncates to whole seconds
  * on both sides (see [[Functions.toSecond]]).
  */
object QueriesEvents {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  private def valSum = (c: org.apache.spark.sql.Column) => Functions.sumExact2(c)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1: flagship 15-min tumbling aggregation (reference gs_ready_agg.py:69-92)
    "q_a1_traffic15" -> ((s, dir) =>
      TrafficAgg.aggregate(t(s, dir, "events"), "ts", Seq("event_type"), Seq("value"))),

    // A2: day-grain discovery count (reference wt_mssql_db.py:62-74)
    "q_a2_daily_count" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("event_day"))
        .agg(count(lit(1)).as("n"))),

    // A3: per-sensor daily health observation (reference bt_json_standard.py:146-157)
    "q_a3_health" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("user_id"), Functions.toSecond(col("ts")).as("ts_sec"), col("value"))
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n"),
          valSum(col("value")).as("value_sum"),
          min(col("ts_sec")).as("first_ts"),
          max(col("ts_sec")).as("last_ts"))),

    // A5: 7-day expected value, moving average (reference perfmet_knack.py:127-156)
    "q_a5_7day_avg" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("event_day"))
        .agg(valSum(col("value")).as("daily_value"))
        .withColumn("day_num", datediff(col("event_day"), lit("1970-01-01").cast("date")))
      val w = Window
        .partitionBy(col("event_type"))
        .orderBy(col("day_num"))
        .rangeBetween(-6, 0)
      daily
        .withColumn("expected", Functions.roundHalfUp(avg(col("daily_value")).over(w), 3))
        .select("event_type", "event_day", "daily_value", "expected")
    }),

    // A6/W3: latest row per group (reference perfmet_knack.py:140-143)
    "q_a6_latest_per_user" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          Functions.toSecond(col("ts")).as("ts_sec"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_sec").desc, col("event_id").desc)
      e.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "event_type", "ts_sec")
    }),

    // J1: the engine's core incremental anti-join over date intervals
    // (reference support/last_update.py:52-121): orders with no lineitem
    // shipped within the order-date day window
    "q_j1_incr_diff" -> ((s, dir) => {
      val src = t(s, dir, "orders")
        .select(col("o_orderkey").as("id_base"), col("o_orderdate").as("collection_date"))
      val tgt = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("id_base"), col("l_shipdate").as("collection_date"))
      IncrementalDiff
        .diff(src, tgt, Seq("id_base"), "collection_date")
        .select(col("id_base"), to_date(col("collection_date")).as("item_date"))
    }),

    // J1 force-mode + F4 same-day cancel (reference etl_app.py:106,
    // last_update.py:200-206): force skips the target subtraction; items
    // dated "today" are dropped because the day is still accumulating
    "q_j1_force_sameday" -> ((s, dir) => {
      val src = t(s, dir, "events")
        .select(col("user_id").as("id_base"), to_date(col("ts")).as("collection_date"))
        .distinct()
      IncrementalDiff.diff(
        src, src.limit(0), Seq("id_base"), "collection_date",
        force = true, sameDayCancel = true, today = lit("2024-01-15").cast("date"))
    }),

    // J7: forward as-of join — earliest signup at-or-after each purchase
    // (reference support/unitdata.py:40-63 resolves the nearest unit-data
    // snapshot with date >= item date)
    "q_j7_asof_fwd" -> ((s, dir) => asof(s, dir, forward = true)),

    // J8: backward as-of join — latest signup at-or-before each purchase
    // (reference support/catalog.py:105-188 "previous-date" site lookup)
    "q_j8_asof_back" -> ((s, dir) => asof(s, dir, forward = false)),

    // J8 with a staleness bound (pandas merge_asof tolerance): the latest
    // signup at-or-before each purchase attaches only when it is at most
    // one day old — stale matches null out whole, facts are all kept
    "q_j15_asof_tol" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), Functions.toSecond(col("ts")).as("pts"))
      val signups = e.filter(col("event_type") === "signup")
        .select(col("user_id"), Functions.toSecond(col("ts")).as("sts"), col("event_id"))
      AsOf.joinWithTolerance(purchases, signups, "user_id", "pts", "sts",
          snapCols = Seq("event_id"), toleranceSeconds = 86400L,
          forward = false, tiebreak = Some("event_id"))
        .select(col("event_id"), col("user_id"), col("pts").as("purchase_ts"),
          col("snap_event_id"), col("snap_sts").as("signup_ts"))
    }),

    // W1: daily first-seen counter, privacy pseudonymization
    // (reference bt_extract_soc.py:73-91)
    "q_w1_first_seen" -> ((s, dir) =>
      Publish
        .firstSeenCounter(
          t(s, dir, "events").select(
            Functions.toSecond(col("ts")).as("ts_sec"), col("user_id")),
          "ts_sec", "user_id")
        .select(col("day"), col("user_id"), col("first_seen"),
          col("daily_counter").cast("long").as("daily_counter"))),

    // W5: lag / previous-row change detection (reference etl_app.py:272-281)
    "q_w5_lag_gap" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), Functions.toSecond(col("ts")).as("ts_sec"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"), col("event_id"))
      e.withColumn(
          "gap_s",
          unix_timestamp(col("ts_sec")) - lag(unix_timestamp(col("ts_sec")), 1).over(w))
        .select("event_id", "user_id", "gap_s")
    }),

    // W6: 15-minute time-bin label (reference wt_extract_soc.py:79)
    "q_w6_timebin" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"), Functions.timeBin15(col("ts")).as("timebin"))),

    // K2: catalog upsert / latest-wins merge on the PK (reference
    // support/catalog.py:283-314): second batch overrides the first
    "q_k2_upsert" -> ((s, dir) => {
      val base = t(s, dir, "orders").select(
        col("o_orderkey").as("id_base"),
        lit("raw").as("repository"),
        col("o_orderpriority").as("pointer"),
        lit(1L).as("batch"))
      val update = t(s, dir, "orders")
        .filter(col("o_orderkey") % 10 === 0)
        .select(
          col("o_orderkey").as("id_base"),
          lit("raw").as("repository"),
          lit("updated").as("pointer"),
          lit(2L).as("batch"))
      graft.catalog.LakeCatalog
        .merge(base.unionByName(update), Seq("id_base", "repository"), "batch")
        .select("id_base", "repository", "pointer", "batch")
    }),

    // K2 through the PHYSICAL snapshot-commit path: two real upserts into a
    // SnapshotCatalog (manifest v1 then v2 — the second reads v1's parquet
    // back and merges), then read the committed snapshot. Latest
    // processing_date wins per PK, exactly the q_k2_upsert relational core,
    // but here the answer round-trips through immutable data files + an
    // atomic manifest swap instead of an in-plan window.
    "q_k2_snapshot" -> ((s, dir) => {
      def asCatalog(src: DataFrame, ptr: org.apache.spark.sql.Column, stamp: String) =
        src.select(
          lit("raw").as("repository"),
          lit("bt").as("data_source"),
          col("o_orderkey").cast("string").as("id_base"),
          lit("x.txt").as("id_ext"),
          ptr.as("pointer"),
          to_timestamp(lit("2020-01-15 00:00:00")).as("collection_date"),
          lit(null).cast("timestamp").as("collection_end"),
          to_timestamp(lit(stamp)).as("processing_date"),
          lit(null).cast("string").as("metadata"))
      val orders = t(s, dir, "orders")
      val tmp = java.nio.file.Files.createTempDirectory("graft_q_k2_snap")
      val cat = new graft.catalog.SnapshotCatalog(s, tmp.toString)
      cat.upsert(asCatalog(orders, col("o_orderpriority"), "2020-02-01 00:00:00"))
      cat.upsert(asCatalog(
        orders.filter(col("o_orderkey") % 10 === 0), lit("updated"), "2020-02-02 00:00:00"))
      // pin the physical read into memory so the temp catalog can be
      // deleted NOW — bench repeats this query and must not leak a full
      // orders snapshot into /tmp per run (bounded: 2 narrow columns)
      val result = cat.read().select("id_base", "pointer").collect()
      val walk = java.nio.file.Files.walk(tmp)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
      import scala.jdk.CollectionConverters._
      s.createDataFrame(result.toSeq.asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id_base",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("pointer",
            org.apache.spark.sql.types.StringType))))
    }),

    // §2.9: the flagship aggregation through the *real* Structured
    // Streaming engine (AvailableNow over a file source, complete-mode
    // memory sink) — same answer as the batch plan, exercised end-to-end
    "q_st_stream15" -> ((s, dir) => streamAgg(s, dir)),

    // Interval-overlap join as a bucketed EQUI-join (RangeJoin.overlap):
    // click sessions × view sessions per user, one row per overlapping pair,
    // no nested-loop plan, no dedup shuffle
    "q_rj_overlap" -> ((s, dir) => {
      val l = sessionIntervals(s, dir, "click", "l")
      val r = sessionIntervals(s, dir, "view", "r")
      graft.ops.RangeJoin
        .overlap(l, r, "l_start", "l_end", "r_start", "r_end",
          Seq("l_user"), Seq("r_user"), bucketWidth = 86400L)
        .select("l_id", "r_id")
    }),

    // robust stats: winsorize value to its event-type's exact [p05, p95]
    "q_rb_winsor" -> ((s, dir) =>
      graft.ops.Robust.winsorize(
          t(s, dir, "events").select(col("event_id"), col("event_type"), col("value")),
          "event_type", "value", 0.05, 0.95)
        .select("event_id", "event_type", "value_w")),

    // forward fill: carry each user's last click value across non-click
    // events — last(ignoreNulls) over a running keyed window
    "q_ts_ffill" -> ((s, dir) => {
      val e = t(s, dir, "events").select(
        col("event_id"), col("user_id"),
        unix_timestamp(Functions.toSecond(col("ts"))).as("tss"),
        when(col("event_type") === "click", col("value")).as("_v"))
      graft.ops.TimeSeries.forwardFill(e, "user_id", "tss", "event_id", Seq("_v"))
        .select(col("event_id"), col("user_id"),
          Functions.roundHalfUp(col("_v_ff"), 6).as("v_ff"))
    }),

    // grid resample: one row per (user, hour slot) carrying the as-of
    // reading — grid construction + the AsOf union-window fill
    "q_ts_grid" -> ((s, dir) => {
      val e = t(s, dir, "events").select(
        col("user_id"),
        unix_timestamp(Functions.toSecond(col("ts"))).as("sec"),
        col("value"), col("event_id"))
      graft.ops.TimeSeries.resampleGrid(e, "user_id", "sec", "value", "event_id", 3600L)
        .select(col("user_id"), col("grid_ts"), col("snap_sec").as("obs_sec"),
          Functions.roundHalfUp(col("snap_value"), 6).as("v"))
    }),

    // grid interpolation: one row per (user, hour slot) with the value
    // linearly interpolated between the bracketing observations — two
    // as-of union-window passes, no interval explosion
    "q_ts_interp" -> ((s, dir) => {
      val e = t(s, dir, "events").select(
        col("user_id"),
        unix_timestamp(Functions.toSecond(col("ts"))).as("sec"),
        col("value"), col("event_id"))
      graft.ops.TimeSeries.interpolateGrid(e, "user_id", "sec", "value", "event_id", 3600L)
        .select(col("user_id"), col("grid_ts"), col("prev_sec"), col("next_sec"),
          Functions.roundHalfUp(col("v"), 6).as("v"))
    }),

    // EWMA smoothing (alpha = 0.3): per-step 9-decimal quantization makes
    // the sequential recursion bit-reproducible — the oracle replays it in
    // a recursive CTE
    "q_ts_ewma" -> ((s, dir) => {
      val e = t(s, dir, "events").select(
        col("user_id"), col("event_id"),
        unix_timestamp(Functions.toSecond(col("ts"))).as("sec"),
        col("value"))
      graft.ops.TimeSeries.ewma(e, "user_id", "sec", "event_id", "value", alpha = 0.3)
    }),

    // per-key OLS trend: drift slope/intercept from DECIMAL-exact sums —
    // one map-side-combinable aggregate per sensor
    "q_ts_trend" -> ((s, dir) => {
      val e = t(s, dir, "events").select(
        col("user_id"),
        unix_timestamp(Functions.toSecond(col("ts"))).as("sec"),
        col("value"))
      graft.ops.TimeSeries.trend(e, "user_id", "sec", "value")
    }),

    // robust stats: per-type quantile normalization (percent_rank) — the
    // cross-source score calibration; the approx histogram path is
    // spec-bounded against this exact form
    "q_rb_qnorm" -> ((s, dir) =>
      graft.ops.Robust.quantileNormalize(
          t(s, dir, "events").select(col("event_id"), col("event_type"), col("value")),
          "event_type", "value")
        .select("event_id", "event_type", "value_qn")),

    // O7's scale path: exact per-group top-k via bounded per-partition
    // heaps + a broadcast-semi recovery join — no per-group sort of the
    // fact table (the window form q_o7_topk is the oracle-shaped twin)
    "q_o8_grouptopk" -> ((s, dir) =>
      graft.ops.TopK.groupTopK(
          t(s, dir, "events").select(col("event_id"), col("event_type"), col("value")),
          "event_type", "value", "event_id", k = 3)
        .select("event_id", "event_type", "value")),

    // robust stats: per-flag Pearson correlation between quantity and
    // price — five DECIMAL-exact sums in one aggregate, closed form in
    // DOUBLE (sqrt is IEEE-correctly-rounded, so both engines agree)
    "q_rb_corr" -> ((s, dir) =>
      graft.ops.Robust.groupCorr(
        t(s, dir, "lineitem"), "l_returnflag", "l_quantity", "l_extendedprice")),

    // robust location: 10%-trimmed mean per event type — drop each tail's
    // floor(0.1·n) values by (value, event_id) rank, average the core
    "q_rb_trimmed" -> ((s, dir) =>
      graft.ops.Robust.trimmedMean(
        t(s, dir, "events").select(col("event_id"), col("event_type"), col("value")),
        "event_type", "event_id", "value", trim = 0.1)),

    // robust stats: median-absolute-deviation outlier flags at k = 3
    "q_rb_mad" -> ((s, dir) =>
      graft.ops.Robust.madOutliers(
          t(s, dir, "events").select(col("event_id"), col("event_type"), col("value")),
          "event_type", "value", k = 3.0)
        .select("event_id", "event_type", "value_outlier")),

    // Point-in-interval containment join (RangeJoin.pointInInterval):
    // purchases landing inside a click session of the same user
    "q_rj_point" -> ((s, dir) => {
      val p = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(
          col("user_id").as("p_user"), col("event_id").as("p_id"),
          unix_timestamp(col("ts")).as("p_ts"))
      val iv = sessionIntervals(s, dir, "click", "l")
      graft.ops.RangeJoin
        .pointInInterval(p, iv, "p_ts", "l_start", "l_end",
          Seq("p_user"), Seq("l_user"), bucketWidth = 86400L)
        .select("p_id", "l_id")
    }))

  /** Synthetic per-user session interval for RangeJoin queries: starts at the
    * event, lasts `60 + floor(value*60)` seconds (1 min .. ~8.2 h — spans at
    * most two day-wide buckets). floor() before the long cast on BOTH sides:
    * Spark's double→long cast truncates while DuckDB's rounds.
    */
  private def sessionIntervals(s: SparkSession, dir: String, eventType: String, p: String): DataFrame =
    t(s, dir, "events")
      .filter(col("event_type") === eventType)
      .select(
        col("user_id").as(s"${p}_user"),
        col("event_id").as(s"${p}_id"),
        unix_timestamp(col("ts")).as(s"${p}_start"),
        (unix_timestamp(col("ts")) + lit(60L) + floor(col("value") * 60d).cast("long"))
          .as(s"${p}_end"))

  // one temp copy + one memory-sink table per (session, sfDir) — reruns in
  // a long-lived session (BenchDebug, repeated Verify) reuse it instead of
  // leaking a fresh directory and in-memory table each call
  private val streamResults =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  private def streamAgg(s: SparkSession, dir: String): DataFrame =
    streamResults.getOrElseUpdate(s.hashCode() + "|" + dir, {
      val events = t(s, dir, "events")
      val tmp = java.nio.file.Files.createTempDirectory("graft_stream_q").toString
      events.write.mode("overwrite").parquet(tmp)
      graft.streaming.Streaming.runAvailableNow(
        s, tmp, events.schema,
        df => graft.streaming.Streaming.windowedAgg(df, "ts", Seq("event_type"), Seq("value")),
        outputMode = "complete")
    })

  /** Shared J7/J8 as-of query: purchases resolved against signup snapshots
    * per user. Truncation to seconds happens before the join on both sides.
    */
  private def asof(s: SparkSession, dir: String, forward: Boolean): DataFrame = {
    val e = t(s, dir, "events")
    val purchases = e
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), Functions.toSecond(col("ts")).as("pts"))
    val signups = e
      .filter(col("event_type") === "signup")
      .select(col("user_id"), Functions.toSecond(col("ts")).as("sts"), col("event_id"))
    AsOf
      .join(purchases, signups, "user_id", "pts", "sts",
        snapCols = Seq("event_id"), forward = forward, tiebreak = Some("event_id"))
      .filter(col("snap_event_id").isNotNull)
      .select(
        col("event_id"), col("user_id"), col("pts").as("purchase_ts"),
        col("snap_event_id"), col("snap_sts").as("signup_ts"))
  }

  private val asofOracle: Boolean => String = fwd => {
    val (cmp, ord) = if (fwd) (">=", "ASC") else ("<=", "DESC")
    s"""WITH p AS (SELECT event_id, user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS pts
       |       FROM events WHERE event_type = 'purchase'),
       |s AS (SELECT event_id AS s_id, user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS sts
       |       FROM events WHERE event_type = 'signup'),
       |j AS (SELECT p.event_id, p.user_id, p.pts, s.s_id, s.sts,
       |        row_number() OVER (PARTITION BY p.event_id ORDER BY s.sts $ord, s.s_id $ord) AS rn
       |      FROM p JOIN s ON p.user_id = s.user_id AND s.sts $cmp p.pts)
       |SELECT event_id, user_id, pts AS purchase_ts, s_id AS snap_event_id, sts AS signup_ts
       |FROM j WHERE rn = 1""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_a1_traffic15" ->
      """WITH g AS (
        |  SELECT make_timestamp(CAST(floor(epoch(ts)/900)*900 AS BIGINT)*1000000) AS bucket_start,
        |    event_type, count(*) AS volume,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
        |    CAST(sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s2
        |  FROM events GROUP BY 1, 2)
        |SELECT bucket_start, event_type, volume,
        |  floor(s1 / volume * 1000 + 0.5) / 1000 AS value_avg,
        |  CASE WHEN volume > 1
        |    THEN floor(sqrt(greatest((s2 * volume - s1 * s1) / (volume * (volume - 1)), 0.0)) * 1000 + 0.5) / 1000
        |    ELSE 0.0 END AS value_std
        |FROM g""".stripMargin,
    "q_a2_daily_count" ->
      "SELECT CAST(ts AS DATE) AS event_day, count(*) AS n FROM events GROUP BY 1",
    "q_a3_health" ->
      """SELECT user_id, count(*) AS n,
        |  floor(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) * 100 + 0.5) / 100 AS value_sum,
        |  min(CAST(date_trunc('second', ts) AS TIMESTAMP)) AS first_ts,
        |  max(CAST(date_trunc('second', ts) AS TIMESTAMP)) AS last_ts
        |FROM events GROUP BY user_id""".stripMargin,
    "q_a5_7day_avg" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS event_day,
        |    floor(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) * 100 + 0.5) / 100 AS daily_value,
        |    CAST(ts AS DATE) - DATE '1970-01-01' AS day_num
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, event_day, daily_value,
        |  floor(avg(daily_value) OVER (PARTITION BY event_type ORDER BY day_num
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) * 1000 + 0.5) / 1000 AS expected
        |FROM daily""".stripMargin,
    "q_a6_latest_per_user" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |    CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_sec FROM events)
        |SELECT user_id, event_id, event_type, ts_sec
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts_sec DESC, event_id DESC) AS rn
        |      FROM e) WHERE rn = 1""".stripMargin,
    "q_j1_incr_diff" ->
      """SELECT o_orderkey AS id_base, CAST(o_orderdate AS DATE) AS item_date
        |FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND o.o_orderdate < l.l_shipdate + INTERVAL 1 DAY
        |    AND l.l_shipdate < o.o_orderdate + INTERVAL 1 DAY)""".stripMargin,
    "q_j1_force_sameday" ->
      """SELECT DISTINCT user_id AS id_base, CAST(ts AS DATE) AS collection_date
        |FROM events WHERE CAST(ts AS DATE) < DATE '2024-01-15'""".stripMargin,
    "q_j7_asof_fwd" -> asofOracle(true),
    "q_j8_asof_back" -> asofOracle(false),
    "q_j15_asof_tol" ->
      """WITH p AS (SELECT event_id, user_id,
        |    CAST(date_trunc('second', ts) AS TIMESTAMP) AS pts
        |  FROM events WHERE event_type = 'purchase'),
        |s AS (SELECT event_id AS s_id, user_id,
        |    CAST(date_trunc('second', ts) AS TIMESTAMP) AS sts
        |  FROM events WHERE event_type = 'signup'),
        |j AS (SELECT p.event_id, s.s_id, s.sts,
        |    row_number() OVER (PARTITION BY p.event_id
        |      ORDER BY s.sts DESC, s.s_id DESC) AS rn
        |  FROM p JOIN s ON p.user_id = s.user_id AND s.sts <= p.pts),
        |pick AS (SELECT event_id, s_id, sts FROM j WHERE rn = 1)
        |SELECT p.event_id, p.user_id, p.pts AS purchase_ts,
        |  CASE WHEN pick.sts IS NOT NULL
        |        AND epoch(p.pts) - epoch(pick.sts) <= 86400
        |       THEN pick.s_id END AS snap_event_id,
        |  CASE WHEN pick.sts IS NOT NULL
        |        AND epoch(p.pts) - epoch(pick.sts) <= 86400
        |       THEN pick.sts END AS signup_ts
        |FROM p LEFT JOIN pick ON p.event_id = pick.event_id""".stripMargin,
    "q_w1_first_seen" ->
      """WITH fs AS (
        |  SELECT CAST(ts AS DATE) AS day, user_id,
        |    min(CAST(date_trunc('second', ts) AS TIMESTAMP)) AS first_seen
        |  FROM events GROUP BY 1, 2)
        |SELECT day, user_id, first_seen,
        |  dense_rank() OVER (PARTITION BY day ORDER BY first_seen, user_id) AS daily_counter
        |FROM fs""".stripMargin,
    "q_w5_lag_gap" ->
      """WITH e AS (SELECT event_id, user_id,
        |    CAST(date_part('epoch', date_trunc('second', ts)) AS BIGINT) AS sec FROM events)
        |SELECT event_id, user_id,
        |  sec - lag(sec, 1) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS gap_s
        |FROM e""".stripMargin,
    "q_w6_timebin" ->
      """SELECT event_id,
        |  lpad(CAST(hour(ts) AS VARCHAR), 2, '0') || ':' ||
        |  lpad(CAST((minute(ts) // 15) * 15 AS VARCHAR), 2, '0') AS timebin
        |FROM events""".stripMargin,
    "q_st_stream15" ->
      """WITH g AS (
        |  SELECT make_timestamp(CAST(floor(epoch(ts)/900)*900 AS BIGINT)*1000000) AS bucket_start,
        |    event_type, count(*) AS volume,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
        |    count(value) AS nv
        |  FROM events GROUP BY 1, 2)
        |SELECT bucket_start, event_type, volume,
        |  floor(s1 / nv * 1000 + 0.5) / 1000 AS value_avg
        |FROM g""".stripMargin,
    "q_k2_upsert" ->
      """WITH all_batches AS (
        |  SELECT o_orderkey AS id_base, 'raw' AS repository, o_orderpriority AS pointer, 1 AS batch
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 'raw', 'updated', 2 FROM orders WHERE o_orderkey % 10 = 0)
        |SELECT id_base, repository, pointer, CAST(batch AS BIGINT) AS batch
        |FROM (SELECT *, row_number() OVER (PARTITION BY id_base, repository ORDER BY batch DESC) AS rn
        |      FROM all_batches) WHERE rn = 1""".stripMargin,
    "q_k2_snapshot" ->
      """WITH all_batches AS (
        |  SELECT CAST(o_orderkey AS VARCHAR) AS id_base, o_orderpriority AS pointer, 1 AS batch
        |  FROM orders
        |  UNION ALL
        |  SELECT CAST(o_orderkey AS VARCHAR), 'updated', 2 FROM orders WHERE o_orderkey % 10 = 0)
        |SELECT id_base, pointer
        |FROM (SELECT *, row_number() OVER (PARTITION BY id_base ORDER BY batch DESC) AS rn
        |      FROM all_batches) WHERE rn = 1""".stripMargin,
    "q_rj_overlap" ->
      s"""WITH l AS ($intervalSql0click), r AS (${intervalSql("view", "r")})
        |SELECT l_id, r_id
        |FROM l JOIN r ON l_user = r_user AND l_start < r_end AND r_start < l_end""".stripMargin,
    "q_rb_winsor" ->
      """WITH q AS (SELECT event_type, quantile_cont(value, 0.05) AS lo,
        |    quantile_cont(value, 0.95) AS hi FROM events GROUP BY 1)
        |SELECT event_id, e.event_type,
        |  floor(least(greatest(value, lo), hi) * 1000000 + 0.5) / 1000000 AS value_w
        |FROM events e JOIN q USING (event_type)""".stripMargin,
    "q_ts_ffill" ->
      """WITH e AS (SELECT event_id, user_id,
        |    CAST(date_part('epoch', date_trunc('second', ts)) AS BIGINT) AS sec,
        |    CASE WHEN event_type = 'click' THEN value END AS v
        |  FROM events)
        |SELECT event_id, user_id,
        |  floor(last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY sec, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1e6 + 0.5) / 1e6
        |    AS v_ff
        |FROM e""".stripMargin,
    "q_ts_grid" ->
      """WITH o0 AS (SELECT user_id,
        |    CAST(date_part('epoch', date_trunc('second', ts)) AS BIGINT) AS sec,
        |    value, event_id
        |  FROM events),
        |o AS (SELECT user_id, sec, value FROM o0
        |  QUALIFY row_number() OVER (PARTITION BY user_id, sec ORDER BY event_id DESC) = 1),
        |b AS (SELECT user_id, min(sec) AS lo, max(sec) AS hi FROM o GROUP BY 1),
        |g AS (SELECT user_id,
        |    unnest(generate_series(
        |      (lo + 3599) - ((lo + 3599) % 3600), hi - (hi % 3600), 3600)) AS grid_ts
        |  FROM b
        |  WHERE hi - (hi % 3600) >= (lo + 3599) - ((lo + 3599) % 3600))
        |SELECT g.user_id, g.grid_ts, o.sec AS obs_sec,
        |  floor(o.value * 1e6 + 0.5) / 1e6 AS v
        |FROM g ASOF JOIN o ON g.user_id = o.user_id AND g.grid_ts >= o.sec""".stripMargin,
    "q_ts_interp" ->
      """WITH o0 AS (SELECT user_id,
        |    CAST(date_part('epoch', date_trunc('second', ts)) AS BIGINT) AS sec,
        |    value, event_id
        |  FROM events),
        |o AS (SELECT user_id, sec, value FROM o0
        |  QUALIFY row_number() OVER (PARTITION BY user_id, sec ORDER BY event_id DESC) = 1),
        |b AS (SELECT user_id, min(sec) AS lo, max(sec) AS hi FROM o GROUP BY 1),
        |g AS (SELECT user_id,
        |    unnest(generate_series(
        |      (lo + 3599) - ((lo + 3599) % 3600), hi - (hi % 3600), 3600)) AS grid_ts
        |  FROM b
        |  WHERE hi - (hi % 3600) >= (lo + 3599) - ((lo + 3599) % 3600)),
        |pv AS (SELECT g.user_id, g.grid_ts, o.sec AS prev_sec, o.value AS prev_v
        |  FROM g ASOF JOIN o ON g.user_id = o.user_id AND g.grid_ts >= o.sec),
        |n0 AS (SELECT user_id, -sec AS nsec, sec, value FROM o),
        |gg AS (SELECT user_id, grid_ts, -grid_ts AS ngrid FROM g),
        |nx AS (SELECT gg.user_id, gg.grid_ts, n0.sec AS next_sec, n0.value AS next_v
        |  FROM gg ASOF JOIN n0 ON gg.user_id = n0.user_id AND gg.ngrid >= n0.nsec)
        |SELECT pv.user_id, pv.grid_ts, prev_sec, next_sec,
        |  floor(CASE WHEN next_sec = prev_sec THEN prev_v
        |        ELSE prev_v + (next_v - prev_v) *
        |          (CAST(pv.grid_ts - prev_sec AS DOUBLE) /
        |           CAST(next_sec - prev_sec AS DOUBLE)) END * 1000000 + 0.5) / 1000000 AS v
        |FROM pv JOIN nx ON pv.user_id = nx.user_id AND pv.grid_ts = nx.grid_ts""".stripMargin,
    "q_ts_ewma" ->
      """WITH RECURSIVE e AS (
        |  SELECT CAST(user_id AS VARCHAR) AS k, event_id AS id, value AS v,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY CAST(date_part('epoch', date_trunc('second', ts)) AS BIGINT),
        |        event_id) AS rn
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT k, id, rn, floor(v * 1e9 + 0.5) / 1e9 AS s FROM e WHERE rn = 1
        |  UNION ALL
        |  SELECT e.k, e.id, e.rn, floor((0.3 * e.v + (1.0 - 0.3) * r.s) * 1e9 + 0.5) / 1e9
        |  FROM r JOIN e ON e.k = r.k AND e.rn = r.rn + 1)
        |SELECT k AS user_id, id AS event_id, s AS ewma FROM r""".stripMargin,
    "q_ts_trend" ->
      """WITH b AS (SELECT user_id,
        |    CAST(date_part('epoch', date_trunc('second', ts)) AS BIGINT) AS x, value
        |  FROM events WHERE value IS NOT NULL),
        |c AS (SELECT user_id, x, x - min(x) OVER (PARTITION BY user_id) AS xc, value FROM b),
        |g AS (SELECT user_id, count(*) AS n, min(x) AS x0,
        |    CAST(sum(CAST(xc AS DECIMAL(38,0))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(xc AS DECIMAL(19,0)) * CAST(xc AS DECIMAL(19,0))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(xc AS DECIMAL(19,0)) * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sxy
        |  FROM c GROUP BY 1),
        |s AS (SELECT user_id, n, x0,
        |    n * sxy - sx * sy AS num, n * sxx - sx * sx AS den, sy, sx FROM g)
        |SELECT user_id, n, x0,
        |  CASE WHEN den = 0 THEN NULL
        |       ELSE floor((num / den) * 1000000 + 0.5) / 1000000 END AS slope,
        |  CASE WHEN den = 0 THEN NULL
        |       ELSE floor(((sy - (num / den) * sx) / n) * 1000000 + 0.5) / 1000000
        |       END AS intercept
        |FROM s""".stripMargin,
    "q_rb_qnorm" ->
      """SELECT event_id, event_type,
        |  floor(percent_rank() OVER (PARTITION BY event_type ORDER BY value)
        |    * 1000000 + 0.5) / 1000000 AS value_qn
        |FROM events WHERE value IS NOT NULL
        |UNION ALL
        |SELECT event_id, event_type, NULL AS value_qn
        |FROM events WHERE value IS NULL""".stripMargin,
    "q_o8_grouptopk" ->
      """SELECT event_id, event_type, value FROM events
        |WHERE value IS NOT NULL
        |QUALIFY row_number() OVER (PARTITION BY event_type
        |  ORDER BY value DESC, CAST(event_id AS VARCHAR)) <= 3""".stripMargin,
    "q_rb_corr" ->
      """WITH g AS (SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(28,6))
        |      * CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))
        |      * CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS syy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(28,6))
        |      * CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sxy
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |  GROUP BY 1)
        |SELECT l_returnflag, n,
        |  CASE WHEN n < 2 OR n * sxx - sx * sx <= 0 OR n * syy - sy * sy <= 0
        |       THEN NULL
        |       ELSE floor((n * sxy - sx * sy)
        |         / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
        |         * 1000000 + 0.5) / 1000000 END AS corr
        |FROM g""".stripMargin,
    "q_rb_trimmed" ->
      """WITH e AS (
        |  SELECT event_type AS grp, event_id, CAST(value AS DOUBLE) AS v
        |  FROM events
        |  WHERE event_id IS NOT NULL AND value IS NOT NULL
        |    AND NOT isnan(CAST(value AS DOUBLE))),
        |r AS (
        |  SELECT grp, v,
        |    row_number() OVER (PARTITION BY grp ORDER BY v, event_id) AS rn,
        |    count(*) OVER (PARTITION BY grp) AS n
        |  FROM e),
        |f AS (
        |  SELECT grp, v FROM r
        |  WHERE rn > CAST(floor(0.1 * CAST(n AS DOUBLE)) AS BIGINT)
        |    AND rn <= n - CAST(floor(0.1 * CAST(n AS DOUBLE)) AS BIGINT))
        |SELECT grp AS event_type, count(*) AS n_kept,
        |  floor(CAST(sum(CAST(v AS DECIMAL(28,6))) AS DOUBLE) / count(*)
        |    * 1000000 + 0.5) / 1000000 AS trimmed_mean
        |FROM f GROUP BY 1""".stripMargin,
    "q_rb_mad" ->
      """WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |    FROM events GROUP BY 1),
        |d AS (SELECT event_id, e.event_type, abs(value - med) AS dev
        |    FROM events e JOIN m USING (event_type)),
        |md AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM d GROUP BY 1)
        |SELECT event_id, d.event_type,
        |  floor(dev * 1000000 + 0.5) / 1000000 >
        |    floor(mad * 3.0 * 1000000 + 0.5) / 1000000 AS value_outlier
        |FROM d JOIN md USING (event_type)""".stripMargin,
    "q_rj_point" ->
      s"""WITH p AS (
        |  SELECT user_id AS p_user, event_id AS p_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS p_ts
        |  FROM events WHERE event_type = 'purchase'),
        |iv AS ($intervalSql0click)
        |SELECT p_id, l_id
        |FROM p JOIN iv ON p_user = l_user AND l_start <= p_ts AND p_ts < l_end""".stripMargin)

  /** DuckDB twin of [[sessionIntervals]] — same floor-before-cast rule. */
  private def intervalSql(eventType: String, p: String): String =
    s"""SELECT user_id AS ${p}_user, event_id AS ${p}_id,
       |    CAST(floor(epoch(ts)) AS BIGINT) AS ${p}_start,
       |    CAST(floor(epoch(ts)) AS BIGINT) + 60 + CAST(floor(value * 60) AS BIGINT) AS ${p}_end
       |  FROM events WHERE event_type = '$eventType'""".stripMargin

  private def intervalSql0click = intervalSql("click", "l")
}
