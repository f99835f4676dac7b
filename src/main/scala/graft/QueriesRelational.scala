package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage (SURVEY §2.3 filters, §2.4 joins, §2.6 sets,
  * §2.7 sorts, §2.10 scalars) expressed over the driver's synthetic tables,
  * each with a DuckDB oracle. Numeric outputs go through exact DECIMAL
  * arithmetic before a final DOUBLE cast so both engines produce bit-equal
  * values regardless of floating-point summation order.
  */
object QueriesRelational {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  private def moneySum(c: Column): Column = Functions.sumExact2(c)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1: ext-type whitelist filter (reference bt_json_standard.py:54-56)
    "q_f1_isin" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_returnflag").isin("A", "R") && col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")),

    // F3: date-range predicate (reference catalog_postgrest.py:56-68)
    "q_f3_daterange" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("order_day"))),

    // F5: LIKE pattern on base/ext (reference catalog_postgrest.py:43-53)
    "q_f5_like" -> ((s, dir) =>
      t(s, dir, "part")
        .filter(col("p_type").like("PRO%") || col("p_name").like("%spark%"))
        .select("p_partkey", "p_type", "p_name")),

    // F6: status + regex filter + keyed dedup (reference gs_support.py:62-98)
    "q_f6_filter_dedup" -> ((s, dir) =>
      t(s, dir, "events")
        .filter(col("event_type") =!= "error" && col("props").rlike("\"k\": [0-9]+"))
        .groupBy(col("user_id"))
        .agg(min(col("event_id")).as("first_event"))),

    // F10: projection / rename / reorder (reference unitdata_knack_common.py:87-99)
    "q_f10_project" -> ((s, dir) =>
      t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(
          col("c_custkey").as("id"),
          upper(col("c_name")).as("name_u"),
          col("c_nationkey").as("nation"))),

    // J2: fact ⋈ broadcast dim + aggregation (reference bt_ready.py:104-107)
    "q_j2_fact_dim" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val part = t(s, dir, "part")
      // revenue factors cast to DECIMAL *before* multiplying — the product
      // is then exact and the sum order-independent (a double multiply first
      // would wobble in the last bit vs. the oracle's decimal arithmetic)
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          Functions.roundHalfUp(
            sum(col("l_extendedprice").cast("decimal(18,4)") *
              (lit(1.0).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
              .cast("double"), 2).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // J3: same dim joined twice for two roles (reference bt_ready.py:112-118)
    "q_j3_double_dim" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      val supp = t(s, dir, "supplier")
      val nation = t(s, dir, "nation")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation.select(
          col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))),
          col("c_nationkey") === col("cn_key"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation.select(
          col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("sn_key"))
        .groupBy(col("cust_nation"), col("supp_nation"))
        .agg(count(lit(1)).as("n_items"), moneySum(col("l_extendedprice")).as("volume"))
    }),

    // J5: left outer join keeping unmatched dimension rows (reference
    // unitdata_knack_common.py:87-90)
    "q_j5_left" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(moneySum(col("o_totalprice")), lit(0.0)).as("total"))
    }),

    // J10: fuzzy similarity join, argmax per left row (reference
    // gs_ready.py:150-215; similarity here is the oracle-portable
    // Levenshtein ratio — the difflib-compatible SequenceRatio expression is
    // exercised in the ScalaTest suite)
    "q_j10_fuzzy" -> ((s, dir) => {
      val nation = t(s, dir, "nation")
      val region = t(s, dir, "region")
      val ratio = Functions.levRatio(lower(col("n_name")), lower(col("r_name")))
      val w = Window
        .partitionBy(col("n_nationkey"))
        .orderBy(col("ratio").desc, col("r_regionkey"))
      nation
        .crossJoin(broadcast(region))
        .select(
          col("n_nationkey"), col("n_name"), col("r_regionkey"), col("r_name"),
          Functions.roundHalfUp(ratio, 4).as("ratio"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("n_nationkey", "n_name", "r_name", "ratio")
    }),

    // J12: nearest-neighbor geo join, argmin haversine (reference
    // gs_ready.py:186-206); coordinates synthesized deterministically from
    // keys since the test tables carry none
    "q_j12_geo_nn" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select(
        col("c_custkey"),
        (col("c_custkey") * 7 % 120 - 60 + 0.25).as("c_lat"),
        (col("c_custkey") * 13 % 340 - 170 + 0.25).as("c_lon"))
      val supp = t(s, dir, "supplier").select(
        col("s_suppkey"),
        (col("s_suppkey") * 11 % 120 - 60 + 0.75).as("s_lat"),
        (col("s_suppkey") * 17 % 340 - 170 + 0.75).as("s_lon"))
      val dist = Functions.haversineFeet(
        col("c_lat"), col("c_lon"), col("s_lat"), col("s_lon"))
      val w = Window
        .partitionBy(col("c_custkey"))
        .orderBy(col("dist_ft"), col("s_suppkey"))
      cust.crossJoin(broadcast(supp))
        .withColumn("dist_ft", Functions.roundHalfUp(dist, 0))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("c_custkey", "s_suppkey", "dist_ft")
    }),

    // J9/J14: literal-map lookup join (reference gs_ready.py:138-148,
    // KNACK_LOOKUPS config_app.py:62-64)
    "q_j14_map_lookup" -> ((s, dir) => {
      val lookup = typedLit(Map(0 -> "africa", 1 -> "america", 2 -> "asia",
        3 -> "europe", 4 -> "middle east"))
      t(s, dir, "nation").select(
        col("n_nationkey"),
        coalesce(element_at(lookup, col("n_regionkey")), lit("unknown"))
          .as("region_label"))
    }),

    // A7: distinct-set reduction (reference bt_ready.py:110,124-126)
    "q_a7_distinct" -> ((s, dir) =>
      t(s, dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()),

    // U1: union + distinct (reference bt_ready.py:124-125)
    "q_u1_union_distinct" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val sp = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      c.union(sp).distinct()
    }),

    // U2: left-semi (reference devices[devices.id.isin(used)] bt_ready.py:110)
    "q_u2_semi" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")),

    // J1-adjacent: left-anti as plain NOT EXISTS (dimension trimming dual);
    // restricted to 1995 orders so the anti set is non-empty
    "q_u5_anti" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(
          t(s, dir, "orders").filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")),

    // U3: dedup on key with deterministic representative (reference
    // date_dirs.py:68-72, gs_support.py:69-79)
    "q_u3_dedup_key" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(col("event_id")).as("event_id"))),

    // O5: top-1 latest (reference catalog.py:245-263 `SELECT TOP 1 ... DESC`)
    "q_o5_top1" -> ((s, dir) =>
      t(s, dir, "events")
        .select(
          col("event_id"), col("user_id"),
          Functions.toSecond(col("ts")).as("ts_sec"))
        .orderBy(col("ts_sec").desc, col("event_id").desc)
        .limit(1)),

    // O2/O7: global sort + limit (top-k with deterministic tiebreak)
    "q_o7_topk" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)),

    // §2.10 string scalars: trim/lower/split/regexp_replace/substring/concat
    "q_sc_strings" -> ((s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        lower(trim(col("p_name"))).as("name_lc"),
        split(col("p_type"), " ").getItem(0).as("type_head"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"),
        substring(col("p_brand"), 6, 3).as("brand_tail"),
        concat_ws("#", col("p_brand"), col("p_type")).as("brand_type"))),

    // §2.10 date scalars: parts, Sunday=0 weekday, format (reference
    // wt_extract_soc.py:73-79, gs_agg_extract_soc.py:119-124)
    "q_sc_dates" -> ((s, dir) =>
      // date-part outputs cast to BIGINT: other engines (incl. the DuckDB
      // oracle) type year()/dayofweek() as 64-bit
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        Functions.dayOfWeekSun0(col("o_orderdate")).cast("long").as("dow_sun0"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("day_str"))),

    // §2.9 idempotent publish key (reference bt_extract_soc.py:110,130-135)
    "q_sc_recordid" -> ((s, dir) =>
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        Functions.recordId(col("l_orderkey"), col("l_linenumber")).as("record_id"))),

    // §2.10 haversine composition (reference util/gps_h.py:9-24)
    "q_sc_haversine" -> ((s, dir) => {
      val lat = col("n_nationkey") * 3 % 120 - 60 + 0.5
      val lon = col("n_nationkey") * 7 % 340 - 170 + 0.5
      t(s, dir, "nation").select(
        col("n_nationkey"),
        Functions.roundHalfUp(
          Functions.haversineFeet(lat, lon, lit(30.2672), lit(-97.7431)), 0)
          .as("dist_ft"))
    }),

    // the 100 TB path of q_j12: tile-bucketed nearest-geo — both sides
    // bucket into zoom-3 slippy tiles, each point probes its 3x3 block,
    // and the argmin runs behind a KEYED tile join instead of the cross;
    // block-empty points surface with NULLs (the documented escalation
    // contract). Same synthetic coordinate grids as q_j12_geo_nn
    "q_j12_tile_nn" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select(
        col("c_custkey"),
        (col("c_custkey") * 7 % 120 - 60 + 0.25).as("c_lat"),
        (col("c_custkey") * 13 % 340 - 170 + 0.25).as("c_lon"))
      val supp = t(s, dir, "supplier").select(
        col("s_suppkey"),
        (col("s_suppkey") * 11 % 120 - 60 + 0.75).as("s_lat"),
        (col("s_suppkey") * 17 % 340 - 170 + 0.75).as("s_lon"))
      graft.ops.GeoJoin.nearestByTile(
        cust, "c_custkey", "c_lat", "c_lon",
        supp, "s_suppkey", "s_lat", "s_lon", zoom = 3)
    }),

    // §2.10 SharedStreets-style geo referencing (reference
    // docs/sharedstreets.md): slippy-tile coordinates at the doc's
    // recommended zoom 12 + the md5 intersection key, composed with the
    // same synthetic lat/lon grid as q_sc_haversine — per-row codegen'd
    // built-ins only (floor/log/tan/cos/md5/format_string)
    "q_sc_geotile" -> ((s, dir) => {
      val lat = col("n_nationkey") * 3 % 120 - 60 + 0.5
      val lon = col("n_nationkey") * 7 % 340 - 170 + 0.5
      t(s, dir, "nation").select(
        col("n_nationkey"),
        Functions.tileX(lon, 12).as("tile_x"),
        Functions.tileY(lat, 12).as("tile_y"),
        Functions.intersectionId(lon, lat).as("intersection_id"))
    }),

    // §2.10 GUID dash normalization (reference gs_ready.py:232-233)
    "q_sc_guid" -> ((s, dir) =>
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        Functions.guidWithDashes(
          md5(concat(col("l_orderkey").cast("string"), lit("_"),
            col("l_linenumber").cast("string")))).as("guid"))),

    // §2.10 JSON-ish metadata extraction (catalog `metadata` JSONB analog)
    "q_sc_json" -> ((s, dir) =>
      t(s, dir, "events")
        .select(
          col("event_id"),
          regexp_extract(col("props"), "[0-9]+", 0).cast("int").as("k"))
        .filter(col("k") >= 50)),

    // data-quality constraint suite: six row-local checks in ONE scan +
    // one referential check (anti-join); the FK ref is orders thinned to
    // o_orderkey % 3 <> 0 so the violation path actually fires
    "q_dv_checks" -> ((s, dir) => {
      import graft.ops.Validate._
      graft.ops.Validate.report(
        t(s, dir, "lineitem"),
        Seq(
          NotNull("l_returnflag"),
          InRange("l_quantity", 1.0, 25.0),
          AcceptedValues("l_returnflag", Seq("A", "N")),
          Matches("l_linestatus", "^[OF]$"),
          Unique(Seq("l_orderkey", "l_linenumber")),
          Unique(Seq("l_orderkey")),
          ForeignKey(Seq("l_orderkey"), "orders_mod3",
            t(s, dir, "orders").filter(col("o_orderkey") % 3 =!= 0),
            Seq("o_orderkey"))))
    }))

  val oracles: Map[String, String] = Map(
    "q_dv_checks" ->
      """WITH tot AS (SELECT count(*) AS total FROM lineitem),
        |arms AS (
        |  SELECT 'not_null(l_returnflag)' AS check_id, 'not_null' AS check_type,
        |    'l_returnflag' AS target,
        |    (SELECT count(*) FROM lineitem WHERE l_returnflag IS NULL) AS violations
        |  UNION ALL
        |  SELECT 'in_range(l_quantity)', 'in_range', 'l_quantity',
        |    (SELECT count(*) FROM lineitem
        |     WHERE l_quantity IS NOT NULL AND (l_quantity < 1.0 OR l_quantity > 25.0))
        |  UNION ALL
        |  SELECT 'accepted(l_returnflag)', 'accepted', 'l_returnflag',
        |    (SELECT count(*) FROM lineitem
        |     WHERE l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A', 'N'))
        |  UNION ALL
        |  SELECT 'matches(l_linestatus)', 'matches', 'l_linestatus',
        |    (SELECT count(*) FROM lineitem
        |     WHERE l_linestatus IS NOT NULL AND NOT regexp_matches(l_linestatus, '^[OF]$'))
        |  UNION ALL
        |  SELECT 'unique(l_orderkey,l_linenumber)', 'unique', 'l_orderkey,l_linenumber',
        |    (SELECT count(*) - count(DISTINCT
        |       coalesce(CAST(l_orderkey AS VARCHAR), chr(2)) || chr(1) ||
        |       coalesce(CAST(l_linenumber AS VARCHAR), chr(2))) FROM lineitem)
        |  UNION ALL
        |  SELECT 'unique(l_orderkey)', 'unique', 'l_orderkey',
        |    (SELECT count(*) - count(DISTINCT
        |       coalesce(CAST(l_orderkey AS VARCHAR), chr(2))) FROM lineitem)
        |  UNION ALL
        |  SELECT 'fk(l_orderkey->orders_mod3)', 'foreign_key', 'l_orderkey',
        |    (SELECT count(*) FROM lineitem l
        |     WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS
        |       (SELECT 1 FROM orders o
        |        WHERE o.o_orderkey % 3 <> 0 AND o.o_orderkey = l.l_orderkey)))
        |SELECT check_id, check_type, target, violations, total,
        |  violations = 0 AS passed
        |FROM arms, tot""".stripMargin,
    "q_a7_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q_f1_isin" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity FROM lineitem
        |WHERE l_returnflag IN ('A','R') AND l_quantity > 45""".stripMargin,
    "q_f3_daterange" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_day FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'""".stripMargin,
    "q_f5_like" ->
      """SELECT p_partkey, p_type, p_name FROM part
        |WHERE p_type LIKE 'PRO%' OR p_name LIKE '%spark%'""".stripMargin,
    "q_f6_filter_dedup" ->
      """SELECT user_id, min(event_id) AS first_event FROM events
        |WHERE event_type <> 'error' AND regexp_matches(props, '"k": [0-9]+')
        |GROUP BY user_id""".stripMargin,
    "q_f10_project" ->
      """SELECT c_custkey AS id, upper(c_name) AS name_u, c_nationkey AS nation
        |FROM customer WHERE c_mktsegment = 'BUILDING'""".stripMargin,
    "q_j2_fact_dim" ->
      """SELECT p_brand,
        |  floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1.0 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand""".stripMargin,
    "q_j3_double_dim" ->
      """SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
        |  count(*) AS n_items,
        |  floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) * 100 + 0.5) / 100 AS volume
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |GROUP BY 1, 2""".stripMargin,
    "q_j5_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  coalesce(floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) * 100 + 0.5) / 100, 0.0) AS total
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey""".stripMargin,
    "q_j10_fuzzy" ->
      """WITH scored AS (
        |  SELECT n_nationkey, n_name, r_regionkey, r_name,
        |    CASE WHEN greatest(length(n_name), length(r_name)) = 0 THEN 1.0
        |         ELSE 1.0 - CAST(levenshtein(lower(n_name), lower(r_name)) AS DOUBLE)
        |                    / CAST(greatest(length(n_name), length(r_name)) AS DOUBLE) END AS ratio
        |  FROM nation, region)
        |SELECT n_nationkey, n_name, r_name, floor(ratio * 10000 + 0.5) / 10000 AS ratio
        |FROM (SELECT *, row_number() OVER (PARTITION BY n_nationkey ORDER BY ratio DESC, r_regionkey) AS rn
        |      FROM scored) WHERE rn = 1""".stripMargin,
    "q_j12_geo_nn" ->
      """WITH c AS (SELECT c_custkey,
        |    c_custkey * 7 % 120 - 60 + 0.25 AS c_lat,
        |    c_custkey * 13 % 340 - 170 + 0.25 AS c_lon FROM customer),
        |sp AS (SELECT s_suppkey,
        |    s_suppkey * 11 % 120 - 60 + 0.75 AS s_lat,
        |    s_suppkey * 17 % 340 - 170 + 0.75 AS s_lon FROM supplier),
        |d AS (SELECT c_custkey, s_suppkey,
        |    floor(2 * atan2(sqrt(pow(sin(radians(s_lat - c_lat)/2), 2)
        |        + cos(radians(c_lat)) * cos(radians(s_lat)) * pow(sin(radians(s_lon - c_lon)/2), 2)),
        |      sqrt(1.0 - (pow(sin(radians(s_lat - c_lat)/2), 2)
        |        + cos(radians(c_lat)) * cos(radians(s_lat)) * pow(sin(radians(s_lon - c_lon)/2), 2))))
        |      * 20914080.0 + 0.5) AS dist_ft
        |  FROM c, sp)
        |SELECT c_custkey, s_suppkey, dist_ft
        |FROM (SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY dist_ft, s_suppkey) AS rn
        |      FROM d) WHERE rn = 1""".stripMargin,
    "q_j12_tile_nn" ->
      """WITH c AS (SELECT c_custkey,
        |    c_custkey * 7 % 120 - 60 + 0.25 AS c_lat,
        |    c_custkey * 13 % 340 - 170 + 0.25 AS c_lon FROM customer),
        |sp AS (SELECT s_suppkey,
        |    s_suppkey * 11 % 120 - 60 + 0.75 AS s_lat,
        |    s_suppkey * 17 % 340 - 170 + 0.75 AS s_lon FROM supplier),
        |pt AS (SELECT c_custkey, c_lat, c_lon,
        |    CAST(floor((c_lon + 180.0) / 360.0 * 8.0) AS BIGINT) AS tx,
        |    LEAST(GREATEST(CAST(floor((1.0 - ln(tan(radians(c_lat)) + 1.0/cos(radians(c_lat))) / pi()) / 2.0 * 8.0)
        |      AS BIGINT), 0), 7) AS ty
        |  FROM c),
        |ct AS (SELECT s_suppkey, s_lat, s_lon,
        |    ((CAST(floor((s_lon + 180.0) / 360.0 * 8.0) AS BIGINT)) % 8 + 8) % 8 AS tx,
        |    LEAST(GREATEST(CAST(floor((1.0 - ln(tan(radians(s_lat)) + 1.0/cos(radians(s_lat))) / pi()) / 2.0 * 8.0)
        |      AS BIGINT), 0), 7) AS ty
        |  FROM sp),
        |probes AS (SELECT c_custkey, c_lat, c_lon,
        |    ((tx + dx.d) % 8 + 8) % 8 AS jx,
        |    LEAST(GREATEST(ty + dy.d, 0), 7) AS jy
        |  FROM pt, (VALUES (-1),(0),(1)) dx(d), (VALUES (-1),(0),(1)) dy(d)),
        |scored AS (SELECT c_custkey, s_suppkey,
        |    floor(2 * atan2(sqrt(pow(sin(radians(s_lat - c_lat)/2), 2)
        |        + cos(radians(c_lat)) * cos(radians(s_lat)) * pow(sin(radians(s_lon - c_lon)/2), 2)),
        |      sqrt(1.0 - (pow(sin(radians(s_lat - c_lat)/2), 2)
        |        + cos(radians(c_lat)) * cos(radians(s_lat)) * pow(sin(radians(s_lon - c_lon)/2), 2))))
        |      * 20914080.0 + 0.5) AS dist_ft
        |  FROM probes JOIN ct ON probes.jx = ct.tx AND probes.jy = ct.ty),
        |best AS (SELECT c_custkey, s_suppkey, dist_ft FROM scored
        |  QUALIFY row_number() OVER (PARTITION BY c_custkey ORDER BY dist_ft, s_suppkey) = 1)
        |SELECT c.c_custkey, best.s_suppkey, best.dist_ft
        |FROM c LEFT JOIN best USING (c_custkey)""".stripMargin,
    "q_j14_map_lookup" ->
      """SELECT n_nationkey,
        |  CASE n_regionkey WHEN 0 THEN 'africa' WHEN 1 THEN 'america'
        |    WHEN 2 THEN 'asia' WHEN 3 THEN 'europe' WHEN 4 THEN 'middle east'
        |    ELSE 'unknown' END AS region_label
        |FROM nation""".stripMargin,
    "q_a7_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q_u1_union_distinct" ->
      """SELECT DISTINCT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL SELECT s_nationkey FROM supplier)""".stripMargin,
    "q_u2_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q_u5_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate < TIMESTAMP '1996-01-01')""".stripMargin,
    "q_u3_dedup_key" ->
      """SELECT user_id, event_type, min(event_id) AS event_id
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_o5_top1" ->
      """SELECT event_id, user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_sec
        |FROM events ORDER BY ts_sec DESC, event_id DESC LIMIT 1""".stripMargin,
    "q_o7_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_sc_strings" ->
      """SELECT p_partkey, lower(trim(p_name)) AS name_lc,
        |  string_split(p_type, ' ')[1] AS type_head,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
        |  substr(p_brand, 6, 3) AS brand_tail,
        |  p_brand || '#' || p_type AS brand_type
        |FROM part""".stripMargin,
    "q_sc_dates" ->
      """SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
        |  dayofmonth(o_orderdate) AS d, dayofweek(o_orderdate) AS dow_sun0,
        |  strftime(o_orderdate, '%Y-%m-%d') AS day_str
        |FROM orders""".stripMargin,
    "q_sc_recordid" ->
      """SELECT l_orderkey, l_linenumber,
        |  md5(CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)) AS record_id
        |FROM lineitem""".stripMargin,
    "q_sc_haversine" ->
      """WITH p AS (SELECT n_nationkey,
        |    n_nationkey * 3 % 120 - 60 + 0.5 AS lat,
        |    n_nationkey * 7 % 340 - 170 + 0.5 AS lon FROM nation)
        |SELECT n_nationkey,
        |  floor(2 * atan2(sqrt(pow(sin(radians(30.2672 - lat)/2), 2)
        |      + cos(radians(lat)) * cos(radians(30.2672)) * pow(sin(radians(-97.7431 - lon)/2), 2)),
        |    sqrt(1.0 - (pow(sin(radians(30.2672 - lat)/2), 2)
        |      + cos(radians(lat)) * cos(radians(30.2672)) * pow(sin(radians(-97.7431 - lon)/2), 2))))
        |    * 20914080.0 + 0.5) AS dist_ft
        |FROM p""".stripMargin,
    "q_sc_geotile" ->
      """WITH p AS (SELECT n_nationkey,
        |    n_nationkey * 3 % 120 - 60 + 0.5 AS lat,
        |    n_nationkey * 7 % 340 - 170 + 0.5 AS lon FROM nation)
        |SELECT n_nationkey,
        |  CAST(floor((lon + 180.0) / 360.0 * 4096.0) AS BIGINT) AS tile_x,
        |  CAST(floor((1.0 - ln(tan(radians(lat)) + 1.0/cos(radians(lat))) / pi()) / 2.0 * 4096.0)
        |    AS BIGINT) AS tile_y,
        |  md5(printf('Intersection %.5f %.5f', lon, lat)) AS intersection_id
        |FROM p""".stripMargin,
    "q_sc_guid" ->
      """WITH g AS (SELECT l_orderkey, l_linenumber,
        |    md5(CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR)) AS h
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        |  substr(h,1,8) || '-' || substr(h,9,4) || '-' || substr(h,13,4) || '-'
        |    || substr(h,17,4) || '-' || substr(h,21,12) AS guid
        |FROM g""".stripMargin,
    "q_sc_json" ->
      """SELECT event_id, TRY_CAST(regexp_extract(props, '[0-9]+') AS INT) AS k
        |FROM events WHERE TRY_CAST(regexp_extract(props, '[0-9]+') AS INT) >= 50""".stripMargin)
}
