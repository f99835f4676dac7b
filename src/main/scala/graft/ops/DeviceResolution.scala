package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Functions

/** The GRIDSMART site→device resolution cascade (reference
  * `gs_ready.py:106-215`): match each camera site to its Knack device record
  * through four stages, first match wins:
  *
  *   1. J9  — curated lookup table on the street-name pair
  *             (`KNACK_LOOKUPS`, reference `config/config_app.py:62-64`)
  *   2. J10 — fuzzy street-name similarity (Ratcliff–Obershelp ≥ 0.7, both
  *             street orderings, with a synonym-substitution retry;
  *             reference `gs_ready.py:150-215,341-353`)
  *   3. J11 — device IP equality (reference `gs_ready.py:177-185`)
  *   4. J12 — nearest device by haversine < 300 ft (reference
  *             `gs_ready.py:186-206`, `util/gps_h.py:9-24`)
  *
  * Both inputs are dimensions (≤ thousands of rows), so every stage is a
  * broadcast join / tiny cross join; the cascade stays fully declarative —
  * one DataFrame expression, no driver loops — and each site carries a
  * `resolution_stage` tag for observability.
  *
  * Shape: "first match wins" is expressed as a PRIORITY-RANKED UNION, not
  * anti-join chaining — every stage scores ALL sites once, stages union
  * with a priority column, and one window keeps each site's
  * lowest-priority candidate. Chaining each stage on the previous stages'
  * leftovers gives the same answer but embeds stage k's whole subplan into
  * every stage > k (the plan doubles per stage: 5 stages ≈ 2⁵ duplicated
  * window+join subtrees to analyze, codegen, and schedule); the ranked
  * union keeps the plan linear in stages. A stage-k winner site may also
  * produce stage->k candidates — computed then outranked — which costs a
  * few extra dimension-sized comparisons, the right trade at any scale.
  *
  * Determinism (SURVEY §7.5 risk 4): difflib breaks ratio ties by candidate
  * order; this engine defines the total order (ratio desc, device id asc).
  */
object DeviceResolution {

  val MinMatchRatio = 0.7 // reference gs_ready.py:22
  val MaxDistFt = 300.0 // reference gs_ready.py:25

  /** @param sites    site dimension: (site_id, street1, street2, net_addr, lat, lon)
    * @param devices  device dimension: (device_id, primary_st, cross_st,
    *                 device_ip, lat, lon, atd_location_id)
    * @param lookups  curated (street1, street2) → device_id map (J9)
    * @param synonyms street-name substring substitutions applied on fuzzy
    *                 retry (reference STREET_SYNONYMS config_app.py:66-70)
    */
  def resolve(
      sites: DataFrame,
      devices: DataFrame,
      lookups: Map[(String, String), String] = Map.empty,
      synonyms: Map[String, String] = Map.empty,
      minRatio: Double = MinMatchRatio,
      maxDistFt: Double = MaxDistFt): DataFrame = {

    val s = sites.select(
      col("site_id"),
      lower(trim(col("street1"))).as("st1"),
      lower(trim(col("street2"))).as("st2"),
      col("net_addr"),
      col("lat").as("site_lat"),
      col("lon").as("site_lon"))
    val d = broadcast(devices.select(
      col("device_id"),
      lower(trim(col("primary_st"))).as("d_st1"),
      lower(trim(col("cross_st"))).as("d_st2"),
      col("device_ip"),
      col("lat").as("dev_lat"),
      col("lon").as("dev_lon")))

    // each stage yields ≤1 candidate per site: (site_id, device_id, stage, _prio)
    def cand(df: DataFrame, stage: String, prio: Int): DataFrame =
      df.select(
        col("site_id"), col("device_id"),
        lit(stage).as("resolution_stage"), lit(prio).as("_prio"))

    // J9 — curated lookup, expressed as a literal map on "st1|st2"
    val stage1 =
      if (lookups.isEmpty) s.limit(0).withColumn("device_id", lit(null).cast("string"))
      else {
        val m = typedLit(lookups.map { case ((a, b), id) =>
          s"${a.toLowerCase.trim}|${b.toLowerCase.trim}" -> id
        })
        s.withColumn("device_id", element_at(m, concat_ws("|", col("st1"), col("st2"))))
          .filter(col("device_id").isNotNull)
      }
    val r1 = cand(stage1, "lookup", 1)

    // J10 — fuzzy: best Ratcliff–Obershelp over both street orderings, in
    // the reference's TWO passes (`gs_ready.py:150-215,341-353`): raw names
    // outrank synonym-substituted names — here as two priorities rather
    // than a leftovers anti-join, because a one-pass greatest() over both
    // scorings would diverge when a synonym-normalized score on device B
    // beats a ≥threshold raw score on device A (the reference picks A).
    def subSynonyms(c: org.apache.spark.sql.Column) =
      synonyms.foldLeft(c) { case (acc, (from, to)) =>
        regexp_replace(acc, java.util.regex.Pattern.quote(from.toLowerCase), to.toLowerCase)
      }
    def bestFuzzy(norm: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
      val score = greatest(
        Functions.seqRatio(norm(concat_ws("/", col("st1"), col("st2"))),
          norm(concat_ws("/", col("d_st1"), col("d_st2")))),
        Functions.seqRatio(norm(concat_ws("/", col("st1"), col("st2"))),
          norm(concat_ws("/", col("d_st2"), col("d_st1")))))
      val w = Window.partitionBy(col("site_id")).orderBy(col("ratio").desc, col("device_id"))
      s.crossJoin(d)
        .withColumn("ratio", score)
        .filter(col("ratio") >= minRatio)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
    }
    val r2raw = cand(bestFuzzy(identity), "fuzzy", 2)
    val r2syn =
      if (synonyms.isEmpty) r2raw.limit(0)
      else cand(bestFuzzy(subSynonyms), "fuzzy", 3)

    // J11 — IP equality; argmin on device_id so duplicate/placeholder IPs
    // in the dimension can't fan a site out to multiple rows
    val ipW = Window.partitionBy(col("site_id")).orderBy(col("device_id"))
    val r3 = cand(
      s.join(d, col("net_addr") === col("device_ip"))
        .withColumn("rn", row_number().over(ipW))
        .filter(col("rn") === 1),
      "ip", 4)

    // J12 — nearest by haversine under the distance cap
    val dist = Functions.haversineFeet(
      col("site_lat"), col("site_lon"), col("dev_lat"), col("dev_lon"))
    val geoW = Window.partitionBy(col("site_id")).orderBy(col("dist_ft"), col("device_id"))
    val r4 = cand(
      s.filter(col("site_lat").isNotNull && col("site_lon").isNotNull)
        .crossJoin(d)
        .withColumn("dist_ft", dist)
        .filter(col("dist_ft") < maxDistFt)
        .withColumn("rn", row_number().over(geoW))
        .filter(col("rn") === 1),
      "geo", 5)

    // first match wins: the lowest-priority candidate per site
    val pickW = Window.partitionBy(col("site_id")).orderBy(col("_prio"))
    val resolved = r1.unionByName(r2raw).unionByName(r2syn)
      .unionByName(r3).unionByName(r4)
      .withColumn("_pick", row_number().over(pickW))
      .filter(col("_pick") === 1)
      .select("site_id", "device_id", "resolution_stage")

    // unmatched sites surface with a null device (reference logs and skips,
    // gs_ready.py:207-210 — surfacing beats dropping for observability); a
    // left join + coalesce references `resolved` ONCE, where an anti-join +
    // union would embed the candidate subtree a second time
    s.select(col("site_id"))
      .join(resolved, Seq("site_id"), "left")
      .select(
        col("site_id"), col("device_id"),
        coalesce(col("resolution_stage"), lit("unmatched")).as("resolution_stage"))
  }

  /** Corpus-scale twin of the J10 fuzzy stage: the same argmax semantics
    * (best Ratcliff–Obershelp over BOTH device street orderings, ties on
    * `(ratio desc, device_id)` — the [[resolve]] total order), but
    * candidates come from [[Dedup.seqRatioJoin]]'s length banding instead
    * of the dim×dim cross. The reference's dimensions are ~100×100 and
    * the cross is fine there; this is the path when either side grows to
    * corpus size — a keyed band join whose candidate volume tracks the
    * length histogram, never |sites|×|devices|. Returns
    * `(site_id, device_id, ratio)`, one row per site with a match
    * ≥ `minRatio`.
    */
  def fuzzyArgmaxBanded(
      sites: DataFrame,
      devices: DataFrame,
      minRatio: Double = MinMatchRatio): DataFrame = {
    val s = sites.select(col("site_id"),
      concat_ws("/", lower(trim(col("street1"))), lower(trim(col("street2"))))
        .as("sname"))
    val d = devices.select(col("device_id"),
      explode(array(
        concat_ws("/", lower(trim(col("primary_st"))), lower(trim(col("cross_st")))),
        concat_ws("/", lower(trim(col("cross_st"))), lower(trim(col("primary_st"))))))
        .as("dname"))
    val pairs = Dedup.seqRatioJoin(
      s, "site_id", "sname", d, "device_id", "dname", minRatio)
    // both orderings of one device may qualify — fold to the device grain
    // BEFORE the argmax so ties break exactly like the cross stage
    val byDevice = pairs.groupBy(col("site_id"), col("device_id"))
      .agg(max(col("ratio")).as("ratio"))
    val w = Window.partitionBy(col("site_id"))
      .orderBy(col("ratio").desc, col("device_id"))
    byDevice.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select("site_id", "device_id", "ratio")
  }
}
