package graft

import graft.ops.DeviceResolution

/** The J9→J12 cascade (reference gs_ready.py:106-215) on a fixture
  * engineered so each site resolves at a different stage (FIXTURES.md A7).
  */
class DeviceResolutionSpec extends SparkSpec {

  import spark.implicits._

  test("each stage wins exactly where designed; unmatched surfaces with null") {
    val sites = Seq(
      // resolves via curated lookup
      ("s_lookup", "Lamar Blvd", "Justin Ln", "10.0.0.1", 30.30, -97.70),
      // clean fuzzy match (identical street names)
      ("s_fuzzy", "Burnet Rd", "Braker Ln", "10.0.0.2", 30.31, -97.71),
      // fuzzy only after synonym substitution (IH 35 → I35)
      ("s_syn", "IH 35", "Oltorf St", "10.0.0.3", 30.32, -97.72),
      // IP-only match (streets unrelated, but net addr equals a device ip)
      ("s_ip", "Nameless Way", "Nowhere Ln", "10.0.0.4", 30.33, -97.73),
      // GPS-only match (< 300 ft of d_geo)
      ("s_geo", "Foo", "Bar", "10.9.9.9", 30.400000, -97.740000),
      // nothing matches
      ("s_none", "Qqq", "Zzz", "10.8.8.8", 45.0, -120.0))
      .toDF("site_id", "street1", "street2", "net_addr", "lat", "lon")

    val devices = Seq(
      ("d_lookup", "Unrelated St", "Other St", "10.1.1.1", 30.30, -97.60),
      ("d_fuzzy", "Burnet Rd", "Braker Ln", "10.1.1.2", 30.31, -97.61),
      ("d_syn", "I35", "Oltorf St", "10.1.1.3", 30.32, -97.62),
      ("d_ip", "Elsewhere Dr", "Faraway Ct", "10.0.0.4", 30.33, -97.63),
      // ~0.0002° lat ≈ 73 ft from s_geo
      ("d_geo", "Also Unrelated", "Streets", "10.1.1.5", 30.400200, -97.740000))
      .toDF("device_id", "primary_st", "cross_st", "device_ip", "lat", "lon")

    val got = DeviceResolution
      .resolve(
        sites, devices,
        lookups = Map(("Lamar Blvd", "Justin Ln") -> "d_lookup"),
        synonyms = Map("ih 35" -> "i35"))
      .as[(String, String, String)].collect()
      .map { case (s, d, st) => s -> ((d, st)) }.toMap

    assert(got("s_lookup") == (("d_lookup", "lookup")))
    assert(got("s_fuzzy") == (("d_fuzzy", "fuzzy")))
    assert(got("s_syn") == (("d_syn", "fuzzy")))
    assert(got("s_ip") == (("d_ip", "ip")))
    assert(got("s_geo") == (("d_geo", "geo")))
    assert(got("s_none") == ((null, "unmatched")))
  }

  test("fuzzyArgmaxBanded == the cross-based fuzzy argmax (randomized, both orderings)") {
    import org.apache.spark.sql.functions._
    // random short street pairs over a tiny alphabet so near-matches are
    // dense; devices reuse site streets (sometimes swapped, sometimes
    // perturbed) so both orderings and ties are exercised
    val rnd = new scala.util.Random(29)
    def street() = Seq.fill(3 + rnd.nextInt(6))("abcd"(rnd.nextInt(4))).mkString
    val sites = (1 to 60).map(i => (s"s$i", street(), street()))
      .toDF("site_id", "street1", "street2")
    val devices = (1 to 60).map { i =>
      val (a, b) = (street(), street())
      if (i % 3 == 0) (f"d$i%03d", b, a) else (f"d$i%03d", a, b)
    }.toDF("device_id", "primary_st", "cross_st")

    val banded = DeviceResolution.fuzzyArgmaxBanded(sites, devices, minRatio = 0.7)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet

    // the cross replay: greatest over both orderings, argmax per site with
    // the (ratio desc, device_id) total order — resolve()'s stage 2
    val s = sites.select(col("site_id"),
      concat_ws("/", lower(trim(col("street1"))), lower(trim(col("street2")))).as("sn"))
    val d = devices.select(col("device_id"),
      concat_ws("/", lower(trim(col("primary_st"))), lower(trim(col("cross_st")))).as("dn1"),
      concat_ws("/", lower(trim(col("cross_st"))), lower(trim(col("primary_st")))).as("dn2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("site_id")).orderBy(col("ratio").desc, col("device_id"))
    val cross = s.crossJoin(d)
      .withColumn("ratio", greatest(
        Functions.seqRatio(col("sn"), col("dn1")),
        Functions.seqRatio(col("sn"), col("dn2"))))
      .filter(col("ratio") >= 0.7)
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select("site_id", "device_id", "ratio")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet

    assert(banded == cross, "banded argmax must equal the cross argmax exactly")
    assert(banded.nonEmpty, "fixture must actually produce matches")
    // and the banded plan is keyed, never a cartesian
    val plan = DeviceResolution.fuzzyArgmaxBanded(sites, devices, 0.7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"banded fuzzy argmax must stay keyed:\n$plan")
  }
}
