package graft

import org.apache.spark.sql.functions._

import graft.ops.Robust

/** Robust stats on a hand-computed fixture: winsorize clips exactly to the
  * interpolated percentiles, MAD flags exactly the > k·MAD rows.
  */
class RobustSpec extends SparkSpec {

  test("winsorize clips to the exact interpolated percentile bounds") {
    import spark.implicits._
    // values 1..5: p25 = 2.0, p75 = 4.0 (exact interpolation on sorted data)
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0), ("g", 5.0))
      .toDF("grp", "v")
    val got = Robust.winsorize(df, "grp", "v", 0.25, 0.75)
      .select("v", "v_w").collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got === Map(1.0 -> 2.0, 2.0 -> 2.0, 3.0 -> 3.0, 4.0 -> 4.0, 5.0 -> 4.0))
  }

  test("madOutliers flags exactly the rows beyond k·MAD per group") {
    import spark.implicits._
    // group a: median 10, deviations {0,1,1,2,100} → MAD 1; k=3 flags dev>3
    val df = (Seq(10.0, 11.0, 9.0, 12.0, 110.0).map(("a", _)) ++
      Seq(5.0, 5.0, 5.0).map(("b", _))).toDF("grp", "v")
    val got = Robust.madOutliers(df, "grp", "v", k = 3.0)
      .select("grp", "v", "v_outlier").collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getBoolean(2)).toMap
    assert(got(("a", 110.0)) === true)
    Seq(10.0, 11.0, 9.0, 12.0).foreach(v => assert(got(("a", v)) === false, s"a/$v"))
    // constant group: MAD 0, every row at dev 0 → not flagged
    assert(got(("b", 5.0)) === false)
  }

  test("NULL group keys clip and flag like any other group (clip-don't-drop)") {
    import spark.implicits._
    val df = Seq((Some("g"), 1.0), (Some("g"), 9.0),
      (None: Option[String], 1.0), (None, 2.0), (None, 3.0), (None, 4.0), (None, 5.0))
      .toDF("grp", "v")
    val w = Robust.winsorize(df, "grp", "v", 0.25, 0.75)
    assert(w.count() === 7, "no row may vanish on a NULL group key")
    val nullClipped = w.filter(col("grp").isNull)
      .select("v", "v_w").collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(nullClipped === Map(1.0 -> 2.0, 2.0 -> 2.0, 3.0 -> 3.0, 4.0 -> 4.0, 5.0 -> 4.0))
    val m = Robust.madOutliers(df, "grp", "v", k = 3.0)
    assert(m.count() === 7)
    assert(m.filter(col("grp").isNull).count() === 5)
  }
}
