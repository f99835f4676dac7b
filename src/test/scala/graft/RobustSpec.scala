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

  test("quantileNormalize: min-rank tie semantics, singleton 0, NULL passthrough") {
    import spark.implicits._
    // group g: values 10, 20, 20, 40  →  pr = 0, 1/3, 1/3, 1
    val df = Seq(
      (1L, "g", Some(10.0)), (2L, "g", Some(20.0)),
      (3L, "g", Some(20.0)), (4L, "g", Some(40.0)),
      (5L, "solo", Some(7.0)), (6L, "g", None))
      .toDF("id", "grp", "v")
    val got = Robust.quantileNormalize(df, "grp", "v")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(1L).contains(0.0))
    assert(got(2L).contains(math.floor(1.0 / 3 * 1e6 + 0.5) / 1e6))
    assert(got(2L) == got(3L), "ties must share their minimum rank")
    assert(got(4L).contains(1.0))
    assert(got(5L).contains(0.0), "singleton group normalizes to 0")
    assert(got(6L).isEmpty, "NULL score passes through with NULL rank")
  }

  test("quantileNormalizeApprox tracks the exact form within grid resolution") {
    val events = Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("event_type"), col("value"))
    val exact = Robust.quantileNormalize(events, "event_type", "value")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val approx = Robust.quantileNormalizeApprox(events, "event_type", "value", grid = 100)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(exact.keySet == approx.keySet && exact.nonEmpty)
    val worst = exact.keys.map(k => math.abs(exact(k) - approx(k))).max
    assert(worst <= 0.06, s"approx quantile normalization drifted: worst gap $worst")
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
  test("groupCorr: exact ±1 on linear data, degenerate nulls, pairwise deletion") {
    import spark.implicits._
    val df = Seq(
      ("up", Some(1.0), Some(10.0)), ("up", Some(2.0), Some(20.0)),
      ("up", Some(3.0), Some(30.0)),
      ("down", Some(1.0), Some(9.0)), ("down", Some(2.0), Some(6.0)),
      ("down", Some(3.0), Some(3.0)),
      ("flat", Some(1.0), Some(5.0)), ("flat", Some(2.0), Some(5.0)),
      ("one", Some(1.0), Some(1.0)),
      ("holes", Some(1.0), Some(1.0)), ("holes", None, Some(9.0)),
      ("holes", Some(2.0), None), ("holes", Some(2.0), Some(2.0)))
      .toDF("grp", "x", "y")
    val got = Robust.groupCorr(df, "grp", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    assert(got("up") == ((3L, Some(1.0))))
    assert(got("down") == ((3L, Some(-1.0))))
    assert(got("flat") == ((2L, None)), "zero y-variance nulls out")
    assert(got("one") == ((1L, None)), "single point nulls out")
    assert(got("holes") == ((2L, Some(1.0))), "null-x/null-y rows excluded pairwise")
  }

  test("trimmedMean: drops floor(trim·n) per tail, outlier can't move the core") {
    import spark.implicits._
    // group g: 10 values — 1..8 plus outliers -1000 and +1000.
    // trim 0.1 → floor(1) per tail → keeps 1..8, mean 4.5 exactly.
    val g = (1 to 8).map(i => ("g", i.toLong, i.toDouble)) ++
      Seq(("g", 100L, -1000.0), ("g", 101L, 1000.0))
    // group h: 3 values, trim 0.1 → floor(0.3)=0 dropped → plain mean
    val h = Seq(("h", 1L, 1.0), ("h", 2L, 2.0), ("h", 3L, 6.0))
    val got = Robust.trimmedMean((g ++ h).toDF("grp", "id", "v"), "grp", "id", "v", 0.1)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got("g") == ((8L, 4.5)))
    assert(got("h") == ((3L, 3.0)))
    // trim 0 ≡ plain mean; trim ≥ 0.5 rejected
    val zero = Robust.trimmedMean(h.toDF("grp", "id", "v"), "grp", "id", "v", 0.0)
      .head()
    assert(zero.getLong(1) == 3L && zero.getDouble(2) == 3.0)
    intercept[IllegalArgumentException] {
      Robust.trimmedMean(h.toDF("grp", "id", "v"), "grp", "id", "v", 0.5)
    }
    // value ties: the (value, key) rank canon makes the drop set exact
    val ties = Seq(("t", 1L, 5.0), ("t", 2L, 5.0), ("t", 3L, 5.0), ("t", 4L, 9.0))
    val tgot = Robust.trimmedMean(ties.toDF("grp", "id", "v"), "grp", "id", "v", 0.25)
      .head()
    // floor(1) per tail: drops (5.0, id 1) and (9.0, id 4) → keeps 5, 5
    assert(tgot.getLong(1) == 2L && tgot.getDouble(2) == 5.0)
  }
}
