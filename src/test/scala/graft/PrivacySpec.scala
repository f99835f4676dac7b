package graft

import org.apache.spark.sql.functions._

import graft.ops.Privacy

/** k-anonymity / l-diversity gates: NULL-group retention through the
  * null-safe join, NULL-sensitive exclusion, composed gate semantics, and
  * generalization monotonicity (coarser buckets never shrink groups).
  */
class PrivacySpec extends SparkSpec {

  import spark.implicits._

  private lazy val rows = Seq(
    // (id, region, age, disease) — the classic k-anon fixture shape
    (1L, Some("north"), Some(34.0), "flu"),
    (2L, Some("north"), Some(36.0), "cold"),
    (3L, Some("north"), Some(38.0), "flu"),
    (4L, Some("south"), Some(34.0), "zika"), // singleton group
    (5L, None, Option.empty[Double], "flu"), // NULL quasi group
    (6L, None, Option.empty[Double], "flu")
  ).toDF("id", "region", "age", "disease")
    .withColumn("ageb", Privacy.generalize(col("age"), 10.0))

  test("kAnonymity: suppression by group size; NULL quasi-group keeps its rows") {
    val out = Privacy.kAnonymity(rows, Seq("region", "ageb"), k = 2L)
      .select("id", "group_n", "suppress")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L), "null-group rows must survive the join")
    assert(out(1L) == ((3L, false)) && out(2L) == ((3L, false)) && out(3L) == ((3L, false)))
    assert(out(4L) == ((1L, true)), "singleton group suppressed")
    assert(out(5L) == ((2L, false)) && out(6L) == ((2L, false)),
      "the all-NULL combination is its own group of 2")
  }

  test("lDiversity: NULL sensitive values provide no cover") {
    val df = Seq(
      (1L, "g1", Some("flu")), (2L, "g1", Some("cold")),
      (3L, "g2", Some("flu")), (4L, "g2", Option.empty[String]), (5L, "g2", Some("flu"))
    ).toDF("id", "q", "disease")
    val out = Privacy.lDiversity(df, Seq("q"), "disease", l = 2L)
      .select("q", "group_n", "n_sensitive", "diverse")
      .as[(String, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out("g1") == (("g1", 2L, 2L, true)))
    assert(out("g2") == (("g2", 3L, 1L, false)), "NULL must not count as a second value")
  }

  test("releaseGate: keep requires BOTH gates; equals kAnonymity ∧ lDiversity") {
    val gate = Privacy.releaseGate(rows, Seq("region", "ageb"), "disease", k = 2L, l = 2L)
      .select("id", "keep").as[(Long, Boolean)].collect().toMap
    // north/30s: n=3 ok, diseases {flu, cold} ok → keep
    assert(gate(1L) && gate(2L) && gate(3L))
    // south singleton: fails k → drop
    assert(!gate(4L))
    // NULL group: n=2 ok but disease uniform {flu} → fails l
    assert(!gate(5L) && !gate(6L))
  }

  test("generalize: coarser buckets only merge groups, never split them") {
    val events = Tables(spark, "/root/testdata/sf0.001", "events")
    val fine = events.select(Privacy.generalize(col("value"), 10.0).as("b"))
      .groupBy("b").count().count()
    val coarse = events.select(Privacy.generalize(col("value"), 100.0).as("b"))
      .groupBy("b").count().count()
    assert(coarse <= fine && coarse > 1)
    intercept[IllegalArgumentException] { Privacy.generalize(col("value"), 0.0) }
  }
}
