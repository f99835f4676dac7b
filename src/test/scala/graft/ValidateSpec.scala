package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Validate
import graft.ops.Validate._

class ValidateSpec extends SparkSpec {

  import spark.implicits._

  private def fixture: DataFrame = Seq(
    (1L, Option(5.0), "A", "AIR", Option("x")),
    (1L, Option(500.0), "Z", "air", Option.empty[String]), // dup key + 4 violations
    (2L, Option.empty[Double], "N", "TRUCK", Option("y")), // null qty passes range
    (3L, Option(10.0), null.asInstanceOf[String], null.asInstanceOf[String], Option("z")))
    .toDF("k", "qty", "flag", "mode", "comment")

  private def collectReport(df: DataFrame): Map[String, (String, Long, Long, Boolean)] =
    df.collect().map(r => r.getString(0) ->
      ((r.getString(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap

  test("each check type counts its violations with SQL null semantics") {
    val ref = Seq(1L, 2L).toDF("rk")
    val got = collectReport(Validate.report(fixture, Seq(
      NotNull("comment"),
      InRange("qty", 1.0, 100.0),
      AcceptedValues("flag", Seq("A", "N")),
      Matches("mode", "^[A-Z]+$"),
      Unique(Seq("k")),
      Unique(Seq("k", "qty")),
      ForeignKey(Seq("k"), "ref", ref, Seq("rk")))))
    assert(got("not_null(comment)") == (("comment", 1L, 4L, false)))
    assert(got("in_range(qty)") == (("qty", 1L, 4L, false)), "NULL qty must pass range")
    assert(got("accepted(flag)") == (("flag", 1L, 4L, false)), "NULL flag must pass accepted")
    assert(got("matches(mode)") == (("mode", 1L, 4L, false)), "NULL mode must pass matches")
    assert(got("unique(k)") == (("k", 1L, 4L, false)))
    assert(got("unique(k,qty)") == (("k,qty", 0L, 4L, true)))
    assert(got("fk(k->ref)") == (("k", 1L, 4L, false)), "only k=3 misses the ref")
  }

  test("uniqueness treats NULL as a collidable value, position-sensitively") {
    val df = Seq(
      (Option(1L), Option.empty[Long]),
      (Option(1L), Option.empty[Long]), // collides with the row above
      (Option.empty[Long], Option(1L))) // does NOT collide: (1,NULL) != (NULL,1)
      .toDF("a", "b")
    val got = collectReport(Validate.report(df, Seq(Unique(Seq("a", "b")))))
    assert(got("unique(a,b)") == (("a,b", 1L, 3L, false)))
  }

  test("foreign key: rows with a NULL key component pass (SQL simple match)") {
    val df = Seq(Option(1L), Option.empty[Long], Option(9L)).toDF("k")
    val ref = Seq(1L).toDF("rk")
    val got = collectReport(Validate.report(df, Seq(ForeignKey(Seq("k"), "r", ref, Seq("rk")))))
    assert(got("fk(k->r)") == (("k", 1L, 3L, false)), "NULL passes, 9 fails")
  }

  test("row-local checks run in ONE scan regardless of how many are declared") {
    val plan = Validate.report(fixture, Seq(
      NotNull("comment"), InRange("qty", 1.0, 100.0),
      AcceptedValues("flag", Seq("A", "N")), Matches("mode", "^[A-Z]+$"),
      Unique(Seq("k")))).queryExecution.executedPlan.toString
    val scans = "LocalTableScan|Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"row-local suite must read the table once, found $scans:\n$plan")
  }

  test("empty table: zero violations everywhere, suite passes") {
    val got = collectReport(Validate.report(fixture.limit(0), Seq(
      NotNull("comment"), Unique(Seq("k")),
      ForeignKey(Seq("k"), "r", Seq(1L).toDF("rk"), Seq("rk")))))
    assert(got.values.forall { case (_, v, t, p) => v == 0L && t == 0L && p })
  }

  test("guards: empty suite, duplicate ids, mismatched FK arity") {
    intercept[IllegalArgumentException] { Validate.report(fixture, Seq.empty) }
    intercept[IllegalArgumentException] {
      Validate.report(fixture, Seq(NotNull("k"), NotNull("k")))
    }
    intercept[IllegalArgumentException] {
      ForeignKey(Seq("a", "b"), "r", fixture, Seq("x"))
    }
  }
  test("report rows come back in declared order even with an FK declared first") {
    val ref = Seq(1L).toDF("rk")
    val ids = Validate.report(fixture, Seq(
      ForeignKey(Seq("k"), "r", ref, Seq("rk")),
      NotNull("comment"),
      Unique(Seq("k"))))
      .select("check_id").collect().map(_.getString(0)).toSeq
    assert(ids == Seq("fk(k->r)", "not_null(comment)", "unique(k)"))
  }
}
