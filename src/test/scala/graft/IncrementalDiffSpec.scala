package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.incr.IncrementalDiff

/** J1 semantics (reference support/last_update.py:52-121): fixture scenarios
  * from FIXTURES.md A8 plus a seeded randomized property for the overlap
  * algebra (checked against an independent in-memory reimplementation).
  */
class IncrementalDiffSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def items(rows: (String, String, String)*) =
    rows.toSeq
      .map { case (b, d, e) =>
        (b, ts(d), Option(e).filter(_.nonEmpty).map(ts).orNull)
      }
      .toDF("id_base", "collection_date", "collection_end")

  test("missing-in-target items survive; overlapping are subtracted") {
    val src = items(
      ("a", "2020-01-01 00:00:00", ""), // overlaps target a@Jan1 → dropped
      ("b", "2020-01-02 00:00:00", ""), // no b in target → kept
      ("a", "2020-01-03 00:00:00", "")) // a exists only Jan1 → kept
    val tgt = items(("a", "2020-01-01 00:00:00", ""))
    val got = IncrementalDiff
      .diff(src, tgt, Seq("id_base"), "collection_date", Some("collection_end"))
      .select("id_base", "collection_date")
      .as[(String, Timestamp)].collect().toSet
    assert(got == Set(("b", ts("2020-01-02 00:00:00")), ("a", ts("2020-01-03 00:00:00"))))
  }

  test("null end date means a one-day interval (+1 day rule)") {
    // target covers Jan1 only; source item late on Jan1 overlaps, Jan2 doesn't
    val tgt = items(("a", "2020-01-01 00:00:00", ""))
    val srcLate = items(("a", "2020-01-01 23:59:59", ""))
    val srcNext = items(("a", "2020-01-02 00:00:00", ""))
    assert(IncrementalDiff.diff(srcLate, tgt, Seq("id_base"), "collection_date",
      Some("collection_end")).count() == 0)
    assert(IncrementalDiff.diff(srcNext, tgt, Seq("id_base"), "collection_date",
      Some("collection_end")).count() == 1)
  }

  test("explicit end dates define interval overlap") {
    val src = items(("a", "2020-01-01 00:00:00", "2020-01-05 00:00:00"))
    val tgtOverlap = items(("a", "2020-01-04 00:00:00", "2020-01-06 00:00:00"))
    val tgtTouch = items(("a", "2020-01-05 00:00:00", "2020-01-06 00:00:00"))
    assert(IncrementalDiff.diff(src, tgtOverlap, Seq("id_base"), "collection_date",
      Some("collection_end")).count() == 0) // overlapping → subtracted
    assert(IncrementalDiff.diff(src, tgtTouch, Seq("id_base"), "collection_date",
      Some("collection_end")).count() == 1) // half-open: touching ≠ overlap
  }

  test("force keeps everything; sameDay cancels still-filling items") {
    val src = items(
      ("a", "2020-01-01 00:00:00", ""),
      ("b", "2020-06-15 00:00:00", ""))
    val tgt = items(("a", "2020-01-01 00:00:00", ""))
    val forced = IncrementalDiff.diff(src, tgt, Seq("id_base"), "collection_date",
      Some("collection_end"), force = true)
    assert(forced.count() == 2)
    val cancelled = IncrementalDiff.diff(src, tgt, Seq("id_base"), "collection_date",
      Some("collection_end"), force = true, sameDayCancel = true,
      today = lit("2020-06-15").cast("date"))
    assert(cancelled.select("id_base").as[String].collect().toSeq == Seq("a"))
  }

  test("property: diff = source minus items overlapping target (seeded random)") {
    val rnd = new scala.util.Random(42)
    def randItems() = Seq.fill(12)(
      (if (rnd.nextBoolean()) "k1" else "k2", 1 + rnd.nextInt(9), 1 + rnd.nextInt(3)))
      .distinct
      .map { case (k, d, len) =>
        (k, ts(f"2020-01-0$d%d 00:00:00"), ts(f"2020-01-${d + len}%02d 00:00:00"))
      }
    (1 to 10).foreach { _ =>
      val s = randItems()
      val t = randItems()
      val src = s.toDF("id_base", "collection_date", "collection_end")
      val tgt = t.toDF("id_base", "collection_date", "collection_end")
      val diff = IncrementalDiff
        .diff(src, tgt, Seq("id_base"), "collection_date", Some("collection_end"))
        .as[(String, Timestamp, Timestamp)].collect().toSet
      // reference overlap semantics, reimplemented independently
      def overlaps(a: (String, Timestamp, Timestamp), b: (String, Timestamp, Timestamp)) =
        a._1 == b._1 && a._2.before(b._3) && b._2.before(a._3)
      val expected = s.toSet.filterNot(s0 => t.exists(t0 => overlaps(s0, t0)))
      assert(diff == expected)
    }
  }
}
