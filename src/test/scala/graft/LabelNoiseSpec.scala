package graft

import graft.ops.LabelNoise

/** Confident-learning semantics: hand-computed thresholds, the
  * integer cross-multiplied comparison, argmax tie canon, and the
  * no-qualified-class convention.
  */
class LabelNoiseSpec extends SparkSpec {
  import spark.implicits._

  // Two classes. Given-0 items: i1 (p0=0.9), i2 (p0=0.5) → t0 = 0.7.
  // Given-1 items: i3 (p1=0.9), i4 (p1=0.7), i5 (p1=0.9) → t1 = 2.5/3.
  // Qualifications (pm·cnt ≥ Σpm):
  //   i1: p0 0.9 ≥ 0.7 ✓; p1 0.1 ✗           → suggested 0, not flagged
  //   i2: p0 0.5 ✗; p1 0.8 (2.4 < 2.5) ✗      → suggested NULL, not flagged
  //   i3: p1 0.9 (2.7 ≥ 2.5) ✓                → suggested 1, not flagged
  //   i4: p0 0.1 ✗; p1 0.7 (2.1 < 2.5) ✗      → suggested NULL
  //   i5: p0 0.9 ✓ AND p1 0.9 ✓, pm tie       → smaller class wins: 0, FLAGGED
  private def fixture = Seq(
    (1L, 0L, 0L, 0.9), (1L, 0L, 1L, 0.1),
    (2L, 0L, 0L, 0.5), (2L, 0L, 1L, 0.8),
    (3L, 1L, 0L, 0.2), (3L, 1L, 1L, 0.9),
    (4L, 1L, 0L, 0.1), (4L, 1L, 1L, 0.7),
    (5L, 1L, 0L, 0.9), (5L, 1L, 1L, 0.9))
    .toDF("item", "given", "cls", "p")

  test("confidentFlags: thresholds, cross-multiplied comparison, tie canon") {
    val got = LabelNoise.confidentFlags(fixture, "item", "given", "cls", "p")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size == 5)
    assert(got(1L).getAs[Long]("suggested") == 0L && !got(1L).getAs[Boolean]("flagged"))
    assert(got(2L).isNullAt(got(2L).fieldIndex("suggested")))
    assert(!got(2L).getAs[Boolean]("flagged"), "unqualified items are not flagged")
    assert(got(3L).getAs[Long]("suggested") == 1L && !got(3L).getAs[Boolean]("flagged"))
    assert(got(4L).isNullAt(got(4L).fieldIndex("suggested")))
    assert(got(5L).getAs[Long]("suggested") == 0L, "probability tie breaks to the smaller class")
    assert(got(5L).getAs[Boolean]("flagged"), "suggested ≠ given flags the item")
    // partition invariance
    val many = LabelNoise.confidentFlags(fixture.repartition(7), "item", "given", "cls", "p")
      .collect().map(_.toString).sorted.toSeq
    assert(many == got.values.map(_.toString).toSeq.sorted)
  }

  test("confidentJoint: counts per (given, suggested), unqualified items excluded") {
    val joint = LabelNoise.confidentJoint(
      LabelNoise.confidentFlags(fixture, "item", "given", "cls", "p"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(joint == Map((0L, 0L) -> 1L, (1L, 1L) -> 1L, (1L, 0L) -> 1L))
  }

  test("confidentFlags: NULL/NaN probabilities drop, never qualify") {
    val withBad = fixture.unionByName(Seq(
      (6L, 0L, 0L, Double.NaN), (6L, 0L, 1L, 0.99))
      .toDF("item", "given", "cls", "p"))
    val got = LabelNoise.confidentFlags(withBad, "item", "given", "cls", "p")
      .collect().map(r => r.getLong(0) -> r).toMap
    // i6's NaN row dropped; its p1=0.99 clears t1 — but t1 is computed only
    // over (given = cls) rows, and i6's given-0 row was the NaN one, so it
    // contributes nothing to t0 either
    assert(got(6L).getAs[Long]("suggested") == 1L && got(6L).getAs[Boolean]("flagged"))
  }
}
