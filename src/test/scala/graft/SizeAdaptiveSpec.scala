package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Preference, RankEval, SizeAdaptive}

/** The size-adaptive pin contract for the one-row-fold eval ops: results
  * are identical pinned or not; the pin stays OFF below the threshold (the
  * local measured-best shape) and, once forced on, collapses the op's
  * repeated input passes onto the materialized dedup aggregate.
  */
class SizeAdaptiveSpec extends SparkSpec {
  import spark.implicits._

  private def withThreshold[A](bytes: Long)(body: => A): A = {
    spark.conf.set(SizeAdaptive.ConfKey, bytes.toString)
    try body finally spark.conf.unset(SizeAdaptive.ConfKey)
  }

  private def ratings = Seq(
    (1L, "r1", "A"), (1L, "r2", "A"), (1L, "r3", "A"),
    (2L, "r1", "A"), (2L, "r2", "A"), (2L, "r3", "B"),
    (3L, "r1", "B"), (3L, "r2", "B"), (3L, "r3", "B"),
    (4L, "r1", "A"), (4L, "r2", "B"), (4L, "r3", "C")).toDF("item", "rater", "label")

  test("pinIfLarge: off below the threshold, localCheckpoint above it") {
    val df = ratings
    val unpinned = SizeAdaptive.pinIfLarge(df)
    assert(unpinned eq df, "below the threshold the relation must pass through untouched")
    val pinned = withThreshold(0L)(SizeAdaptive.pinIfLarge(df))
    assert(pinned.queryExecution.executedPlan.toString.contains("Scan ExistingRDD"),
      "a forced pin must materialize to an RDD scan")
    assert(pinned.collect().toSet == df.collect().toSet)
  }

  test("fleissKappa: pinned result identical; input scanned once with the pin active") {
    val base = Preference.fleissKappa(ratings, "item", "rater", "label", 3)
    val baseRow = base.head()
    val pinnedDf = withThreshold(0L)(
      Preference.fleissKappa(ratings, "item", "rater", "label", 3))
    val pinnedRow = pinnedDf.head()
    assert(pinnedRow == baseRow, "the pin must not change a single digit")
    // with the pin active, every consumer reads the materialized dedup
    // aggregate: the executed plan's only input leaves are the checkpoint
    // RDD — the original LocalTableScan input appears ZERO times (r14
    // runtime audit: up to 18 surviving input leaf scans without the pin)
    pinnedDf.write.format("noop").mode("overwrite").save()
    val pinnedPlan = pinnedDf.queryExecution.executedPlan.toString
    assert(pinnedPlan.contains("Scan ExistingRDD") &&
      !pinnedPlan.contains("LocalTableScan"),
      s"pinned fleiss must fold from the checkpoint alone:\n$pinnedPlan")
    // default threshold: no pin at local sizes — the plan keeps the
    // measured-best unpinned shape (no checkpoint RDD leaf)
    base.write.format("noop").mode("overwrite").save()
    val basePlan = base.queryExecution.executedPlan.toString
    assert(!basePlan.contains("Scan ExistingRDD"),
      "below the threshold the op must not materialize")
  }

  test("krippendorffAlpha and cochranQ: pinned results identical") {
    val kBase = Preference.krippendorffAlpha(ratings, "item", "rater", "label").head()
    val kPinned = withThreshold(0L)(
      Preference.krippendorffAlpha(ratings, "item", "rater", "label")).head()
    assert(kPinned == kBase)
    val correctness = Seq(
      (1L, "s1", true), (1L, "s2", false), (1L, "s3", true),
      (2L, "s1", true), (2L, "s2", true), (2L, "s3", true),
      (3L, "s1", false), (3L, "s2", false), (3L, "s3", true),
      (4L, "s1", true), (4L, "s2", false), (4L, "s3", false)).toDF("item", "sys", "ok")
    val qBase = RankEval.cochranQ(correctness, "item", "sys", "ok").head()
    val qPinned = withThreshold(0L)(
      RankEval.cochranQ(correctness, "item", "sys", "ok")).head()
    assert(qPinned == qBase)
  }
}
