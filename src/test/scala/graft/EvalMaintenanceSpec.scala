package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.catalog.{MaterializedAgg, SnapshotLake}
import graft.ops.RankEval

/** The continuous filter-model monitor (the streaming-IVM composition the
  * round-9 verdict asked for): calibration counts maintained INCREMENTALLY
  * — (a) retractably over the lake CDF via a [[MaterializedAgg]] with
  * `groupCols = (grp, bin), sumCols = (y, pm)`, and (b) append-only over a
  * real Structured Streaming `foreachBatch` fold via
  * [[RankEval.mergeCalibrationCounts]] — must read out the SAME ECE as the
  * batch [[RankEval.ece]] recomputed from the raw predictions, at EVERY
  * commit / micro-batch. calibrationCounts is signed-sum state (`n = Σ1`,
  * `hits = Σy`, `spm = Σpm`), which is exactly what makes both maintenance
  * modes exact rather than approximate.
  */
class EvalMaintenanceSpec extends SparkSpec {

  import spark.implicits._

  private val bins = 10

  /** Scored predictions as they land on the lake. */
  private def preds(t: (Long, String, String, Double, Int)*) =
    t.toDF("k", "part", "grp", "p", "label")

  /** Event grain with the lake PK carried through, plus an explicit
    * monotone version for upsert conflict resolution (the merge keeps the
    * MAX version per PK — a data column like pm would resolve backwards
    * whenever a rescore lowers it).
    */
  private def lakeRows(df: DataFrame, ver: Long) =
    RankEval.calibrationEvents(df, "grp", "p", "label", bins,
      carryCols = Seq("k", "part"))
      .withColumn("ver", lit(ver))

  test("MaterializedAgg over calibration events: maintained ECE == batch ECE at every commit") {
    val lake = new SnapshotLake(spark,
      Files.createTempDirectory("graft_ece_lake").toString)
    val agg = MaterializedAgg(spark, lake,
      Files.createTempDirectory("graft_ece_state").toString,
      consumerId = "ece", pk = Seq("k", "part"), partitionCols = Seq("part"),
      groupCols = Seq("grp", "bin"), sumCols = Seq("y", "pm"))

    def maintainedCounts = agg.read().select(
      col("grp"), col("bin"), col("cnt").as("n"),
      col("y_sum").cast("long").as("hits"),
      col("pm_sum").cast("long").as("spm"))

    // the ground truth is the RAW-row batch metric over whatever the
    // table currently holds — tracked driver-side through every mutation
    def check(current: DataFrame): Unit = {
      val stateEce = RankEval.eceFromCounts(maintainedCounts)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val batchEce = RankEval.ece(current, "grp", "p", "label", bins)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(stateEce == batchEce, s"maintained $stateEce != batch $batchEce")
      val stateCounts = maintainedCounts
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      val batchCounts = RankEval
        .calibrationCounts(current, "grp", "p", "label", bins)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(stateCounts == batchCounts, s"counts $stateCounts != $batchCounts")
    }

    // commit 1: initial scores (edge probabilities included: 0.0 and 1.0
    // land in the clamped edge bins)
    val p1 = preds(
      (1L, "s1", "en", 0.91, 1), (2L, "s1", "en", 0.88, 0),
      (3L, "s1", "en", 0.12, 0), (4L, "s1", "de", 0.55, 1),
      (5L, "s2", "de", 0.49, 0), (6L, "s2", "en", 1.0, 1),
      (7L, "s2", "de", 0.0, 0), (8L, "s2", "en", 0.34, 1))
    lake.commit(lakeRows(p1, 1L), Seq("part"))
    agg.refresh()
    check(p1)

    // commit 2: the model RESCORES items 2 and 4 (bin moves, pm changes,
    // one label correction) — the CDF retracts the old rows and adds the
    // new ones; the maintained counts must follow exactly
    val rescored = preds((2L, "s1", "en", 0.41, 0), (4L, "s1", "de", 0.97, 0))
    lake.upsert(lakeRows(rescored, 2L), Seq("k", "part"), "ver", Seq("part"))
    agg.refresh()
    val after2 = preds(
      (1L, "s1", "en", 0.91, 1), (2L, "s1", "en", 0.41, 0),
      (3L, "s1", "en", 0.12, 0), (4L, "s1", "de", 0.97, 0),
      (5L, "s2", "de", 0.49, 0), (6L, "s2", "en", 1.0, 1),
      (7L, "s2", "de", 0.0, 0), (8L, "s2", "en", 0.34, 1))
    check(after2)

    // commit 3: partition s1 expires — its contributions must fully
    // retract (a grp/bin cell whose count returns to zero disappears)
    lake.deleteWhere(col("part") === "s1", Seq("part"))
    agg.refresh()
    val after3 = preds(
      (5L, "s2", "de", 0.49, 0), (6L, "s2", "en", 1.0, 1),
      (7L, "s2", "de", 0.0, 0), (8L, "s2", "en", 0.34, 1))
    check(after3)
  }

  test("streaming foreachBatch folds of pass@k and BLEU counts == batch metrics") {
    val src = Files.createTempDirectory("graft_pb_src").toString
    val base = Files.createTempDirectory("graft_pb_state").toString
    val ckpt = Files.createTempDirectory("graft_pb_ck").toString

    // each row is one (problem, ok, cand, ref) record — a doc arrives
    // whole in one wave, the bleuCounts mergeability condition
    def rows(lo: Long, hi: Long) = (lo until hi).map { i =>
      val cand = s"tok${i % 7} tok${i % 5} tok${i % 3} tail$i"
      val ref = if (i % 2 == 0) cand else s"tok${i % 7} tok${i % 5} other"
      (i % 6, i % 3 == 0, cand, ref)
    }

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("problem LONG, ok BOOLEAN, cand STRING, ref STRING").parquet(src)
        .writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val pInc = RankEval.passAtKCounts(batch, "problem", "ok")
          val bInc = RankEval.bleuCounts(batch, "problem", "cand", "ref")
          val prevP = new java.io.File(s"$base/p${batchId - 1}")
          val prevB = new java.io.File(s"$base/b${batchId - 1}")
          val ss = batch.sparkSession
          (if (prevP.exists()) RankEval.mergePassAtKCounts(ss.read.parquet(prevP.toString), pInc) else pInc)
            .write.mode("overwrite").parquet(s"$base/p$batchId")
          (if (prevB.exists()) RankEval.mergeBleuCounts(ss.read.parquet(prevB.toString), bInc) else bInc)
            .write.mode("overwrite").parquet(s"$base/b$batchId")
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    rows(0L, 120L).toDF("problem", "ok", "cand", "ref")
      .write.mode("append").parquet(src)
    runOnce()
    rows(120L, 200L).toDF("problem", "ok", "cand", "ref")
      .write.mode("append").parquet(src)
    runOnce()

    val all = rows(0L, 200L).toDF("problem", "ok", "cand", "ref")
    val passStream = RankEval.passAtKFromCounts(
      spark.read.parquet(s"$base/p1"), Seq(1, 5))
      .collect().map(_.toString).sorted.toSeq
    val passBatch = RankEval.passAtK(all, "problem", "ok", Seq(1, 5))
      .collect().map(_.toString).sorted.toSeq
    assert(passStream == passBatch)
    val bleuStream = RankEval.bleuFromCounts(spark.read.parquet(s"$base/b1"))
      .head().toString
    val bleuBatch = RankEval.bleuCorpus(all, "problem", "cand", "ref")
      .head().toString
    assert(bleuStream == bleuBatch)
  }

  test("streaming foreachBatch fold of mergeCalibrationCounts == batch counts and ECE") {
    val src = Files.createTempDirectory("graft_ece_src").toString
    val base = Files.createTempDirectory("graft_ece_sk").toString
    val ckpt = Files.createTempDirectory("graft_ece_ck").toString

    val wave1 = (0L until 300L).map(i =>
      (s"g${i % 3}", (i % 97).toDouble / 97.0, (i % 5 < 2).compare(false)))
    val wave2 = (300L until 500L).map(i =>
      (s"g${i % 3}", (i % 89).toDouble / 89.0, (i % 7 < 3).compare(false)))

    def runOnce(): Unit = {
      val q = spark.readStream.schema("grp STRING, p DOUBLE, label INT").parquet(src)
        .writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val inc = RankEval.calibrationCounts(batch, "grp", "p", "label", bins)
          val prev = new java.io.File(s"$base/v${batchId - 1}")
          val merged =
            if (prev.exists()) RankEval.mergeCalibrationCounts(
              batch.sparkSession.read.parquet(prev.toString), inc)
            else inc
          merged.write.mode("overwrite").parquet(s"$base/v$batchId")
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    wave1.toDF("grp", "p", "label").write.mode("append").parquet(src)
    runOnce()
    wave2.toDF("grp", "p", "label").write.mode("append").parquet(src)
    runOnce()

    val all = (wave1 ++ wave2).toDF("grp", "p", "label")
    val streamed = spark.read.parquet(s"$base/v1")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val batchTwin = RankEval.calibrationCounts(all, "grp", "p", "label", bins)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(streamed == batchTwin,
      "incrementally merged calibration counts must equal the batch counts cell-for-cell")
    val eceStream = RankEval.eceFromCounts(spark.read.parquet(s"$base/v1"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val eceBatch = RankEval.ece(all, "grp", "p", "label", bins)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(eceStream == eceBatch)
  }
}
