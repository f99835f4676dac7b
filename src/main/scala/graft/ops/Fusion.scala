package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval: combine independently-produced
  * rankings (BM25 lexical, embedding cosine, …) into one list with
  * Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR'09):
  *
  *   rrf(d) = Σ_lists 1 / (kRrf + rank_list(d))
  *
  * RRF needs only ranks, never score calibration, which is why it is the
  * default fusion in hybrid RAG stacks — BM25 scores and cosines live on
  * incomparable scales.
  *
  * Scale contract: each input is truncated to its top `perListTopN` rows
  * FIRST via a distributed take-ordered (per-partition top-N, then one
  * bounded merge — no global sort of the candidate corpus); ranks, the
  * full-outer id alignment, and the fused sort all run on ≤ lists ×
  * perListTopN rows. At 100 TB the expensive part is producing the input
  * rankings; fusion is bounded by construction.
  *
  * Determinism: rank ties break on ascending id; the fused score is summed
  * in FIXED list order via a left-associated column expression (not a
  * row-order-dependent aggregate), so the double arithmetic is replayable
  * bit-for-bit by the SQL oracle (q_rrf_fuse).
  *
  * Reference analog: none (training-data/retrieval extension; the
  * reference has no ranking surface).
  */
object Fusion {

  /** Fuse `rankings` — (DataFrame, scoreCol) pairs, higher score = better —
    * on `idCol`. Output: `(idCol, rrf, n_lists)` for the global top
    * `topK` by fused score (ties on ascending id), with `rrf` half-up at
    * 9 decimals and `n_lists` the number of input lists the id survived
    * truncation in.
    */
  def rrf(
      rankings: Seq[(DataFrame, String)],
      idCol: String,
      kRrf: Int = 60,
      perListTopN: Int = 100,
      topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "at least one ranking required")
    require(kRrf >= 1 && perListTopN >= 1 && topK >= 1)
    val contribs = rankings.zipWithIndex.map { case ((df, scoreCol), i) =>
      val top = df
        .select(col(idCol).cast("long").as("id"), col(scoreCol).cast("double").as("s"))
        .filter(col("id").isNotNull && col("s").isNotNull)
        .orderBy(col("s").desc, col("id"))
        .limit(perListTopN)
      // ranks over the ≤ perListTopN survivors — bounded window
      top
        .withColumn("r", row_number().over(Window.orderBy(col("s").desc, col("id"))))
        .select(col("id"), (lit(1.0) / (lit(kRrf.toDouble) + col("r"))).as(s"c$i"))
    }
    val joined = contribs.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
    val fused = rankings.indices
      .map(i => coalesce(col(s"c$i"), lit(0.0)))
      .reduce(_ + _) // fixed left-associated order — oracle-replayable
    val hits = rankings.indices
      .map(i => when(col(s"c$i").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    joined
      .select(col("id").as(idCol),
        graft.Functions.roundHalfUp(fused, 9).as("rrf"),
        hits.cast("long").as("n_lists"),
        fused.as("_raw"))
      .orderBy(col("_raw").desc, col(idCol))
      .limit(topK)
      .drop("_raw")
  }
}
