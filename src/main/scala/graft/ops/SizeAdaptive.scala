package graft.ops

import org.apache.spark.sql.DataFrame

/** Input-size-adaptive materialization for bounded multi-consumer
  * intermediates inside the single-action one-row-fold eval ops
  * ([[Preference.fleissKappa]], [[Preference.krippendorffAlpha]],
  * [[RankEval.cochranQ]]).
  *
  * The boundary, measured in r14: within one action Spark's ReuseExchange
  * dedups identical duplicated aggregate subtrees, so an unconditional
  * `localCheckpoint` there only adds a materialization job — pinning these
  * relations at sf0.1 was measured flat-to-sharply-worse and reverted. But
  * the runtime plans also show up to 18 leaf scans SURVIVING exchange reuse
  * (the consumers project/filter the shared subtree differently), and at
  * cluster scale those extra passes over the rating stream dominate while
  * the pinned relation stays bounded (one row per (item, rater) /
  * (item, label) — agreement panels, not the corpus). So the pin is gated
  * on the optimizer's size estimate of the relation's own plan: below the
  * threshold (every local bench/oracle run) the op keeps its measured-best
  * unpinned shape; above it, the dedup aggregate materializes once and the
  * input is scanned once instead of once per consumer.
  *
  * The same threshold also gates PLAN-SHAPE choices with the same
  * local-vs-scale boundary — [[Dedup.filterCrossDoc]] /
  * [[SuffixArray]]'s crossDocFiltered pick the window min/max shape
  * (fastest measured locally: one pass, no join-back) below it and the
  * hot-key-proof aggregate + co-partitioned join-back shape above it
  * (window partitions are not AQE-skew-splittable, so one boilerplate
  * window repeated across ~10^5 documents serializes into a single
  * WindowExec task's sort+buffer at scale; the sa_hotkey ScaleProbe gates
  * that shape).
  *
  * `graft.adaptivePin.minInputBytes` overrides the 1 GiB default; set it to
  * a huge value to disable, or 0 to force the scale shapes (the spec and
  * ScaleProbe hook).
  */
private[graft] object SizeAdaptive {

  val ConfKey = "graft.adaptivePin.minInputBytes"
  val DefaultMinBytes: Long = 1L << 30

  /** True iff the optimized-plan size estimate of `df` meets the
    * configured threshold — the shared local-vs-scale boundary. Callers
    * must produce identical results on both sides of it.
    */
  def isLarge(df: DataFrame): Boolean = {
    val threshold = df.sparkSession.conf.getOption(ConfKey)
      .map(_.toLong).getOrElse(DefaultMinBytes)
    val sz = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (sys.env.contains("GRAFT_DEBUG_SIZE")) println(s"[sizeadaptive] estimate=$sz threshold=$threshold large=${sz >= BigInt(threshold)}")
    sz >= BigInt(threshold)
  }

  /** `localCheckpoint()` iff [[isLarge]]; `df` unchanged otherwise.
    * Results are identical either way — only the number of executed passes
    * over the upstream relation differs.
    */
  def pinIfLarge(df: DataFrame): DataFrame =
    if (isLarge(df)) df.localCheckpoint() else df
}
