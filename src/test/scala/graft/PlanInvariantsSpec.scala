package graft

/** Executed-plan scale invariants for the heaviest headline queries: what
  * must NEVER appear in the plan AQE actually ran, regardless of data
  * layout or optimizer drift across testdata regenerations (the q_gs_ready
  * lesson from round 5 — a silent plan flip reads as a perf regression).
  *
  *   - no CartesianProduct and no BroadcastNestedLoopJoin: every pair
  *     generator here is keyed (bands, buckets, PK, zone×bin); an
  *     unconditioned join would be quadratic in the fact at scale.
  *     (q_gs_ready's sanctioned dim×dim fuzzy/geo crosses are asserted
  *     separately in GsReadySpec.)
  *   - no rangepartitioning exchange: none of these queries may sort the
  *     corpus globally mid-chain; orderings live at the write edge only.
  */
class PlanInvariantsSpec extends SparkSpec {

  private val queries = Seq(
    "q_cr_keep",       // composed curation: flags + dedup + CC + sampling
    "q_dd_clusters",   // large/small-star connected components
    "q_hh_tokens",     // Misra-Gries + exact recount
    "q_bpe_encode",    // broadcast-ranks zero-shuffle tokenize
    "q_dd_spans",      // window explode + keyed groupBy/join + island merge
    "q_j1_incr_diff",  // interval anti-join incremental diff
    "q_a1_traffic15")  // flagship 15-min aggregation

  queries.foreach { name =>
    test(s"$name: no cartesian, no nested-loop join, no global sort mid-chain") {
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      df.collect() // drive AQE to its final plan before inspecting
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"cartesian product in $name")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"unkeyed nested-loop join in $name")
      assert(!plan.contains("rangepartitioning"),
        s"global range exchange mid-chain in $name")
    }
  }
}
