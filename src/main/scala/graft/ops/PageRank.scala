package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank (Brin & Page 1998) over an edge relation, with
  * every rank quantized to integer "pico-rank" units (scale = 10^12 per
  * unit of probability mass). The per-iteration update is
  *
  *   r'(v) = base + (dampingPct · Σ_{u→v} (r(u) div outdeg(u))) div 100
  *   base  = ((scale div 100) · (100 − dampingPct)) div N
  *
  * — ALL integer arithmetic. That choice buys two properties float
  * PageRank cannot have: the fixpoint iteration is bit-deterministic
  * under any partitioning/aggregation order (integer sums are order-free),
  * and an external SQL engine can replay the whole iterated computation
  * digit-for-digit (oracle q_graph_pagerank unrolls the iterations as
  * CTEs). The cost is truncation leakage: `div` drops sub-pico mass, so
  * ranks sum to slightly under `scale` — bounded by (outdeg-truncation +
  * damping-truncation) < N·2 pico per iteration, negligible and identical
  * in both engines. Dangling nodes (outdeg 0) leak their damped mass, the
  * standard simplification.
  *
  * Scale shape: each iteration is one keyed join of the rank relation
  * (N rows) against the edge relation on `src` plus one map-side-partial
  * sum keyed on `dst` — the canonical shuffle-bound Pregel-style loop,
  * inheriting AQE/skew handling (a celebrity node's in-edges are one hot
  * reduce key → AQE skew split). Ranks are `localCheckpoint`ed per round:
  * the loop output feeds the next round's join, and without the barrier
  * lineage doubles per iteration (the [[ConnectedComponents]] lesson).
  * Iterations are caller-fixed (PageRank at corpus scale runs a fixed
  * budget, not to convergence).
  *
  * Reference analog: none (training-data extension — link-graph quality
  * priors for web curation, the RefinedWeb/Common-Crawl ranking step).
  */
object PageRank {

  /** Run `iterations` rounds over `edges(srcCol, dstCol)`. Edges are
    * deduplicated and NULL endpoints dropped; nodes = src ∪ dst. Returns
    * `(node, rank_pico)` — pico-ranks summing to ≈ `scale`.
    */
  def run(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      dampingPct: Int = 85,
      scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampingPct >= 0 && dampingPct <= 100, s"dampingPct in [0,100], got $dampingPct")
    require(scale % 100L == 0L, s"scale must be divisible by 100, got $scale")
    // the graph is pinned ONCE (lazy checkpoints, materialized by the
    // first action): every iteration joins against e/outdeg and rebuilds
    // ranks over nodes, so an unpinned edge relation re-derives itself —
    // and whatever corpus projection produced it — twice per round. The
    // standard Pregel-style discipline: iterative graph algorithms cache
    // the edge relation for the loop's lifetime.
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(false)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(false)
    val n = nodes.count() // bounded driver scalar — the node count
    require(n > 0, "empty graph")
    val base = (scale / 100L) * (100L - dampingPct) / n
    var ranks = nodes.select(col("node"), lit(scale / n).as("r")).localCheckpoint()
    for (_ <- 1 to iterations) {
      val contribPerNode = ranks
        .join(outdeg, ranks("node") === outdeg("src"))
        .select(col("node").as("u"), expr("r div outdeg").as("c"))
      val inbound = e
        .join(contribPerNode, e("src") === contribPerNode("u"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(inbound, nodes("node") === inbound("dst"), "left")
        .select(
          col("node"),
          expr(s"CAST($base AS BIGINT) + ($dampingPct * coalesce(s, CAST(0 AS BIGINT))) div 100")
            .as("r"))
        .localCheckpoint()
    }
    ranks.select(col("node"), col("r").as("rank_pico"))
  }
}
