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
    "q_dd_spans_sub",  // threshold-grain spans + content-verify pass
    "q_sa_crossdoc_spans", // char-grain two-pass spans: hash groupBy + chunk-keyed verify
    "q_sa_crossdoc_clean", // spans + ONE doc-keyed removal join, per-row stitch
    "q_j1_incr_diff",  // interval anti-join incremental diff
    "q_a1_traffic15",  // flagship 15-min aggregation
    "q_tx_quality",    // per-row quality projection (r6 bench-drift watch)
    "q_cms_sketch",    // CMS: bounded-key aggregate, no joins
    "q_ann_negatives_lsh", // hard negatives: bucket-KEYED pair join, never a cross
    "q_dd_editdist",   // salted band join: keyed SHUFFLE_HASH, never a cross
    "q_dd_seqratio_pairs", // ratio-threshold banding: same salted keyed join
    "q_kmv_sketch",    // bounded-heap candidates + bounded bottom-k window
    "q_vec_cov",       // d(d+1)/2-bounded covariance aggregate, no joins
    "q_o8_grouptopk",  // heap candidates + broadcast-semi recovery, no fact sort
    "q_dpo_advantage", // one prompt-keyed window of decimal moments
    "q_pv_gate",       // group stats + null-safe keyed join back
    "q_pk_mask",       // chunk arithmetic + parallel-array slices, keyed only
    "q_sft_lossmask",  // conv-keyed prefix-sum window
    "q_cl_flags",      // broadcast thresholds + item-keyed struct-max + keyed spine join
    "q_dd_calibration", // LSH-keyed pairs + semi-pruned shingle intersection join
    "q_sm_topfrac",    // one group-keyed window pair, no join
    "q_ev_f1",         // class-bounded contingency + keyed marginal joins
    "q_rb_trimmed",    // group-keyed rank/count windows + keyed mean
    "q_tx_sentchunks", // per-row fold + ONE (id, chunk)-keyed assembly
    "q_tx_fertility",  // pure per-row projection
    "q_ev_brier",      // one keyed aggregate of nano-quantized terms
    "q_cms_inner",     // (row, bucket)-keyed sketch join, depth-bounded
    // the round-9 heavy five (the rows where a silent plan flip costs the
    // most — VERDICT r9 task #2); executedPlan shows the final
    // post-localCheckpoint segment for the iterative ones, which is
    // exactly the segment a flip would corrupt (final window round /
    // rank-join / state read)
    "q_sa_ranks",      // per-doc windows: hash-partitioned, never ranged
    "q_sa_lrs",        // adjacent-rank self-join keyed on (id, rank)
    "q_graph_pagerank", // per-round keyed join + map-side partial sum
    "q_magg_rollup",   // maintained-state read + bounded rollup
    "q_e2e_curate",    // the six-stage composition: every join keyed
    "q_e2e_sft",       // the SFT funnel: conv-keyed gates/render/spans only
    "q_ev_passk",      // one problem-keyed aggregate + per-row factorials
    "q_ev_rougel",     // per-row LCS DP: zero joins, zero wide exchanges
    "q_ev_distinctn")  // (n, gram)-grain aggregate, bounded output

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

  // bleu/chrf end in a deliberate 1-row × bounded-row cross (corpus length
  // aggregate × per-order pivot aggregate — the bm25 avgdl trick), which is
  // a BroadcastNestedLoopJoin by construction and CONSTANT-sized at any
  // corpus scale. The pin therefore allows nested-loop joins but still bans
  // the shapes that would actually grow with data: a cartesian over
  // non-aggregate inputs and any mid-chain range exchange; the gram-count
  // join itself must stay keyed (a hash or sort-merge join on (id, n, gram)).
  Seq("q_ev_bleu", "q_ev_chrf").foreach { name =>
    test(s"$name: gram join keyed; only constant-side nested-loop crosses; no range exchange") {
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"cartesian product in $name:\n$plan")
      assert(!plan.contains("rangepartitioning"),
        s"global range exchange mid-chain in $name:\n$plan")
      val keyedJoins =
        "SortMergeJoin".r.findAllIn(plan).size + "ShuffledHashJoin".r.findAllIn(plan).size +
          "BroadcastHashJoin".r.findAllIn(plan).size
      assert(keyedJoins >= 1, s"the (id, n, gram) count join must be keyed in $name:\n$plan")
      val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
      assert(nlj <= 2, s"more nested-loop joins than the two constant-side " +
        s"aggregate crosses in $name:\n$plan")
    }
  }

  // marginMine scores a DELIBERATE broadcast cross (the exact mining-shard
  // form — the q_ann_brute role; LSH-pruned candidates are the scale path),
  // pinned by localCheckpoint so the sum/mutual branches reuse ONE scoring:
  // exactly one nested-loop join may appear, everything after must be keyed.
  test("q_ann_bitext: one pinned scoring cross, keyed margin joins, no range exchange") {
    val df = SparkEntry.queries("q_ann_bitext")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in q_ann_bitext:\n$plan")
    assert(!plan.contains("rangepartitioning"), s"range exchange in q_ann_bitext:\n$plan")
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(nlj == 0, // the scoring cross sits BEHIND the localCheckpoint pin
      s"the margin phase must reuse the pinned scoring, not re-cross:\n$plan")
  }

  // The LSH-bucketed mining path must have NO cross anywhere — candidates
  // come from a keyed bucket equi-join, the vector fetches are keyed id
  // joins, and the margin tail reuses the pinned scoring. Any nested-loop
  // or cartesian here means the scale path silently regressed to the
  // exact shard form.
  test("q_ann_bitext_lsh: fully keyed — no cross, no nested loop, no range exchange") {
    val df = SparkEntry.queries("q_ann_bitext_lsh")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in q_ann_bitext_lsh:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"nested loop in q_ann_bitext_lsh — the candidate path must stay keyed:\n$plan")
    assert(!plan.contains("rangepartitioning"), s"range exchange in q_ann_bitext_lsh:\n$plan")
  }

  // The tile-bucketed geo join exists to NOT be a cross: candidates reach
  // points only through the keyed (tile_x, tile_y) equi-join, and the
  // argmin must ride the WindowGroupLimit top-1 path, not a global sort.
  test("q_j12_tile_nn: keyed tile join, no cross or nested loop, group-limited argmin") {
    val df = SparkEntry.queries("q_j12_tile_nn")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in q_j12_tile_nn:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"nested loop in q_j12_tile_nn — the tile path must stay keyed:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"argmin must use the rank-limit pushdown, not a full per-point sort:\n$plan")
  }

  // Incremental cross-doc detection: history hashes must reach the probe
  // only through keyed joins (the semi-prune + the union-distinct), never
  // a cross, and nothing in the probe may range-exchange.
  test("q_sa_crossdoc_incr: fully keyed probe, no cross, no range exchange") {
    val df = SparkEntry.queries("q_sa_crossdoc_incr")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in q_sa_crossdoc_incr:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"nested loop in q_sa_crossdoc_incr:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"range exchange in q_sa_crossdoc_incr:\n$plan")
  }

  // The two round-6 bench-drift suspects get STRONGER pins than the generic
  // three: both are single-pass scans whose only legitimate plan is
  // shuffle-free, so any future Exchange (or a TakeOrdered degrading to a
  // global sort) is a named plan flip, not noise.

  // KN deliberately carries ONE broadcast one-row cross (the bigram-type
  // total, the stupid-backoff shape); every other join must stay keyed.
  test("q_tx_kn_ppl: keyed count-table joins; only the one-row totals broadcast crosses") {
    val df = SparkEntry.queries("q_tx_kn_ppl")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian product in q_tx_kn_ppl")
    assert(!plan.contains("rangepartitioning"), s"global range exchange in q_tx_kn_ppl")
    // every nested-loop line is the sanctioned broadcast one-row Cross
    plan.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).foreach { l =>
      assert(l.contains("BuildRight, Cross"),
        s"non-sanctioned nested-loop join in q_tx_kn_ppl: $l")
    }
  }

  test("q_tx_quality: pure per-row projection — zero exchanges, no aggregate, no join") {
    val df = SparkEntry.queries("q_tx_quality")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"q_tx_quality must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"q_tx_quality must not join:\n$plan")
    assert(!plan.contains("HashAggregate"), s"q_tx_quality must not aggregate:\n$plan")
  }

  test("q_dd_simhash: pure per-row projection — zero exchanges, no aggregate, no join") {
    // the r7 bench-drift watch (0.22 → 0.44 s on unchanged code): pin the
    // only legitimate plan — a shuffle-free per-row fingerprint projection —
    // so any future regression is provably host noise, not a plan flip
    val df = SparkEntry.queries("q_dd_simhash")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"q_dd_simhash must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"q_dd_simhash must not join:\n$plan")
    assert(!plan.contains("HashAggregate"), s"q_dd_simhash must not aggregate:\n$plan")
  }

  test("q_dd_oph_sig: hash-once MinHash is a zero-exchange per-row projection") {
    // the whole point of OPH over q_dd_minhash_sig is losing the per-seed
    // hash aggregate's exchange — if a shuffle ever appears here, the
    // operator has regressed to the shape it exists to avoid
    val df = SparkEntry.queries("q_dd_oph_sig")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"q_dd_oph_sig must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"q_dd_oph_sig must not join:\n$plan")
    assert(!plan.contains("HashAggregate"), s"q_dd_oph_sig must not aggregate:\n$plan")
  }

  test("q_web_html / q_bp_clean: extraction chains are zero-exchange per-row projections") {
    for (name <- Seq("q_web_html", "q_bp_clean")) {
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"$name must not shuffle:\n$plan")
      assert(!plan.contains("Join"), s"$name must not join:\n$plan")
      assert(!plan.contains("HashAggregate"), s"$name must not aggregate:\n$plan")
    }
  }

  test("q_url_domain: one map-side-partial aggregate on the bounded domain key") {
    val df = SparkEntry.queries("q_url_domain")(spark, "/root/testdata/sf0.001")
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    // AQE prints the pre-adaptive plan again under "== Initial Plan ==" —
    // pin the FINAL physical plan only
    val plan = full.split("== Initial Plan ==")(0)
    assert(!plan.contains("Join"), s"q_url_domain must not join:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"q_url_domain needs exactly ONE exchange:\n$plan")
    val exchangeIdx = plan.indexOf("Exchange")
    assert(plan.lastIndexOf("HashAggregate") > exchangeIdx,
      s"map-side partial aggregate must run UNDER the exchange:\n$plan")
  }

  test("q_ann_brute: one-row broadcast cross + TakeOrderedAndProject — fact side never shuffles") {
    val df = SparkEntry.queries("q_ann_brute")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must stay a TakeOrdered, not a sort+limit:\n$plan")
    // the SANCTIONED quadratic: the single query vector broadcasts and
    // nested-loops against the fact scan — the fact side itself must never
    // move (no hash/range exchange, no shuffled join, no driver cartesian)
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"the one-row query side must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"driver cartesian in q_ann_brute:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"fact side must not shuffle into a join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning") && !plan.contains("rangepartitioning"),
      s"no fact-side exchange allowed:\n$plan")
  }

  test("q_dpo_pairs: ONE exchange, partial struct-extreme aggregate map-side, no window") {
    val df = SparkEntry.queries("q_dpo_pairs")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"extremes must aggregate, not window:\n$plan")
    assert(!plan.contains("Join"), s"q_dpo_pairs must not join:\n$plan")
    assert(plan.split("Exchange").length - 1 <= 2, // final plan + AQE-cached subplan ref
      s"q_dpo_pairs must shuffle once (one row per prompt):\n$plan")
    // partial aggregation must run before the exchange so the shuffle
    // carries one row per prompt, not one per candidate
    val beforeExchange = plan.substring(plan.indexOf("Exchange"))
    assert(beforeExchange.contains("SortAggregate") ||
      beforeExchange.contains("HashAggregate"),
      s"no map-side partial aggregate under the exchange:\n$plan")
  }

  test("q_sft_render: ONE conv-keyed exchange, no window sort, no join") {
    val df = SparkEntry.queries("q_sft_render")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"turn ordering must ride array_sort:\n$plan")
    assert(!plan.contains("Join"), s"q_sft_render must not join:\n$plan")
    assert(!plan.contains("rangepartitioning"), s"no global sort:\n$plan")
  }

  test("q_ev_auc: rank and tie windows share ONE group-keyed exchange, no join") {
    val df = SparkEntry.queries("q_ev_auc")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"q_ev_auc must not join:\n$plan")
    assert(!plan.contains("rangepartitioning"), s"no global sort:\n$plan")
    // the (grp, score) tie window's ClusteredDistribution is satisfied by
    // the rank window's hashpartitioning(grp) — a second exchange means
    // the windows stopped sharing the partitioning
    assert(plan.split("Exchange").length - 1 <= 2, // final plan + AQE subplan ref
      s"q_ev_auc must exchange once on the group key:\n$plan")
  }

  test("q_sm_topfrac: no join; the rank and count windows never range-shuffle") {
    val df = SparkEntry.queries("q_sm_topfrac")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"q_sm_topfrac must not join:\n$plan")
    assert(!plan.contains("rangepartitioning"), s"no global sort:\n$plan")
    assert(plan.split("Exchange").length - 1 <= 2,
      s"q_sm_topfrac must exchange once on the group key:\n$plan")
  }

  test("q_pf_embdrift: literal-centroid assignment — ZERO joins; only the two bounded per-cell count aggregates exchange") {
    val df = SparkEntry.queries("q_pf_embdrift")(spark, "/root/testdata/sf0.001")
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    val plan = full.split("== Initial Plan ==")(0)
    assert(!plan.contains("rangepartitioning"), s"no global sort:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"q_pf_embdrift must not cross:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"the corpus must never shuffle into a join — centroids are literals:\n$plan")
  }

  test("q_sa_ranks_global / q_sa_crossdoc: two-phase rank joins stay keyed/broadcast — no cartesian, no nested loop") {
    // rangepartitioning IS these operators' design (the skew-immune global
    // sort), so unlike q_sa_ranks it is NOT banned here — only unkeyed
    // quadratic shapes are
    for (name <- Seq("q_sa_ranks_global", "q_sa_crossdoc")) {
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"cartesian in $name:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"unkeyed nested-loop join in $name:\n$plan")
    }
  }

  test("q_proto_prune: centroid side broadcasts; cell-keyed window only — no cross, no global sort") {
    val df = SparkEntry.queries("q_proto_prune")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"centroids must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"driver cartesian in q_proto_prune:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"the corpus must never shuffle into the centroid join:\n$plan")
    assert(!plan.contains("rangepartitioning"), s"no global sort:\n$plan")
  }
}
