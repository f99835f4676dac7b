package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Functions.register(spark)
    // headline queries: the scale-relevant operators (flagship agg, keyed
    // joins, incremental diff, as-of, windows, dedup, ANN, text metrics) plus
    // the most composed core-loop paths: catalog merge, GS ready cascade,
    // iterative dup clustering, and the full corpus-curation pipeline
    val headline = Seq(
      "q_a1_traffic15", "q_j1_incr_diff", "q_j2_fact_dim", "q_j3_double_dim",
      "q_j5_left", "q_j7_asof_fwd", "q_a5_7day_avg", "q_a6_latest_per_user",
      "q_w1_first_seen", "q_dd_exact", "q_dd_lsh_pairs", "q_dd_simhash",
      "q_dd_clusters", "q_cr_keep", "q_tx_cdc", "q_pk_concat",
      "q_ann_brute", "q_tx_quality", "q_tx_fingerprint", "q_sc_recordid",
      "q_k2_upsert", "q_gs_ready", "q_rj_overlap", "q_bf_join",
      "q_hh_tokens", "q_rb_winsor", "q_k2_snapshot", "q_bpe_encode", "q_dd_spans",
      "q_sm_shuffle", "q_nb_predict", "q_ds_weights", "q_sd_keep",
      "q_dd_spans_sub", "q_ug_encode", "q_tx_kn_ppl", "q_cms_sketch",
      "q_ann_negatives_lsh", "q_fim", "q_tx_apss", "q_dd_editdist",
      "q_ts_grid", "q_cr_split",
      "q_kmv_sketch", "q_dv_checks", "q_vec_cov", "q_ts_ewma", "q_tx_nfc",
      "q_o8_grouptopk", "q_nb_chi2", "q_rb_corr", "q_pf_psi", "q_t5_spans",
      "q_ul2_mix",
      "q_sft_render", "q_sft_lossmask", "q_dpo_pairs", "q_dpo_advantage",
      "q_proto_prune", "q_pv_gate", "q_pk_mask", "q_pf_embdrift",
      "q_hll_estimate", "q_magg_rollup",
      "q_web_html", "q_url_parse", "q_url_domain", "q_bp_clean",
      "q_rrf_fuse", "q_tx_pmi", "q_kmv_jaccard", "q_bpe_roundtrip",
      "q_graph_pagerank", "q_tx_snippet", "q_sm_reweight",
      "q_ann_mmr", "q_ann_recall", "q_tx_qexp", "q_sa_ranks", "q_sa_lrs",
      "q_bl_skip", "q_tx_ppmi",
      "q_dd_oph_sig", "q_dd_oph_pairs", "q_tx_novelty", "q_sm_timesplit",
      "q_pf_quantiles", "q_sm_unimax_take", "q_ann_maxsim",
      "q_bt_strength", "q_tx_phrase", "q_tx_pii", "q_tx_tags",
      "q_dd_softweight", "q_ann_brute_batch",
      "q_pk_lenbucket", "q_pk_padwaste", "q_kappa", "q_ann_metrics",
      "q_ev_auc", "q_ev_ece", "q_ev_fleiss", "q_ev_wilson",
      "q_cl_flags", "q_sm_topfrac", "q_dd_calibration", "q_ann_ap",
      "q_ev_perm", "q_tx_sentchunks", "q_tx_fertility", "q_rb_trimmed",
      "q_cms_inner", "q_skew_report", "q_ev_f1", "q_ev_f1_macro", "q_ev_conformal",
      "q_sd_nmi", "q_ev_kripp", "q_ev_brier", "q_ev_cochran",
      "q_sa_ranks_global", "q_e2e_curate", "q_x_approx_distinct",
      "q_sa_crossdoc", "q_e2e_sft", "q_sa_crossdoc_spans", "q_sa_crossdoc_clean",
      "q_tx_zipf", "q_tx_heaps", "q_tx_jsd", "q_ann_kcenter",
      "q_lm_kn_artifact", "q_sft_toolcalls", "q_tx_langseg", "q_pk_shards",
      "q_mm_exif", "q_ev_passk", "q_ev_bleu", "q_ev_rougel", "q_ev_chrf",
      "q_ev_distinctn", "q_ann_bitext", "q_fmt_avro", "q_tx_pii_spans",
      "q_ev_ter",
      "q_ann_bitext_lsh", "q_sa_crossdoc_incr", "q_sc_geotile",
      "q_j12_tile_nn", "q_dv_delete", "q_dv_upsert", "q_ann_ivfadc",
      "q_dd_seqratio_pairs", "q_dc_exact_overlap", "q_dc_exact_clean",
      "q_lk_append", "q_sql_pushdown", "q_dd_seqratio_long",
      "q_sql_count", "q_st_mirror")
    // Each query runs once uncounted (JIT + janino codegen + parquet footer
    // reads — a long-lived cluster pays those once, and AQE picks different
    // physical plans per SF, so the warmup must happen AT the measured SF),
    // then several timed runs of which the MINIMUM is reported: the host is
    // shared, and min-of-N is the standard noise-robust statistic — a single
    // "run 2" can land on a neighbor's CPU burst and read 10x high.
    //
    // The timed runs are SWEEP-INTERLEAVED — pass 1 runs every query once,
    // then pass 2, then pass 3, and each query's minimum is taken ACROSS
    // passes — instead of back-to-back per query: consecutive per-query runs
    // all land inside the same host-contention window, so a sustained
    // neighbor burst used to defeat the min statistic for every query it
    // covered (the r10 driver bench read ~12 queries 3-6x high for exactly
    // this reason). With interleaving, a burst shorter than one full sweep
    // corrupts at most one of the three samples per query.
    val timedRuns = 3
    def attempt(name: String): Option[Double] =
      try {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        Some((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          System.err.println(s"bench: $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
          None
      }
    val warmed = headline.filter(name => attempt(name).isDefined)
    val sweeps: Seq[Map[String, Double]] =
      (1 to timedRuns).map { _ =>
        warmed.flatMap(name => attempt(name).map(name -> _)).toMap
      }
    val results = headline.map { name =>
      val timed = sweeps.flatMap(_.get(name))
      name -> (if (timed.size == timedRuns) Some(timed.min) else None)
    }
    val failed = results.collect { case (n, None) => n }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v.fold("null")(_.toString) }
      .mkString("{", ",", "}")
    // every per-sweep sample, in sweep order: `queries` stays the
    // noise-robust min, but publishing the raw samples lets a reader
    // adjudicate host contention from the artifact alone (one inflated
    // sample among three = a neighbor burst during that sweep; all three
    // high = a real regression) instead of needing a quiet-host re-run
    val samples = headline.map { name =>
      "\"" + name + "\":" +
        sweeps.flatMap(_.get(name)).map(_.toString).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"samples":$samples,"failed":$failedJson,"sf":"$sfDir"}"""
    // the adjudication essentials in ONE compact line, printed LAST: the
    // artifact keeps only the tail of this process's stdout, and the full
    // line above leads with `total`/`queries` — so the surviving fragment
    // used to carry ~40 sample entries and lose the headline numbers. The
    // summary (total + slowest-10 mins + failures) is what a reader needs
    // to adjudicate a round without reconstruction; the fragment of the
    // full line that still fits the tail window adds raw samples on top.
    val slowest = results.collect { case (n, Some(t)) => (n, t) }
      .sortBy(-_._2).take(10)
      .map { case (n, t) => "\"" + n + "\":" + t }.mkString("{", ",", "}")
    val summary =
      s"""{"metric":"total","value":$total,"unit":"sec","slowest":$slowest,"failed":$failedJson,"sf":"$sfDir"}"""
    println(line)
    println(summary)
    // sidecar with the raw per-sweep samples (the full `line` above): the
    // samples map triples the line length, and the driver's per-query
    // comparison has parsed nothing for three rounds — keep the bulky form
    // on disk for adjudication and keep stdout's FINAL line compact
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"bench: sidecar write failed: ${e.getMessage}") }
    spark.stop()
    // printed AGAIN after spark.stop(): executor-shutdown WARN chatter lands
    // between the prints and process exit, and a tail-reading harness can
    // otherwise lose the summary off the end of its capture window
    println(summary)
    // the VERY LAST stdout line is the driver contract — the complete
    // per-query minima in ONE compact JSON object (metric/value/unit/
    // queries/failed/sf, no samples), printed after spark.stop() so no
    // executor-shutdown chatter can land after it
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
  }
}
