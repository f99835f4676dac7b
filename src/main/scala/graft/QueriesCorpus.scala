package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{ConnectedComponents, Curate, Decontaminate, Dedup, LangModel, Multimodal, Pack, ProductQuantize, Quantize, RandomProjection, SimilaritySearch, TextAnalysis}

/** Training-data pipeline coverage over `documents` and `embeddings`:
  * deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
  * embedding cosine), similarity search (brute-force and LSH ANN), and text
  * analysis (language id, quality, tokens, fingerprints). All hashing is
  * md5-derived, so each query has an exact DuckDB oracle.
  */
object QueriesCorpus {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  // one history window-hash artifact per (session, sfDir): the incremental
  // rows measure the PROBE (the thing the incremental path exists for),
  // not a per-run rebuild of history indexing — and repeated bench sweeps
  // stop leaking a fresh artifact directory each run. Same discipline as
  // QueriesExtra's compactCache.
  private val xdocHistoryCache =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def xdocHistory(s: SparkSession, dir: String): String =
    xdocHistoryCache.getOrElseUpdate("xdoc|" + s.hashCode() + "|" + dir, {
      val path = java.nio.file.Files.createTempDirectory("graft_xdoc_q_").toString
      graft.ops.SuffixArray.saveCrossDocHashes(
        t(s, dir, "documents").filter(col("doc_id") % 3 =!= 0),
        "doc_id", "text", minLen = 30, path)
      path
    })

  // the decontamination benchmark artifact: doc_id % 3 == 0 plays the eval
  // suite (the INVERSE split of xdocHistory, so the two probes exercise
  // different directions), held only as its window-hash artifact
  private def dcBenchHashes(s: SparkSession, dir: String): String =
    xdocHistoryCache.getOrElseUpdate("dcbench|" + s.hashCode() + "|" + dir, {
      val path = java.nio.file.Files.createTempDirectory("graft_dcb_q_").toString
      graft.ops.SuffixArray.saveCrossDocHashes(
        t(s, dir, "documents").filter(col("doc_id") % 3 === 0),
        "doc_id", "text", minLen = 30, path)
      path
    })

  /** The BPE golden-oracle fixture corpus: nation ⋈ region names, ordered
    * by nation key. Both dimensions are fixed-cardinality (25 / 5 rows) and
    * byte-identical at every scale factor, so the golden merge/vocabulary
    * tables generated once by tools/gen_bpe_golden.py (an INDEPENDENT
    * Python implementation of the same Sennrich contract) hold at any
    * sfDir the driver chooses.
    */
  private def bpeFixtureCorpus(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .select(
        col("n_nationkey").as("doc_id"),
        concat(col("n_name"), lit(" "), col("r_name")).as("text"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup: hash-groupBy, one shuffle
    "q_dd_exact" -> ((s, dir) =>
      Dedup.exact(t(s, dir, "documents"), "doc_id", "text")),

    // cross-document repeated spans (Lee et al. exact-substring dedup at
    // 8-token-window grain): maximal duplicated token spans per doc
    "q_dd_spans" -> ((s, dir) =>
      Dedup.repeatedSpans(t(s, dir, "documents"), "doc_id", "text", windowTokens = 8)),

    // sub-window exact-substring spans: threshold-grain detection with a
    // content-verification pass — finds the 5..7-token cross-doc runs the
    // fixed 8-token indexing window above is structurally blind to (and
    // whole documents shorter than that window, which its explode skips)
    "q_dd_spans_sub" -> ((s, dir) =>
      Dedup.repeatedSpansExact(t(s, dir, "documents"), "doc_id", "text",
        minMatchTokens = 5)),

    // duplication coverage: per-doc duplicated-token ratio from the spans —
    // the "mostly boilerplate" curation gate signal
    "q_dd_span_cov" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.spanCoverage(docs,
        Dedup.repeatedSpans(docs, "doc_id", "text", windowTokens = 8),
        "doc_id", "text")
    }),

    // incremental spans: docs with id % 3 == 0 arrive as the new batch;
    // the rest are history (held as the persisted window-hash artifact).
    // history never reshuffles — only batch-pruned survivors move
    "q_dd_spans_incr" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val history = graft.ops.Dedup.windowRows(
        docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text", windowTokens = 8)
        .select("win_hash").distinct()
      graft.ops.Dedup.repeatedSpansAgainstHistory(
        docs.filter(col("doc_id") % 3 === 0), history,
        "doc_id", "text", windowTokens = 8)
    }),

    // the apply side: the corpus with every flagged span cut out (the
    // detect→cut composition, oracle-recomputed text for every doc)
    "q_dd_spans_clean" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.removeSpans(docs,
        Dedup.repeatedSpans(docs, "doc_id", "text", windowTokens = 8),
        "doc_id", "text")
    }),

    // MinHash signatures (4 permutations over 3-word shingles)
    "q_dd_minhash_sig" -> ((s, dir) =>
      Dedup.minhashSignatures(t(s, dir, "documents"), "doc_id", "text", numHashes = 4)),

    // MinHash-LSH candidate pairs (8 hashes, 2 bands of 4, 3-word shingles)
    "q_dd_lsh_pairs" -> ((s, dir) =>
      Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text",
        numHashes = 8, bands = 2)),

    // minhash calibration report: signature-estimated vs exact shingle-set
    // jaccard (+ absolute error) for every LSH candidate pair — the
    // is-k-big-enough measurement before a corpus-scale dedup commits
    "q_dd_calibration" -> ((s, dir) =>
      Dedup.minhashCalibration(t(s, dir, "documents"), "doc_id", "text",
        numHashes = 8, bands = 2)),

    // LSH parameter planner: the collision S-curve for every (bands, rows)
    // factorization of k=128 at five probed jaccard levels — powers as
    // left-associated multiply chains, never libm pow()
    "q_dd_lshplan" -> ((s, dir) =>
      Dedup.lshPlan(s, numHashes = 128,
        thresholds = Seq(0.3, 0.5, 0.7, 0.8, 0.9))),

    // one-permutation MinHash (k=8 buckets, rotation densification): ONE
    // hash per shingle and ZERO shuffles — the hash-once scale path of
    // q_dd_minhash_sig (plan-pinned as a pure projection)
    "q_dd_oph_sig" -> ((s, dir) =>
      Dedup.ophSignatures(t(s, dir, "documents"), "doc_id", "text", k = 8)),

    // OPH-LSH candidate pairs (2 bands of 4 densified slots — r=4 keeps
    // per-band collision at jaccard⁴; a first cut at 4 bands of 2 read
    // 58 s at sf0.1 from candidate explosion, the r-selectivity lesson)
    "q_dd_oph_pairs" -> ((s, dir) =>
      Dedup.ophLshPairs(t(s, dir, "documents"), "doc_id", "text", k = 8, bands = 2)),

    // n-gram novelty vs a reference corpus (even doc_ids are the trained
    // reference, odd doc_ids are scored): distinct-shingle membership via
    // ONE keyed left join — the upweight-unseen-content curation signal
    "q_tx_novelty" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.noveltyScore(
        docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text")
    }),

    // duplicate GROUPS: LSH pairs clustered by alternating-star connected
    // components — every doc labeled with its component's min id (singletons
    // label themselves); keep-one-per-cluster is `doc_id = cluster_id`
    "q_dd_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      ConnectedComponents.assign(
        docs.select(col("doc_id")), "doc_id",
        Dedup.minhashLshPairs(docs, "doc_id", "text", numHashes = 8, bands = 2),
        "id_a", "id_b")
    }),

    // soft dedup: weight 1/cluster_size instead of keep-one — repeated
    // content loses its n× gradient mass, per-cluster weights sum to 1
    "q_dd_softweight" -> ((s, dir) =>
      Dedup.softDedupWeights(t(s, dir, "documents"), "doc_id", "text",
        numHashes = 8, bands = 2)),

    // distributed suffix array (prefix doubling): per-doc suffix ranks —
    // the oracle sorts the suffixes DIRECTLY, so algorithm and check are
    // fully independent
    "q_sa_ranks" -> ((s, dir) =>
      graft.ops.SuffixArray.ranks(t(s, dir, "documents"), "doc_id", "text")),

    // corpus-grain suffix array: the SAME ranks via range-partitioned
    // global sorts + two-phase offset ranking — zero per-doc windows, so
    // a single giant document can never serialize a partition; same
    // fully-independent direct-sort oracle as q_sa_ranks
    "q_sa_ranks_global" -> ((s, dir) =>
      graft.ops.SuffixArray.ranksGlobal(t(s, dir, "documents"), "doc_id", "text")),

    // longest repeated substring per doc from adjacent-suffix LCPs, over
    // text with a guaranteed synthesized repeat of its own prefix; the
    // 48-char cap sits BELOW the synthesized 60-char repeat so the oracle
    // exercises both capped=true (long docs truncate) and capped=false
    // (short docs exhaust the shorter suffix before the cap)
    "q_sa_lrs" -> ((s, dir) =>
      graft.ops.SuffixArray.longestRepeat(
        t(s, dir, "documents").select(
          col("doc_id"),
          concat(substring(col("text"), 1, 120), lit(" "),
            substring(col("text"), 1, 60)).as("text")),
        "doc_id", "text", maxLcp = 48)),

    // cross-document exact-substring detection at the Lee-et-al grain:
    // per doc, the longest substring shared with ANY other document, via
    // adjacent cross-doc LCPs in CORPUS suffix order — n−1 adjacent pairs
    // replace all-pairs, so pair volume is linear no matter how much
    // duplication exists; the oracle sorts every suffix of every doc
    // directly and replays the adjacent compare
    "q_sa_crossdoc" -> ((s, dir) =>
      graft.ops.SuffixArray.crossDocRepeat(
        t(s, dir, "documents"), "doc_id", "text", maxLcp = 64)),

    // cross-document shared spans at character grain: the exact maximal
    // extents of every >= 30-char run shared across documents — the
    // apply-side offsets the detection above cannot provide (its adjacent
    // pairs aggregate positions away, and would be position-incomplete
    // anyway); two-pass hash-then-content-verify, so md5/xxhash collisions
    // can never flag an unshared span
    "q_sa_crossdoc_spans" -> ((s, dir) =>
      graft.ops.SuffixArray.crossDocSpans(
        t(s, dir, "documents"), "doc_id", "text", minLen = 30)),

    // the Lee-et-al loop closed at the corpus grain: detect cross-doc
    // shared character runs, then CUT them out of the raw text — docs with
    // no spans pass through byte-identical (the oracle re-stitches every
    // kept segment independently)
    "q_sa_crossdoc_clean" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ops.Dedup.removeCharSpans(
        docs.filter(col("doc_id").isNotNull),
        graft.ops.SuffixArray.crossDocSpans(docs, "doc_id", "text", minLen = 30),
        "doc_id", "text")
    }),

    // incremental cross-doc char spans: docs with id % 3 == 0 arrive as
    // the new batch; the rest are history, held ONLY as the persisted
    // window-hash artifact (saved, then probed through the artifact dir so
    // geometry comes from the sidecar). With disjoint ids this is exactly
    // the full-corpus crossDocSpans restricted to batch docs — which is
    // what the oracle computes, so the hash-equality proves the
    // batch-vs-history ≡ full-corpus contract end to end
    "q_sa_crossdoc_incr" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ops.SuffixArray.crossDocSpansAgainstHistoryDir(
        docs.filter(col("doc_id") % 3 === 0), xdocHistory(s, dir), "doc_id", "text")
    }),

    // the removal composition over the incremental detection: the batch
    // with every vs-history span cut out (detect-incrementally → cut)
    "q_sa_crossdoc_incr_clean" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val batch = docs.filter(col("doc_id") % 3 === 0 && col("doc_id").isNotNull)
      graft.ops.Dedup.removeCharSpans(
        batch,
        graft.ops.SuffixArray.crossDocSpansAgainstHistoryDir(
          batch, xdocHistory(s, dir), "doc_id", "text"),
        "doc_id", "text")
    }),

    // char-grain benchmark decontamination (Lee et al. exact-substring vs
    // a reference set): docs with id % 3 == 0 play the benchmark, held
    // ONLY as its window-hash artifact; spans of the REMAINING corpus that
    // reproduce any 30-char benchmark run. Corpus-internal repeats must
    // NOT flag — the oracle matches corpus windows against benchmark
    // windows alone
    "q_dc_exact_overlap" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ops.Decontaminate.exactSubstringOverlap(
        docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text",
        dcBenchHashes(s, dir))
    }),

    // the decontamination removal composition: the corpus with every
    // benchmark-contaminated span CUT out; clean docs pass byte-identical
    "q_dc_exact_clean" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ops.Decontaminate.exactSubstringClean(
        docs.filter(col("doc_id") % 3 =!= 0 && col("doc_id").isNotNull),
        "doc_id", "text", dcBenchHashes(s, dir))
    }),

    // integer-quantized PageRank over a deterministic md5-derived link
    // graph (3 out-edges per doc) — the iterated fixpoint itself is
    // oracle-replayed (all-integer update rule, unrolled CTEs in SQL)
    "q_graph_pagerank" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = docs.count()
      val edges = docs.select(
        col("doc_id").as("src"),
        explode(array((0 until 3).map(k =>
          Functions.md5Bits(
            concat(lit("pr:"), col("doc_id").cast("string"), lit(s":$k")), 60) % n): _*))
          .as("dst"))
      graft.ops.PageRank.run(edges, "src", "dst", iterations = 5)
    }),

    // one-pass table profile: per-column rows/nulls/distinct/min/max —
    // the dataset-health report, exact and fully oracle-checked
    "q_pf_describe" -> ((s, dir) =>
      graft.ops.Profile.describe(
        t(s, dir, "documents"), Seq("doc_id", "lang", "source", "n_chars"))),

    // Unicode script profile: per-block character counts + dominant script
    // (script detection before language id) — pure regexp projections
    "q_tx_script" -> ((s, dir) =>
      TextAnalysis.scriptProfile(t(s, dir, "documents"), "doc_id", "text")),

    // edit-distance similarity join: part names within levenshtein 3 —
    // length-banded candidates (keyed join, never a cross), built-in
    // levenshtein verify the oracle reproduces exactly
    "q_dd_editdist" -> ((s, dir) =>
      Dedup.editDistancePairs(
        t(s, dir, "part").filter(col("p_partkey") % 7 === 0),
        "p_partkey", "p_name", maxDist = 3)),

    // ratio-threshold similarity join (the J10 fuzzy argmax at corpus
    // scale): length-banded candidates (keyed join, never a cross) with a
    // lev-ratio verify the oracle replays exactly — the seq_ratio variant
    // of the same banding is spec-pinned banded ≡ cross against difflib
    "q_dd_seqratio_pairs" -> ((s, dir) =>
      Dedup.seqRatioPairs(
        t(s, dir, "part").filter(col("p_partkey") % 7 === 0),
        "p_partkey", "p_name", threshold = 0.75, sim = "lev_ratio")
        .select(col("id_a"), col("id_b"),
          Functions.roundHalfUp(col("ratio"), 6).as("ratio"))),

    // the document-grain form: geometric length buckets (2 band rows per
    // string instead of ≈(1−frac)·len) with the exact length lemma as a
    // join predicate — same pairs, bounded banded bytes (ScaleProbe
    // seqratio_long: 0.04× of per-length banding on 10 k-char docs)
    "q_dd_seqratio_long" -> ((s, dir) =>
      Dedup.seqRatioPairsLong(
        t(s, dir, "part").filter(col("p_partkey") % 7 === 0),
        "p_partkey", "p_name", threshold = 0.7, sim = "lev_ratio")
        .select(col("id_a"), col("id_b"),
          Functions.roundHalfUp(col("ratio"), 6).as("ratio"))),

    // sparse tf-idf cosine pairs (APSS): lexical similarity join over the
    // df-capped vocabulary (cap = N/10 — the stopword guard is the scale
    // configuration), integer-exact weights so every cosine oracles
    "q_tx_apss" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = docs.count()
      TextAnalysis.tfidfCosinePairs(docs, "doc_id", "text",
        totalDocs = n, threshold = 0.5, maxDocFreq = n / 10)
    }),

    // leakage-safe split: near-dup clusters (LSH pairs + star contraction)
    // move to train/val/test as units — the split key is the cluster id
    "q_cr_split" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Curate.leakageSafeSplit(
        docs.select(col("doc_id")), "doc_id",
        Dedup.minhashLshPairs(docs, "doc_id", "text", numHashes = 8, bands = 2),
        "id_a", "id_b",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "cluster_id", "split")
    }),

    // SimHash 16-bit fingerprints
    "q_dd_simhash" -> ((s, dir) =>
      Dedup.simhash(t(s, dir, "documents"), "doc_id", "text", bits = 16)),

    // SimHash near-dup pairs within Hamming radius 2 via pigeonhole banding
    "q_dd_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text",
        bits = 32, maxHamming = 2)),

    // shifted-duplicate pairs: docs sharing >= 2 content-defined chunk
    // hashes (survives insertions/deletions that break fixed-stride hashes)
    "q_dd_cdc_pairs" -> ((s, dir) =>
      Dedup.cdcChunkPairs(t(s, dir, "documents"), "doc_id", "text",
        window = 4, avgTokens = 16, minShared = 2)),

    // blocked n-gram Jaccard near-dup pairs (same lang + length bucket)
    "q_dd_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(
        t(s, dir, "documents"), "doc_id", "text",
        blockCols = Seq(col("lang"), (col("n_chars") / 100).cast("long")),
        n = 2, threshold = 0.2)),

    // near-containment pairs (subset duplicates Jaccard misses)
    "q_dd_containment" -> ((s, dir) =>
      Dedup.ngramContainmentPairs(
        t(s, dir, "documents"), "doc_id", "text",
        blockCols = Seq(col("lang"), (col("n_chars") / 100).cast("long")),
        n = 2, threshold = 0.5)),

    // embedding cosine near-dup pairs within label blocks
    "q_dd_cos_pairs" -> ((s, dir) =>
      Dedup.embeddingNearDupPairs(
        t(s, dir, "embeddings"), "vec_id", "embedding", "label", threshold = 0.30)),

    // exact brute-force cosine top-k against the vec_id=0 query vector
    // late-interaction max-sim retrieval (ColBERT): docs carry 4 vectors
    // each (vec_id div 4), a 3-vector query scores each doc as the sum of
    // per-query best matches — query vectors enter as plan-time literals,
    // ONE keyed aggregate, TakeOrdered top-k
    "q_ann_maxsim" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qvs: Seq[Seq[Double]] = emb.filter(col("vec_id") < 3).orderBy("vec_id")
        .select(col("embedding").cast("array<double>"))
        .collect().toSeq.map(_.getSeq[Double](0).toList)
      val docs = emb.filter(col("vec_id") >= 100)
        .select((col("vec_id") / 4).cast("long").as("doc_id"), col("embedding"))
      SimilaritySearch.maxSimTopK(docs, "doc_id", "embedding", qvs, k = 10)
    }),

    // batched multi-query exact top-k (the recall-sweep shape): 5 query
    // vectors share ONE corpus scan; per-query winners via the grouped
    // bounded-heap path — the corpus is never sorted
    "q_ann_brute_batch" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      SimilaritySearch.bruteForceTopKBatch(
        emb.filter(col("vec_id") >= 5), "vec_id", "embedding",
        emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
    }),

    // retrieval-quality metrics over the batched run: graded qrels from
    // label agreement (2 for even-id matches, 1 for odd), per-query
    // precision/recall/MRR/NDCG@10 — the recall-sweep measurement half
    "q_ann_metrics" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val runs = SimilaritySearch.bruteForceTopKBatch(
        emb.filter(col("vec_id") >= 5), "vec_id", "embedding",
        emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
        .withColumnRenamed("vec_id", "doc_id")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("label").as("_ql"))
      val qrels = emb.filter(col("vec_id") >= 5)
        .select(col("vec_id").as("doc_id"), col("label"))
        .join(broadcast(q), col("label") === col("_ql"))
        .select(col("qid"), col("doc_id"),
          (lit(1L) + col("doc_id") % 2).as("rel"))
      graft.ops.RankEval.metricsAtK(
        runs, "query_id", "doc_id", "cos",
        qrels, "qid", "doc_id", "rel", k = 10)
    }),

    // average precision over the same judged run: per-precision terms
    // nano-quantized before the order-free per-query sum (TREC AP)
    "q_ann_ap" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val runs = SimilaritySearch.bruteForceTopKBatch(
        emb.filter(col("vec_id") >= 5), "vec_id", "embedding",
        emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
        .withColumnRenamed("vec_id", "doc_id")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("label").as("_ql"))
      val qrels = emb.filter(col("vec_id") >= 5)
        .select(col("vec_id").as("doc_id"), col("label"))
        .join(broadcast(q), col("label") === col("_ql"))
        .select(col("qid"), col("doc_id"),
          (lit(1L) + col("doc_id") % 2).as("rel"))
      graft.ops.RankEval.averagePrecisionAtK(
        runs, "query_id", "doc_id", "cos",
        qrels, "qid", "doc_id", "rel", k = 10)
    }),

    "q_ann_brute" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>").as("qv"))
      emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(
          col("vec_id"),
          Functions.roundHalfUp(
            SimilaritySearch.cosine(col("embedding").cast("array<double>"), col("qv")), 6)
            .as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(20)
    }),

    // LSH-bucketed ANN: vectors per md5-hyperplane bucket (the scale path;
    // the bucket assignment is the verifiable part — deterministic join key)
    "q_ann_lsh_buckets" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      // one-row driver read of the embedding dimensionality (bounded); the
      // hyperplanes become plan-time literals
      val dims = emb.select(size(col("embedding"))).head().getInt(0)
      emb.select(
        col("vec_id"),
        SimilaritySearch.lshBucket(col("embedding").cast("array<double>"), planes = 6, dims = dims)
          .as("bucket"))
    }),

    // mean pooling: per-label element-wise mean embedding (the chunk→doc
    // reduction), decimal-exact sums — exploded (group, dim, m) so the
    // oracle checks every component
    "q_vec_meanpool" -> ((s, dir) =>
      graft.ops.VectorOps.meanPool(t(s, dir, "embeddings"), "label", "embedding")
        .select(col("group"), posexplode(col("vec")))
        .select(col("group"), col("pos").cast("long").as("dim"),
          graft.Functions.roundHalfUp(col("col"), 6).as("m"))),

    // PCA step 1 — the corpus-scale pass: exact covariance cells from ONE
    // aggregate (shuffle ≤ d(d+1)/2 rows total); the driver-side eigen step
    // is spec-bounded like IVF's Lloyd loop
    "q_vec_cov" -> ((s, dir) =>
      graft.ops.Pca.covariance(t(s, dir, "embeddings"), "embedding", dims = 64)
        .select(col("i"), col("j"), graft.Functions.roundHalfUp(col("cov"), 9).as("cov"))),

    // Matryoshka truncation: first-4-dims slice re-normalized (Kusupati et
    // al. 2022) — exploded components, rounded 6
    "q_vec_matryoshka" -> ((s, dir) =>
      graft.ops.VectorOps.matryoshka(t(s, dir, "embeddings"), "embedding", dims = 4)
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), (col("pos") + 1).cast("long").as("dim"),
          graft.Functions.roundHalfUp(col("col"), 6).as("val"))),

    // exact hard-negative mining: top-5 most-similar OTHER-label vectors
    // per anchor — contrastive-training data prep; quadratic exact
    // baseline (the q_ann_brute role) for the LSH-bucketed scale path
    "q_ann_negatives" -> ((s, dir) =>
      SimilaritySearch.hardNegatives(
        t(s, dir, "embeddings"), "vec_id", "embedding", "label", k = 5)),

    // margin-based bitext mining (Artetxe & Schwenk / CCMatrix): label-0
    // vectors as the "source language", label-1 as the "target"; k=4
    // neighborhood ratio margin, mutual-best intersection, threshold 1.15.
    // All cosine arithmetic quantized to integer micro-units, so both
    // neighborhood sums are exact LONGs and the margin is one division —
    // the full mining pipeline replays in SQL
    "q_ann_bitext" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      SimilaritySearch.marginMine(
        emb.filter(col("label") === 0), "vec_id", "embedding",
        emb.filter(col("label") === 1), "vec_id", "embedding",
        k = 4, threshold = 1.15, mutual = true)
    }),

    // LSH-bucketed margin mining — the CCMatrix-scale path of q_ann_bitext:
    // candidates are same-bucket pairs under 3 md5 hyperplanes (a keyed
    // equi-join, never a cross), and the margin's neighborhood sums are
    // computed WITHIN the candidate set (what a FAISS-sharded pipeline
    // sees). Deterministic geometry ⇒ the whole approximate path replays
    // in SQL — a full oracle, not a rows-only check
    "q_ann_bitext_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val dims = emb.select(size(col("embedding"))).head().getInt(0)
      SimilaritySearch.marginMineLsh(
        emb.filter(col("label") === 0), "vec_id", "embedding",
        emb.filter(col("label") === 1), "vec_id", "embedding",
        k = 4, threshold = 1.0, planes = 3, dims = dims, mutual = true)
    }),

    // LSH-bucketed hard negatives: candidates keyed on the md5-hyperplane
    // bucket — deterministic geometry makes even the approximate path
    // fully oracle-checkable
    "q_ann_negatives_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val dims = emb.select(size(col("embedding"))).head().getInt(0)
      SimilaritySearch.hardNegativesLsh(
        emb, "vec_id", "embedding", "label", k = 5, planes = 4, dims = dims)
    }),

    // product quantization codes: md5-sample codebooks (m=4 subspaces,
    // k=8 codewords), every vector encoded to its nearest codeword per
    // subspace on the rounded-distance grid — exploded (vec_id, subspace,
    // code) so the oracle recomputes the argmin directly
    "q_pq_encode" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cb = ProductQuantize.fit(emb, "vec_id", "embedding", m = 4, k = 8)
      emb.select(
          col("vec_id"),
          posexplode(ProductQuantize.encode(col("embedding").cast("array<double>"), cb)))
        .select(
          col("vec_id"), col("pos").cast("long").as("subspace"),
          col("col").cast("long").as("code"))
    }),

    // ADC top-10 against the vec_id=0 query: approximate distance is m
    // table lookups per candidate against the plan-time literal ADC table
    "q_pq_adc" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cb = ProductQuantize.fit(emb, "vec_id", "embedding", m = 4, k = 8)
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
      ProductQuantize.adcTopK(
        emb.filter(col("vec_id") =!= 0), "vec_id", "embedding", cb, q, topK = 10)
    }),

    // JL random projection 64 → 16 dims with a plan-time ±1 sign matrix;
    // exploded (vec_id, out_dim, val) so the oracle needs no array assembly
    "q_rp_project" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val dims = emb.select(size(col("embedding"))).head().getInt(0)
      RandomProjection.project(emb, "vec_id", "embedding", outDims = 16, dims = dims)
        .select(col("vec_id"), posexplode(col("projected")))
        .select(
          col("vec_id"), col("pos").cast("long").as("out_dim"),
          Functions.roundHalfUp(col("col"), 6).as("val"))
    }),

    // int8 scalar quantization of the embedding corpus: per-dimension
    // min-max bounds fit on the data (dims-row driver collect, the IVF
    // centroid contract), quantize + dequantize against literal bounds;
    // exploded (vec_id, pos, q, deq) form so the oracle needs no array
    // assembly
    "q_eq_quantize" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val (lo, hi) = Quantize.fitBounds(emb, "embedding")
      val qv = Quantize.quantize(col("embedding"), lo, hi)
      val dq = Quantize.dequantize(qv, lo, hi)
      emb.select(
          col("vec_id"),
          posexplode(zip_with(qv, dq, (a, b) => struct(a.as("q"), b.as("d")))))
        .select(
          col("vec_id"), col("pos").cast("long").as("pos"),
          col("col.q").cast("long").as("q"),
          Functions.roundHalfUp(col("col.d"), 6).as("deq"))
    }),

    // language-id heuristic (default marker table)
    "q_tx_langid" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), TextAnalysis.langId(col("text")).as("lang_guess"))),

    // language-id with a caller-supplied marker table (the pluggable path:
    // production swaps in real per-language frequency tables); the oracle is
    // generated from the SAME table, so the parameterization is verified
    "q_tx_langid_custom" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextAnalysis.langId(col("text"), CustomLangMarkers).as("lang_guess"))),

    // per-line language segmentation: polyglot docs split into contiguous
    // same-language line runs (line-grain langId + island merge)
    "q_tx_langseg" -> ((s, dir) =>
      TextAnalysis.langSegments(t(s, dir, "documents"), "doc_id", "text")),

    // quality metrics
    "q_tx_quality" -> ((s, dir) =>
      TextAnalysis.qualityMetrics(t(s, dir, "documents"), "doc_id", "text")),

    // token counting
    "q_tx_tokens" -> ((s, dir) =>
      TextAnalysis.tokenCounts(t(s, dir, "documents"), "doc_id", "text")),

    // tokenization economics: byte-BPE floor token count (bytes+1 per
    // word), tokens-per-word fertility, bytes-per-token compression
    "q_tx_fertility" -> ((s, dir) =>
      TextAnalysis.tokenizationStats(t(s, dir, "documents"), "doc_id", "text")),

    // sentence-aware RAG chunks: greedy-pack sentences to ≤64 tokens,
    // sentences never split, chunk concatenation restores the document.
    // The synthetic corpus has no punctuation, so the fixture synthesizes
    // a period after every 5th word IN BOTH ENGINES (the q_tx_pii
    // precedent) — multi-sentence docs actually exercise the packer
    "q_tx_sentchunks" -> ((s, dir) =>
      TextAnalysis.sentenceChunks(
        t(s, dir, "documents").withColumn("text",
          regexp_replace(col("text"), "(\\w+ \\w+ \\w+ \\w+ \\w+) ", "$1. ")),
        "doc_id", "text", maxTokens = 64)),

    // order-insensitive content fingerprint
    "q_tx_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))),

    // C4-style intra-document line dedup: repeated lines drop, first
    // occurrence and original order kept (synthesized multi-line text with
    // a guaranteed repeat of the first line)
    "q_tx_dedup_lines" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.dedupLines(
          concat_ws("\n",
            substring(col("text"), 1, 20), substring(col("text"), 21, 20),
            substring(col("text"), 1, 20), substring(col("text"), 41, 20)))
          .as("deduped"))),

    // PII/URL scrubbing over text with deterministically injected
    // emails/URLs (the raw corpus has none)
    "q_tx_scrub" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.scrub(concat(
          col("text"),
          when(col("doc_id") % 3 === 0, lit(" mail bob.smith+a@ex-ample.org end"))
            .otherwise(lit("")),
          when(col("doc_id") % 4 === 0, lit(" see https://example.com/a?b=1 done"))
            .otherwise(lit("")))).as("scrubbed"))),

    // Gopher-style repetition metrics over synthesized multi-line text with
    // a guaranteed repeated line (the corpus itself is single-line)
    "q_tx_repetition" -> ((s, dir) => {
      val lined = t(s, dir, "documents").select(
        col("doc_id"),
        concat_ws("\n",
          substring(col("text"), 1, 40), substring(col("text"), 41, 40),
          substring(col("text"), 1, 40), substring(col("text"), 81, 40)).as("ltext"))
      TextAnalysis.repetitionMetrics(lined, "doc_id", "ltext")
    }),

    // corpus-wide line dedup over synthesized multi-line text: a line shared
    // by EVERY doc survives only in the min-id doc; within-doc repeats and
    // per-doc prose exercise the (id, pos) first-occurrence order
    "q_tx_dedup_global" -> ((s, dir) => {
      val lined = t(s, dir, "documents").select(
        col("doc_id"),
        concat_ws("\n", lit("shared header"),
          substring(col("text"), 1, 40), substring(col("text"), 1, 40),
          substring(col("text"), 41, 40)).as("ltext"))
      TextAnalysis.dedupLinesGlobal(lined, "doc_id", "ltext")
    }),

    // training-sample chunking: 40-token sliding windows, 8-token overlap
    "q_tx_chunks" -> ((s, dir) =>
      TextAnalysis.chunkTokenWindows(
        t(s, dir, "documents"), "doc_id", "text", chunkTokens = 40, overlapTokens = 8)),

    // content-defined chunking: md5-windowed cut points (window 4, ~16-token
    // expected chunks) — shift-resistant chunk boundaries for dedup
    "q_tx_cdc" -> ((s, dir) =>
      TextAnalysis.chunkContentDefined(
        t(s, dir, "documents"), "doc_id", "text", window = 4, avgTokens = 16)),

    // incremental exact dedup of a new batch against history: the batch is
    // synthesized from the corpus (1/3 true re-ingests under new ids, 1/3
    // genuinely novel suffixed texts) so both outcomes are exercised; the
    // history side is only ever semi-filtered against the broadcast batch
    // hashes, never shuffled
    "q_dd_incr" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val reingest = docs.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
      val fresh = docs.filter(col("doc_id") % 3 === 1)
        .select((col("doc_id") + 2000000).as("doc_id"),
          concat(col("text"), lit(" zz"), col("doc_id").cast("string")).as("text"))
      Dedup.newAgainstHistory(reingest.unionAll(fresh), docs, "doc_id", "text")
    }),

    // sequence packing, GPT-style concat-and-chunk: 128-token sequences per
    // md5 shard, boundary-crossing docs split across sequences
    "q_pk_concat" -> ((s, dir) =>
      Pack.packConcat(t(s, dir, "documents"), "doc_id", "text",
        budget = 128, numShards = 8)),

    // loss-mask propagation through packing: a parallel per-token boolean
    // array (mask[i] = i % 3 == 0, SQL-recomputable) rides the identical
    // chunk arithmetic; the oracle rebuilds each segment's mask bits from
    // the [s, e) indices alone, so any slice misalignment hash-fails
    "q_pk_mask" -> ((s, dir) => {
      val toks = split(trim(lower(col("text"))), "\\s+")
      val prepared = t(s, dir, "documents")
        .select(col("doc_id"), toks.as("ids"),
          // NULL text → NULL ids; the mask must be NULL too (both sides of
          // the length guard null) so the row drops instead of raising
          when(toks.isNotNull,
            transform(sequence(lit(0), size(toks) - 1), i => i % 3 === 0))
            .as("mask"))
      Pack.packTokenIdsWithMask(prepared, "doc_id", "ids", "mask",
          budget = 128, numShards = 8)
        .select(col("shard"), col("seq_idx"), col("doc_id"), col("seq_offset"),
          col("seg_tokens"),
          array_join(transform(col("seg_mask"),
            b => when(b, "1").otherwise("0")), "").as("seg_mask_bits"))
    }),

    // sequence packing, greedy next-fit (no splitting): per-shard sequential
    // fold over md5-ordered (id, tokens) triples
    "q_pk_greedy" -> ((s, dir) =>
      Pack.packGreedy(t(s, dir, "documents"), "doc_id", "text",
        budget = 128, numShards = 8)),

    // length-bucketed batch assembly (the padded-batch layout SFT needs):
    // fixed integer edges, md5-ordered fill within bucket, batches of 8
    "q_pk_lenbucket" -> ((s, dir) =>
      Pack.lengthBucketBatches(t(s, dir, "documents"), "doc_id", "text",
        edges = Seq(16L, 32L, 64L, 128L, 1024L), batchSize = 8)),

    // padding-efficiency report over the same assignment: per-batch max
    // length, actual vs padded tokens, waste fraction
    "q_pk_padwaste" -> ((s, dir) =>
      Pack.paddingWaste(
        Pack.lengthBucketBatches(t(s, dir, "documents"), "doc_id", "text",
          edges = Seq(16L, 32L, 64L, 128L, 1024L), batchSize = 8))),

    // size-balanced export sharding: boustrophedon assignment over the
    // global (size DESC, id) order — near-equal shard byte totals for
    // WebDataset-style tar export (md5 sharding balances counts only)
    "q_pk_shards" -> ((s, dir) =>
      Pack.shardBySize(
        t(s, dir, "documents")
          .select(col("doc_id"), length(col("text")).cast("long").as("n_chars")),
        "doc_id", "n_chars", numShards = 16)),

    // the per-shard balance rollup an export job gates on
    "q_pk_shard_report" -> ((s, dir) =>
      Pack.shardReport(
        Pack.shardBySize(
          t(s, dir, "documents")
            .select(col("doc_id"), length(col("text")).cast("long").as("n_chars")),
          "doc_id", "n_chars", numShards = 16),
        "n_chars")),

    // token-id packing: BPE byte-level encode (zero merges → per-word
    // token count = UTF-8 bytes + 1, SQL-recomputable) through the
    // concat-and-chunk layout; the oracle checks the full segment
    // arithmetic, the ids themselves are conservation-checked in PackSpec
    "q_pk_ids" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val noMerges = graft.ops.Bpe.learn(docs, "text", numMerges = 0, byteLevel = true)
      val vocab = graft.ops.Bpe.vocabulary(docs, "text", noMerges, byteLevel = true)
      Pack.packTokenIds(
          graft.ops.Bpe.encodeIds(docs, "doc_id", "text", noMerges, vocab, byteLevel = true),
          "doc_id", "token_ids", budget = 128, numShards = 8)
        .select("shard", "seq_idx", "doc_id", "seq_offset", "seg_tokens")
    }),

    // duplicate-cluster representative: keep each near-dup cluster's
    // highest-quality member instead of its minimum id
    "q_dd_representative" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val clusters = ConnectedComponents.assign(
        docs.select(col("doc_id")), "doc_id",
        Dedup.minhashLshPairs(docs, "doc_id", "text", numHashes = 8, bands = 2),
        "id_a", "id_b")
      val scored = clusters.join(
        TextAnalysis.qualityMetrics(docs, "doc_id", "text")
          .select(col("doc_id"), col("quality_score")),
        Seq("doc_id"))
      Curate.representatives(scored, "doc_id", "cluster_id", "quality_score")
    }),

    // per-(doc, token) TF-IDF weights
    "q_tx_tfidf" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.tfidf(docs, "doc_id", "text", totalDocs = docs.count())
    }),

    // conjunctive boolean retrieval: docs containing ALL three query tokens
    "q_tx_search" -> ((s, dir) =>
      TextAnalysis.booleanSearch(t(s, dir, "documents"), "doc_id", "text",
        queryTokens = Seq("scan", "join", "window"))),

    // exact phrase retrieval ("hash join" adjacency): per-row array filter
    // over token positions, zero shuffle — the adjacency predicate the
    // conjunctive search above cannot express
    "q_tx_phrase" -> ((s, dir) =>
      TextAnalysis.phraseSearch(t(s, dir, "documents"), "doc_id", "text",
        phrase = Seq("hash", "join"))),

    // PII audit over carrier text synthesized from doc fields in BOTH
    // engines (the q_web_html precedent — the raw corpus is PII-free, so
    // the patterns must be exercised by construction): per-pattern counts
    // + release flag, pure per-row regexp_count projection
    "q_tx_pii" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val carrier = when(col("doc_id") % 3 === 0, col("text"))
        .otherwise(concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com http://site"),
          col("doc_id") % 7, lit(".org 10.0."), col("doc_id") % 256, lit(".1")))
      TextAnalysis.piiAudit(
        docs.select(col("doc_id"), carrier.as("text")), "doc_id", "text")
    }),

    // span-level PII audit through the REAL regex engine (codegen'd
    // RegexSpans) against the same constructed carrier, whose match
    // OFFSETS have a closed form the oracle states directly (the
    // q_ev_rougel trick — corpus is pure ASCII, so code-point and UTF-16
    // offsets coincide): hash-exact means Java's Matcher agrees with the
    // arithmetic on every document
    "q_tx_pii_spans" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val carrier = when(col("doc_id") % 3 === 0, col("text"))
        .otherwise(concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com http://site"),
          col("doc_id") % 7, lit(".org 10.0."), col("doc_id") % 256, lit(".1")))
      TextAnalysis.piiSpans(
        docs.select(col("doc_id"), carrier.as("text")), "doc_id", "text")
    }),

    // dictionary keyword tagging: (doc, term) rows for an 8-term topic
    // dictionary entering as one literal array — per-row intersect
    "q_tx_tags" -> ((s, dir) =>
      TextAnalysis.tagKeywords(t(s, dir, "documents"), "doc_id", "text",
        terms = Seq("join", "window", "stream", "vector",
          "hash", "sort", "customer", "quantum"))),

    // the same conjunctive search through a persisted inverted index
    // (build → save → load → search; answers must be identical, so the
    // oracle is the same SQL as q_tx_search)
    "q_tx_search_indexed" -> ((s, dir) => {
      val idx = TextAnalysis.buildTextIndex(t(s, dir, "documents"), "doc_id", "text",
        buckets = 64)
      val path = java.nio.file.Files.createTempDirectory("graft_tix_q_").toString
      TextAnalysis.saveTextIndex(idx, path)
      TextAnalysis.booleanSearchIndexed(
        TextAnalysis.loadTextIndex(s, path), "doc_id",
        queryTokens = Seq("scan", "join", "window"))
    }),

    // BM25 relevance of every doc to a 3-token query (Lucene idf)
    "q_tx_bm25" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.bm25(docs, "doc_id", "text",
        queryTokens = Seq("scan", "join", "window"), totalDocs = docs.count())
    }),

    // PMI collocations: adjacent-pair pointwise mutual information over
    // corpus bigram/unigram counts — pairs under the count floor drop
    "q_tx_pmi" -> ((s, dir) =>
      TextAnalysis.pmiCollocations(
        t(s, dir, "documents"), "doc_id", "text", minCount = 20L)),

    // windowed PPMI co-occurrence (window ±2): the count-based word
    // association matrix — lead-passes, no positions self-join
    "q_tx_ppmi" -> ((s, dir) =>
      TextAnalysis.ppmiCooccurrence(
        t(s, dir, "documents"), "doc_id", "text", window = 2, minCount = 40L)),

    // hit-context snippets: the 12-token window with the most query hits
    // per doc (earliest tie) — pure array expressions, zero shuffle
    "q_tx_snippet" -> ((s, dir) =>
      TextAnalysis.snippets(t(s, dir, "documents"), "doc_id", "text",
        queryTokens = Seq("scan", "join", "window"), windowTokens = 12)),

    // RM1-lite pseudo-relevance-feedback expansion: top terms of the
    // bm25 top-10 docs by exact pico-unit normalized term frequency
    "q_tx_qexp" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.expandQuery(docs, "doc_id", "text",
        queryTokens = Seq("scan", "join", "window"),
        totalDocs = docs.count(), fbDocs = 10, fbTerms = 8)
    }),

    // hybrid retrieval: BM25 lexical list fused with the embedding cosine
    // list by Reciprocal Rank Fusion — rank-only, calibration-free; both
    // candidate lists truncate to top-50 BEFORE fusion (the bounded part)
    "q_rrf_fuse" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val lex = TextAnalysis.bm25(docs, "doc_id", "text",
        queryTokens = Seq("scan", "join", "window"), totalDocs = docs.count())
      val emb = t(s, dir, "embeddings")
      val qv = emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>").as("qv"))
      val sem = emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qv))
        .select(
          col("vec_id").as("doc_id"),
          Functions.roundHalfUp(
            SimilaritySearch.cosine(col("embedding").cast("array<double>"), col("qv")),
            6).as("cos"))
      graft.ops.Fusion.rrf(
        Seq((lex, "bm25"), (sem, "cos")), "doc_id",
        kRrf = 60, perListTopN = 50, topK = 20)
    }),

    // bigram-LM perplexity: model fit on docs with doc_id % 5 != 0 (the
    // decontamination train split), every document scored against it —
    // the KenLM-style quality signal with exact-integer nano-nat sums
    "q_tx_perplexity" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 5 =!= 0)
      val vocab = TextAnalysis.vocabStats(train, "doc_id", "text").count()
      TextAnalysis.bigramPerplexity(
        train, "doc_id", "text", docs, "doc_id", "text",
        vocabSize = vocab, addK = 0.5)
    }),

    // trigram stupid-backoff LM scores against the same train split — the
    // web-scale backoff recipe (count tables + keyed joins, λ = 0.4)
    "q_tx_sb_ppl" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 5 =!= 0)
      val vocab = TextAnalysis.vocabStats(train, "doc_id", "text").count()
      TextAnalysis.stupidBackoffScore(
        train, "doc_id", "text", docs, "doc_id", "text", vocabSize = vocab)
    }),

    // interpolated Kneser-Ney bigram LM against the same train split —
    // the continuation-count smoothing KenLM/CCNet builds on (D = 0.75)
    "q_tx_kn_ppl" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 5 =!= 0)
      val vocab = TextAnalysis.vocabStats(train, "doc_id", "text").count()
      TextAnalysis.kneserNeyScore(
        train, "doc_id", "text", docs, "doc_id", "text", vocabSize = vocab)
    }),

    // persisted LM artifact, incremental path end-to-end: fit KN counts on
    // half the train split, SAVE, APPEND the other half as count deltas,
    // LOAD (delta fold), score the whole corpus with |V| derived from the
    // artifact itself. Counts are mergeable sums, so the oracle is the
    // plain union-trained KN replay — hash-exact means append ≡ rebuild.
    "q_lm_kn_artifact" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 5 =!= 0)
      val path = java.nio.file.Files.createTempDirectory("graft_lm_q_").toString
      LangModel.save(
        LangModel.fit(train.filter(col("doc_id") % 2 === 0), "doc_id", "text"), path)
      LangModel.append(s, path,
        train.filter(col("doc_id") % 2 =!= 0), "doc_id", "text")
      LangModel.scoreKneserNey(
        LangModel.load(s, path), docs, "doc_id", "text")
    }),

    // the same artifact serving the trigram stupid-backoff scorer — one
    // persisted count family behind the whole LM surface
    "q_lm_sb_artifact" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 5 =!= 0)
      val path = java.nio.file.Files.createTempDirectory("graft_lm_q_").toString
      LangModel.save(
        LangModel.fit(train.filter(col("doc_id") % 2 === 0), "doc_id", "text"), path)
      LangModel.append(s, path,
        train.filter(col("doc_id") % 2 =!= 0), "doc_id", "text")
      LangModel.scoreStupidBackoff(
        LangModel.load(s, path), docs, "doc_id", "text")
    }),

    // CCNet perplexity bucketing (Wenzek et al. 2020): per-language
    // head/middle/tail terciles over the stupid-backoff perplexity —
    // the exact ntile form the approx histogram path is oracled against
    "q_tx_ccnet" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 5 =!= 0)
      val vocab = TextAnalysis.vocabStats(train, "doc_id", "text").count()
      val scored = TextAnalysis.stupidBackoffScore(
        train, "doc_id", "text", docs, "doc_id", "text", vocabSize = vocab)
      TextAnalysis.perplexityBuckets(
          scored.join(docs.select("doc_id", "lang"), Seq("doc_id")),
          "doc_id", "lang", "sb_ppl")
        .select("doc_id", "lang", "sb_ppl", "ppl_bucket")
    }),

    // Gopher rule-based quality gate (Rae et al. 2021 A.1.1): published
    // thresholds over word count / mean word length / symbol / bullet /
    // ellipsis / alphabetic / required-stopword rules — every metric and
    // the AND-ed keep recomputed independently by the oracle
    "q_tx_gopher" -> ((s, dir) =>
      TextAnalysis.gopherRules(t(s, dir, "documents"), "doc_id", "text")),

    // C4 line-level cleaner (Raffel et al. 2020 §2.2): terminal-
    // punctuation line gate + lorem-ipsum/brace/sentence-count page gate
    "q_tx_c4" -> ((s, dir) =>
      TextAnalysis.c4Clean(t(s, dir, "documents"), "doc_id", "text")),

    // per-language top-20 tokens (grouped frequent items)
    "q_tx_top_tokens" -> ((s, dir) =>
      TextAnalysis.topTokensPerGroup(t(s, dir, "documents"), "lang", "doc_id", "text", k = 20)),

    // corpus vocabulary: global token tf/df, top 100 by frequency
    "q_tx_vocab" -> ((s, dir) =>
      TextAnalysis.vocabStats(t(s, dir, "documents"), "doc_id", "text", topK = 100)),

    // heavy hitters at bounded memory: tokens with frequency > 1/50 via
    // per-partition Misra-Gries + exact candidate recount — the result is
    // exact and partitioning-independent, which is what the oracle checks
    "q_hh_tokens" -> ((s, dir) =>
      graft.ops.HeavyHitters.frequentTokens(t(s, dir, "documents"), "text", k = 50)),

    // fill-in-the-middle transform (Bavarian et al. 2022): deterministic
    // character cuts + PSM/SPM sentinel serialization — every split point
    // and mode decision md5-derived, so the oracle rebuilds each output
    // string exactly
    "q_fim" -> ((s, dir) =>
      graft.ops.Fim.transform(t(s, dir, "documents"), "doc_id", "text")
        .select("doc_id", "format", "out_text")),

    // T5 span corruption (Raffel et al. 2020 §3.1.4): deterministic
    // block/span construction — offsets, sentinel numbering, and both
    // output strings all md5-derived, so the oracle rebuilds every
    // input/target pair exactly
    "q_t5_spans" -> ((s, dir) =>
      graft.ops.Fim.spanCorrupt(t(s, dir, "documents"), "doc_id", "text",
        blockTokens = 8, spanTokens = 3)),

    // Shannon character entropy — the compressibility quality signal;
    // per-char nano-nat terms summed as longs so the oracle is hash-exact
    "q_tx_entropy" -> ((s, dir) =>
      graft.ops.TextAnalysis.charEntropy(t(s, dir, "documents"), "doc_id", "text")),

    // Zipf's-law fit over the token frequency table: ln(tf) ~ ln(rank) OLS
    // through the distributed min-rank (no corpus-wide window); the slope
    // is the head-heaviness corpus-health signal
    "q_tx_zipf" -> ((s, dir) =>
      graft.ops.TextAnalysis.zipfFit(t(s, dir, "documents"), "doc_id", "text")),

    // Heaps'-law fit: vocabulary growth V(n) ~ K n^beta over docs in id
    // order — cumulative token/type prefix sums via the two-phase scan,
    // then the same nano-unit OLS
    "q_tx_heaps" -> ((s, dir) =>
      graft.ops.TextAnalysis.heapsLaw(t(s, dir, "documents"), "doc_id", "text")),

    // KL / Jensen-Shannon divergence between the 'en' slice and the rest —
    // vocabulary-grain drift between two corpora, Laplace-smoothed over the
    // union vocab, nano-nat term sums
    "q_tx_jsd" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      graft.ops.TextAnalysis.distributionDivergence(
        d.filter(col("lang") === "en"),
        d.filter(coalesce(col("lang"), lit("")) =!= "en"),
        "text")
    }),

    // UL2 mixture-of-denoisers: md5-routed R/X span corruption + S
    // continuation — the whole mixture (routing draw included) rebuilt in
    // SQL
    "q_ul2_mix" -> ((s, dir) =>
      graft.ops.Fim.ul2Mix(t(s, dir, "documents"), "doc_id", "text")),

    // Count-Min sketch: the whole counter table (≤ depth×width rows) — the
    // third bounded-memory counting primitive; md5 hashing makes every
    // counter value oracle-checkable exactly
    "q_cms_sketch" -> ((s, dir) =>
      graft.ops.CountMin.sketch(t(s, dir, "documents"), "text", depth = 3, width = 64)),

    // CMS point estimates for every distinct corpus token: min over hash
    // rows — the one-sided (over)estimate the sketch answers queries with
    "q_cms_estimate" -> ((s, dir) =>
      graft.ops.CountMin.estimateAll(t(s, dir, "documents"), "text", depth = 3, width = 64)),

    // CMS inner product: equi-join size estimate between the even- and
    // odd-doc token multisets from their sketches alone (AMS/CMS §4.2) —
    // the broadcast-vs-salt-vs-bucket planning number without a rescan
    "q_cms_inner" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ops.CountMin.innerProductEstimate(
        graft.ops.CountMin.sketch(
          docs.filter(col("doc_id") % 2 === 0), "text", depth = 3, width = 64),
        graft.ops.CountMin.sketch(
          docs.filter(col("doc_id") % 2 === 1), "text", depth = 3, width = 64),
        depth = 3)
    }),

    // χ² token–label association (feature selection for the classifier
    // family): one-vs-rest 2×2 document-frequency contingency per (token,
    // lang), exact integer counts, formula mirrored in DOUBLE
    "q_nb_chi2" -> ((s, dir) =>
      graft.ops.Classify.chiSquareTokens(t(s, dir, "documents"), "lang", "text", minDf = 5L)),

    // Unicode NFC canonicalization (codegen'd native expression): a
    // decomposed suffix is appended so composition provably happens —
    // é from e+U+0301, Ä from A+U+0308, with ﬁ (U+FB01) kept under NFC
    "q_tx_nfc" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        graft.ops.TextAnalysis.normalizeText(
          concat(col("text"), lit(" cafe\u0301 A\u0308 \uFB01n")), form = "NFC")
          .as("t_norm"))),

    // KMV bottom-k distinct sketch: per-language k smallest distinct token
    // hashes — like the in-house HLL (q_x_approx_distinct), every byte is
    // md5-derived, so the sketch itself is hash-exact against the oracle
    "q_kmv_sketch" -> ((s, dir) =>
      graft.ops.Kmv.sketchTokens(t(s, dir, "documents"), "lang", "text", k = 32)
        .select(col("lang"), col("pos").cast("long").as("pos"), col("h"))),

    // KMV distinct-count estimates: exact below k, (k−1)·2^60/h_k above —
    // the estimator arithmetic recomputed exactly by the oracle
    "q_kmv_estimate" -> ((s, dir) =>
      graft.ops.Kmv.estimate(
        graft.ops.Kmv.sketchTokens(t(s, dir, "documents"), "lang", "text", k = 32),
        "lang", k = 32)),

    // theta-sketch-style set algebra: per-language vocabulary overlap
    // between the two source halves from their KMV sketches alone —
    // union estimate, Jaccard, intersection estimate, all sketch-derived
    "q_kmv_jaccard" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val half = expr("CAST(substring(source, 4, 10) AS INT)")
      val a = graft.ops.Kmv.sketchTokens(
        docs.filter(half < 10), "lang", "text", k = 32)
      val b = graft.ops.Kmv.sketchTokens(
        docs.filter(half >= 10), "lang", "text", k = 32)
      graft.ops.Kmv.jaccardEstimate(a, b, "lang", k = 32)
    }),

    // BPE round-1 pair counts: frequency-weighted adjacent symbol pairs
    // over character-initial symbols + the end-of-word marker — the
    // oracle-checkable core every learning round re-aggregates
    "q_bpe_pairs" -> ((s, dir) =>
      graft.ops.Bpe.initialPairCounts(t(s, dir, "documents"), "text")),

    // byte-level round-1 pair counts: UTF-8 hex-block symbols (the GPT-2
    // closed-alphabet mode) — oracle checks the byte decomposition exactly
    "q_bpe_pairs_bytes" -> ((s, dir) =>
      graft.ops.Bpe.initialPairCounts(t(s, dir, "documents"), "text", byteLevel = true)),

    // BPE merge learning over the FIXTURE corpus (nation ⋈ region names —
    // byte-identical at every scale factor), 16 rounds: hash-exact against
    // a golden merge table produced by the independent Python reference
    // implementation in tools/gen_bpe_golden.py. DuckDB can't express the
    // iterative argmax, so the oracle is the checked-in golden itself.
    "q_bpe_merges" -> ((s, dir) =>
      graft.ops.Bpe.learn(bpeFixtureCorpus(s, dir), "text", numMerges = 16)),

    // the same learning loop in byte-level mode (UTF-8 hex-block symbols):
    // golden-checked like q_bpe_merges — the merge STRUCTURE must mirror
    // the char-level table exactly (same corpus, closed alphabet)
    "q_bpe_merges_bytes" -> ((s, dir) =>
      graft.ops.Bpe.learn(bpeFixtureCorpus(s, dir), "text", numMerges = 16,
        byteLevel = true)),

    // BPE encoding under the learned table: per-doc token count (zero
    // shuffle, broadcast ranks). Token identity is spec-checked (round
    // trip); counts are the scale-relevant output
    "q_bpe_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ops.Bpe.encode(docs, "doc_id", "text",
          graft.ops.Bpe.learn(docs, "text", numMerges = 12))
        .select("doc_id", "n_tokens")
    }),

    // encode→decode round trip over the whole corpus: BPE is lossless
    // above its normalization, so the decoded text must equal the
    // space-joined normalized tokens — an oracle the SQL side computes
    // from the RAW corpus without ever running the tokenizer
    "q_bpe_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ops.Bpe.decode(
        graft.ops.Bpe.encode(docs, "doc_id", "text",
          graft.ops.Bpe.learn(docs, "text", numMerges = 12)),
        "doc_id")
    }),

    // the ENCODE step itself against the golden: per-fixture-doc token
    // sequence (space-joined) and count under the 16 learned merges — the
    // greedy lowest-rank merge loop is now hash-exact end to end, not just
    // spec-bounded (the scale-path twin over `documents` is q_bpe_encode)
    "q_bpe_encode_gold" -> ((s, dir) => {
      val docs = bpeFixtureCorpus(s, dir)
      graft.ops.Bpe.encode(docs, "doc_id", "text",
          graft.ops.Bpe.learn(docs, "text", numMerges = 16))
        .select(col("doc_id"), concat_ws(" ", col("tokens")).as("token_str"),
          col("n_tokens"))
    }),

    // the dense token-id artifact (base code points + merge products at
    // |base|+rank) over the fixture corpus: hash-exact against the golden
    // vocabulary table (tools/gen_bpe_golden.py)
    "q_bpe_vocab" -> ((s, dir) => {
      val docs = bpeFixtureCorpus(s, dir)
      graft.ops.Bpe.vocabulary(docs, "text",
        graft.ops.Bpe.learn(docs, "text", numMerges = 16))
    }),

    // unigram-LM (SentencePiece) seed statistic: frequency-weighted
    // substring counts over the boundary-marked distinct words — exact
    // long arithmetic, reproduced in plain SQL by the oracle
    "q_ug_seed" -> ((s, dir) =>
      graft.ops.Unigram.seedCounts(t(s, dir, "documents"), "text")),

    // unigram EM learning over the FIXTURE corpus (the q_bpe_merges
    // corpus), hash-exact against the golden piece table produced by the
    // independent Python reference implementation in
    // tools/gen_unigram_golden.py. DuckDB can't express the EM/prune
    // loop, so the oracle is the checked-in golden itself. logp is
    // excluded (float text-form drift); piece SET + dense ids are the
    // contract — the logp-dependent behavior is gated by q_ug_encode_gold
    "q_ug_vocab" -> ((s, dir) =>
      graft.ops.Unigram.learn(bpeFixtureCorpus(s, dir), "text",
          vocabSize = 40, seedSize = 40)
        .select(col("piece"), col("piece_id"))),

    // the Viterbi ENCODE step under the learned vocabulary: per-fixture-doc
    // token sequence + count, hash-exact against the golden — gates the
    // learned probabilities end to end (segmentation argmax is logp-driven)
    "q_ug_encode_gold" -> ((s, dir) => {
      val docs = bpeFixtureCorpus(s, dir)
      graft.ops.Unigram.encode(docs, "doc_id", "text",
          graft.ops.Unigram.learn(docs, "text", vocabSize = 40, seedSize = 40))
        .select(col("doc_id"), concat_ws(" ", col("tokens")).as("token_str"),
          col("n_tokens"))
    }),

    // unigram encoding at corpus scale (zero-shuffle mapPartitions,
    // broadcast vocabulary): per-doc token count over `documents` — the
    // scale-path twin of q_ug_encode_gold (rows-only check, like
    // q_bpe_encode; token identity is golden- and spec-gated)
    "q_ug_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ops.Unigram.encode(docs, "doc_id", "text",
          graft.ops.Unigram.learn(docs, "text", vocabSize = 40, seedSize = 40))
        .select("doc_id", "n_tokens")
    }),

    // WordPiece learning over the FIXTURE corpus (BERT's tokenizer — the
    // third subword family next to BPE and Unigram): 16 likelihood-ratio
    // merges, hash-exact against the independent Python implementation in
    // tools/gen_wordpiece_golden.py. DuckDB can't express the iterative
    // argmax, so the oracle is the checked-in golden itself.
    "q_wp_merges" -> ((s, dir) =>
      graft.ops.WordPiece.learn(bpeFixtureCorpus(s, dir), "text", numMerges = 16)),

    // the dense token-id artifact (sorted base + [UNK], merge products at
    // |base|+rank) — golden-checked like q_bpe_vocab
    "q_wp_vocab" -> ((s, dir) => {
      val docs = bpeFixtureCorpus(s, dir)
      graft.ops.WordPiece.vocabulary(docs, "text",
        graft.ops.WordPiece.learn(docs, "text", numMerges = 16))
    }),

    // BERT greedy longest-match-first encoding under the learned
    // vocabulary, per-fixture-doc token sequence — hash-exact
    "q_wp_encode_gold" -> ((s, dir) => {
      val docs = bpeFixtureCorpus(s, dir)
      graft.ops.WordPiece.encode(docs, "doc_id", "text",
          graft.ops.WordPiece.vocabulary(docs, "text",
            graft.ops.WordPiece.learn(docs, "text", numMerges = 16)))
        .select(col("doc_id"), concat_ws(" ", col("tokens")).as("token_str"),
          col("n_tokens"))
    }),

    // corpus-scale encoding twin (zero-shuffle mapPartitions, broadcast
    // vocabulary) — rows-only like q_bpe_encode/q_ug_encode
    "q_wp_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ops.WordPiece.encode(docs, "doc_id", "text",
          graft.ops.WordPiece.vocabulary(docs, "text",
            graft.ops.WordPiece.learn(docs, "text", numMerges = 12)))
        .select("doc_id", "n_tokens")
    }),

    // logistic-regression quality classifier (the GPT-3/LLaMA
    // "reference-like pages" filter, Classify's discriminative sibling):
    // full-batch GD over hashed-bigram counts on the FIXTURE corpus,
    // hash-exact against the independent Python implementation in
    // tools/gen_lr_golden.py (weights in micro-units so the oracle's
    // k/1e6 is the same IEEE double as roundHalfUp(w, 6))
    "q_lr_model" -> ((s, dir) => {
      val docs = bpeFixtureCorpus(s, dir)
        .withColumn("label", (col("doc_id") % 2).cast("int"))
      graft.ops.Logistic.lrFit(docs, "label", "text",
          n = 2, buckets = 64, iters = 40, step = 0.5, l2 = 1e-3)
        .weights.select(col("bucket"),
          Functions.roundHalfUp(col("weight"), 6).as("weight"))
    }),

    // hard decisions under the model above — margin-sign, never the
    // rounded score, so the class can't flip between engines
    "q_lr_predict" -> ((s, dir) => {
      val docs = bpeFixtureCorpus(s, dir)
      val model = graft.ops.Logistic.lrFit(
        docs.withColumn("label", (col("doc_id") % 2).cast("int")),
        "label", "text", n = 2, buckets = 64, iters = 40, step = 0.5, l2 = 1e-3)
      graft.ops.Logistic.lrPredict(docs, "doc_id", "text", model)
    }),

    // the corpus-scale path: train on the documents table's language
    // label and score every doc (one GD job per iteration, map-side-
    // combinable bucket gradient — rows-only check like q_bpe_encode;
    // the learning loop itself is golden-gated by q_lr_model)
    "q_lr_quality" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("label", when(col("lang") === "en", 1).otherwise(0))
      val model = graft.ops.Logistic.lrFit(docs, "label", "text",
        n = 2, buckets = 64, iters = 10)
      graft.ops.Logistic.lrPredict(docs, "doc_id", "text", model)
    }),

    // one-row corpus health report: the snapshot summary a curation
    // pipeline publishes — doc/dup/quality/token counts, all exact
    // integers, every stage recomputed independently in the oracle
    "q_corpus_report" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val exact = Dedup.exact(docs, "doc_id", "text")
      val clusters = ConnectedComponents.assign(
        docs.select(col("doc_id")), "doc_id",
        Dedup.minhashLshPairs(docs, "doc_id", "text", numHashes = 8, bands = 2),
        "id_a", "id_b")
      val quality = TextAnalysis.qualityMetrics(docs, "doc_id", "text")
      docs.agg(count(lit(1)).as("total_docs"))
        .crossJoin(exact.agg(count(lit(1)).as("distinct_texts")))
        .crossJoin(clusters.filter(col("doc_id") =!= col("cluster_id"))
          .agg(count(lit(1)).as("near_dup_docs")))
        .crossJoin(quality.filter(col("quality_score") >= 0.5)
          .agg(count(lit(1)).as("quality_pass_docs")))
        .crossJoin(quality.agg(sum(col("word_count")).cast("long").as("total_tokens")))
        .withColumn("exact_dup_docs", col("total_docs") - col("distinct_texts"))
    }),

    // the COMPOSED curation pipeline (corpus twin of q_gs_ready): quality
    // gate + language gate + exact-dup canonical + near-dup cluster
    // canonical + deterministic sampling, per-doc flags ANDed into `keep`
    "q_cr_keep" -> ((s, dir) =>
      Curate.decide(
        t(s, dir, "documents"), "doc_id", "text",
        minQuality = 0.5, acceptLangs = Seq("en", "und"),
        sampleRate = 0.9, sampleSalt = "cr")),

    // the composed WEB-curation pipeline (FineWeb/RefinedWeb recipe):
    // Gopher rules ∧ C4 gates ∧ repetition caps ∧ exact-dup canonical,
    // every flag recomputed independently by the oracle
    "q_cr_web" -> ((s, dir) =>
      Curate.decideWeb(t(s, dir, "documents"), "doc_id", "text")),

    // THE end-to-end pretraining-curation composition — every stage is an
    // individually-oracled operator, chained as ONE plan the way a real
    // 100 TB run executes it: synthetic-HTML extract → web quality gates
    // (gopher ∧ c4 ∧ repetition ∧ exact-canonical) → LSH near-dup cluster
    // canonical → bigram decontamination against the eval slice →
    // temperature sampling over languages → pack with loss masks. The
    // oracle replays the WHOLE chain in SQL from the same raw rows.
    "q_e2e_curate" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id").isNotNull)
      // stage 1: extraction from a deterministic HTML carrier. The second
      // <p> block is prose "furniture" (stopwords + three real sentences)
      // — the synthetic corpus is keyword soup with no punctuation, so
      // without it the Gopher stopword clause and the C4 sentence gate
      // would reject EVERY document and the pipeline would be vacuous;
      // with it the gates discriminate on word count and repetition,
      // the realistic failure modes
      // explicit-count repartition BELOW the regex chain (the shingleRows
      // discipline): the localCheckpoint freezes its input partitioning,
      // and off a low-split scan the whole per-row extraction — and every
      // downstream stage reading the checkpoint — would run as ONE task
      val extracted = docs
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), col("lang"),
        graft.ops.WebExtract.htmlToText(concat(
          lit("<div><h1>Doc "), col("doc_id").cast("string"), lit("</h1><p>"),
          col("text"), lit(" &amp; tail</p><p>the size of this page will " +
            "be fine. we have that and more to be sure. it should do " +
            "with ease.</p><script>skip<this</script></div>")))
          .as("text"))
        // the regexp extraction chain feeds FOUR consumers (gates, LSH,
        // decontamination eval side, pack) and the eager star-contraction
        // re-triggers lineage per round — materialize it once
        .localCheckpoint()
      // stage 2: web gates (FineWeb/RefinedWeb recipe) — keep survivors
      val web = graft.ops.Curate.decideWeb(extracted, "doc_id", "text")
      val kept1 = extracted
        .join(web.filter(col("keep")).select("doc_id"), Seq("doc_id"))
        .localCheckpoint() // reused by LSH pairs, the canonical join, and stage 4+
      // stage 3: near-dup LSH clusters — keep each cluster's canonical
      val clusters = graft.ops.ConnectedComponents.assign(
        kept1.select(col("doc_id")), "doc_id",
        graft.ops.Dedup.minhashLshPairs(kept1, "doc_id", "text",
          numHashes = 8, bands = 2),
        "id_a", "id_b")
      // cross-action pin (the measured pin boundary): stage 5's
      // temperatureMix runs a driver collect over the survivor chain —
      // its own action — and the final query execution is another, so an
      // unpinned kept2 re-runs the canonical join (and the CC assembly
      // above it) once per action
      val kept2 = kept1.join(
        clusters.filter(col("doc_id") === col("cluster_id")).select("doc_id"),
        Seq("doc_id"))
        .localCheckpoint(false)
      // stage 4: decontaminate against the eval slice (doc_id % 10 = 0) —
      // the benchmark is probed AS PUBLISHED (raw text), not re-wrapped in
      // the extraction carrier: a train doc embedding the benchmark's
      // content still scores ~1 (its internal bigrams survive extraction),
      // while unrelated docs don't inherit spurious carrier bigrams
      val evalSet = docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), col("text"))
      // same cross-action rule: unpinned, the whole shingle-containment
      // decontamination pass re-runs for the mix collect AND the final
      // action. Slim distinct train ids — bounded materialization.
      val contaminated = graft.ops.Decontaminate.ngramOverlap(
        kept2, "doc_id", "text", evalSet, "doc_id", "text",
        n = 2, threshold = 0.3)
        .select(col("train_id").as("doc_id")).distinct()
        .localCheckpoint(false)
      val kept3 = kept2.join(contaminated, Seq("doc_id"), "left_anti")
      // stage 5: temperature mix over languages (α = 0.5)
      val kept4 = graft.ops.Sampling.temperatureMix(
        kept3, "lang", "doc_id", alpha = 0.5, salt = "e2e")
      // stage 6: pack with loss masks (the q_pk_mask contract)
      val toks = split(trim(lower(col("text"))), "\\s+")
      val prepared = kept4.select(col("doc_id"), toks.as("ids"),
        transform(sequence(lit(0), size(toks) - 1), i => i % 3 === 0).as("mask"))
      Pack.packTokenIdsWithMask(prepared, "doc_id", "ids", "mask",
          budget = 128, numShards = 8)
        .select(col("shard"), col("seq_idx"), col("doc_id"), col("seq_offset"),
          col("seg_tokens"),
          array_join(transform(col("seg_mask"),
            b => when(b, "1").otherwise("0")), "").as("seg_mask_bits"))
    }),

    // benchmark decontamination: eval = every 5th doc, train = the rest;
    // containment of the EVAL doc's bigram shingle set
    "q_dc_overlap" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Decontaminate.ngramOverlap(
        docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text",
        docs.filter(col("doc_id") % 5 === 0), "doc_id", "text",
        n = 2, threshold = 0.3)
    }),

    // incremental decontamination: same answer as q_dc_overlap through the
    // persisted bucket-partitioned shingle index (build once, probe each
    // new benchmark with partition pruning — the corpus never re-tokenizes)
    "q_dc_overlap_idx" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idx = Decontaminate.buildShingleIndex(
        docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text", n = 2, buckets = 16)
      val path = java.nio.file.Files.createTempDirectory("graft_shix_q_").toString
      Decontaminate.saveShingleIndex(idx, path)
      Decontaminate.ngramOverlapIndexed(
        Decontaminate.loadShingleIndex(s, path),
        docs.filter(col("doc_id") % 5 === 0), "doc_id", "text", threshold = 0.3)
    }),

    // multimodal plumbing: opaque binary payload + typed metadata through
    // the REAL batched mapPartitions decode path (graft.ops.Multimodal); the
    // decoder is a deterministic md5-derived stub, so the DuckDB oracle can
    // check the whole contract — schema, batch shape, and stub decode — not
    // an expression twin of it.
    "q_mm_meta" -> ((s, dir) => {
      val payload = t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      Multimodal.withDecodedMeta(payload, "payload")
        .select(
          col("doc_id"),
          col("meta.byte_len").cast("long").as("byte_len"),
          col("meta.width").cast("long").as("width"),
          col("meta.height").cast("long").as("height"),
          col("meta.mime").as("mime"))
    }),

    // EXIF container truth through the REAL parser: the fixture BUILDS an
    // EXIF JPEG per doc from doc_id alone (both byte orders, optional
    // fields, GPS IFD, no-EXIF and truncated corruption classes), the
    // engine parses it back with the pure-JVM TIFF walk, and the oracle
    // states the expected fields in closed form — hash-exact means
    // parse ∘ build ≡ identity across the whole corpus
    "q_mm_exif" -> ((s, dir) => {
      import s.implicits._
      val payload = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val bytes =
            if (id % 13 == 0) Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte)
            else {
              val full = Multimodal.buildExifJpeg(
                orientation = (id % 8 + 1).toInt,
                datetime = Some(f"2024:01:${id % 27 + 1}%02d 10:00:00"),
                gps = id % 3 == 0,
                make = if (id % 5 == 0) Some("CamA") else None,
                model = Some("M" + (id % 4)),
                littleEndian = id % 2 == 0)
              if (id % 31 == 0) full.dropRight(12) else full
            }
          (id, bytes)
        }.toDF("doc_id", "payload")
      Multimodal.withExifMeta(payload, "payload")
        .select(col("doc_id"),
          col("exif.has_exif").as("has_exif"),
          col("exif.orientation").as("orientation"),
          col("exif.datetime").as("datetime"),
          col("exif.has_gps").as("has_gps"),
          col("exif.make").as("make"),
          col("exif.model").as("model"))
    }),

    // multimodal audio metadata through the REAL mapPartitions path with the
    // deterministic stub codec (JavaSoundDecoder is the production decoder
    // behind the same seam — spec-checked on real WAV bytes, which an SQL
    // oracle cannot re-run)
    "q_mm_audio" -> ((s, dir) => {
      val payload = t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      Multimodal.withAudioMeta(payload, "payload")
        .select(
          col("doc_id"),
          col("audio_meta.byte_len").cast("long").as("byte_len"),
          col("audio_meta.sample_rate").cast("long").as("sample_rate"),
          col("audio_meta.channels").cast("long").as("channels"),
          col("audio_meta.bits").cast("long").as("bits"),
          col("audio_meta.frames").as("frames"),
          col("audio_meta.mime").as("mime"))
    }),

    // SemDeDup: intra-cluster cosine dedup (label as the precomputed
    // cluster) — a vector is dropped iff a lower-id cluster-mate sits
    // within cosine 0.30; the k-means-composed variant is spec-checked
    "q_sd_keep" -> ((s, dir) =>
      graft.ops.SemanticDedup.semanticKeep(
        t(s, dir, "embeddings"), "vec_id", "embedding", "label", eps = 0.30)),

    // NB classifier model: per-(lang, token) add-one conditional log-probs
    "q_nb_model" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val vocab = TextAnalysis.vocabStats(docs, "doc_id", "text").count()
      graft.ops.Classify.nbTokenLogProbs(docs, "lang", "text", vocabSize = vocab)
    }),

    // NB classification: every document argmax-labeled against the
    // lang-conditioned model (self-train/self-score, the perplexity
    // contract); integer nano-nat scores make the argmax exact
    "q_nb_predict" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val vocab = TextAnalysis.vocabStats(docs, "doc_id", "text").count()
      graft.ops.Classify.nbPredict(
        docs, "lang", "text", docs, "doc_id", "text", vocabSize = vocab)
    }),

    // DSIR importance weights: hashed-bigram log ratio of the en slice
    // (target) against the whole corpus (raw), 64 feature buckets
    "q_ds_weights" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ops.ImportanceSampling.importanceWeights(
        docs, "doc_id", "text",
        graft.ops.ImportanceSampling.featureCounts(
          docs.filter(col("lang") === "en"), "text", n = 2, buckets = 64),
        graft.ops.ImportanceSampling.featureCounts(docs, "text", n = 2, buckets = 64),
        n = 2, buckets = 64)
    }),

    // Gumbel top-50 importance resample over those weights (without
    // replacement, md5-deterministic noise)
    "q_ds_sample" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val w = graft.ops.ImportanceSampling.importanceWeights(
        docs, "doc_id", "text",
        graft.ops.ImportanceSampling.featureCounts(
          docs.filter(col("lang") === "en"), "text", n = 2, buckets = 64),
        graft.ops.ImportanceSampling.featureCounts(docs, "text", n = 2, buckets = 64),
        n = 2, buckets = 64)
      graft.ops.ImportanceSampling.gumbelTopK(w, "doc_id", "weight", k = 50, salt = "dsir")
    }),

    // multimodal frame sampling: one "frame" per 100-char window
    "q_mm_frames" -> ((s, dir) =>
      t(s, dir, "documents")
        .filter(length(col("text")) >= 1)
        .select(
          col("doc_id"), col("text"),
          posexplode(sequence(lit(0), floor((length(col("text")) - 1) / 100).cast("int"))))
        .select(
          col("doc_id"), col("pos").as("frame_idx"),
          md5(col("text").substr(col("pos") * 100 + 1, lit(100))).as("frame_md5"))))

  /** A deliberately different marker table for the pluggable-langid query:
    * proves the operator is parameterized, not hardwired to [[TextAnalysis
    * .LangMarkers]]. (Tables are demo-sized; production supplies real
    * frequency tables the same way.)
    */
  val CustomLangMarkers: Seq[(String, Seq[String])] = Seq(
    "en_small" -> Seq("the", "and"),
    "latinish" -> Seq("lorem", "ipsum", "dolor", "amet"),
    "connective" -> Seq("of", "to", "in", "is", "that"))

  // ---- oracle SQL ----------------------------------------------------------

  /** DuckDB twin of [[TextAnalysis.langId]] generated from an arbitrary
    * marker table — the oracle is parameterized exactly like the operator.
    */
  private def langIdOracleSql(markers: Seq[(String, Seq[String])]): String = {
    val markerHits = markers
      .map { case (lang, ms) =>
        s"len(list_filter(t, x -> x IN (${ms.map(m => s"'$m'").mkString(",")}))) AS hits_$lang"
      }
      .mkString(",\n    ")
    val langs = markers.map(_._1)
    val best = s"greatest(${langs.map(l => s"hits_$l").mkString(", ")})"
    val pick = langs.reverse.foldLeft("'und'") { (acc, l) =>
      s"CASE WHEN hits_$l = best AND best > 0 THEN '$l' ELSE $acc END"
    }
    s"""WITH scored AS (
       |  SELECT doc_id, lang, $markerHits
       |  FROM (SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents)),
       |ranked AS (SELECT *, $best AS best FROM scored)
       |SELECT doc_id, lang, $pick AS lang_guess FROM ranked""".stripMargin
  }

  /** Line-grain replay of [[langIdOracleSql]]'s marker scoring + the
    * lag/running-sum island merge (the q_dd_spans pattern at line grain).
    */
  private def langSegOracleSql(markers: Seq[(String, Seq[String])]): String = {
    val markerHits = markers
      .map { case (lang, ms) =>
        s"len(list_filter(t, x -> x IN (${ms.map(m => s"'$m'").mkString(",")}))) AS hits_$lang"
      }
      .mkString(",\n    ")
    val langs = markers.map(_._1)
    val best = s"greatest(${langs.map(l => s"hits_$l").mkString(", ")})"
    val pick = langs.reverse.foldLeft("'und'") { (acc, l) =>
      s"CASE WHEN hits_$l = best AND best > 0 THEN '$l' ELSE $acc END"
    }
    s"""WITH lx AS (
       |  SELECT doc_id, string_split(text, chr(10)) AS ln
       |  FROM documents WHERE text IS NOT NULL),
       |lines AS (
       |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, ln[CAST(i AS INT)] AS line
       |  FROM lx, unnest(range(1, len(ln) + 1)) AS u(i)),
       |sc AS (
       |  SELECT doc_id, pos, CAST(length(line) AS BIGINT) AS nc, $markerHits
       |  FROM (SELECT doc_id, pos, line,
       |          string_split_regex(trim(lower(line)), '\\s+') AS t FROM lines)),
       |pick AS (
       |  SELECT doc_id, pos, nc, $pick AS lg
       |  FROM (SELECT *, $best AS best FROM sc)),
       |fl AS (
       |  SELECT *, CASE WHEN lag(lg) OVER (PARTITION BY doc_id ORDER BY pos) = lg
       |                 THEN 0 ELSE 1 END AS nw
       |  FROM pick),
       |sg AS (
       |  SELECT *, CAST(sum(nw) OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS BIGINT) AS seg
       |  FROM fl)
       |SELECT doc_id, seg AS seg_idx, min(lg) AS lang,
       |  min(pos) AS line_start, max(pos) AS line_end,
       |  count(*) AS n_lines, CAST(sum(nc) AS BIGINT) AS n_chars
       |FROM sg GROUP BY doc_id, seg""".stripMargin
  }

  private val toksSql =
    "list_distinct(string_split_regex(trim(lower(text)), '\\s+'))"

  /** Non-empty token list — [[graft.ops.Classify]]'s tokenization. */
  private val nbToksSql =
    """list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')"""

  /** DSIR recomputation (hashed bigrams, 64 buckets, target = lang 'en',
    * raw = whole corpus): CTE chain ending in `d(doc_id, lang, tt)` and
    * `w(doc_id, n_feats, w)` with `w` in integer nano-nats — shared by the
    * weight and Gumbel-resample oracles.
    */
  private val dsirCteSql =
    """d AS (
      |  SELECT doc_id, lang,
      |    list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS tt
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, lang,
      |    CAST('0x' || substr(md5(array_to_string(
      |      tt[CAST(u.i AS INT) + 1 : CAST(u.i AS INT) + 2], ' ')), 1, 8) AS BIGINT) % 64
      |      AS bucket
      |  FROM d, unnest(range(0, len(tt) - 1)) AS u(i)
      |  WHERE len(tt) >= 2),
      |tc AS (SELECT bucket, count(*) AS tc FROM f WHERE lang = 'en' GROUP BY 1),
      |rc AS (SELECT bucket, count(*) AS rc FROM f GROUP BY 1),
      |ts AS (SELECT sum(tc) AS t FROM tc),
      |rs AS (SELECT sum(rc) AS r FROM rc),
      |ratio AS (
      |  SELECT rc.bucket,
      |    CAST(floor((ln((coalesce(tc.tc, 0) + 1.0) / (ts.t + 64.0))
      |              - ln((rc.rc + 1.0) / (rs.r + 64.0))) * 1e9 + 0.5) AS BIGINT) AS lr
      |  FROM rc LEFT JOIN tc USING (bucket), ts, rs),
      |w AS (
      |  SELECT f.doc_id, count(*) AS n_feats, sum(r.lr) AS w
      |  FROM f JOIN ratio r USING (bucket) GROUP BY 1)""".stripMargin

  /** 3-word shingle set of the raw (non-distinct) token sequence. */
  private val shinglesSql =
    "list_distinct(list_transform(range(1, greatest(len(tt) - 2, 1) + 1), " +
      "i -> array_to_string(tt[i:i+2], ' ')))"

  private def minhashSql(seed: Int): String =
    s"list_min(list_transform(sh, x -> md5('s$seed:' || x)))"

  /** OPH signature CTE chain ending in `oph(doc_id, oph0..oph{k-1})`:
    * one 32-bit hash per shingle, bucket minima (`h % k`), then rotation
    * densification unrolled as a k-way coalesce per slot — the exact
    * arithmetic of [[graft.ops.Dedup.ophSignatures]].
    */
  private def ophCteSql(k: Int): String = {
    val mins =
      s"list_transform(range(0, $k), j -> list_min(list_filter(hs, v -> v % $k = j)))"
    val slots = (0 until k).map { j =>
      val args = (0 until k).map { off =>
        val idx = (j + off) % k + 1
        if (off == 0) s"m[$idx]" else s"m[$idx] + $off"
      }.mkString(", ")
      s"coalesce($args) AS oph$j"
    }.mkString(",\n  ")
    s"""h AS (
       |  SELECT doc_id,
       |    list_transform(sh, x -> CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)) AS hs
       |  FROM $shingleFrom),
       |mm AS (SELECT doc_id, $mins AS m FROM h),
       |oph AS (
       |  SELECT doc_id, $slots
       |  FROM mm)""".stripMargin
  }

  private val shingleFrom =
    s"(SELECT doc_id, $shinglesSql AS sh FROM " +
      "(SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tt FROM documents))"

  /** Cross-document shared CHARACTER spans (>= 30-char runs occurring in
    * >= 2 distinct docs, merged to maximal extents) as a reusable CTE chain
    * ending in `spans(doc_id, span_start, span_end)` — the direct
    * recomputation: every 30-char window of every doc, grouped by its
    * actual CONTENT (the engine's hash pass is invisible to the oracle),
    * cross-doc windows marked, marks merged by the lag/sum island rule.
    * Shared by q_sa_crossdoc_spans and the removal composition's oracle.
    */
  private val crossdocSpansCteSql: String = {
    val m = 30
    s"""d AS (SELECT doc_id, text FROM documents
       |  WHERE doc_id IS NOT NULL AND text IS NOT NULL AND length(text) >= $m),
       |p AS (SELECT doc_id, text, unnest(range(0, length(text) - $m + 1)) AS pos
       |  FROM d),
       |g AS (SELECT doc_id, pos, substr(text, CAST(pos AS INT) + 1, $m) AS gram
       |  FROM p),
       |sh AS (SELECT gram FROM g GROUP BY gram HAVING min(doc_id) <> max(doc_id)),
       |h AS (SELECT doc_id, pos FROM g JOIN sh USING (gram)),
       |isl AS (SELECT doc_id, pos,
       |    CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
       |           OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + $m
       |         THEN 1 ELSE 0 END AS ns
       |  FROM h),
       |seg AS (SELECT doc_id, pos,
       |    sum(ns) OVER (PARTITION BY doc_id ORDER BY pos) AS sid
       |  FROM isl),
       |spans AS (SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       |    CAST(max(pos) + $m AS BIGINT) AS span_end
       |  FROM seg GROUP BY doc_id, sid)""".stripMargin
  }

  /** Benchmark decontamination spans as a CTE chain ending in
    * `spans(doc_id, span_start, span_end)`: corpus (doc_id % 3 <> 0)
    * windows matched against BENCHMARK (doc_id % 3 = 0) windows only —
    * corpus-internal repeats must not flag, which is exactly where this
    * differs from [[crossdocSpansCteSql]]'s min<>max rule.
    */
  private val dcSpansCteSql: String = {
    val m = 30
    s"""bg AS (SELECT DISTINCT substr(text, CAST(pos AS INT) + 1, $m) AS gram
       |  FROM (SELECT text, unnest(range(0, length(text) - $m + 1)) AS pos
       |        FROM documents
       |        WHERE doc_id IS NOT NULL AND text IS NOT NULL
       |          AND doc_id % 3 = 0 AND length(text) >= $m)),
       |cg AS (SELECT doc_id, pos, substr(text, CAST(pos AS INT) + 1, $m) AS gram
       |  FROM (SELECT doc_id, text, unnest(range(0, length(text) - $m + 1)) AS pos
       |        FROM documents
       |        WHERE doc_id IS NOT NULL AND text IS NOT NULL
       |          AND doc_id % 3 <> 0 AND length(text) >= $m)),
       |h AS (SELECT doc_id, pos FROM cg JOIN bg USING (gram)),
       |isl AS (SELECT doc_id, pos,
       |    CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
       |           OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + $m
       |         THEN 1 ELSE 0 END AS ns
       |  FROM h),
       |seg AS (SELECT doc_id, pos,
       |    sum(ns) OVER (PARTITION BY doc_id ORDER BY pos) AS sid
       |  FROM isl),
       |spans AS (SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       |    CAST(max(pos) + $m AS BIGINT) AS span_end
       |  FROM seg GROUP BY doc_id, sid)""".stripMargin
  }

  /** MinHash-LSH duplicate clusters as a reusable CTE chain ending in
    * `clusters(doc_id, cluster_id)`: the q_dd_lsh_pairs banding plus a
    * recursive min-label transitive closure (r reaches id ⇒ r reaches
    * id's neighbors; min reachable label = the component minimum). Shared
    * by q_dd_clusters and the soft-dedup weight oracle.
    */
  private val clustersCteSql: String = {
    val bandSelects = (0 until 2)
      .map { b =>
        val sig = (0 until 4).map(r => minhashSql(b * 4 + r)).mkString(" || '_' || ")
        s"SELECT doc_id, $b AS band, $sig AS sig FROM $shingleFrom"
      }
      .mkString("\n  UNION ALL ")
    s"""banded AS (
       |  $bandSelects),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
       |edges AS (
       |  SELECT id_a AS u, id_b AS v FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(id, r) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.id),
       |clusters AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id)""".stripMargin
  }

  /** Length-bucketed batch assignment (edges 16/32/64/128/1024, batch 8,
    * salt "lb") — shared by q_pk_lenbucket and the padding-waste oracle.
    */
  /** Global (size DESC, id) rank + boustrophedon shard, shared by the
    * assignment and report oracles.
    */
  private val shardBySizeSql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
      |  FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL),
      |rk AS (
      |  SELECT doc_id, n_chars,
      |    CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS BIGINT) AS rank
      |  FROM d)
      |SELECT doc_id, n_chars, rank,
      |  CASE WHEN (rank // 16) % 2 = 0 THEN rank % 16
      |       ELSE 15 - rank % 16 END AS shard
      |FROM rk""".stripMargin

  private val lenBucketSql: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens,
      |    CAST('0x' || substr(md5('lb' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
      |      / 4294967296.0 AS u
      |  FROM documents WHERE doc_id IS NOT NULL),
      |b AS (
      |  SELECT doc_id, n_tokens, u,
      |    CAST(CASE WHEN n_tokens <= 16 THEN 16 WHEN n_tokens <= 32 THEN 32
      |         WHEN n_tokens <= 64 THEN 64 WHEN n_tokens <= 128 THEN 128
      |         WHEN n_tokens <= 1024 THEN 1024 END AS BIGINT) AS bucket
      |  FROM base WHERE n_tokens <= 1024),
      |r AS (
      |  SELECT doc_id, n_tokens, bucket,
      |    row_number() OVER (PARTITION BY bucket ORDER BY u, doc_id) AS rn
      |  FROM b)
      |SELECT doc_id, n_tokens, bucket,
      |  CAST((rn - 1) // 8 AS BIGINT) AS batch_idx,
      |  CAST((rn - 1) % 8 AS BIGINT) AS pos_in_batch
      |FROM r""".stripMargin

  /** Judged ANN run CTE chain shared by q_ann_metrics / q_ann_ap — ends in
    * `j(query, doc, rnk, rel)` (top-10 batched brute run joined to the
    * label-agreement qrels) plus `qrels(query, doc, rel)`.
    */
  private val annJudgedRunCteSql: String =
    """q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv, label AS ql
      |  FROM embeddings WHERE vec_id < 5),
      |d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv, label
      |  FROM embeddings WHERE vec_id >= 5),
      |s AS (SELECT q.query_id, d.vec_id,
      |    floor(list_cosine_similarity(d.dv, q.qv) * 1000000 + 0.5) / 1000000 AS cos
      |  FROM d, q),
      |run AS (SELECT query_id, vec_id, cos FROM s
      |  QUALIFY row_number() OVER (PARTITION BY query_id
      |    ORDER BY cos DESC, CAST(vec_id AS VARCHAR)) <= 10),
      |ranked AS (
      |  SELECT query_id AS query, vec_id AS doc, cos,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
      |  FROM run),
      |qrels AS (
      |  SELECT q.query_id AS query, d.vec_id AS doc, 1 + d.vec_id % 2 AS rel
      |  FROM d JOIN q ON d.label = q.ql),
      |j AS (
      |  SELECT r.query, r.doc, r.rnk, coalesce(qr.rel, 0) AS rel
      |  FROM ranked r LEFT JOIN qrels qr USING (query, doc))""".stripMargin

  /** CDC chunk-boundary CTEs (window 4, divisor 16), shared by q_tx_cdc and
    * the shifted-dup pair oracle: `j(doc_id, tt, starts, ends)`.
    */
  private val cdcCtePrefix: String =
    """base AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tt FROM documents),
      |c AS (
      |  SELECT doc_id, list_sort(list(i)) AS cuts
      |  FROM base, unnest(range(4, len(tt))) AS u(i)
      |  WHERE CAST('0x' || substr(md5(
      |          array_to_string(tt[CAST(i AS INT) - 3 : CAST(i AS INT)], ' ')), 1, 8)
      |        AS BIGINT) % 16 = 0
      |  GROUP BY doc_id),
      |j AS (
      |  SELECT b.doc_id, b.tt,
      |    list_prepend(CAST(0 AS BIGINT), coalesce(c.cuts, [])) AS starts,
      |    list_append(coalesce(c.cuts, []), CAST(len(b.tt) AS BIGINT)) AS ends
      |  FROM base b LEFT JOIN c USING (doc_id))""".stripMargin

  /** Shared by q_tx_search and q_tx_search_indexed: a persisted index must
    * answer exactly like the direct scan.
    */
  private val booleanSearchOracleSql: String =
    """SELECT doc_id, count(*) AS matched FROM (
      |  SELECT DISTINCT doc_id, tok FROM (
      |    SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
      |    FROM documents)
      |  WHERE tok IN ('scan', 'join', 'window'))
      |GROUP BY doc_id HAVING count(*) = 3""".stripMargin

  /** PQ recomputation (m=4 subspaces of 16 dims, k=8 codewords), shared by
    * q_pq_encode and q_pq_adc: codebooks are the md5-smallest 8 vectors
    * (the [[graft.ops.ProductQuantize.fit]] sample), distances rounded
    * half-up 6 before the argmin, ties to the lowest code — CTE `enc`
    * yields (vec_id, subspace, code).
    */
  private val pqCteSql: String =
    """s AS (
      |  SELECT CAST(embedding AS DOUBLE[]) AS cv,
      |    row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS code
      |  FROM embeddings QUALIFY code < 8),
      |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |d AS (
      |  SELECT v.vec_id, CAST(mm.m AS BIGINT) AS subspace, s.code,
      |    floor(list_sum(list_transform(range(1, 17), j ->
      |      (v.v[CAST(mm.m * 16 + j AS INT)] - s.cv[CAST(mm.m * 16 + j AS INT)])
      |      * (v.v[CAST(mm.m * 16 + j AS INT)] - s.cv[CAST(mm.m * 16 + j AS INT)])))
      |      * 1e6 + 0.5) / 1e6 AS dist
      |  FROM v, unnest(range(0, 4)) AS mm(m), s),
      |enc AS (
      |  SELECT vec_id, subspace, code FROM d
      |  QUALIFY row_number() OVER (PARTITION BY vec_id, subspace ORDER BY dist, code) = 1)""".stripMargin

  /** The simhash recomputation at `bits`, shared by q_dd_simhash and the
    * Hamming pair oracle (CTE named `sh`).
    */
  private def simhashCteSql(bits: Int): String = {
    val votes = (0 until bits)
      .map(b =>
        s"CASE WHEN list_sum(list_transform(h, x -> ((x >> $b) & 1) * 2 - 1)) > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""WITH hashed AS (
       |  SELECT doc_id,
       |    list_transform($toksSql, x -> CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)) AS h
       |  FROM documents),
       |sh AS (SELECT doc_id, CAST($votes AS BIGINT) AS simhash FROM hashed)""".stripMargin
  }

  /** CTE chain computing [[graft.ops.Dedup.repeatedSpans]] (8-token
    * windows, minDocs 2) as `merged(doc_id, span_start, span_end)`, with
    * `toks(doc_id, t)` exposed for reuse by the apply-side oracle.
    */
  // parameterized by window/threshold grain `w`; `byContent` groups the
  // cross-doc test on the window text itself (repeatedSpansExact's verified
  // semantics) instead of its md5 — identical absent collisions, and the
  // oracle checking BOTH forms pins that equivalence from the SQL side
  private def spansCteSql(w: Int, byContent: Boolean = false): String = {
    val winExpr =
      s"array_to_string(t[CAST(u.i+1 AS INT):CAST(u.i+$w AS INT)], chr(1))"
    val key = if (byContent) winExpr else s"md5($winExpr)"
    s"""toks AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> '') AS t
      |  FROM documents),
      |wins AS (
      |  SELECT doc_id, CAST(u.i AS INTEGER) AS start_pos,
      |    $key AS win_key
      |  FROM toks, unnest(range(0, len(t) - ${w - 1})) AS u(i)
      |  WHERE len(t) >= $w),
      |dup AS (
      |  SELECT win_key FROM wins GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
      |hits AS (SELECT doc_id, start_pos FROM wins JOIN dup USING (win_key)),
      |marked AS (
      |  SELECT doc_id, start_pos,
      |    CASE WHEN lag(start_pos) OVER w IS NULL
      |           OR start_pos > lag(start_pos) OVER w + $w THEN 1 ELSE 0 END AS new_span
      |  FROM hits
      |  WINDOW w AS (PARTITION BY doc_id ORDER BY start_pos)),
      |spans AS (
      |  SELECT doc_id, start_pos, sum(new_span) OVER (
      |    PARTITION BY doc_id ORDER BY start_pos ROWS UNBOUNDED PRECEDING) AS span_id
      |  FROM marked),
      |merged AS (
      |  SELECT doc_id, min(start_pos) AS span_start,
      |    CAST(max(start_pos) + $w AS INTEGER) AS span_end
      |  FROM spans GROUP BY doc_id, span_id)""".stripMargin
  }

  // the full stupid-backoff scoring query, shared verbatim between its
  // own oracle and the CCNet bucket composition
  private val sbPplOracleSql: String =
    """WITH tr AS (
        |  SELECT string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents WHERE doc_id % 5 <> 0),
        |t3 AS (
        |  SELECT t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2,
        |    t[CAST(i AS INT) + 2] AS w3
        |  FROM tr, unnest(range(1, len(t) - 1)) AS u(i)),
        |c3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM t3 GROUP BY 1, 2, 3),
        |bt AS (
        |  SELECT t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
        |  FROM tr, unnest(range(1, len(t))) AS u(i)),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bt GROUP BY 1, 2),
        |c1 AS (
        |  SELECT x AS token, count(*) AS c1
        |  FROM (SELECT unnest(t) AS x FROM tr) WHERE x <> '' GROUP BY 1),
        |nn AS (SELECT coalesce(sum(c1), 0) AS n FROM c1),
        |v AS (
        |  SELECT count(DISTINCT x) AS v
        |  FROM (SELECT unnest(t) AS x FROM tr) WHERE x <> ''),
        |sb AS (
        |  SELECT doc_id, t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2,
        |    t[CAST(i AS INT) + 2] AS w3
        |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        |        FROM documents), unnest(range(1, len(t) - 1)) AS u(i)),
        |nll AS (
        |  SELECT sb.doc_id,
        |    CAST(floor(-ln(
        |      CASE
        |        WHEN c3.c3 IS NOT NULL AND c12.c2 IS NOT NULL
        |          THEN CAST(c3.c3 AS DOUBLE) / c12.c2
        |        WHEN c23.c2 IS NOT NULL
        |          THEN 0.4 * CAST(c23.c2 AS DOUBLE) / cw2.c1
        |        WHEN cu.c1 IS NOT NULL
        |          THEN 0.4 * 0.4 * CAST(cu.c1 AS DOUBLE) / nn.n
        |        ELSE 0.4 * 0.4 / (nn.n + v.v)
        |      END) * 1e9 + 0.5) AS BIGINT) AS s
        |  FROM sb
        |  LEFT JOIN c3 USING (w1, w2, w3)
        |  LEFT JOIN c2 c12 ON c12.w1 = sb.w1 AND c12.w2 = sb.w2
        |  LEFT JOIN c2 c23 ON c23.w1 = sb.w2 AND c23.w2 = sb.w3
        |  LEFT JOIN c1 cw2 ON cw2.token = sb.w2
        |  LEFT JOIN c1 cu ON cu.token = sb.w3
        |  CROSS JOIN nn CROSS JOIN v),
        |ag AS (SELECT doc_id, count(*) AS n_trigrams, sum(s) AS ss FROM nll GROUP BY 1)
        |SELECT d.doc_id, coalesce(ag.n_trigrams, 0) AS n_trigrams,
        |  floor(CAST(ss AS DOUBLE) / n_trigrams / 1e9 * 1e6 + 0.5) / 1e6 AS avg_nll,
        |  floor(exp(CAST(ss AS DOUBLE) / n_trigrams / 1e9) * 1e4 + 0.5) / 1e4 AS sb_ppl
        |FROM documents d LEFT JOIN ag USING (doc_id)""".stripMargin

  private val knPplOracleSql: String =
    """WITH tr AS (
        |  SELECT string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents WHERE doc_id % 5 <> 0),
        |bg AS (
        |  SELECT t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
        |  FROM tr, unnest(range(1, len(t))) AS u(i)),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
        |ctx AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1x, count(*) AS n1f
        |        FROM c2 GROUP BY 1),
        |cont AS (SELECT w2, count(*) AS n1b FROM c2 GROUP BY 1),
        |tot AS (SELECT count(*) AS bt FROM c2),
        |v AS (
        |  SELECT count(DISTINCT x) AS v
        |  FROM (SELECT unnest(t) AS x FROM tr) WHERE x <> ''),
        |sc AS (
        |  SELECT doc_id, t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
        |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        |        FROM documents), unnest(range(1, len(t))) AS u(i)),
        |nll AS (
        |  SELECT sc.doc_id,
        |    CAST(floor(-ln(
        |      CASE WHEN ctx.c1x IS NOT NULL THEN
        |        greatest(CAST(coalesce(c2.c2, 0) AS DOUBLE) - 0.75, 0.0)
        |          / CAST(ctx.c1x AS DOUBLE)
        |        + 0.75 * CAST(ctx.n1f AS DOUBLE) / CAST(ctx.c1x AS DOUBLE)
        |          * ((CAST(coalesce(cont.n1b, 0) AS DOUBLE) + 1.0)
        |             / (CAST(tot.bt AS DOUBLE) + CAST(v.v AS DOUBLE)))
        |      ELSE (CAST(coalesce(cont.n1b, 0) AS DOUBLE) + 1.0)
        |             / (CAST(tot.bt AS DOUBLE) + CAST(v.v AS DOUBLE))
        |      END) * 1e9 + 0.5) AS BIGINT) AS s
        |  FROM sc
        |  LEFT JOIN c2 ON c2.w1 = sc.w1 AND c2.w2 = sc.w2
        |  LEFT JOIN ctx ON ctx.w1 = sc.w1
        |  LEFT JOIN cont ON cont.w2 = sc.w2
        |  CROSS JOIN tot CROSS JOIN v),
        |ag AS (SELECT doc_id, count(*) AS n_bigrams, sum(s) AS ss FROM nll GROUP BY 1)
        |SELECT d.doc_id, coalesce(ag.n_bigrams, 0) AS n_bigrams,
        |  floor(CAST(ss AS DOUBLE) / n_bigrams / 1e9 * 1e6 + 0.5) / 1e6 AS avg_nll,
        |  floor(exp(CAST(ss AS DOUBLE) / n_bigrams / 1e9) * 1e4 + 0.5) / 1e4 AS kn_ppl
        |FROM documents d LEFT JOIN ag USING (doc_id)""".stripMargin

  /** The q_e2e_curate oracle: the WHOLE six-stage curation chain replayed
    * in SQL — each stage is the (adapted) oracle fragment of its
    * individually-verified query: q_web_html's extraction chain,
    * q_cr_web's gate CTEs, q_dd_clusters' banded-LSH recursive closure,
    * q_dc_overlap's bigram containment, q_sm_temperature's rate filter,
    * and q_pk_mask's segment arithmetic.
    */
  private val e2eCurateOracleSql: String = {
    val bandSelects = (0 until 2)
      .map { b =>
        val sig = (0 until 4)
          .map(r => s"list_min(list_transform(sh, x -> md5('s${b * 4 + r}:' || x)))")
          .mkString(" || '_' || ")
        s"SELECT doc_id, $b AS band, $sig AS sig FROM ksh"
      }
      .mkString("\n  UNION ALL ")
    s"""WITH RECURSIVE
       |raw AS (SELECT doc_id, lang, text FROM documents WHERE doc_id IS NOT NULL),
       |h AS (SELECT doc_id, lang,
       |  '<div><h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>' || text ||
       |  ' &amp; tail</p><p>the size of this page will be fine. we have that and more to be sure. it should do with ease.</p><script>skip<this</script></div>' AS x FROM raw),
       |s1 AS (SELECT doc_id, lang,
       |  regexp_replace(x, '(?s)<!--.*?-->', ' ', 'g') AS x FROM h),
       |s2 AS (SELECT doc_id, lang,
       |  regexp_replace(x, '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS x FROM s1),
       |s3 AS (SELECT doc_id, lang,
       |  regexp_replace(x, '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS x FROM s2),
       |s4 AS (SELECT doc_id, lang, regexp_replace(x,
       |  '(?i)<(?:br|hr)[^>]*>|</(?:p|div|li|tr|h[1-6]|ul|ol|table)[^>]*>',
       |  chr(10), 'g') AS x FROM s3),
       |s5 AS (SELECT doc_id, lang,
       |  regexp_replace(x, '<[^>]+>', ' ', 'g') AS x FROM s4),
       |s6 AS (SELECT doc_id, lang,
       |  replace(replace(replace(replace(replace(replace(replace(x,
       |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
       |    '&apos;', ''''), '&nbsp;', ' '), '&amp;', '&') AS x FROM s5),
       |e2e_docs AS (SELECT doc_id, lang, array_to_string(
       |  list_filter(
       |    list_transform(string_split(x, chr(10)),
       |      l -> trim(regexp_replace(l, '[ \t]+', ' ', 'g'))),
       |    l -> l <> ''),
       |  chr(10)) AS text FROM s6),
       |wt AS (
       |  SELECT doc_id, text,
       |    list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> '') AS w,
       |    list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)), l -> l <> '') AS ls
       |  FROM e2e_docs),
       |wg AS (
       |  SELECT doc_id,
       |    (CAST(len(w) AS BIGINT) BETWEEN 50 AND 100000)
       |    AND (CASE WHEN len(w) = 0 THEN 0.0 ELSE floor(
       |      (CAST(coalesce(list_sum(list_transform(w, x -> length(x))), 0) AS DOUBLE)
       |        / CAST(len(w) AS DOUBLE)) * 10000 + 0.5) / 10000 END BETWEEN 3.0 AND 10.0)
       |    AND (CASE WHEN len(w) = 0 THEN 0.0 ELSE floor(
       |      (CAST(length(text) - length(replace(text, '#', ''))
       |        + (length(text) - length(replace(text, '...', ''))) / 3
       |        + length(text) - length(replace(text, chr(8230), '')) AS DOUBLE)
       |        / CAST(len(w) AS DOUBLE)) * 10000 + 0.5) / 10000 END <= 0.1)
       |    AND (CASE WHEN len(ls) = 0 THEN 0.0 ELSE floor(
       |      (CAST(len(list_filter(ls, l -> starts_with(l, chr(8226))
       |          OR starts_with(l, '-') OR starts_with(l, '*'))) AS DOUBLE)
       |        / CAST(len(ls) AS DOUBLE)) * 10000 + 0.5) / 10000 END <= 0.9)
       |    AND (CASE WHEN len(ls) = 0 THEN 0.0 ELSE floor(
       |      (CAST(len(list_filter(ls, l -> ends_with(l, '...')
       |          OR ends_with(l, chr(8230)))) AS DOUBLE)
       |        / CAST(len(ls) AS DOUBLE)) * 10000 + 0.5) / 10000 END <= 0.3)
       |    AND (CASE WHEN len(w) = 0 THEN 0.0 ELSE floor(
       |      (CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
       |        / CAST(len(w) AS DOUBLE)) * 10000 + 0.5) / 10000 END >= 0.8)
       |    AND (len(list_filter(list_distinct(w), x -> list_contains(
       |      ['the','be','to','of','and','that','have','with'], x))) >= 2) AS gopher_ok
       |  FROM wt),
       |wc AS (
       |  SELECT doc_id,
       |    NOT contains(lower(text), 'lorem ipsum') AND NOT contains(text, '{')
       |      AND length(coalesce(ct, '')) - length(regexp_replace(coalesce(ct, ''), '[.!?]', '', 'g')) >= 3 AS c4_ok
       |  FROM (
       |    SELECT doc_id, text, array_to_string(
       |      list_filter(ls, l -> (ends_with(l, '.') OR ends_with(l, '!')
       |          OR ends_with(l, '?') OR ends_with(l, '"'))
       |        AND len(list_filter(regexp_split_to_array(l, '\\s+'), x -> x <> '')) >= 3),
       |      chr(10)) AS ct
       |    FROM wt)),
       |wr AS (
       |  SELECT doc_id,
       |    (CASE WHEN len(rls) = 0 THEN 0.0 ELSE floor(
       |      (CAST(len(rls) - len(list_distinct(rls)) AS DOUBLE)
       |        / CAST(len(rls) AS DOUBLE)) * 10000 + 0.5) / 10000 END <= 0.3)
       |    AND (CASE WHEN len(w) = 0 THEN 0.0 ELSE floor(
       |      (CAST(len(w) - len(list_distinct(w)) AS DOUBLE)
       |        / CAST(len(w) AS DOUBLE)) * 10000 + 0.5) / 10000 END <= 0.3)
       |    AND (CASE WHEN len(w) = 0 THEN 0.0 ELSE floor(
       |      (CAST(list_max(list_transform(list_distinct(w), d ->
       |          len(list_filter(w, x -> x = d)))) AS DOUBLE)
       |        / CAST(len(w) AS DOUBLE)) * 10000 + 0.5) / 10000 END <= 0.2) AS rep_ok
       |  FROM (SELECT doc_id, w, string_split(text, chr(10)) AS rls
       |        FROM wt)),
       |wch AS (SELECT doc_id, md5(trim(lower(text))) AS ch FROM e2e_docs),
       |wcanon AS (SELECT ch, min(doc_id) AS cid FROM wch GROUP BY 1),
       |k1 AS (
       |  SELECT d.doc_id, d.lang, d.text
       |  FROM e2e_docs d
       |  JOIN wg USING (doc_id) JOIN wc USING (doc_id) JOIN wr USING (doc_id)
       |  JOIN wch ON wch.doc_id = d.doc_id JOIN wcanon ON wcanon.ch = wch.ch
       |  WHERE wg.gopher_ok AND wc.c4_ok AND wr.rep_ok AND d.doc_id = wcanon.cid),
       |ktt AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tt FROM k1),
       |ksh AS (SELECT doc_id,
       |    list_distinct(list_transform(range(1, greatest(len(tt) - 2, 1) + 1),
       |      i -> array_to_string(tt[i:i+2], ' '))) AS sh
       |  FROM ktt),
       |banded AS (
       |  $bandSelects),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
       |edges AS (
       |  SELECT id_a AS u, id_b AS v FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(id, r) AS (
       |  SELECT doc_id, doc_id FROM k1
       |  UNION
       |  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.id),
       |clusters AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
       |k2 AS (
       |  SELECT k1.doc_id, k1.lang, k1.text FROM k1
       |  JOIN clusters c ON k1.doc_id = c.doc_id AND c.doc_id = c.cluster_id),
       |trsh AS (SELECT doc_id,
       |    list_distinct(list_transform(
       |      list_transform(range(1, greatest(len(t) - 1, 1) + 1),
       |        i -> array_to_string(t[i:i+1], ' ')),
       |      x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT))) AS sh
       |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t FROM k2)),
       |evsh AS (SELECT doc_id,
       |    list_distinct(list_transform(
       |      list_transform(range(1, greatest(len(t) - 1, 1) + 1),
       |        i -> array_to_string(t[i:i+1], ' ')),
       |      x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT))) AS sh
       |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
       |        FROM raw WHERE doc_id % 10 = 0)),
       |cont AS (
       |  SELECT DISTINCT tr.doc_id
       |  FROM trsh tr JOIN evsh ev ON
       |    floor(CAST(len(list_intersect(tr.sh, ev.sh)) AS DOUBLE)
       |      / len(ev.sh) * 10000 + 0.5) / 10000 >= 0.3),
       |k3 AS (SELECT * FROM k2 WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
       |tc AS (SELECT lang, count(*) AS n FROM k3 WHERE lang IS NOT NULL GROUP BY lang),
       |tmn AS (SELECT min(n) AS nmin FROM tc),
       |trt AS (SELECT lang,
       |  floor(power(CAST(n AS DOUBLE) / CAST(nmin AS DOUBLE), -0.5)
       |    * 1000000000 + 0.5) / 1000000000 AS rate FROM tc, tmn),
       |k4 AS (
       |  SELECT d.doc_id, d.text FROM k3 d JOIN trt USING (lang)
       |  WHERE (CAST('0x' || substr(md5('e2e' || CAST(d.doc_id AS VARCHAR)), 1, 8)
       |    AS BIGINT) / 4294967296.0) < trt.rate),
       |pbase AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tt,
       |    CAST('0x' || substr(md5('pkshard' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 8 AS shard,
       |    CAST('0x' || substr(md5('pk' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) / 4294967296.0 AS u
       |  FROM k4),
       |pc AS (
       |  SELECT doc_id, tt, shard, CAST(len(tt) AS BIGINT) AS nt,
       |    CAST(sum(CAST(len(tt) AS BIGINT)) OVER (PARTITION BY shard ORDER BY u, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM pbase),
       |pseg AS (
       |  SELECT shard, doc_id, nt, cum, cum - nt AS cb, CAST(sq.s AS BIGINT) AS seq_idx
       |  FROM pc, unnest(range(CAST((cum - nt) // 128 AS BIGINT),
       |                       CAST((cum - 1) // 128 + 1 AS BIGINT))) AS sq(s))
       |SELECT shard, seq_idx, doc_id,
       |  cb + greatest(seq_idx * 128 - cb, 0) - seq_idx * 128 AS seq_offset,
       |  least((seq_idx + 1) * 128, cum) - cb - greatest(seq_idx * 128 - cb, 0) AS seg_tokens,
       |  array_to_string(list_transform(
       |    range(CAST(greatest(seq_idx * 128 - cb, 0) AS BIGINT),
       |          CAST(least((seq_idx + 1) * 128, cum) - cb AS BIGINT)),
       |    x -> CASE WHEN x % 3 = 0 THEN '1' ELSE '0' END), '') AS seg_mask_bits
       |FROM pseg""".stripMargin
  }

  private val dcOverlapOracleSql: String =
    """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      list_transform(range(1, greatest(len(t) - 1, 1) + 1),
        |        i -> array_to_string(t[i:i+1], ' ')),
        |      x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT))) AS sh
        |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents)),
        |pairs AS (
        |  SELECT tr.doc_id AS train_id, ev.doc_id AS eval_id,
        |    floor(CAST(len(list_intersect(tr.sh, ev.sh)) AS DOUBLE) / len(ev.sh) * 10000 + 0.5) / 10000
        |      AS contamination
        |  FROM sh tr JOIN sh ev ON tr.doc_id % 5 <> 0 AND ev.doc_id % 5 = 0)
        |SELECT train_id, eval_id, contamination FROM pairs WHERE contamination >= 0.3""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_tx_kn_ppl" -> knPplOracleSql,

    // the artifact queries' oracles are the UNION-trained inline replays:
    // hash-exact here proves save → append → load ≡ fit on the whole train
    // split (counts are associative sums)
    "q_lm_kn_artifact" -> knPplOracleSql,
    "q_lm_sb_artifact" -> sbPplOracleSql,
    "q_dd_exact" ->
      """SELECT md5(trim(lower(text))) AS content_hash, min(doc_id) AS canonical_id,
        |  count(*) AS dup_count
        |FROM documents GROUP BY 1""".stripMargin,
    "q_dd_spans" ->
      s"""WITH ${spansCteSql(8)}
         |SELECT doc_id, span_start, span_end FROM merged""".stripMargin,
    // threshold grain 5, cross-doc test on the window CONTENT itself
    // (repeatedSpansExact's verified semantics)
    "q_dd_spans_sub" ->
      s"""WITH ${spansCteSql(5, byContent = true)}
         |SELECT doc_id, span_start, span_end FROM merged""".stripMargin,
    "q_dd_span_cov" ->
      s"""WITH ${spansCteSql(8)},
         |per AS (
         |  SELECT doc_id, CAST(sum(span_end - span_start) AS BIGINT) AS dup FROM merged
         |  GROUP BY doc_id),
         |tot AS (SELECT doc_id, CAST(len(t) AS INTEGER) AS total_tokens FROM toks)
         |SELECT tot.doc_id, coalesce(per.dup, 0) AS dup_tokens, tot.total_tokens,
         |  CASE WHEN tot.total_tokens = 0 THEN 0.0
         |    ELSE floor(coalesce(per.dup, 0) * 1000000.0 / tot.total_tokens + 0.5) / 1000000
         |  END AS dup_ratio
         |FROM tot LEFT JOIN per USING (doc_id)""".stripMargin,
    "q_dd_spans_incr" ->
      """WITH btoks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '') AS t
        |  FROM documents WHERE doc_id % 3 = 0),
        |htoks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '') AS t
        |  FROM documents WHERE doc_id % 3 <> 0),
        |bwins AS (
        |  SELECT doc_id, CAST(u.i AS INTEGER) AS start_pos,
        |    md5(array_to_string(t[CAST(u.i+1 AS INT):CAST(u.i+8 AS INT)], chr(1))) AS win_hash
        |  FROM btoks, unnest(range(0, len(t) - 7)) AS u(i) WHERE len(t) >= 8),
        |hwins AS (
        |  SELECT DISTINCT md5(array_to_string(t[CAST(u.i+1 AS INT):CAST(u.i+8 AS INT)], chr(1))) AS win_hash
        |  FROM htoks, unnest(range(0, len(t) - 7)) AS u(i) WHERE len(t) >= 8),
        |dup AS (
        |  SELECT win_hash FROM bwins GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
        |  UNION
        |  SELECT win_hash FROM hwins WHERE win_hash IN (SELECT win_hash FROM bwins)),
        |hits AS (SELECT doc_id, start_pos FROM bwins JOIN dup USING (win_hash)),
        |marked AS (
        |  SELECT doc_id, start_pos,
        |    CASE WHEN lag(start_pos) OVER w IS NULL
        |           OR start_pos > lag(start_pos) OVER w + 8 THEN 1 ELSE 0 END AS new_span
        |  FROM hits
        |  WINDOW w AS (PARTITION BY doc_id ORDER BY start_pos)),
        |spans AS (
        |  SELECT doc_id, start_pos, sum(new_span) OVER (
        |    PARTITION BY doc_id ORDER BY start_pos ROWS UNBOUNDED PRECEDING) AS span_id
        |  FROM marked)
        |SELECT doc_id, min(start_pos) AS span_start,
        |  CAST(max(start_pos) + 8 AS INTEGER) AS span_end
        |FROM spans GROUP BY doc_id, span_id""".stripMargin,
    "q_dd_spans_clean" ->
      s"""WITH ${spansCteSql(8)},
         |tok_rows AS (
         |  SELECT doc_id, CAST(u.i AS INTEGER) AS idx, t[CAST(u.i+1 AS INT)] AS tok
         |  FROM toks, unnest(range(0, len(t))) AS u(i)),
         |keep AS (
         |  SELECT tr.doc_id, tr.idx, tr.tok FROM tok_rows tr
         |  WHERE NOT EXISTS (SELECT 1 FROM merged sp
         |    WHERE sp.doc_id = tr.doc_id AND tr.idx >= sp.span_start AND tr.idx < sp.span_end))
         |SELECT d.doc_id, coalesce(k.clean_text, '') AS clean_text
         |FROM documents d LEFT JOIN (
         |  SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS clean_text
         |  FROM keep GROUP BY doc_id) k USING (doc_id)""".stripMargin,
    "q_dd_minhash_sig" ->
      s"""SELECT doc_id, ${(0 until 4).map(i => s"${minhashSql(i)} AS mh$i").mkString(", ")}
         |FROM $shingleFrom""".stripMargin,
    "q_dd_lsh_pairs" -> {
      val bandSelects = (0 until 2)
        .map { b =>
          val sig = (0 until 4).map(r => minhashSql(b * 4 + r)).mkString(" || '_' || ")
          s"SELECT doc_id, $b AS band, $sig AS sig FROM $shingleFrom"
        }
        .mkString("\n  UNION ALL ")
      s"""WITH banded AS (
         |  $bandSelects)
         |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |FROM banded a JOIN banded b
         |  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id""".stripMargin
    },
    "q_dd_calibration" -> {
      val bandSelects = (0 until 2)
        .map { b =>
          val sig = (0 until 4).map(r => s"mh${b * 4 + r}").mkString(" || '_' || ")
          s"SELECT doc_id, $b AS band, $sig AS sig FROM sigs"
        }
        .mkString("\n  UNION ALL ")
      val matches = (0 until 8)
        .map(i => s"CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH sigs AS (
         |  SELECT doc_id, sh,
         |    ${(0 until 8).map(i => s"${minhashSql(i)} AS mh$i").mkString(", ")}
         |  FROM $shingleFrom),
         |banded AS (
         |  $bandSelects),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         |j AS (
         |  SELECT p.id_a, p.id_b,
         |    floor(CAST($matches AS DOUBLE) / 8 * 1000000 + 0.5) / 1000000 AS est_jaccard,
         |    len(list_intersect(a.sh, b.sh)) AS i,
         |    len(a.sh) AS sa, len(b.sh) AS sb
         |  FROM pairs p
         |  JOIN sigs a ON a.doc_id = p.id_a
         |  JOIN sigs b ON b.doc_id = p.id_b),
         |x AS (
         |  SELECT id_a, id_b, est_jaccard,
         |    CASE WHEN sa + sb - i = 0 THEN 1.0
         |      ELSE floor(CAST(i AS DOUBLE) / CAST(sa + sb - i AS DOUBLE)
         |        * 1000000 + 0.5) / 1000000 END AS exact_jaccard
         |  FROM j)
         |SELECT id_a, id_b, est_jaccard, exact_jaccard,
         |  floor(abs(est_jaccard - exact_jaccard) * 1000000 + 0.5) / 1000000 AS abs_err
         |FROM x""".stripMargin
    },
    "q_dd_oph_sig" ->
      s"""WITH ${ophCteSql(8)}
         |SELECT doc_id, ${(0 until 8).map(j => s"oph$j").mkString(", ")} FROM oph""".stripMargin,
    "q_dd_oph_pairs" -> {
      val bandSelects = (0 until 2)
        .map { b =>
          val sig = (0 until 4)
            .map(r => s"CAST(oph${b * 4 + r} AS VARCHAR)").mkString(" || '_' || ")
          s"SELECT doc_id, $b AS band, $sig AS sig FROM oph"
        }
        .mkString("\n  UNION ALL ")
      s"""WITH ${ophCteSql(8)},
         |banded AS (
         |  $bandSelects)
         |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |FROM banded a JOIN banded b
         |  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id""".stripMargin
    },
    "q_tx_novelty" ->
      s"""WITH tt AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tt
         |  FROM documents),
         |sh AS (SELECT doc_id, unnest($shinglesSql) AS shingle FROM tt),
         |ref AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 2 = 0),
         |sc AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE doc_id % 2 = 1),
         |a AS (
         |  SELECT sc.doc_id, count(*) AS n_shingles,
         |    CAST(sum(CASE WHEN r.shingle IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
         |  FROM sc LEFT JOIN ref r USING (shingle) GROUP BY 1)
         |SELECT d.doc_id, coalesce(a.n_shingles, 0) AS n_shingles,
         |  coalesce(a.n_novel, 0) AS n_novel,
         |  floor(CAST(a.n_novel AS DOUBLE) / a.n_shingles * 1e9 + 0.5) / 1e9 AS novelty
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
         |LEFT JOIN a USING (doc_id)""".stripMargin,
    "q_dd_clusters" ->
      s"""WITH RECURSIVE $clustersCteSql
         |SELECT doc_id, cluster_id FROM clusters""".stripMargin,
    "q_dd_softweight" ->
      s"""WITH RECURSIVE $clustersCteSql,
         |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM clusters GROUP BY 1)
         |SELECT c.doc_id, c.cluster_id, sz.cluster_size,
         |  floor(1.0 / sz.cluster_size * 1e9 + 0.5) / 1e9 AS weight
         |FROM clusters c JOIN sz USING (cluster_id)""".stripMargin,
    "q_sa_ranks" ->
      """WITH p AS (
        |  SELECT doc_id, text, unnest(range(0, length(text))) AS pos
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND text IS NOT NULL AND length(text) > 0)
        |SELECT doc_id, CAST(pos AS BIGINT) AS pos,
        |  CAST(row_number() OVER (PARTITION BY doc_id
        |    ORDER BY substr(text, CAST(pos AS INT) + 1)) AS BIGINT) AS sa_rank
        |FROM p""".stripMargin,
    "q_sa_ranks_global" ->
      """WITH p AS (
        |  SELECT doc_id, text, unnest(range(0, length(text))) AS pos
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND text IS NOT NULL AND length(text) > 0)
        |SELECT doc_id, CAST(pos AS BIGINT) AS pos,
        |  CAST(row_number() OVER (PARTITION BY doc_id
        |    ORDER BY substr(text, CAST(pos AS INT) + 1)) AS BIGINT) AS sa_rank
        |FROM p""".stripMargin,
    "q_sa_lrs" ->
      """WITH d AS (
        |  SELECT doc_id, substr(text, 1, 120) || ' ' || substr(text, 1, 60) AS t
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |dd AS (SELECT doc_id, t FROM d WHERE length(t) > 0),
        |p AS (SELECT doc_id, t, unnest(range(0, length(t))) AS i FROM dd),
        |r AS (SELECT doc_id, t, i, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY substr(t, CAST(i AS INT) + 1)) AS rk FROM p),
        |pr AS (SELECT a.doc_id, a.t, a.i AS i, b.i AS j
        |  FROM r a JOIN r b ON a.doc_id = b.doc_id AND b.rk = a.rk + 1),
        |l AS (SELECT doc_id, t, i, j,
        |    least(length(t) - i, length(t) - j) AS shorter,
        |    least(length(t) - i, length(t) - j, 48) AS m FROM pr),
        |lc AS (SELECT doc_id, shorter,
        |    CASE WHEN m <= 0 THEN 0
        |         ELSE coalesce(nullif(list_position(
        |           list_transform(range(1, m + 1), k ->
        |             substr(t, CAST(i + k AS INT), 1) <> substr(t, CAST(j + k AS INT), 1)),
        |           true), 0) - 1, m) END AS lcp
        |  FROM l),
        |mx AS (SELECT doc_id, max(lcp) AS lrs,
        |    max(CASE WHEN lcp = 48 AND shorter > 48 THEN 1 ELSE 0 END) AS cm
        |  FROM lc GROUP BY doc_id)
        |SELECT dd.doc_id, CAST(coalesce(mx.lrs, 0) AS BIGINT) AS lrs_len,
        |  coalesce(mx.cm, 0) = 1 AS capped
        |FROM dd LEFT JOIN mx ON dd.doc_id = mx.doc_id""".stripMargin,
    "q_sa_crossdoc" ->
      """WITH p AS (
        |  SELECT doc_id, text AS t, unnest(range(0, length(text))) AS i
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND text IS NOT NULL AND length(text) > 0),
        |r AS (SELECT doc_id, t, i,
        |    row_number() OVER (ORDER BY substr(t, CAST(i AS INT) + 1), doc_id, i) AS seq
        |  FROM p),
        |pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    a.t AS ta, b.t AS tb, a.i AS i, b.i AS j
        |  FROM r a JOIN r b ON b.seq = a.seq + 1 AND a.doc_id <> b.doc_id),
        |l AS (SELECT id_a, id_b,
        |    least(length(ta) - i, length(tb) - j) AS shorter,
        |    substr(ta, CAST(i + 1 AS INT), 64) AS ra,
        |    substr(tb, CAST(j + 1 AS INT), 64) AS rb
        |  FROM pr),
        |lc AS (SELECT id_a, id_b, shorter,
        |    CASE WHEN least(shorter, 64) <= 0 THEN 0
        |         ELSE coalesce(nullif(list_position(
        |           list_transform(range(1, least(shorter, 64) + 1), k ->
        |             substr(ra, CAST(k AS INT), 1) <> substr(rb, CAST(k AS INT), 1)),
        |           true), 0) - 1, least(shorter, 64)) END AS lcp
        |  FROM l),
        |sides AS (
        |  SELECT id_a AS doc_id, lcp,
        |    CASE WHEN lcp = 64 AND shorter > 64 THEN 1 ELSE 0 END AS cap FROM lc
        |  UNION ALL
        |  SELECT id_b, lcp,
        |    CASE WHEN lcp = 64 AND shorter > 64 THEN 1 ELSE 0 END FROM lc),
        |mx AS (SELECT doc_id, max(lcp) AS ml, max(cap) AS mc FROM sides GROUP BY doc_id)
        |SELECT p0.doc_id, CAST(coalesce(mx.ml, 0) AS BIGINT) AS xdoc_len,
        |  coalesce(mx.mc, 0) = 1 AS capped
        |FROM (SELECT DISTINCT doc_id FROM p) p0 LEFT JOIN mx USING (doc_id)""".stripMargin,
    "q_sa_crossdoc_spans" ->
      s"""WITH $crossdocSpansCteSql
         |SELECT doc_id, span_start, span_end FROM spans""".stripMargin,
    "q_sa_crossdoc_incr" ->
      s"""WITH $crossdocSpansCteSql
         |SELECT doc_id, span_start, span_end FROM spans
         |WHERE doc_id % 3 = 0""".stripMargin,
    "q_sa_crossdoc_incr_clean" ->
      s"""WITH $crossdocSpansCteSql,
         |d0 AS (SELECT doc_id, coalesce(text, '') AS text FROM documents
         |  WHERE doc_id IS NOT NULL AND doc_id % 3 = 0),
         |s2 AS (SELECT doc_id, span_start, span_end,
         |    lag(span_end, 1, 0) OVER (PARTITION BY doc_id ORDER BY span_start)
         |      AS prev_end
         |  FROM spans WHERE doc_id % 3 = 0),
         |pieces AS (
         |  SELECT s2.doc_id, s2.span_start AS ord,
         |    substr(d0.text, CAST(s2.prev_end AS INT) + 1,
         |      CAST(s2.span_start - s2.prev_end AS INT)) AS piece
         |  FROM s2 JOIN d0 USING (doc_id)
         |  UNION ALL
         |  SELECT d0.doc_id, 2147483647,
         |    substr(d0.text, CAST(m.mx AS INT) + 1)
         |  FROM d0 JOIN (SELECT doc_id, max(span_end) AS mx
         |                FROM spans WHERE doc_id % 3 = 0 GROUP BY doc_id) m USING (doc_id)),
         |stitched AS (SELECT doc_id, string_agg(piece, '' ORDER BY ord) AS ct
         |  FROM pieces GROUP BY doc_id)
         |SELECT d0.doc_id, coalesce(stitched.ct, d0.text) AS clean_text
         |FROM d0 LEFT JOIN stitched USING (doc_id)""".stripMargin,
    "q_dc_exact_overlap" ->
      s"""WITH $dcSpansCteSql
         |SELECT doc_id, span_start, span_end FROM spans""".stripMargin,
    "q_dc_exact_clean" ->
      s"""WITH $dcSpansCteSql,
         |d0 AS (SELECT doc_id, coalesce(text, '') AS text FROM documents
         |  WHERE doc_id IS NOT NULL AND doc_id % 3 <> 0),
         |s2 AS (SELECT doc_id, span_start, span_end,
         |    lag(span_end, 1, 0) OVER (PARTITION BY doc_id ORDER BY span_start)
         |      AS prev_end
         |  FROM spans),
         |pieces AS (
         |  SELECT s2.doc_id, s2.span_start AS ord,
         |    substr(d0.text, CAST(s2.prev_end AS INT) + 1,
         |      CAST(s2.span_start - s2.prev_end AS INT)) AS piece
         |  FROM s2 JOIN d0 USING (doc_id)
         |  UNION ALL
         |  SELECT d0.doc_id, 2147483647,
         |    substr(d0.text, CAST(m.mx AS INT) + 1)
         |  FROM d0 JOIN (SELECT doc_id, max(span_end) AS mx
         |                FROM spans GROUP BY doc_id) m USING (doc_id)),
         |stitched AS (SELECT doc_id, string_agg(piece, '' ORDER BY ord) AS ct
         |  FROM pieces GROUP BY doc_id)
         |SELECT d0.doc_id, coalesce(stitched.ct, d0.text) AS clean_text
         |FROM d0 LEFT JOIN stitched USING (doc_id)""".stripMargin,
    "q_sa_crossdoc_clean" ->
      s"""WITH $crossdocSpansCteSql,
         |d0 AS (SELECT doc_id, coalesce(text, '') AS text FROM documents
         |  WHERE doc_id IS NOT NULL),
         |s2 AS (SELECT doc_id, span_start, span_end,
         |    lag(span_end, 1, 0) OVER (PARTITION BY doc_id ORDER BY span_start)
         |      AS prev_end
         |  FROM spans),
         |pieces AS (
         |  SELECT s2.doc_id, s2.span_start AS ord,
         |    substr(d0.text, CAST(s2.prev_end AS INT) + 1,
         |      CAST(s2.span_start - s2.prev_end AS INT)) AS piece
         |  FROM s2 JOIN d0 USING (doc_id)
         |  UNION ALL
         |  SELECT d0.doc_id, 2147483647,
         |    substr(d0.text, CAST(m.mx AS INT) + 1)
         |  FROM d0 JOIN (SELECT doc_id, max(span_end) AS mx
         |                FROM spans GROUP BY doc_id) m USING (doc_id)),
         |stitched AS (SELECT doc_id, string_agg(piece, '' ORDER BY ord) AS ct
         |  FROM pieces GROUP BY doc_id)
         |SELECT d0.doc_id, coalesce(stitched.ct, d0.text) AS clean_text
         |FROM d0 LEFT JOIN stitched USING (doc_id)""".stripMargin,
    "q_graph_pagerank" -> {
      // the all-integer update rule makes the ITERATED fixpoint exactly
      // replayable: each Spark round unrolls to one CTE pair (contrib sum,
      // rank update) with // integer division mirroring Spark's `div`
      val iters = (1 to 5).map { i =>
        val p = i - 1
        s"""c$i AS (SELECT e.dst AS node, sum(r$p.r // o.outdeg) AS s
           |  FROM e JOIN r$p ON e.src = r$p.node JOIN o ON e.src = o.src
           |  GROUP BY e.dst),
           |r$i AS (SELECT n.node,
           |    (1000000000000 // 100) * 15 // nn + (85 * coalesce(c.s, 0)) // 100 AS r
           |  FROM n LEFT JOIN c$i c ON n.node = c.node, params)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT DISTINCT doc_id AS src,
         |    CAST('0x' || substr(md5('pr:' || CAST(doc_id AS VARCHAR)
         |        || ':' || CAST(t.k AS VARCHAR)), 1, 15) AS BIGINT)
         |      % (SELECT count(*) FROM documents) AS dst
         |  FROM documents, range(0, 3) t(k)),
         |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |o AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY src),
         |params AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM n),
         |r0 AS (SELECT node, 1000000000000 // nn AS r FROM n, params),
         |$iters
         |SELECT node, CAST(r AS BIGINT) AS rank_pico FROM r5""".stripMargin
    },
    "q_pf_describe" -> {
      val cols = Seq("doc_id", "lang", "source", "n_chars")
      cols.map { c =>
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |  count(*) - count($c) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_str,
           |  CAST(max($c) AS VARCHAR) AS max_str
           |FROM documents""".stripMargin
      }.mkString("\nUNION ALL\n")
    },
    "q_tx_script" -> {
      val counts = graft.ops.TextAnalysis.ScriptRanges.map { case (name, r) =>
        s"length(regexp_replace(coalesce(text, ''), '[^$r]', '', 'g')) AS n_$name"
      }.mkString(",\n        |  ")
      val names = graft.ops.TextAnalysis.ScriptRanges.map(_._1)
      val best = names.map(n => s"n_$n").mkString("greatest(", ", ", ")")
      val cases = names.map(n => s"WHEN n_$n = _best AND _best > 0 THEN '$n'")
        .mkString("\n        |       ")
      s"""WITH c AS (
        |  SELECT doc_id,
        |  $counts
        |  FROM documents),
        |b AS (SELECT *, $best AS _best FROM c)
        |SELECT doc_id, ${names.map(n => s"n_$n").mkString(", ")},
        |  CASE $cases
        |       ELSE 'und' END AS script
        |FROM b""".stripMargin
    },
    "q_dd_editdist" ->
      """WITH b AS (
        |  SELECT p_partkey AS id, trim(lower(p_name)) AS s
        |  FROM part WHERE p_partkey % 7 = 0)
        |SELECT a.id AS id_a, bb.id AS id_b, levenshtein(a.s, bb.s) AS dist
        |FROM b a JOIN b bb ON a.id < bb.id
        |WHERE levenshtein(a.s, bb.s) <= 3""".stripMargin,
    "q_dd_seqratio_pairs" ->
      """WITH b AS (
        |  SELECT p_partkey AS id, trim(lower(p_name)) AS s
        |  FROM part WHERE p_partkey % 7 = 0),
        |r AS (
        |  SELECT a.id AS id_a, bb.id AS id_b,
        |    CASE WHEN greatest(length(a.s), length(bb.s)) = 0 THEN 1.0
        |      ELSE 1.0 - CAST(levenshtein(a.s, bb.s) AS DOUBLE)
        |        / greatest(length(a.s), length(bb.s)) END AS ratio
        |  FROM b a JOIN b bb ON a.id < bb.id)
        |SELECT id_a, id_b, floor(ratio * 1e6 + 0.5) / 1e6 AS ratio
        |FROM r WHERE ratio >= 0.75""".stripMargin,
    "q_dd_seqratio_long" ->
      """WITH b AS (
        |  SELECT p_partkey AS id, trim(lower(p_name)) AS s
        |  FROM part WHERE p_partkey % 7 = 0),
        |r AS (
        |  SELECT a.id AS id_a, bb.id AS id_b,
        |    CASE WHEN greatest(length(a.s), length(bb.s)) = 0 THEN 1.0
        |      ELSE 1.0 - CAST(levenshtein(a.s, bb.s) AS DOUBLE)
        |        / greatest(length(a.s), length(bb.s)) END AS ratio
        |  FROM b a JOIN b bb ON a.id < bb.id)
        |SELECT id_a, id_b, floor(ratio * 1e6 + 0.5) / 1e6 AS ratio
        |FROM r WHERE ratio >= 0.7""".stripMargin,
    "q_tx_apss" ->
      """WITH pd AS (
        |  SELECT doc_id AS d, tok AS token, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |        FROM documents)
        |  WHERE tok <> '' GROUP BY 1, 2),
        |nn AS (SELECT count(*) AS n FROM documents),
        |dfq AS (
        |  SELECT token, count(*) AS df FROM pd GROUP BY 1
        |  HAVING count(*) * 10 <= (SELECT n FROM nn)),
        |w AS (
        |  SELECT d, token,
        |    CAST(floor(tf * ln(CAST(nn.n AS DOUBLE) / df) * 1e6 + 0.5) AS HUGEINT) AS wq
        |  FROM pd JOIN dfq USING (token) CROSS JOIN nn),
        |norms AS (SELECT d, sum(wq * wq) AS n2 FROM w GROUP BY 1),
        |dots AS (
        |  SELECT a.d AS id_a, b.d AS id_b, sum(a.wq * b.wq) AS dot
        |  FROM w a JOIN w b ON a.token = b.token AND a.d < b.d
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT id_a, id_b,
        |    floor(CAST(dot AS DOUBLE) /
        |      (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) * 1e4 + 0.5) / 1e4
        |      AS cos
        |  FROM dots JOIN norms na ON na.d = id_a JOIN norms nb ON nb.d = id_b)
        |SELECT id_a, id_b, cos FROM scored WHERE cos >= 0.5""".stripMargin,
    "q_cr_split" -> {
      val bandSelects = (0 until 2)
        .map { b =>
          val sig = (0 until 4).map(r => minhashSql(b * 4 + r)).mkString(" || '_' || ")
          s"SELECT doc_id, $b AS band, $sig AS sig FROM $shingleFrom"
        }
        .mkString("\n  UNION ALL ")
      val u = "(CAST('0x' || substr(md5('' || CAST(cluster_id AS VARCHAR)), 1, 8) AS BIGINT) / 4294967296.0)"
      s"""WITH RECURSIVE banded AS (
         |  $bandSelects),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         |edges AS (
         |  SELECT id_a AS u, id_b AS v FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.id),
         |cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN $u < 0.8 THEN 'train'
         |       WHEN $u < 0.9 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM cl""".stripMargin
    },
    "q_dd_cdc_pairs" ->
      s"""WITH $cdcCtePrefix,
         |ch AS (
         |  SELECT DISTINCT doc_id, md5(array_to_string(
         |    tt[CAST(starts[CAST(u.k AS INT) + 1] AS INT) + 1
         |       : CAST(ends[CAST(u.k AS INT) + 1] AS INT)], ' ')) AS chunk_hash
         |  FROM j, unnest(range(0, len(starts))) AS u(k))
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_chunks
         |FROM ch a JOIN ch b ON a.chunk_hash = b.chunk_hash AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,
    "q_dd_simhash" -> s"${simhashCteSql(16)}\nSELECT doc_id, simhash FROM sh",
    "q_dd_simhash_pairs" ->
      s"""${simhashCteSql(32)}
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 2""".stripMargin,
    "q_dd_ngram_jaccard" ->
      s"""WITH sh AS (
         |  SELECT doc_id, lang, n_chars // 100 AS lenb,
         |    list_distinct(list_transform(
         |      list_transform(range(1, greatest(len(t) - 1, 1) + 1),
         |        i -> array_to_string(t[i:i+1], ' ')),
         |      x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT))) AS sh
         |  FROM (SELECT doc_id, lang, n_chars,
         |        string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents)),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    floor((CASE WHEN CAST(len(a.sh) + len(b.sh) AS DOUBLE) - len(list_intersect(a.sh, b.sh)) = 0.0 THEN 1.0
         |      ELSE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |           / (CAST(len(a.sh) + len(b.sh) AS DOUBLE) - len(list_intersect(a.sh, b.sh))) END) * 10000 + 0.5) / 10000 AS jaccard
         |  FROM sh a JOIN sh b
         |    ON a.lang = b.lang AND a.lenb = b.lenb AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.2""".stripMargin,
    "q_dd_containment" ->
      s"""WITH sh AS (
         |  SELECT doc_id, lang, n_chars // 100 AS lenb,
         |    list_distinct(list_transform(
         |      list_transform(range(1, greatest(len(t) - 1, 1) + 1),
         |        i -> array_to_string(t[i:i+1], ' ')),
         |      x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT))) AS sh
         |  FROM (SELECT doc_id, lang, n_chars,
         |        string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents)),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    floor((CASE WHEN least(len(a.sh), len(b.sh)) = 0 THEN 1.0
         |      ELSE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |           / least(len(a.sh), len(b.sh)) END) * 10000 + 0.5) / 10000 AS containment
         |  FROM sh a JOIN sh b
         |    ON a.lang = b.lang AND a.lenb = b.lenb AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b, containment FROM pairs WHERE containment >= 0.5""".stripMargin,
    "q_dd_cos_pairs" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  floor(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) * 10000 + 0.5) / 10000 AS cos
        |FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE floor(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) * 10000 + 0.5) / 10000 >= 0.30""".stripMargin,
    "q_ann_ap" ->
      s"""WITH $annJudgedRunCteSql,
         |cum AS (
         |  SELECT query, rnk, rel,
         |    sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY query ORDER BY rnk) AS ch
         |  FROM j),
         |obs AS (
         |  SELECT query,
         |    CAST(sum(CASE WHEN rel > 0
         |      THEN CAST(floor(CAST(ch AS DOUBLE) / rnk * 1e9 + 0.5) AS BIGINT)
         |      ELSE 0 END) AS BIGINT) AS apn
         |  FROM cum GROUP BY 1),
         |idl AS (SELECT query, count(*) AS n_rel FROM qrels WHERE rel > 0 GROUP BY 1)
         |SELECT obs.query, coalesce(idl.n_rel, 0) AS n_rel,
         |  CASE WHEN coalesce(idl.n_rel, 0) = 0 THEN NULL
         |    ELSE floor(CAST(apn AS DOUBLE) / (CAST(idl.n_rel AS DOUBLE) * 1e9)
         |      * 1000000 + 0.5) / 1000000 END AS ap
         |FROM obs LEFT JOIN idl USING (query)""".stripMargin,
    "q_dd_lshplan" ->
      """WITH RECURSIVE pr(b, r) AS (
        |  SELECT * FROM (VALUES (1, 128), (2, 64), (4, 32), (8, 16),
        |    (16, 8), (32, 4), (64, 2), (128, 1)) v(b, r)),
        |th AS (SELECT CAST(x AS DOUBLE) AS s
        |  FROM (SELECT unnest([0.3, 0.5, 0.7, 0.8, 0.9]) AS x)),
        |g AS (SELECT b, r, s FROM pr, th),
        |sr AS (
        |  SELECT b, r, s, 1 AS i, s AS v FROM g
        |  UNION ALL SELECT b, r, s, i + 1, v * s FROM sr WHERE i < r),
        |srf AS (SELECT b, r, s, v FROM sr WHERE i = r),
        |qb AS (
        |  SELECT b, r, s, v, 1 AS jj, 1.0 - v AS w FROM srf
        |  UNION ALL SELECT b, r, s, v, jj + 1, w * (1.0 - v) FROM qb WHERE jj < b),
        |f AS (SELECT b, r, s, w FROM qb WHERE jj = b)
        |SELECT CAST(b AS BIGINT) AS bands, CAST(r AS BIGINT) AS rows, s AS jaccard,
        |  floor((1.0 - w) * 1000000 + 0.5) / 1000000 AS p_collide
        |FROM f""".stripMargin,
    "q_ann_metrics" ->
      s"""WITH $annJudgedRunCteSql,
        |obs AS (
        |  SELECT query,
        |    sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS n_hits,
        |    min(CASE WHEN rel > 0 THEN rnk END) AS first_hit,
        |    CAST(sum(CAST(floor(CAST(rel AS DOUBLE)
        |      / (ln(rnk + 1.0) / ln(2.0)) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS dcg_nano
        |  FROM j GROUP BY 1),
        |idl AS (
        |  SELECT query, count(*) AS n_rel,
        |    CAST(sum(CASE WHEN irank <= 10 THEN CAST(floor(CAST(rel AS DOUBLE)
        |      / (ln(irank + 1.0) / ln(2.0)) * 1e9 + 0.5) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS idcg_nano
        |  FROM (SELECT query, rel,
        |      row_number() OVER (PARTITION BY query ORDER BY rel DESC, doc) AS irank
        |    FROM qrels WHERE rel > 0) GROUP BY 1)
        |SELECT obs.query, coalesce(idl.n_rel, 0) AS n_rel,
        |  CAST(obs.n_hits AS BIGINT) AS n_hits,
        |  floor(CAST(obs.n_hits AS DOUBLE) / 10.0 * 1000000 + 0.5) / 1000000 AS precision,
        |  CASE WHEN coalesce(idl.n_rel, 0) = 0 THEN NULL
        |    ELSE floor(CAST(obs.n_hits AS DOUBLE) / idl.n_rel * 1000000 + 0.5) / 1000000
        |  END AS recall,
        |  CASE WHEN obs.first_hit IS NULL THEN 0.0
        |    ELSE floor(1.0 / obs.first_hit * 1000000 + 0.5) / 1000000 END AS rr,
        |  floor(CAST(obs.dcg_nano AS DOUBLE) / 1e9 * 1000000 + 0.5) / 1000000 AS dcg,
        |  floor(CAST(coalesce(idl.idcg_nano, 0) AS DOUBLE) / 1e9 * 1000000 + 0.5) / 1000000 AS idcg,
        |  CASE WHEN coalesce(idl.idcg_nano, 0) <= 0 THEN NULL
        |    ELSE floor(CAST(obs.dcg_nano AS DOUBLE) / idl.idcg_nano * 1000000 + 0.5) / 1000000
        |  END AS ndcg
        |FROM obs LEFT JOIN idl USING (query)""".stripMargin,
    "q_ann_brute_batch" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv
        |  FROM embeddings WHERE vec_id >= 5),
        |s AS (SELECT q.query_id, d.vec_id,
        |    floor(list_cosine_similarity(d.dv, q.qv) * 1000000 + 0.5) / 1000000 AS cos
        |  FROM d, q)
        |SELECT query_id, vec_id, cos FROM s
        |QUALIFY row_number() OVER (PARTITION BY query_id
        |  ORDER BY cos DESC, CAST(vec_id AS VARCHAR)) <= 10""".stripMargin,
    "q_ann_maxsim" ->
      """WITH d AS (
        |  SELECT CAST(vec_id // 4 AS BIGINT) AS doc_id, CAST(embedding AS DOUBLE[]) AS dv
        |  FROM embeddings WHERE vec_id >= 100),
        |q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id < 3),
        |c AS (SELECT d.doc_id, q.qid,
        |    floor(list_cosine_similarity(d.dv, q.qv) * 1000000 + 0.5) / 1000000 AS cos
        |  FROM d, q),
        |m AS (SELECT doc_id,
        |    max(CASE WHEN qid = 0 THEN cos END) AS m0,
        |    max(CASE WHEN qid = 1 THEN cos END) AS m1,
        |    max(CASE WHEN qid = 2 THEN cos END) AS m2
        |  FROM c GROUP BY 1)
        |SELECT doc_id, floor((m0 + m1 + m2) * 1000000 + 0.5) / 1000000 AS maxsim
        |FROM m ORDER BY maxsim DESC, doc_id LIMIT 10""".stripMargin,
    "q_ann_brute" ->
      """SELECT b.vec_id,
        |  floor(list_cosine_similarity(CAST(b.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) * 1000000 + 0.5) / 1000000 AS cos
        |FROM embeddings b, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |WHERE b.vec_id <> 0
        |ORDER BY cos DESC, b.vec_id LIMIT 20""".stripMargin,
    "q_vec_meanpool" ->
      """WITH e AS (
        |  SELECT label, z[1] AS x, CAST(z[2] AS BIGINT) AS dim
        |  FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |       unnest(list_zip(v, range(0, len(v)))) AS t(z))
        |SELECT label AS "group", dim,
        |  floor(CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS m
        |FROM e GROUP BY 1, 2""".stripMargin,
    "q_vec_cov" ->
      """WITH v AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |  WHERE embedding IS NOT NULL AND len(embedding) = 64),
        |c AS (SELECT ii.i AS i, jj.j AS j,
        |        CAST(v[CAST(ii.i AS INT) + 1] AS DECIMAL(18,9)) AS xi,
        |        CAST(v[CAST(jj.j AS INT) + 1] AS DECIMAL(18,9)) AS xj
        |      FROM v, range(0, 64) ii(i), range(0, 64) jj(j)
        |      WHERE jj.j >= ii.i)
        |SELECT i, j,
        |  floor(((CAST(sum(xi * xj) AS DOUBLE)
        |          - CAST(sum(xi) AS DOUBLE) * CAST(sum(xj) AS DOUBLE) / count(*))
        |         / (count(*) - 1)) * 1e9 + 0.5) / 1e9 AS cov
        |FROM c GROUP BY 1, 2""".stripMargin,
    "q_vec_matryoshka" ->
      """WITH c AS (
        |  SELECT vec_id, (CAST(embedding AS DOUBLE[]))[1:4] AS t FROM embeddings),
        |n AS (
        |  SELECT vec_id, t,
        |    sqrt(t[1]*t[1] + t[2]*t[2] + t[3]*t[3] + t[4]*t[4]) AS nm
        |  FROM c)
        |SELECT vec_id, CAST(u.i AS BIGINT) AS dim,
        |  floor((CASE WHEN nm = 0.0 THEN t[CAST(u.i AS INT)]
        |              ELSE t[CAST(u.i AS INT)] / nm END) * 1e6 + 0.5) / 1e6 AS val
        |FROM n, unnest(range(1, 5)) AS u(i)""".stripMargin,
    "q_ann_negatives" ->
      """WITH base AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |              FROM embeddings),
        |pairs AS (
        |  SELECT a.vec_id AS id, b.vec_id AS negative,
        |    floor(list_cosine_similarity(a.v, b.v) * 1000000 + 0.5) / 1000000 AS cos
        |  FROM base a JOIN base b ON a.label <> b.label),
        |ranked AS (
        |  SELECT id, negative, cos,
        |    CAST(row_number() OVER (PARTITION BY id ORDER BY cos DESC, negative)
        |      AS BIGINT) AS rank
        |  FROM pairs)
        |SELECT id, negative, cos, rank FROM ranked WHERE rank <= 5""".stripMargin,
    "q_ann_bitext" ->
      """WITH s AS (SELECT vec_id AS src_id, CAST(embedding AS DOUBLE[]) v
        |           FROM embeddings WHERE label = 0),
        |t AS (SELECT vec_id AS tgt_id, CAST(embedding AS DOUBLE[]) v
        |      FROM embeddings WHERE label = 1),
        |sc AS (SELECT src_id, tgt_id,
        |         CAST(floor(list_cosine_similarity(s.v, t.v) * 1000000 + 0.5) AS BIGINT) AS cmu
        |       FROM s, t),
        |a AS (SELECT src_id, CAST(sum(cmu) AS BIGINT) AS amu FROM (
        |        SELECT *, row_number() OVER (PARTITION BY src_id ORDER BY cmu DESC, tgt_id) AS r
        |        FROM sc) WHERE r <= 4 GROUP BY 1),
        |b AS (SELECT tgt_id, CAST(sum(cmu) AS BIGINT) AS bmu FROM (
        |        SELECT *, row_number() OVER (PARTITION BY tgt_id ORDER BY cmu DESC, src_id) AS r
        |        FROM sc) WHERE r <= 4 GROUP BY 1),
        |m AS (SELECT sc.src_id, sc.tgt_id, cmu,
        |        floor(CAST(cmu AS DOUBLE) * 8.0 / CAST(amu + bmu AS DOUBLE) * 1000000 + 0.5) / 1000000 AS margin
        |      FROM sc JOIN a USING (src_id) JOIN b USING (tgt_id)
        |      WHERE amu + bmu <> 0),
        |fwd AS (SELECT src_id, tgt_id, cmu, margin FROM (
        |          SELECT *, row_number() OVER (PARTITION BY src_id ORDER BY margin DESC, tgt_id) AS rs
        |          FROM m) WHERE rs = 1),
        |bwd AS (SELECT src_id, tgt_id FROM (
        |          SELECT src_id, tgt_id, row_number() OVER (PARTITION BY tgt_id ORDER BY margin DESC, src_id) AS rt
        |          FROM m) WHERE rt = 1)
        |SELECT fwd.src_id, fwd.tgt_id,
        |  CAST(cmu AS DOUBLE) / 1000000 AS cos, margin
        |FROM fwd JOIN bwd ON fwd.src_id = bwd.src_id AND fwd.tgt_id = bwd.tgt_id
        |WHERE margin >= 1.15""".stripMargin,
    "q_ann_bitext_lsh" -> {
      val planeBit = (p: Int) =>
        s"""CASE WHEN (SELECT sum(z[1] * (CAST('0x' || substr(md5('p$p:' || CAST(z[2] AS VARCHAR)), 1, 8) AS BIGINT) / 4294967296.0 - 0.5))
           |  FROM unnest(list_zip(v, range(0, len(v)))) AS t(z)) > 0.0 THEN ${1L << p} ELSE 0 END""".stripMargin
      val bucketExpr = (0 until 3).map(planeBit).mkString(" + ")
      s"""WITH s AS (SELECT vec_id AS src_id, CAST(embedding AS DOUBLE[]) v,
         |             CAST($bucketExpr AS BIGINT) AS bucket
         |           FROM embeddings WHERE label = 0),
         |t AS (SELECT vec_id AS tgt_id, CAST(embedding AS DOUBLE[]) v,
         |        CAST($bucketExpr AS BIGINT) AS bucket
         |      FROM embeddings WHERE label = 1),
         |sc AS (SELECT src_id, tgt_id,
         |         CAST(floor(list_cosine_similarity(s.v, t.v) * 1000000 + 0.5) AS BIGINT) AS cmu
         |       FROM s JOIN t ON s.bucket = t.bucket),
         |a AS (SELECT src_id, CAST(sum(cmu) AS BIGINT) AS amu FROM (
         |        SELECT *, row_number() OVER (PARTITION BY src_id ORDER BY cmu DESC, tgt_id) AS r
         |        FROM sc) WHERE r <= 4 GROUP BY 1),
         |b AS (SELECT tgt_id, CAST(sum(cmu) AS BIGINT) AS bmu FROM (
         |        SELECT *, row_number() OVER (PARTITION BY tgt_id ORDER BY cmu DESC, src_id) AS r
         |        FROM sc) WHERE r <= 4 GROUP BY 1),
         |m AS (SELECT sc.src_id, sc.tgt_id, cmu,
         |        floor(CAST(cmu AS DOUBLE) * 8.0 / CAST(amu + bmu AS DOUBLE) * 1000000 + 0.5) / 1000000 AS margin
         |      FROM sc JOIN a USING (src_id) JOIN b USING (tgt_id)
         |      WHERE amu + bmu <> 0),
         |fwd AS (SELECT src_id, tgt_id, cmu, margin FROM (
         |          SELECT *, row_number() OVER (PARTITION BY src_id ORDER BY margin DESC, tgt_id) AS rs
         |          FROM m) WHERE rs = 1),
         |bwd AS (SELECT src_id, tgt_id FROM (
         |          SELECT src_id, tgt_id, row_number() OVER (PARTITION BY tgt_id ORDER BY margin DESC, src_id) AS rt
         |          FROM m) WHERE rt = 1)
         |SELECT fwd.src_id, fwd.tgt_id,
         |  CAST(cmu AS DOUBLE) / 1000000 AS cos, margin
         |FROM fwd JOIN bwd ON fwd.src_id = bwd.src_id AND fwd.tgt_id = bwd.tgt_id
         |WHERE margin >= 1.0""".stripMargin
    },
    "q_ann_negatives_lsh" -> {
      val planeBit = (p: Int) =>
        s"""CASE WHEN (SELECT sum(z[1] * (CAST('0x' || substr(md5('p$p:' || CAST(z[2] AS VARCHAR)), 1, 8) AS BIGINT) / 4294967296.0 - 0.5))
           |  FROM unnest(list_zip(v, range(0, len(v)))) AS t(z)) > 0.0 THEN ${1L << p} ELSE 0 END""".stripMargin
      s"""WITH base AS (
         |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |bucketed AS (
         |  SELECT vec_id, label, v,
         |    CAST(${(0 until 4).map(planeBit).mkString(" + ")} AS BIGINT) AS bucket
         |  FROM base),
         |pairs AS (
         |  SELECT a.vec_id AS id, b.vec_id AS negative,
         |    floor(list_cosine_similarity(a.v, b.v) * 1000000 + 0.5) / 1000000 AS cos
         |  FROM bucketed a JOIN bucketed b
         |    ON a.bucket = b.bucket AND a.label <> b.label),
         |ranked AS (
         |  SELECT id, negative, cos,
         |    CAST(row_number() OVER (PARTITION BY id ORDER BY cos DESC, negative)
         |      AS BIGINT) AS rank
         |  FROM pairs)
         |SELECT id, negative, cos, rank FROM ranked WHERE rank <= 5""".stripMargin
    },
    "q_ann_lsh_buckets" -> {
      // plane p bit: sign of sum_d v[d] * (md5-uniform('p<p>:<d>') - 0.5)
      val planeBit = (p: Int) =>
        s"""CASE WHEN (SELECT sum(z[1] * (CAST('0x' || substr(md5('p$p:' || CAST(z[2] AS VARCHAR)), 1, 8) AS BIGINT) / 4294967296.0 - 0.5))
           |  FROM unnest(list_zip(v, range(0, len(v)))) AS t(z)) > 0.0 THEN ${1L << p} ELSE 0 END""".stripMargin
      s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
         |SELECT vec_id, CAST(${(0 until 6).map(planeBit).mkString(" + ")} AS BIGINT) AS bucket
         |FROM base""".stripMargin
    },
    "q_dd_representative" -> {
      val bandSelects = (0 until 2)
        .map { b =>
          val sig = (0 until 4).map(r => minhashSql(b * 4 + r)).mkString(" || '_' || ")
          s"SELECT doc_id, $b AS band, $sig AS sig FROM $shingleFrom"
        }
        .mkString("\n  UNION ALL ")
      s"""WITH RECURSIVE banded AS (
         |  $bandSelects),
         |prs AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         |edges AS (
         |  SELECT id_a AS u, id_b AS v FROM prs
         |  UNION SELECT id_b, id_a FROM prs),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.id),
         |cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
         |q AS (
         |  SELECT doc_id,
         |    floor(((CASE WHEN len(t) BETWEEN 20 AND 400 THEN 0.5 ELSE 0.0 END)
         |      + (CASE WHEN (CASE WHEN len(t) = 0 THEN 0.0
         |           ELSE CAST(len(list_filter(t, x -> x IN ('the','a','and','of','to','in','is'))) AS DOUBLE) / len(t) END)
         |           BETWEEN 0.01 AND 0.5 THEN 0.5 ELSE 0.0 END)) * 100 + 0.5) / 100 AS score
         |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents))
         |SELECT cl.cluster_id, q.doc_id AS representative_id, q.score AS representative_score
         |FROM cl JOIN q USING (doc_id)
         |QUALIFY row_number() OVER (
         |  PARTITION BY cl.cluster_id ORDER BY q.score DESC, q.doc_id) = 1""".stripMargin
    },
    "q_tx_tfidf" ->
      """WITH tf AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |        FROM documents)
        |  WHERE token <> '' GROUP BY doc_id, token),
        |dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT count(*) AS n FROM documents)
        |SELECT tf.doc_id, tf.token, tf.tf,
        |  floor(tf.tf * ln(CAST(n.n AS DOUBLE) / df) * 1000000 + 0.5) / 1000000 AS tfidf
        |FROM tf JOIN dfq USING (token), n""".stripMargin,
    "q_tx_perplexity" ->
      """WITH tr AS (
        |  SELECT string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents WHERE doc_id % 5 <> 0),
        |bt AS (
        |  SELECT t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
        |  FROM tr, unnest(range(1, len(t))) AS u(i)),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bt GROUP BY 1, 2),
        |c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY 1),
        |v AS (
        |  SELECT count(DISTINCT x) AS v
        |  FROM (SELECT unnest(t) AS x FROM tr) WHERE x <> ''),
        |sb AS (
        |  SELECT doc_id, t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
        |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        |        FROM documents), unnest(range(1, len(t))) AS u(i)),
        |nll AS (
        |  SELECT doc_id,
        |    CAST(floor(-ln((coalesce(c2.c2, 0) + 0.5)
        |      / (coalesce(c1.c1, 0) + 0.5 * v.v)) * 1e9 + 0.5) AS BIGINT) AS s
        |  FROM sb LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1) CROSS JOIN v),
        |ag AS (SELECT doc_id, count(*) AS n_bigrams, sum(s) AS ss FROM nll GROUP BY 1)
        |SELECT d.doc_id, coalesce(ag.n_bigrams, 0) AS n_bigrams,
        |  floor(CAST(ss AS DOUBLE) / n_bigrams / 1e9 * 1e6 + 0.5) / 1e6 AS avg_nll,
        |  floor(exp(CAST(ss AS DOUBLE) / n_bigrams / 1e9) * 1e4 + 0.5) / 1e4 AS perplexity
        |FROM documents d LEFT JOIN ag USING (doc_id)""".stripMargin,
    "q_tx_sb_ppl" -> sbPplOracleSql,
    // CCNet terciles over the stupid-backoff scores, per language
    "q_tx_ccnet" ->
      s"""WITH scored AS ($sbPplOracleSql)
         |SELECT doc_id, lang, sb_ppl,
         |  CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS ppl_bucket
         |FROM (
         |  SELECT s.doc_id, d.lang, s.sb_ppl,
         |    ntile(3) OVER (PARTITION BY d.lang
         |      ORDER BY s.sb_ppl ASC NULLS LAST, s.doc_id) AS t
         |  FROM scored s JOIN documents d USING (doc_id))""".stripMargin,
    "q_pq_encode" ->
      s"""WITH $pqCteSql
         |SELECT vec_id, subspace, code FROM enc""".stripMargin,
    "q_pq_adc" ->
      s"""WITH $pqCteSql,
         |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
         |tab AS (
         |  SELECT CAST(mm.m AS BIGINT) AS subspace, s.code,
         |    floor(list_sum(list_transform(range(1, 17), j ->
         |      (q.qv[CAST(mm.m * 16 + j AS INT)] - s.cv[CAST(mm.m * 16 + j AS INT)])
         |      * (q.qv[CAST(mm.m * 16 + j AS INT)] - s.cv[CAST(mm.m * 16 + j AS INT)])))
         |      * 1e6 + 0.5) / 1e6 AS dist
         |  FROM q, unnest(range(0, 4)) AS mm(m), s)
         |SELECT enc.vec_id, floor(sum(tab.dist) * 1e6 + 0.5) / 1e6 AS adc
         |FROM enc JOIN tab USING (subspace, code)
         |WHERE enc.vec_id <> 0
         |GROUP BY enc.vec_id
         |ORDER BY adc, vec_id LIMIT 10""".stripMargin,
    "q_rp_project" ->
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |e AS (
        |  SELECT vec_id, CAST(z[2] AS BIGINT) AS d, CAST(z[1] AS DOUBLE) AS x
        |  FROM base, unnest(list_zip(v, range(0, len(v)))) AS t(z)),
        |w AS (
        |  SELECT e.vec_id, CAST(o.o AS BIGINT) AS out_dim,
        |    e.x * (CASE WHEN CAST('0x' || substr(md5(
        |        'rj' || CAST(o.o AS VARCHAR) || ':' || CAST(e.d AS VARCHAR)), 1, 8)
        |      AS BIGINT) / 4294967296.0 < 0.5 THEN 1.0 ELSE -1.0 END) AS term
        |  FROM e, unnest(range(0, 16)) AS o(o))
        |SELECT vec_id, out_dim,
        |  floor(sum(term) / sqrt(16.0) * 1000000 + 0.5) / 1000000 AS val
        |FROM w GROUP BY vec_id, out_dim""".stripMargin,
    "q_eq_quantize" ->
      """WITH ex AS (
        |  SELECT vec_id, CAST(z[2] AS BIGINT) AS pos, CAST(z[1] AS DOUBLE) AS x
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |       unnest(list_zip(v, range(0, len(v)))) AS t(z)),
        |b AS (SELECT pos, min(x) AS lo, max(x) AS hi FROM ex GROUP BY pos),
        |qq AS (
        |  SELECT e.vec_id, e.pos,
        |    CASE WHEN b.hi = b.lo THEN 0
        |      ELSE CAST(greatest(0.0, least(255.0, floor((e.x - b.lo) / (b.hi - b.lo) * 255 + 0.5))) AS BIGINT) - 128 END AS q,
        |    b.lo, b.hi
        |  FROM ex e JOIN b USING (pos))
        |SELECT vec_id, pos, q,
        |  floor((CASE WHEN hi = lo THEN lo ELSE lo + (q + 128) * (hi - lo) / 255.0 END) * 1000000 + 0.5) / 1000000 AS deq
        |FROM qq""".stripMargin,
    "q_tx_langid" -> langIdOracleSql(TextAnalysis.LangMarkers),
    "q_tx_langseg" -> langSegOracleSql(TextAnalysis.LangMarkers),
    "q_tx_langid_custom" -> langIdOracleSql(CustomLangMarkers),
    "q_tx_quality" ->
      """WITH base AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t,
        |    length(trim(text)) AS char_count
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, len(t) AS word_count, char_count,
        |    CASE WHEN len(t) = 0 THEN 0.0
        |      ELSE CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t) END AS awl,
        |    CASE WHEN len(t) = 0 THEN 0.0
        |      ELSE CAST(len(list_filter(t, x -> x IN ('the','a','and','of','to','in','is'))) AS DOUBLE) / len(t) END AS sr
        |  FROM base)
        |SELECT doc_id, word_count, char_count, floor(awl * 1000 + 0.5) / 1000 AS avg_word_len,
        |  floor(sr * 10000 + 0.5) / 10000 AS stopword_ratio,
        |  floor(((CASE WHEN word_count BETWEEN 20 AND 400 THEN 0.5 ELSE 0.0 END)
        |      + (CASE WHEN sr BETWEEN 0.01 AND 0.5 THEN 0.5 ELSE 0.0 END)) * 100 + 0.5) / 100 AS quality_score
        |FROM m""".stripMargin,
    "q_tx_tokens" ->
      """SELECT doc_id,
        |  len(string_split_regex(trim(lower(text)), '\s+')) AS ws_tokens,
        |  len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS re_tokens
        |FROM documents""".stripMargin,
    "q_tx_fingerprint" ->
      """SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(string_split_regex(trim(lower(text)), '\s+'))), ' ')) AS fp
        |FROM documents""".stripMargin,
    "q_tx_sentchunks" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id,
        |    regexp_extract_all(
        |      regexp_replace(text, '(\w+ \w+ \w+ \w+ \w+) ', '\1. ', 'g'),
        |      '[^.!?]*[.!?]+|[^.!?]+') AS sents
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |sx AS (
        |  SELECT doc_id, sents, unnest(range(1, len(sents) + 1)) AS pos FROM d),
        |s AS (
        |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
        |    sents[CAST(pos AS INT)] AS sv,
        |    CAST(len(string_split_regex(trim(sents[CAST(pos AS INT)]), '\s+')) AS BIGINT) AS nt
        |  FROM sx),
        |st(doc_id, pos, idx, fill) AS (
        |  SELECT doc_id, pos, CAST(0 AS BIGINT), nt FROM s WHERE pos = 1
        |  UNION ALL
        |  SELECT s.doc_id, s.pos,
        |    CASE WHEN st.fill + s.nt > 64 THEN st.idx + 1 ELSE st.idx END,
        |    CASE WHEN st.fill + s.nt > 64 THEN s.nt ELSE st.fill + s.nt END
        |  FROM st JOIN s ON s.doc_id = st.doc_id AND s.pos = st.pos + 1)
        |SELECT st.doc_id, st.idx AS chunk_idx,
        |  count(*) AS n_sentences, CAST(sum(s.nt) AS BIGINT) AS n_tokens,
        |  string_agg(s.sv, '' ORDER BY s.pos) AS chunk_text
        |FROM st JOIN s USING (doc_id, pos)
        |GROUP BY 1, 2""".stripMargin,
    "q_tx_fertility" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(lower(coalesce(text, ''))), '\s+')) AS BIGINT) AS n_words,
        |    CAST(strlen(coalesce(text, '')) AS BIGINT) AS n_bytes,
        |    CAST(length(coalesce(text, '')) AS BIGINT) AS n_cp,
        |    CAST(strlen(regexp_replace(trim(lower(coalesce(text, ''))), '\s+', '', 'g')) AS BIGINT)
        |      + CAST(len(string_split_regex(trim(lower(coalesce(text, ''))), '\s+')) AS BIGINT)
        |      AS byte_tokens
        |  FROM documents WHERE doc_id IS NOT NULL)
        |SELECT doc_id, n_words, n_bytes, n_cp, byte_tokens,
        |  floor(CAST(byte_tokens AS DOUBLE) / CAST(n_words AS DOUBLE)
        |    * 1000000 + 0.5) / 1000000 AS tokens_per_word,
        |  floor(CAST(n_bytes AS DOUBLE) / CAST(byte_tokens AS DOUBLE)
        |    * 1000000 + 0.5) / 1000000 AS bytes_per_token
        |FROM b""".stripMargin,
    "q_tx_dedup_lines" ->
      """WITH lined AS (
        |  SELECT doc_id,
        |    [substr(text, 1, 20), substr(text, 21, 20),
        |     substr(text, 1, 20), substr(text, 41, 20)] AS ls
        |  FROM documents)
        |SELECT doc_id,
        |  array_to_string(list_filter(ls, (x, i) -> list_position(ls, x) = i), chr(10))
        |    AS deduped
        |FROM lined""".stripMargin,
    "q_tx_scrub" ->
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      text || CASE WHEN doc_id % 3 = 0 THEN ' mail bob.smith+a@ex-ample.org end' ELSE '' END
        |           || CASE WHEN doc_id % 4 = 0 THEN ' see https://example.com/a?b=1 done' ELSE '' END,
        |      'https?://[^\s]+', '<URL>', 'g'),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS scrubbed
        |FROM documents""".stripMargin,
    "q_cr_web" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '') AS w,
        |    list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)), l -> l <> '') AS ls
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    (CAST(len(w) AS BIGINT) BETWEEN 50 AND 100000)
        |    AND (CASE WHEN len(w) = 0 THEN 0.0 ELSE floor(
        |      (CAST(coalesce(list_sum(list_transform(w, x -> length(x))), 0) AS DOUBLE)
        |        / CAST(len(w) AS DOUBLE)) * 10000 + 0.5) / 10000 END BETWEEN 3.0 AND 10.0)
        |    AND (CASE WHEN len(w) = 0 THEN 0.0 ELSE floor(
        |      (CAST(length(text) - length(replace(text, '#', ''))
        |        + (length(text) - length(replace(text, '...', ''))) / 3
        |        + length(text) - length(replace(text, chr(8230), '')) AS DOUBLE)
        |        / CAST(len(w) AS DOUBLE)) * 10000 + 0.5) / 10000 END <= 0.1)
        |    AND (CASE WHEN len(ls) = 0 THEN 0.0 ELSE floor(
        |      (CAST(len(list_filter(ls, l -> starts_with(l, chr(8226))
        |          OR starts_with(l, '-') OR starts_with(l, '*'))) AS DOUBLE)
        |        / CAST(len(ls) AS DOUBLE)) * 10000 + 0.5) / 10000 END <= 0.9)
        |    AND (CASE WHEN len(ls) = 0 THEN 0.0 ELSE floor(
        |      (CAST(len(list_filter(ls, l -> ends_with(l, '...')
        |          OR ends_with(l, chr(8230)))) AS DOUBLE)
        |        / CAST(len(ls) AS DOUBLE)) * 10000 + 0.5) / 10000 END <= 0.3)
        |    AND (CASE WHEN len(w) = 0 THEN 0.0 ELSE floor(
        |      (CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
        |        / CAST(len(w) AS DOUBLE)) * 10000 + 0.5) / 10000 END >= 0.8)
        |    AND (len(list_filter(list_distinct(w), x -> list_contains(
        |      ['the','be','to','of','and','that','have','with'], x))) >= 2) AS gopher_ok
        |  FROM t),
        |c AS (
        |  SELECT doc_id,
        |    NOT contains(lower(text), 'lorem ipsum') AND NOT contains(text, '{')
        |      AND length(coalesce(ct, '')) - length(regexp_replace(coalesce(ct, ''), '[.!?]', '', 'g')) >= 3 AS c4_ok
        |  FROM (
        |    SELECT doc_id, text, array_to_string(
        |      list_filter(ls, l -> (ends_with(l, '.') OR ends_with(l, '!')
        |          OR ends_with(l, '?') OR ends_with(l, '"'))
        |        AND len(list_filter(regexp_split_to_array(l, '\s+'), x -> x <> '')) >= 3),
        |      chr(10)) AS ct
        |    FROM t)),
        |r AS (
        |  SELECT doc_id,
        |    (CASE WHEN len(rls) = 0 THEN 0.0 ELSE floor(
        |      (CAST(len(rls) - len(list_distinct(rls)) AS DOUBLE)
        |        / CAST(len(rls) AS DOUBLE)) * 10000 + 0.5) / 10000 END <= 0.3)
        |    AND (CASE WHEN len(w) = 0 THEN 0.0 ELSE floor(
        |      (CAST(len(w) - len(list_distinct(w)) AS DOUBLE)
        |        / CAST(len(w) AS DOUBLE)) * 10000 + 0.5) / 10000 END <= 0.3)
        |    AND (CASE WHEN len(w) = 0 THEN 0.0 ELSE floor(
        |      (CAST(list_max(list_transform(list_distinct(w), d ->
        |          len(list_filter(w, x -> x = d)))) AS DOUBLE)
        |        / CAST(len(w) AS DOUBLE)) * 10000 + 0.5) / 10000 END <= 0.2) AS rep_ok
        |  FROM (SELECT doc_id, w, string_split(text, chr(10)) AS rls
        |        FROM t)),
        |ch AS (SELECT doc_id, md5(trim(lower(text))) AS h FROM documents),
        |canon AS (SELECT h, min(doc_id) AS cid FROM ch GROUP BY 1)
        |SELECT t.doc_id, g.gopher_ok, c.c4_ok, r.rep_ok,
        |  (t.doc_id = canon.cid) AS exact_canonical,
        |  g.gopher_ok AND c.c4_ok AND r.rep_ok AND (t.doc_id = canon.cid) AS keep
        |FROM t
        |JOIN g USING (doc_id) JOIN c USING (doc_id) JOIN r USING (doc_id)
        |JOIN ch ON ch.doc_id = t.doc_id JOIN canon ON canon.h = ch.h""".stripMargin,
    "q_tx_c4" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)), l -> l <> '') AS ls
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, text,
        |    list_filter(ls, l -> (ends_with(l, '.') OR ends_with(l, '!')
        |        OR ends_with(l, '?') OR ends_with(l, '"'))
        |      AND len(list_filter(regexp_split_to_array(l, '\s+'), w -> w <> '')) >= 3) AS kept,
        |    ls
        |  FROM t),
        |m AS (
        |  SELECT doc_id, text,
        |    coalesce(array_to_string(kept, chr(10)), '') AS clean_text,
        |    CAST(len(kept) AS BIGINT) AS lines_kept,
        |    CAST(len(ls) AS BIGINT) AS lines_total
        |  FROM k)
        |SELECT doc_id, clean_text, lines_kept, lines_total,
        |  CAST(length(clean_text) - length(regexp_replace(clean_text, '[.!?]', '', 'g')) AS BIGINT) AS sentences,
        |  NOT contains(lower(text), 'lorem ipsum') AND NOT contains(text, '{')
        |    AND length(clean_text) - length(regexp_replace(clean_text, '[.!?]', '', 'g')) >= 3 AS keep
        |FROM m""".stripMargin,
    "q_tx_gopher" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '') AS w,
        |    list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)), l -> l <> '') AS ls
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(w) AS BIGINT) AS word_count,
        |    CASE WHEN len(w) = 0 THEN 0.0 ELSE floor(
        |      (CAST(coalesce(list_sum(list_transform(w, x -> length(x))), 0) AS DOUBLE)
        |        / CAST(len(w) AS DOUBLE)) * 10000 + 0.5) / 10000 END AS mean_word_len,
        |    CASE WHEN len(w) = 0 THEN 0.0 ELSE floor(
        |      (CAST(length(text) - length(replace(text, '#', ''))
        |        + (length(text) - length(replace(text, '...', ''))) / 3
        |        + length(text) - length(replace(text, chr(8230), '')) AS DOUBLE)
        |        / CAST(len(w) AS DOUBLE)) * 10000 + 0.5) / 10000 END AS symbol_ratio,
        |    CASE WHEN len(ls) = 0 THEN 0.0 ELSE floor(
        |      (CAST(len(list_filter(ls, l -> starts_with(l, chr(8226))
        |          OR starts_with(l, '-') OR starts_with(l, '*'))) AS DOUBLE)
        |        / CAST(len(ls) AS DOUBLE)) * 10000 + 0.5) / 10000 END AS bullet_ratio,
        |    CASE WHEN len(ls) = 0 THEN 0.0 ELSE floor(
        |      (CAST(len(list_filter(ls, l -> ends_with(l, '...')
        |          OR ends_with(l, chr(8230)))) AS DOUBLE)
        |        / CAST(len(ls) AS DOUBLE)) * 10000 + 0.5) / 10000 END AS ellipsis_ratio,
        |    CASE WHEN len(w) = 0 THEN 0.0 ELSE floor(
        |      (CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
        |        / CAST(len(w) AS DOUBLE)) * 10000 + 0.5) / 10000 END AS alpha_ratio,
        |    CAST(len(list_filter(list_distinct(w), x -> list_contains(
        |      ['the','be','to','of','and','that','have','with'], x))) AS BIGINT) AS stop_hits
        |  FROM t)
        |SELECT *,
        |  (word_count BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
        |    AND symbol_ratio <= 0.1 AND bullet_ratio <= 0.9 AND ellipsis_ratio <= 0.3
        |    AND alpha_ratio >= 0.8 AND stop_hits >= 2 AS keep
        |FROM m""".stripMargin,
    "q_tx_repetition" ->
      """WITH lined AS (
        |  SELECT doc_id,
        |    [substr(text, 1, 40), substr(text, 41, 40),
        |     substr(text, 1, 40), substr(text, 81, 40)] AS ls,
        |    substr(text, 1, 40) || chr(10) || substr(text, 41, 40) || chr(10) ||
        |      substr(text, 1, 40) || chr(10) || substr(text, 81, 40) AS ltext
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, ls,
        |    string_split_regex(trim(lower(ltext)), '\s+') AS t,
        |    list_filter(ls, (x, i) -> list_position(ls, x) <> i) AS dupl
        |  FROM lined),
        |r AS (
        |  SELECT doc_id,
        |    CAST(len(ls) - len(list_distinct(ls)) AS DOUBLE) / len(ls) AS dlr,
        |    CASE WHEN list_sum(list_transform(ls, x -> length(x))) = 0 THEN 0.0
        |      ELSE CAST(coalesce(list_sum(list_transform(dupl, x -> length(x))), 0) AS DOUBLE)
        |           / list_sum(list_transform(ls, x -> length(x))) END AS dlcr,
        |    CAST(len(t) - len(list_distinct(t)) AS DOUBLE) / len(t) AS dtr,
        |    CAST(list_max(list_transform(list_distinct(t), d -> len(list_filter(t, x -> x = d)))) AS DOUBLE)
        |      / len(t) AS ttr
        |  FROM m)
        |SELECT doc_id,
        |  floor(dlr * 10000 + 0.5) / 10000 AS dup_line_ratio,
        |  floor(dlcr * 10000 + 0.5) / 10000 AS dup_line_char_ratio,
        |  floor(dtr * 10000 + 0.5) / 10000 AS dup_token_ratio,
        |  floor(ttr * 10000 + 0.5) / 10000 AS top_token_ratio
        |FROM r""".stripMargin,
    "q_tx_chunks" ->
      """WITH base AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tt FROM documents)
        |SELECT doc_id, CAST(u.i AS BIGINT) AS chunk_idx,
        |  array_to_string(tt[CAST(u.i AS INT) * 32 + 1 : CAST(u.i AS INT) * 32 + 40], ' ')
        |    AS chunk_text,
        |  least(len(tt) - CAST(u.i AS BIGINT) * 32, 40) AS chunk_tokens
        |FROM base, unnest(range(0, (greatest(len(tt) - 8, 1) - 1) // 32 + 1)) AS u(i)""".stripMargin,
    "q_dd_incr" ->
      """WITH batch AS (
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id, text || ' zz' || CAST(doc_id AS VARCHAR)
        |  FROM documents WHERE doc_id % 3 = 1),
        |hh AS (SELECT DISTINCT md5(trim(lower(text))) AS content_hash FROM documents)
        |SELECT b.doc_id, md5(trim(lower(b.text))) AS content_hash,
        |  (hh.content_hash IS NOT NULL) AS seen_before
        |FROM batch b LEFT JOIN hh ON md5(trim(lower(b.text))) = hh.content_hash""".stripMargin,
    "q_pk_concat" ->
      """WITH base AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tt,
        |    CAST('0x' || substr(md5('pkshard' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 8 AS shard,
        |    CAST('0x' || substr(md5('pk' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) / 4294967296.0 AS u
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, tt, shard, CAST(len(tt) AS BIGINT) AS nt,
        |    CAST(sum(CAST(len(tt) AS BIGINT)) OVER (PARTITION BY shard ORDER BY u, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM base),
        |seg AS (
        |  SELECT shard, doc_id, tt, nt, cum, cum - nt AS cb, CAST(sq.s AS BIGINT) AS seq_idx
        |  FROM c, unnest(range(CAST((cum - nt) // 128 AS BIGINT),
        |                       CAST((cum - 1) // 128 + 1 AS BIGINT))) AS sq(s))
        |SELECT shard, seq_idx, doc_id,
        |  cb + greatest(seq_idx * 128 - cb, 0) - seq_idx * 128 AS seq_offset,
        |  least((seq_idx + 1) * 128, cum) - cb - greatest(seq_idx * 128 - cb, 0) AS seg_tokens,
        |  array_to_string(tt[CAST(greatest(seq_idx * 128 - cb, 0) AS INT) + 1
        |    : CAST(least((seq_idx + 1) * 128, cum) - cb AS INT)], ' ') AS seg_text
        |FROM seg""".stripMargin,
    "q_pk_mask" ->
      """WITH base AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tt,
        |    CAST('0x' || substr(md5('pkshard' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 8 AS shard,
        |    CAST('0x' || substr(md5('pk' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) / 4294967296.0 AS u
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, tt, shard, CAST(len(tt) AS BIGINT) AS nt,
        |    CAST(sum(CAST(len(tt) AS BIGINT)) OVER (PARTITION BY shard ORDER BY u, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM base),
        |seg AS (
        |  SELECT shard, doc_id, nt, cum, cum - nt AS cb, CAST(sq.s AS BIGINT) AS seq_idx
        |  FROM c, unnest(range(CAST((cum - nt) // 128 AS BIGINT),
        |                       CAST((cum - 1) // 128 + 1 AS BIGINT))) AS sq(s))
        |SELECT shard, seq_idx, doc_id,
        |  cb + greatest(seq_idx * 128 - cb, 0) - seq_idx * 128 AS seq_offset,
        |  least((seq_idx + 1) * 128, cum) - cb - greatest(seq_idx * 128 - cb, 0) AS seg_tokens,
        |  array_to_string(list_transform(
        |    range(CAST(greatest(seq_idx * 128 - cb, 0) AS BIGINT),
        |          CAST(least((seq_idx + 1) * 128, cum) - cb AS BIGINT)),
        |    x -> CASE WHEN x % 3 = 0 THEN '1' ELSE '0' END), '') AS seg_mask_bits
        |FROM seg""".stripMargin,

    "q_pk_greedy" ->
      """WITH RECURSIVE base AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS nt,
        |    CAST('0x' || substr(md5('pkshard' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 8 AS shard,
        |    CAST('0x' || substr(md5('pk' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) / 4294967296.0 AS u
        |  FROM documents),
        |it AS (
        |  SELECT *, row_number() OVER (PARTITION BY shard ORDER BY u, doc_id) AS k FROM base),
        |st AS (
        |  SELECT shard, k, doc_id, nt, CAST(0 AS BIGINT) AS bin, nt AS fill
        |  FROM it WHERE k = 1
        |  UNION ALL
        |  SELECT i.shard, i.k, i.doc_id, i.nt,
        |    CASE WHEN s.fill + i.nt > 128 THEN s.bin + 1 ELSE s.bin END,
        |    CASE WHEN s.fill + i.nt > 128 THEN i.nt ELSE s.fill + i.nt END
        |  FROM st s JOIN it i ON i.shard = s.shard AND i.k = s.k + 1)
        |SELECT shard, bin AS seq_idx, doc_id, nt FROM st""".stripMargin,
    "q_pk_shards" -> shardBySizeSql,
    "q_pk_shard_report" ->
      s"""WITH asg AS ($shardBySizeSql)
         |SELECT shard, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_size
         |FROM asg GROUP BY 1""".stripMargin,
    "q_pk_lenbucket" -> lenBucketSql,
    "q_pk_padwaste" ->
      s"""WITH asg AS ($lenBucketSql)
         |SELECT bucket, batch_idx, count(*) AS rows,
         |  max(n_tokens) AS max_len,
         |  CAST(sum(n_tokens) AS BIGINT) AS actual_tokens,
         |  count(*) * max(n_tokens) AS padded_tokens,
         |  floor((1.0 - CAST(sum(n_tokens) AS DOUBLE)
         |    / (count(*) * max(n_tokens))) * 1000000 + 0.5) / 1000000 AS waste_frac
         |FROM asg GROUP BY 1, 2""".stripMargin,
    "q_tx_dedup_global" ->
      """WITH lined AS (
        |  SELECT doc_id, concat_ws(chr(10), 'shared header',
        |    substr(text, 1, 40), substr(text, 1, 40), substr(text, 41, 40)) AS ltext
        |  FROM documents),
        |l AS (
        |  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
        |    string_split(ltext, chr(10))[CAST(u.i AS INT) + 1] AS line
        |  FROM lined, unnest(range(0, len(string_split(ltext, chr(10))))) AS u(i)),
        |k AS (
        |  SELECT doc_id, pos, line,
        |    row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
        |  FROM l WHERE line <> '')
        |SELECT doc_id,
        |  array_to_string(list(line ORDER BY pos), chr(10)) AS clean_text,
        |  count(*) AS kept_lines
        |FROM k WHERE rn = 1 GROUP BY doc_id""".stripMargin,
    "q_tx_cdc" ->
      s"""WITH $cdcCtePrefix
        |SELECT doc_id, CAST(u.k AS BIGINT) AS chunk_idx,
        |  CAST(starts[CAST(u.k AS INT) + 1] AS BIGINT) AS chunk_start,
        |  CAST(ends[CAST(u.k AS INT) + 1] - starts[CAST(u.k AS INT) + 1] AS BIGINT)
        |    AS chunk_tokens,
        |  array_to_string(
        |    tt[CAST(starts[CAST(u.k AS INT) + 1] AS INT) + 1
        |       : CAST(ends[CAST(u.k AS INT) + 1] AS INT)], ' ') AS chunk_text,
        |  md5(array_to_string(
        |    tt[CAST(starts[CAST(u.k AS INT) + 1] AS INT) + 1
        |       : CAST(ends[CAST(u.k AS INT) + 1] AS INT)], ' ')) AS chunk_hash
        |FROM j, unnest(range(0, len(starts))) AS u(k)""".stripMargin,
    "q_tx_top_tokens" ->
      """SELECT lang, token, count(*) AS tf,
        |  CAST(row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, token)
        |    AS BIGINT) AS rank
        |FROM (SELECT lang, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |      FROM documents)
        |WHERE token <> ''
        |GROUP BY lang, token
        |QUALIFY rank <= 20""".stripMargin,
    "q_hh_tokens" ->
      """WITH t AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |    FROM documents),
        |tt AS (SELECT token FROM t WHERE token <> '')
        |SELECT token, count(*) AS cnt FROM tt GROUP BY token
        |HAVING count(*) * 50 > (SELECT count(*) FROM tt)""".stripMargin,
    "q_fim" -> {
      def u(salt: String) =
        s"(CAST('0x' || substr(md5('$salt' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) / 4294967296.0)"
      s"""WITH b AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
         |c AS (SELECT doc_id, t,
         |        CAST(floor(${u("fimc1")} * (length(t) + 1)) AS INT) AS c1,
         |        CAST(floor(${u("fimc2")} * (length(t) + 1)) AS INT) AS c2,
         |        ${u("fima")} AS ua, ${u("fims")} AS us
         |      FROM b),
         |d AS (SELECT doc_id, t, least(c1, c2) AS lo, greatest(c1, c2) AS hi, ua, us FROM c),
         |e AS (SELECT doc_id, t,
         |        substr(t, 1, greatest(lo, 0)) AS pre,
         |        substr(t, lo + 1, greatest(hi - lo, 0)) AS mid,
         |        substr(t, hi + 1, greatest(length(t) - hi, 0)) AS suf,
         |        CASE WHEN NOT (ua < 0.5) THEN 'none'
         |             WHEN us < 0.5 THEN 'spm' ELSE 'psm' END AS format
         |      FROM d)
         |SELECT doc_id, format,
         |  CASE format WHEN 'none' THEN t
         |       WHEN 'spm' THEN '<SUF>' || suf || '<PRE>' || pre || '<MID>' || mid
         |       ELSE '<PRE>' || pre || '<SUF>' || suf || '<MID>' || mid END AS out_text
         |FROM e""".stripMargin
    },
    "q_tx_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split(coalesce(text, ''), '')) AS c
        |  FROM documents),
        |cc AS (SELECT doc_id, c, count(*) AS k FROM ch WHERE c <> '' GROUP BY 1, 2),
        |wn AS (SELECT doc_id, c, k,
        |    sum(k) OVER (PARTITION BY doc_id) AS n FROM cc),
        |per AS (SELECT doc_id, CAST(max(n) AS BIGINT) AS nc,
        |    sum(CAST(floor(-((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
        |      * ln(CAST(k AS DOUBLE) / CAST(n AS DOUBLE))) * 1e9 + 0.5) AS BIGINT)) AS e
        |  FROM wn GROUP BY 1)
        |SELECT d.doc_id, coalesce(per.nc, 0) AS n_chars,
        |  floor(CAST(coalesce(per.e, 0) AS DOUBLE) / 1e9 * 1000000 + 0.5) / 1000000
        |    AS entropy_nats
        |FROM documents d LEFT JOIN per USING (doc_id)""".stripMargin,
    "q_tx_zipf" ->
      """WITH tok AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |  FROM documents),
        |tf AS (SELECT token, count(*) AS tf FROM tok WHERE token <> '' GROUP BY 1),
        |rk AS (SELECT tf, row_number() OVER (ORDER BY tf DESC, token) AS rank FROM tf),
        |pt AS (SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(tf AS DOUBLE)) AS y, tf FROM rk),
        |s AS (SELECT count(*) AS n,
        |    sum(CAST(floor(x * 1e9 + 0.5) AS BIGINT)) AS sx,
        |    sum(CAST(floor(y * 1e9 + 0.5) AS BIGINT)) AS sy,
        |    sum(CAST(floor(x * y * 1e9 + 0.5) AS BIGINT)) AS sxy,
        |    sum(CAST(floor(x * x * 1e9 + 0.5) AS BIGINT)) AS sxx,
        |    sum(CAST(floor(y * y * 1e9 + 0.5) AS BIGINT)) AS syy,
        |    CAST(sum(tf) AS BIGINT) AS n_tokens
        |  FROM pt),
        |f AS (SELECT n, n_tokens,
        |    CAST(n AS DOUBLE) AS nd,
        |    CAST(sx AS DOUBLE) / 1e9 AS dsx, CAST(sy AS DOUBLE) / 1e9 AS dsy,
        |    CAST(sxy AS DOUBLE) / 1e9 AS dsxy, CAST(sxx AS DOUBLE) / 1e9 AS dsxx,
        |    CAST(syy AS DOUBLE) / 1e9 AS dsyy
        |  FROM s),
        |g AS (SELECT n, n_tokens, nd, dsx, dsy,
        |    nd * dsxy - dsx * dsy AS cov,
        |    nd * dsxx - dsx * dsx AS varx,
        |    nd * dsyy - dsy * dsy AS vary
        |  FROM f),
        |h AS (SELECT n, n_tokens, nd, dsx, dsy, cov, varx, vary,
        |    CASE WHEN n >= 2 AND varx <> 0 THEN cov / varx END AS slope_r
        |  FROM g)
        |SELECT n AS n_types, n_tokens,
        |  floor(slope_r * 1000000 + 0.5) / 1000000 AS slope,
        |  floor((dsy - slope_r * dsx) / nd * 1000000 + 0.5) / 1000000 AS intercept,
        |  floor(CASE WHEN vary <> 0 THEN (cov * cov) / (varx * vary) END
        |    * 1000000 + 0.5) / 1000000 AS r2
        |FROM h""".stripMargin,
    "q_tx_heaps" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |  FROM documents),
        |tk AS (SELECT doc_id, token FROM tok WHERE token <> '' AND doc_id IS NOT NULL),
        |pd AS (SELECT doc_id, count(*) AS ntok FROM tk GROUP BY 1),
        |fo AS (SELECT min(doc_id) AS doc_id FROM tk GROUP BY token),
        |nt AS (SELECT doc_id, count(*) AS ntyp FROM fo GROUP BY 1),
        |sp AS (SELECT pd.doc_id, ntok, coalesce(ntyp, 0) AS ntyp
        |  FROM pd LEFT JOIN nt USING (doc_id)),
        |cm AS (SELECT sum(ntok) OVER w AS cn, sum(ntyp) OVER w AS cv FROM sp
        |  WINDOW w AS (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |pt AS (SELECT ln(CAST(cn AS DOUBLE)) AS x, ln(CAST(cv AS DOUBLE)) AS y, cn, cv
        |  FROM cm),
        |s AS (SELECT count(*) AS n,
        |    sum(CAST(floor(x * 1e9 + 0.5) AS BIGINT)) AS sx,
        |    sum(CAST(floor(y * 1e9 + 0.5) AS BIGINT)) AS sy,
        |    sum(CAST(floor(x * y * 1e9 + 0.5) AS BIGINT)) AS sxy,
        |    sum(CAST(floor(x * x * 1e9 + 0.5) AS BIGINT)) AS sxx,
        |    sum(CAST(floor(y * y * 1e9 + 0.5) AS BIGINT)) AS syy,
        |    CAST(max(cn) AS BIGINT) AS n_tokens, CAST(max(cv) AS BIGINT) AS n_types
        |  FROM pt),
        |f AS (SELECT n, n_tokens, n_types,
        |    CAST(n AS DOUBLE) AS nd,
        |    CAST(sx AS DOUBLE) / 1e9 AS dsx, CAST(sy AS DOUBLE) / 1e9 AS dsy,
        |    CAST(sxy AS DOUBLE) / 1e9 AS dsxy, CAST(sxx AS DOUBLE) / 1e9 AS dsxx,
        |    CAST(syy AS DOUBLE) / 1e9 AS dsyy
        |  FROM s),
        |g AS (SELECT n, n_tokens, n_types, nd, dsx, dsy,
        |    nd * dsxy - dsx * dsy AS cov,
        |    nd * dsxx - dsx * dsx AS varx,
        |    nd * dsyy - dsy * dsy AS vary
        |  FROM f),
        |h AS (SELECT n, n_tokens, n_types, nd, dsx, dsy, cov, varx, vary,
        |    CASE WHEN n >= 2 AND varx <> 0 THEN cov / varx END AS slope_r
        |  FROM g),
        |i AS (SELECT n, n_tokens, n_types, nd, dsx, dsy, cov, varx, vary, slope_r,
        |    floor((dsy - slope_r * dsx) / nd * 1000000 + 0.5) / 1000000 AS icpt6
        |  FROM h)
        |SELECT n AS n_docs, n_tokens, n_types,
        |  floor(slope_r * 1000000 + 0.5) / 1000000 AS beta,
        |  floor(exp(icpt6) * 1000000 + 0.5) / 1000000 AS k,
        |  floor(CASE WHEN vary <> 0 THEN (cov * cov) / (varx * vary) END
        |    * 1000000 + 0.5) / 1000000 AS r2
        |FROM i""".stripMargin,
    "q_tx_jsd" ->
      """WITH ta AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |  FROM documents WHERE lang = 'en'),
        |tb AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |  FROM documents WHERE coalesce(lang, '') <> 'en'),
        |ca AS (SELECT token, count(*) AS ka FROM ta WHERE token <> '' GROUP BY 1),
        |cb AS (SELECT token, count(*) AS kb FROM tb WHERE token <> '' GROUP BY 1),
        |j AS (SELECT coalesce(ka, 0) AS ka, coalesce(kb, 0) AS kb
        |  FROM ca FULL OUTER JOIN cb USING (token)),
        |tt AS (SELECT count(*) AS vocab, CAST(sum(ka) AS BIGINT) AS na,
        |    CAST(sum(kb) AS BIGINT) AS nb FROM j),
        |p AS (SELECT
        |    (CAST(ka AS DOUBLE) + 0.5) /
        |      (CAST(na AS DOUBLE) + 0.5 * CAST(vocab AS DOUBLE)) AS pa,
        |    (CAST(kb AS DOUBLE) + 0.5) /
        |      (CAST(nb AS DOUBLE) + 0.5 * CAST(vocab AS DOUBLE)) AS pb
        |  FROM j, tt),
        |p2 AS (SELECT pa, pb, (pa + pb) / 2.0 AS m FROM p),
        |s AS (SELECT
        |    sum(CAST(floor(pa * ln(pa / pb) * 1e9 + 0.5) AS BIGINT)) AS klab,
        |    sum(CAST(floor(pb * ln(pb / pa) * 1e9 + 0.5) AS BIGINT)) AS klba,
        |    sum(CAST(floor((pa * ln(pa / m) + pb * ln(pb / m)) / 2.0 * 1e9 + 0.5)
        |      AS BIGINT)) AS jd
        |  FROM p2)
        |SELECT vocab, na AS n_tokens_a, nb AS n_tokens_b,
        |  floor(CAST(klab AS DOUBLE) / 1e9 * 1000000 + 0.5) / 1000000 AS kl_ab,
        |  floor(CAST(klba AS DOUBLE) / 1e9 * 1000000 + 0.5) / 1000000 AS kl_ba,
        |  floor(CAST(jd AS DOUBLE) / 1e9 * 1000000 + 0.5) / 1000000 AS jsd
        |FROM s, tt""".stripMargin,
    "q_ul2_mix" -> ul2MixOracleSql,
    "q_t5_spans" ->
      """WITH d AS (SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(coalesce(text, ''))), '\s+'),
        |      x -> x <> '') AS l
        |  FROM documents),
        |tk AS (SELECT doc_id, len(l) AS n, z[1] AS tok, CAST(z[2] AS BIGINT) AS pos
        |  FROM d, unnest(list_zip(l, range(0, len(l)))) AS t(z)),
        |c AS (SELECT doc_id, n, tok, pos,
        |    pos // 8 AS blk, pos % 8 AS ib, n // 8 AS numfull,
        |    CAST('0x' || substr(md5('t5:' || CAST(doc_id AS VARCHAR) || ':'
        |      || CAST(pos // 8 AS VARCHAR)), 1, 8) AS BIGINT) % 6 AS off
        |  FROM tk),
        |cl AS (SELECT doc_id, n, pos, blk, ib, off, tok,
        |    (blk < numfull AND ib >= off AND ib < off + 3) AS corr FROM c),
        |agg AS (SELECT doc_id, any_value(n) AS n,
        |    string_agg(CASE WHEN NOT corr THEN tok
        |        WHEN ib = off THEN '<extra_id_' || CAST(blk AS VARCHAR) || '>' END,
        |      ' ' ORDER BY pos) AS input_text,
        |    string_agg(CASE
        |        WHEN corr AND ib = off
        |          THEN '<extra_id_' || CAST(blk AS VARCHAR) || '> ' || tok
        |        WHEN corr THEN tok END,
        |      ' ' ORDER BY pos) AS tgt
        |  FROM cl GROUP BY doc_id)
        |SELECT doc.doc_id, coalesce(agg.n, 0) AS n_tokens,
        |  coalesce(agg.input_text, '') AS input_text,
        |  CASE WHEN agg.tgt IS NULL OR agg.tgt = ''
        |       THEN '<extra_id_' || CAST(coalesce(agg.n, 0) // 8 AS VARCHAR) || '>'
        |       ELSE agg.tgt || ' <extra_id_' || CAST(agg.n // 8 AS VARCHAR) || '>'
        |       END AS target_text
        |FROM documents doc LEFT JOIN agg USING (doc_id)""".stripMargin,
    "q_cms_sketch" ->
      """WITH t AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |    FROM documents),
        |tt AS (SELECT tok FROM t WHERE tok <> ''),
        |rb AS (SELECT g.r AS r,
        |         CAST('0x' || substr(md5('cms' || CAST(g.r AS VARCHAR) || ':' || tok), 1, 8)
        |           AS BIGINT) % 64 AS bucket
        |       FROM tt CROSS JOIN range(0, 3) g(r))
        |SELECT r AS "row", bucket, count(*) AS cnt FROM rb GROUP BY 1, 2""".stripMargin,
    "q_cms_inner" ->
      """WITH ta AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |    FROM documents WHERE doc_id % 2 = 0),
        |tb AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |    FROM documents WHERE doc_id % 2 = 1),
        |ska AS (SELECT g.r AS r,
        |    CAST('0x' || substr(md5('cms' || CAST(g.r AS VARCHAR) || ':' || tok), 1, 8)
        |      AS BIGINT) % 64 AS bucket, count(*) AS cnt
        |  FROM (SELECT tok FROM ta WHERE tok <> '') CROSS JOIN range(0, 3) g(r)
        |  GROUP BY 1, 2),
        |skb AS (SELECT g.r AS r,
        |    CAST('0x' || substr(md5('cms' || CAST(g.r AS VARCHAR) || ':' || tok), 1, 8)
        |      AS BIGINT) % 64 AS bucket, count(*) AS cnt
        |  FROM (SELECT tok FROM tb WHERE tok <> '') CROSS JOIN range(0, 3) g(r)
        |  GROUP BY 1, 2),
        |rs AS (SELECT a.r, CAST(sum(a.cnt * b.cnt) AS BIGINT) AS v
        |  FROM ska a JOIN skb b ON a.r = b.r AND a.bucket = b.bucket GROUP BY 1),
        |allr AS (SELECT unnest(range(0, 3)) AS r)
        |SELECT CAST(min(coalesce(rs.v, 0)) AS BIGINT) AS est
        |FROM allr LEFT JOIN rs USING (r)""".stripMargin,
    "q_cms_estimate" ->
      """WITH t AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |    FROM documents),
        |tt AS (SELECT tok FROM t WHERE tok <> ''),
        |sk AS (SELECT g.r AS r,
        |         CAST('0x' || substr(md5('cms' || CAST(g.r AS VARCHAR) || ':' || tok), 1, 8)
        |           AS BIGINT) % 64 AS bucket,
        |         count(*) AS cnt
        |       FROM tt CROSS JOIN range(0, 3) g(r)
        |       GROUP BY 1, 2),
        |v AS (SELECT DISTINCT tok FROM tt),
        |probes AS (SELECT tok, g.r AS r,
        |         CAST('0x' || substr(md5('cms' || CAST(g.r AS VARCHAR) || ':' || tok), 1, 8)
        |           AS BIGINT) % 64 AS bucket
        |       FROM v CROSS JOIN range(0, 3) g(r))
        |SELECT p.tok AS token, min(coalesce(sk.cnt, 0)) AS est
        |FROM probes p LEFT JOIN sk ON sk.r = p.r AND sk.bucket = p.bucket
        |GROUP BY 1""".stripMargin,
    "q_nb_chi2" ->
      """WITH base AS (SELECT doc_id, lang, text FROM documents WHERE lang IS NOT NULL),
        |dt AS (SELECT DISTINCT doc_id, lang, tok FROM (
        |    SELECT doc_id, lang,
        |      unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |    FROM base) WHERE tok <> ''),
        |lt AS (SELECT lang, count(*) AS n_label FROM base GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM base),
        |tl AS (SELECT tok, lang, count(*) AS a FROM dt GROUP BY 1, 2),
        |tt AS (SELECT tok, sum(a) AS df_tok FROM tl GROUP BY 1 HAVING sum(a) >= 5),
        |c2 AS (SELECT tl.tok, tl.lang, tl.a AS df_label,
        |    CAST(tl.a AS DOUBLE) AS aa,
        |    CAST(tt.df_tok - tl.a AS DOUBLE) AS bb,
        |    CAST(lt.n_label - tl.a AS DOUBLE) AS cc,
        |    CAST(nn.n - tt.df_tok - lt.n_label + tl.a AS DOUBLE) AS dd,
        |    CAST(nn.n AS DOUBLE) AS nd
        |  FROM tl JOIN tt USING (tok) JOIN lt USING (lang) CROSS JOIN nn)
        |SELECT tok AS token, lang AS label, df_label,
        |  CASE WHEN (aa + bb) * (cc + dd) * (aa + cc) * (bb + dd) = 0 THEN NULL
        |       ELSE floor(nd * (aa * dd - bb * cc) * (aa * dd - bb * cc)
        |         / ((aa + bb) * (cc + dd) * (aa + cc) * (bb + dd))
        |         * 1000000 + 0.5) / 1000000 END AS chi2
        |FROM c2""".stripMargin,
    "q_tx_nfc" ->
      """SELECT doc_id,
        |  nfc_normalize(text || ' cafe' || chr(769) || ' A' || chr(776)
        |    || ' ' || chr(64257) || 'n') AS t_norm
        |FROM documents""".stripMargin,
    "q_kmv_sketch" ->
      """WITH t AS (SELECT lang, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |    FROM documents WHERE lang IS NOT NULL),
        |h AS (SELECT DISTINCT lang,
        |        CAST('0x' || substr(md5('kmv:' || tok), 1, 15) AS BIGINT) AS h
        |      FROM t WHERE tok <> ''),
        |r AS (SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS pos
        |      FROM h)
        |SELECT lang, pos, h FROM r WHERE pos <= 32""".stripMargin,
    "q_kmv_estimate" ->
      """WITH t AS (SELECT lang, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |    FROM documents WHERE lang IS NOT NULL),
        |h AS (SELECT DISTINCT lang,
        |        CAST('0x' || substr(md5('kmv:' || tok), 1, 15) AS BIGINT) AS h
        |      FROM t WHERE tok <> ''),
        |r AS (SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS pos
        |      FROM h),
        |sk AS (SELECT lang, h FROM r WHERE pos <= 32)
        |SELECT lang,
        |  CASE WHEN count(*) < 32 THEN count(*)
        |       ELSE CAST(floor(31.0 * 1152921504606846976.0
        |              / CAST(greatest(max(h), 1) AS DOUBLE))
        |              AS BIGINT) END AS est
        |FROM sk GROUP BY lang""".stripMargin,
    "q_kmv_jaccard" ->
      """WITH tA AS (SELECT lang, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |    FROM documents
        |    WHERE lang IS NOT NULL AND CAST(substr(source, 4, 10) AS INT) < 10),
        |hA AS (SELECT DISTINCT lang,
        |        CAST('0x' || substr(md5('kmv:' || tok), 1, 15) AS BIGINT) AS h
        |      FROM tA WHERE tok <> ''),
        |rA AS (SELECT lang, h FROM (
        |        SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS pos
        |        FROM hA) WHERE pos <= 32),
        |tB AS (SELECT lang, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |    FROM documents
        |    WHERE lang IS NOT NULL AND CAST(substr(source, 4, 10) AS INT) >= 10),
        |hB AS (SELECT DISTINCT lang,
        |        CAST('0x' || substr(md5('kmv:' || tok), 1, 15) AS BIGINT) AS h
        |      FROM tB WHERE tok <> ''),
        |rB AS (SELECT lang, h FROM (
        |        SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS pos
        |        FROM hB) WHERE pos <= 32),
        |u AS (SELECT lang, h FROM rA UNION SELECT lang, h FROM rB),
        |m AS (SELECT lang, h FROM (
        |        SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS pos
        |        FROM u) WHERE pos <= 32),
        |mb AS (SELECT m.lang, m.h,
        |        CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL THEN 1 ELSE 0 END AS inboth
        |      FROM m
        |      LEFT JOIN rA a ON m.lang = a.lang AND m.h = a.h
        |      LEFT JOIN rB b ON m.lang = b.lang AND m.h = b.h),
        |g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_merged,
        |        CAST(sum(inboth) AS BIGINT) AS n_both, max(h) AS hk
        |      FROM mb GROUP BY lang),
        |e AS (SELECT *,
        |        CASE WHEN n_merged < 32 THEN n_merged
        |             ELSE CAST(floor(31.0 * 1152921504606846976.0
        |                    / CAST(greatest(hk, 1) AS DOUBLE)) AS BIGINT) END AS est_union
        |      FROM g)
        |SELECT lang, n_merged, n_both,
        |  floor(CAST(n_both AS DOUBLE) / CAST(n_merged AS DOUBLE) * 1000000000.0 + 0.5)
        |    / 1000000000.0 AS jaccard,
        |  est_union,
        |  CAST(floor(CAST(n_both AS DOUBLE) / CAST(n_merged AS DOUBLE)
        |    * CAST(est_union AS DOUBLE)) AS BIGINT) AS est_intersection
        |FROM e""".stripMargin,
    "q_tx_search" -> booleanSearchOracleSql,
    "q_tx_phrase" ->
      """WITH tt AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |p AS (SELECT doc_id,
        |    len(list_filter(range(1, greatest(len(t) - 1, 0) + 1),
        |      i -> t[CAST(i AS INT)] = 'hash' AND t[CAST(i AS INT) + 1] = 'join')) AS n
        |  FROM tt)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_matches FROM p WHERE n > 0""".stripMargin,
    "q_tx_pii" ->
      """WITH d AS (
        |  SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN text
        |    ELSE text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |      '@example.com http://site' || CAST(doc_id % 7 AS VARCHAR) ||
        |      '.org 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1' END AS t
        |  FROM documents),
        |c AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |    CAST(len(regexp_extract_all(t, 'https?://[^\s]+')) AS BIGINT) AS n_urls,
        |    CAST(len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips
        |  FROM d)
        |SELECT doc_id, n_emails, n_urls, n_ips,
        |  (n_emails + n_urls + n_ips = 0) AS clean
        |FROM c""".stripMargin,
    "q_tx_pii_spans" ->
      """WITH d AS (
        |  SELECT doc_id, length(text) AS l,
        |    length(CAST(doc_id AS VARCHAR)) AS dd,
        |    length(CAST(doc_id % 256 AS VARCHAR)) AS d256
        |  FROM documents WHERE doc_id % 3 <> 0)
        |SELECT doc_id, 'email' AS kind,
        |  CAST(l + 9 AS BIGINT) AS span_start,
        |  CAST(l + dd + 25 AS BIGINT) AS span_end FROM d
        |UNION ALL
        |SELECT doc_id, 'url', CAST(l + dd + 26 AS BIGINT), CAST(l + dd + 42 AS BIGINT) FROM d
        |UNION ALL
        |SELECT doc_id, 'ip', CAST(l + dd + 43 AS BIGINT), CAST(l + dd + d256 + 50 AS BIGINT) FROM d""".stripMargin,
    "q_tx_tags" ->
      """SELECT doc_id,
        |  unnest(list_intersect(
        |    list_distinct(string_split_regex(trim(lower(text)), '\s+')),
        |    ['join', 'window', 'stream', 'vector',
        |     'hash', 'sort', 'customer', 'quantum'])) AS term
        |FROM documents""".stripMargin,
    "q_tx_search_indexed" -> booleanSearchOracleSql,
    "q_tx_bm25" -> {
      val toks = Seq("scan", "join", "window")
      val k1 = 1.2; val b = 0.75
      val tfs = toks.zipWithIndex
        .map { case (t, i) => s"sum(CASE WHEN tok = '$t' THEN 1 ELSE 0 END) AS tf$i" }
        .mkString(", ")
      val dfs = toks.indices
        .map(i => s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
      val terms = toks.indices
        .map { i =>
          s"""ln((n - df$i + 0.5) / (df$i + 0.5) + 1.0) * tf$i * ${k1 + 1.0}
             | / (tf$i + $k1 * (1.0 - $b + $b * dl / avgdl))""".stripMargin
        }
        .mkString(" + ")
      s"""WITH tk AS (
         |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
         |  FROM documents),
         |per AS (
         |  SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl, $tfs
         |  FROM tk GROUP BY doc_id),
         |g AS (
         |  SELECT CAST(sum(dl) AS DOUBLE) / (SELECT count(*) FROM documents) AS avgdl,
         |    CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n, $dfs
         |  FROM per)
         |SELECT doc_id, floor(($terms) * 1000000 + 0.5) / 1000000 AS bm25
         |FROM per, g""".stripMargin
    },
    "q_tx_pmi" ->
      """WITH ar AS (SELECT string_split_regex(trim(lower(text)), '\s+') AS a
        |    FROM documents),
        |bg AS (SELECT a[CAST(t.i AS INT)] AS w1, a[CAST(t.i AS INT) + 1] AS w2
        |    FROM ar, unnest(range(1, len(a))) AS t(i)),
        |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_count
        |    FROM bg GROUP BY 1, 2),
        |un AS (SELECT tok AS w, CAST(count(*) AS BIGINT) AS c
        |    FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |          FROM documents)
        |    WHERE tok <> '' GROUP BY 1),
        |tot AS (SELECT (SELECT CAST(sum(pair_count) AS BIGINT) FROM c2) AS n2,
        |               (SELECT CAST(sum(c) AS BIGINT) FROM un) AS n1)
        |SELECT c2.w1, c2.w2, c2.pair_count,
        |  floor(ln(CAST(pair_count AS DOUBLE) * CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)
        |    / (CAST(n2 AS DOUBLE) * CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)))
        |    * 1000000 + 0.5) / 1000000 AS pmi
        |FROM c2 JOIN un ca ON c2.w1 = ca.w JOIN un cb ON c2.w2 = cb.w, tot
        |WHERE pair_count >= 20""".stripMargin,
    "q_tx_ppmi" ->
      """WITH ar AS (SELECT string_split_regex(trim(lower(text)), '\s+') AS a
        |    FROM documents),
        |bg AS (
        |  SELECT least(a[CAST(t.i AS INT)], a[CAST(t.i AS INT) + 1]) AS w1,
        |         greatest(a[CAST(t.i AS INT)], a[CAST(t.i AS INT) + 1]) AS w2
        |  FROM ar, unnest(range(1, len(a))) AS t(i)
        |  UNION ALL
        |  SELECT least(a[CAST(t.i AS INT)], a[CAST(t.i AS INT) + 2]),
        |         greatest(a[CAST(t.i AS INT)], a[CAST(t.i AS INT) + 2])
        |  FROM ar, unnest(range(1, len(a) - 1)) AS t(i)),
        |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_count
        |    FROM bg GROUP BY 1, 2),
        |un AS (SELECT tok AS w, CAST(count(*) AS BIGINT) AS c
        |    FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |          FROM documents)
        |    WHERE tok <> '' GROUP BY 1),
        |tot AS (SELECT (SELECT CAST(sum(pair_count) AS BIGINT) FROM c2) AS n2,
        |               (SELECT CAST(sum(c) AS BIGINT) FROM un) AS n1)
        |SELECT c2.w1, c2.w2, c2.pair_count,
        |  floor(greatest(ln(CAST(pair_count AS DOUBLE) * CAST(n1 AS DOUBLE)
        |      * CAST(n1 AS DOUBLE)
        |    / (CAST(n2 AS DOUBLE) * CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE))), 0.0)
        |    * 1000000 + 0.5) / 1000000 AS ppmi
        |FROM c2 JOIN un ca ON c2.w1 = ca.w JOIN un cb ON c2.w2 = cb.w, tot
        |WHERE pair_count >= 40""".stripMargin,
    "q_tx_snippet" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |      x -> x <> '') AS tk
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, tk,
        |    list_transform(tk, x -> CASE WHEN list_contains(
        |      ['scan', 'join', 'window'], x) THEN 1 ELSE 0 END) AS hit
        |  FROM t),
        |s AS (
        |  SELECT doc_id, tk,
        |    list_transform(range(0, greatest(len(tk) - 12, 0) + 1),
        |      i -> coalesce(list_sum(list_slice(hit, CAST(i AS INT) + 1,
        |        CAST(i AS INT) + 12)), 0)) AS scores
        |  FROM h)
        |SELECT doc_id,
        |  CAST(list_position(scores, list_max(scores)) - 1 AS BIGINT) AS start_tok,
        |  CAST(list_max(scores) AS BIGINT) AS n_hits,
        |  array_to_string(list_slice(tk,
        |    CAST(list_position(scores, list_max(scores)) AS INT),
        |    CAST(list_position(scores, list_max(scores)) AS INT) + 11), ' ')
        |    AS snippet
        |FROM s""".stripMargin,
    "q_tx_qexp" -> {
      val toks = Seq("scan", "join", "window")
      val k1 = 1.2; val b = 0.75
      val tfs = toks.zipWithIndex
        .map { case (t, i) => s"sum(CASE WHEN tok = '$t' THEN 1 ELSE 0 END) AS tf$i" }
        .mkString(", ")
      val dfs = toks.indices
        .map(i => s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
      val terms = toks.indices
        .map { i =>
          s"""ln((n - df$i + 0.5) / (df$i + 0.5) + 1.0) * tf$i * ${k1 + 1.0}
             | / (tf$i + $k1 * (1.0 - $b + $b * dl / avgdl))""".stripMargin
        }
        .mkString(" + ")
      s"""WITH tk AS (
         |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
         |  FROM documents),
         |per AS (
         |  SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl, $tfs
         |  FROM tk GROUP BY doc_id),
         |g AS (
         |  SELECT CAST(sum(dl) AS DOUBLE) / (SELECT count(*) FROM documents) AS avgdl,
         |    CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n, $dfs
         |  FROM per),
         |bm AS (SELECT doc_id, floor(($terms) * 1000000 + 0.5) / 1000000 AS bm25
         |  FROM per, g),
         |td AS (SELECT doc_id FROM bm ORDER BY bm25 DESC, doc_id LIMIT 10),
         |tf AS (SELECT t.doc_id, t.tok, CAST(count(*) AS BIGINT) AS tf
         |  FROM tk t JOIN td USING (doc_id) WHERE t.tok <> '' GROUP BY 1, 2),
         |dl2 AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
         |w AS (SELECT tf.tok, (tf.tf * 1000000000000) // dl2.dl AS w
         |  FROM tf JOIN dl2 USING (doc_id)
         |  WHERE tf.tok NOT IN ('scan', 'join', 'window')),
         |gw AS (SELECT tok AS term, CAST(sum(w) AS BIGINT) AS weight_pico
         |  FROM w GROUP BY 1 ORDER BY weight_pico DESC, term LIMIT 8)
         |SELECT term, weight_pico,
         |  CAST(row_number() OVER (ORDER BY weight_pico DESC, term) AS BIGINT) AS rank
         |FROM gw""".stripMargin
    },
    "q_rrf_fuse" -> {
      val toks = Seq("scan", "join", "window")
      val k1 = 1.2; val b = 0.75
      val tfs = toks.zipWithIndex
        .map { case (t, i) => s"sum(CASE WHEN tok = '$t' THEN 1 ELSE 0 END) AS tf$i" }
        .mkString(", ")
      val dfs = toks.indices
        .map(i => s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
      val terms = toks.indices
        .map { i =>
          s"""ln((n - df$i + 0.5) / (df$i + 0.5) + 1.0) * tf$i * ${k1 + 1.0}
             | / (tf$i + $k1 * (1.0 - $b + $b * dl / avgdl))""".stripMargin
        }
        .mkString(" + ")
      s"""WITH tk AS (
         |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
         |  FROM documents),
         |per AS (
         |  SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl, $tfs
         |  FROM tk GROUP BY doc_id),
         |g AS (
         |  SELECT CAST(sum(dl) AS DOUBLE) / (SELECT count(*) FROM documents) AS avgdl,
         |    CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n, $dfs
         |  FROM per),
         |bm AS (SELECT doc_id, floor(($terms) * 1000000 + 0.5) / 1000000 AS bm25
         |  FROM per, g),
         |lexTop AS (SELECT doc_id AS id, bm25 AS s FROM bm
         |  ORDER BY s DESC, id LIMIT 50),
         |lexR AS (SELECT id,
         |    1.0 / (60.0 + row_number() OVER (ORDER BY s DESC, id)) AS c0
         |  FROM lexTop),
         |cos AS (SELECT e.vec_id AS id,
         |    floor(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
         |      CAST(q.embedding AS DOUBLE[])) * 1000000 + 0.5) / 1000000 AS s
         |  FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
         |  WHERE e.vec_id <> 0),
         |semTop AS (SELECT id, s FROM cos ORDER BY s DESC, id LIMIT 50),
         |semR AS (SELECT id,
         |    1.0 / (60.0 + row_number() OVER (ORDER BY s DESC, id)) AS c1
         |  FROM semTop),
         |j AS (SELECT COALESCE(a.id, bb.id) AS id, a.c0, bb.c1
         |  FROM lexR a FULL OUTER JOIN semR bb ON a.id = bb.id),
         |f AS (SELECT id, coalesce(c0, 0.0) + coalesce(c1, 0.0) AS raw,
         |    (CASE WHEN c0 IS NOT NULL THEN 1 ELSE 0 END
         |     + CASE WHEN c1 IS NOT NULL THEN 1 ELSE 0 END) AS n_lists
         |  FROM j)
         |SELECT id AS doc_id,
         |  floor(raw * 1000000000.0 + 0.5) / 1000000000.0 AS rrf,
         |  CAST(n_lists AS BIGINT) AS n_lists
         |FROM f ORDER BY raw DESC, id LIMIT 20""".stripMargin
    },
    "q_bpe_roundtrip" ->
      """SELECT doc_id,
        |  array_to_string(list_filter(
        |    regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+'),
        |    x -> x <> ''), ' ') AS decoded
        |FROM documents WHERE doc_id IS NOT NULL""".stripMargin,
    "q_bpe_pairs" ->
      """WITH wf AS (
        |  SELECT w AS word, count(*) AS freq
        |  FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
        |        FROM documents)
        |  WHERE w <> '' GROUP BY 1),
        |syms AS (SELECT freq, list_append(string_split(word, ''), '</w>') AS s FROM wf),
        |pairs AS (
        |  SELECT s[CAST(t.i AS INT)] AS left_sym, s[CAST(t.i AS INT)+1] AS right_sym, freq
        |  FROM syms, unnest(range(1, len(s))) AS t(i))
        |SELECT left_sym, right_sym, CAST(sum(freq) AS BIGINT) AS pair_count
        |FROM pairs GROUP BY 1, 2""".stripMargin,
    // golden merge table (char-level, fixture corpus) — tools/gen_bpe_golden.py
    "q_bpe_merges" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS INTEGER), 'a', 't', CAST(25 AS BIGINT)),
        |  (CAST(1 AS INTEGER), 'at', 'i', CAST(25 AS BIGINT)),
        |  (CAST(2 AS INTEGER), 'ati', 'o', CAST(25 AS BIGINT)),
        |  (CAST(3 AS INTEGER), 'atio', 'n', CAST(25 AS BIGINT)),
        |  (CAST(4 AS INTEGER), 'ation', '_', CAST(25 AS BIGINT)),
        |  (CAST(5 AS INTEGER), 'n', 'ation_', CAST(25 AS BIGINT)),
        |  (CAST(6 AS INTEGER), 'a', '</w>', CAST(15 AS BIGINT)),
        |  (CAST(7 AS INTEGER), 'nation_', '1', CAST(11 AS BIGINT)),
        |  (CAST(8 AS INTEGER), 'a', 's', CAST(10 AS BIGINT)),
        |  (CAST(9 AS INTEGER), 'c', 'a</w>', CAST(10 AS BIGINT)),
        |  (CAST(10 AS INTEGER), 'e', '</w>', CAST(10 AS BIGINT)),
        |  (CAST(11 AS INTEGER), 'i', 'ca</w>', CAST(10 AS BIGINT)),
        |  (CAST(12 AS INTEGER), 'r', 'ica</w>', CAST(10 AS BIGINT)),
        |  (CAST(13 AS INTEGER), 'nation_', '2', CAST(6 AS BIGINT)),
        |  (CAST(14 AS INTEGER), 'a', 'f', CAST(5 AS BIGINT)),
        |  (CAST(15 AS INTEGER), 'a', 'm', CAST(5 AS BIGINT))) AS t(rank, left_sym, right_sym, pair_count)""".stripMargin,
    // golden merge table (byte-level) — tools/gen_bpe_golden.py
    "q_bpe_merges_bytes" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS INTEGER), '61', '74', CAST(25 AS BIGINT)),
        |  (CAST(1 AS INTEGER), '6174', '69', CAST(25 AS BIGINT)),
        |  (CAST(2 AS INTEGER), '617469', '6f', CAST(25 AS BIGINT)),
        |  (CAST(3 AS INTEGER), '6174696f', '6e', CAST(25 AS BIGINT)),
        |  (CAST(4 AS INTEGER), '6174696f6e', '5f', CAST(25 AS BIGINT)),
        |  (CAST(5 AS INTEGER), '6e', '6174696f6e5f', CAST(25 AS BIGINT)),
        |  (CAST(6 AS INTEGER), '61', '</w>', CAST(15 AS BIGINT)),
        |  (CAST(7 AS INTEGER), '6e6174696f6e5f', '31', CAST(11 AS BIGINT)),
        |  (CAST(8 AS INTEGER), '61', '73', CAST(10 AS BIGINT)),
        |  (CAST(9 AS INTEGER), '63', '61</w>', CAST(10 AS BIGINT)),
        |  (CAST(10 AS INTEGER), '65', '</w>', CAST(10 AS BIGINT)),
        |  (CAST(11 AS INTEGER), '69', '6361</w>', CAST(10 AS BIGINT)),
        |  (CAST(12 AS INTEGER), '72', '696361</w>', CAST(10 AS BIGINT)),
        |  (CAST(13 AS INTEGER), '6e6174696f6e5f', '32', CAST(6 AS BIGINT)),
        |  (CAST(14 AS INTEGER), '61', '66', CAST(5 AS BIGINT)),
        |  (CAST(15 AS INTEGER), '61', '6d', CAST(5 AS BIGINT))) AS t(rank, left_sym, right_sym, pair_count)""".stripMargin,
    // golden dense-id vocabulary (char-level base + merge products)
    "q_bpe_vocab" ->
      """SELECT * FROM (VALUES
        |  ('0', CAST(0 AS BIGINT)),
        |  ('1', CAST(1 AS BIGINT)),
        |  ('2', CAST(2 AS BIGINT)),
        |  ('3', CAST(3 AS BIGINT)),
        |  ('4', CAST(4 AS BIGINT)),
        |  ('5', CAST(5 AS BIGINT)),
        |  ('6', CAST(6 AS BIGINT)),
        |  ('7', CAST(7 AS BIGINT)),
        |  ('8', CAST(8 AS BIGINT)),
        |  ('9', CAST(9 AS BIGINT)),
        |  ('</w>', CAST(10 AS BIGINT)),
        |  ('_', CAST(11 AS BIGINT)),
        |  ('a', CAST(12 AS BIGINT)),
        |  ('c', CAST(13 AS BIGINT)),
        |  ('d', CAST(14 AS BIGINT)),
        |  ('e', CAST(15 AS BIGINT)),
        |  ('f', CAST(16 AS BIGINT)),
        |  ('i', CAST(17 AS BIGINT)),
        |  ('l', CAST(18 AS BIGINT)),
        |  ('m', CAST(19 AS BIGINT)),
        |  ('n', CAST(20 AS BIGINT)),
        |  ('o', CAST(21 AS BIGINT)),
        |  ('p', CAST(22 AS BIGINT)),
        |  ('r', CAST(23 AS BIGINT)),
        |  ('s', CAST(24 AS BIGINT)),
        |  ('t', CAST(25 AS BIGINT)),
        |  ('u', CAST(26 AS BIGINT)),
        |  ('at', CAST(27 AS BIGINT)),
        |  ('ati', CAST(28 AS BIGINT)),
        |  ('atio', CAST(29 AS BIGINT)),
        |  ('ation', CAST(30 AS BIGINT)),
        |  ('ation_', CAST(31 AS BIGINT)),
        |  ('nation_', CAST(32 AS BIGINT)),
        |  ('a</w>', CAST(33 AS BIGINT)),
        |  ('nation_1', CAST(34 AS BIGINT)),
        |  ('as', CAST(35 AS BIGINT)),
        |  ('ca</w>', CAST(36 AS BIGINT)),
        |  ('e</w>', CAST(37 AS BIGINT)),
        |  ('ica</w>', CAST(38 AS BIGINT)),
        |  ('rica</w>', CAST(39 AS BIGINT)),
        |  ('nation_2', CAST(40 AS BIGINT)),
        |  ('af', CAST(41 AS BIGINT)),
        |  ('am', CAST(42 AS BIGINT))) AS t(token, token_id)""".stripMargin,
    // golden encode table (char-level tokens per fixture doc)
    "q_bpe_encode_gold" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), 'nation_ 0 </w> af rica</w>', CAST(5 AS BIGINT)),
        |  (CAST(1 AS BIGINT), 'nation_1 </w> am e rica</w>', CAST(5 AS BIGINT)),
        |  (CAST(2 AS BIGINT), 'nation_2 </w> as i a</w>', CAST(5 AS BIGINT)),
        |  (CAST(3 AS BIGINT), 'nation_ 3 </w> e u r o p e</w>', CAST(9 AS BIGINT)),
        |  (CAST(4 AS BIGINT), 'nation_ 4 </w> m i d d l e</w> e as t </w>', CAST(13 AS BIGINT)),
        |  (CAST(5 AS BIGINT), 'nation_ 5 </w> af rica</w>', CAST(5 AS BIGINT)),
        |  (CAST(6 AS BIGINT), 'nation_ 6 </w> am e rica</w>', CAST(6 AS BIGINT)),
        |  (CAST(7 AS BIGINT), 'nation_ 7 </w> as i a</w>', CAST(6 AS BIGINT)),
        |  (CAST(8 AS BIGINT), 'nation_ 8 </w> e u r o p e</w>', CAST(9 AS BIGINT)),
        |  (CAST(9 AS BIGINT), 'nation_ 9 </w> m i d d l e</w> e as t </w>', CAST(13 AS BIGINT)),
        |  (CAST(10 AS BIGINT), 'nation_1 0 </w> af rica</w>', CAST(5 AS BIGINT)),
        |  (CAST(11 AS BIGINT), 'nation_1 1 </w> am e rica</w>', CAST(6 AS BIGINT)),
        |  (CAST(12 AS BIGINT), 'nation_1 2 </w> as i a</w>', CAST(6 AS BIGINT)),
        |  (CAST(13 AS BIGINT), 'nation_1 3 </w> e u r o p e</w>', CAST(9 AS BIGINT)),
        |  (CAST(14 AS BIGINT), 'nation_1 4 </w> m i d d l e</w> e as t </w>', CAST(13 AS BIGINT)),
        |  (CAST(15 AS BIGINT), 'nation_1 5 </w> af rica</w>', CAST(5 AS BIGINT)),
        |  (CAST(16 AS BIGINT), 'nation_1 6 </w> am e rica</w>', CAST(6 AS BIGINT)),
        |  (CAST(17 AS BIGINT), 'nation_1 7 </w> as i a</w>', CAST(6 AS BIGINT)),
        |  (CAST(18 AS BIGINT), 'nation_1 8 </w> e u r o p e</w>', CAST(9 AS BIGINT)),
        |  (CAST(19 AS BIGINT), 'nation_1 9 </w> m i d d l e</w> e as t </w>', CAST(13 AS BIGINT)),
        |  (CAST(20 AS BIGINT), 'nation_2 0 </w> af rica</w>', CAST(5 AS BIGINT)),
        |  (CAST(21 AS BIGINT), 'nation_2 1 </w> am e rica</w>', CAST(6 AS BIGINT)),
        |  (CAST(22 AS BIGINT), 'nation_2 2 </w> as i a</w>', CAST(6 AS BIGINT)),
        |  (CAST(23 AS BIGINT), 'nation_2 3 </w> e u r o p e</w>', CAST(9 AS BIGINT)),
        |  (CAST(24 AS BIGINT), 'nation_2 4 </w> m i d d l e</w> e as t </w>', CAST(13 AS BIGINT))) AS t(doc_id, token_str, n_tokens)""".stripMargin,
    // unigram seed statistic: substring counts of the ▁-marked distinct
    // words, weighted by word frequency — exact integer arithmetic
    "q_ug_seed" ->
      """WITH wf AS (
        |  SELECT w AS word, count(*) AS freq
        |  FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
        |        FROM documents)
        |  WHERE w <> '' GROUP BY 1),
        |mw AS (SELECT '▁' || word AS m, freq FROM wf),
        |subs AS (
        |  SELECT substr(m, CAST(t.i AS INT), CAST(l.j AS INT)) AS piece, freq
        |  FROM mw,
        |       unnest(range(1, length(m) + 1)) AS t(i),
        |       unnest(range(1, least(8, length(m) - CAST(t.i AS INT) + 1) + 1)) AS l(j))
        |SELECT piece, CAST(sum(freq) AS BIGINT) AS weight FROM subs GROUP BY 1""".stripMargin,
    // golden unigram piece table (fixture corpus, vocab_size=40,
    // seed_size=40) — tools/gen_unigram_golden.py
    "q_ug_vocab" ->
      """SELECT * FROM (VALUES
        |  ('0', CAST(0 AS BIGINT)),
        |  ('1', CAST(1 AS BIGINT)),
        |  ('2', CAST(2 AS BIGINT)),
        |  ('3', CAST(3 AS BIGINT)),
        |  ('4', CAST(4 AS BIGINT)),
        |  ('5', CAST(5 AS BIGINT)),
        |  ('6', CAST(6 AS BIGINT)),
        |  ('7', CAST(7 AS BIGINT)),
        |  ('8', CAST(8 AS BIGINT)),
        |  ('9', CAST(9 AS BIGINT)),
        |  ('_', CAST(10 AS BIGINT)),
        |  ('a', CAST(11 AS BIGINT)),
        |  ('america', CAST(12 AS BIGINT)),
        |  ('ation_', CAST(13 AS BIGINT)),
        |  ('ation_1', CAST(14 AS BIGINT)),
        |  ('ation_2', CAST(15 AS BIGINT)),
        |  ('c', CAST(16 AS BIGINT)),
        |  ('d', CAST(17 AS BIGINT)),
        |  ('e', CAST(18 AS BIGINT)),
        |  ('f', CAST(19 AS BIGINT)),
        |  ('i', CAST(20 AS BIGINT)),
        |  ('ion_', CAST(21 AS BIGINT)),
        |  ('ion_1', CAST(22 AS BIGINT)),
        |  ('l', CAST(23 AS BIGINT)),
        |  ('m', CAST(24 AS BIGINT)),
        |  ('n', CAST(25 AS BIGINT)),
        |  ('na', CAST(26 AS BIGINT)),
        |  ('nation_', CAST(27 AS BIGINT)),
        |  ('nation_1', CAST(28 AS BIGINT)),
        |  ('nation_2', CAST(29 AS BIGINT)),
        |  ('o', CAST(30 AS BIGINT)),
        |  ('p', CAST(31 AS BIGINT)),
        |  ('r', CAST(32 AS BIGINT)),
        |  ('s', CAST(33 AS BIGINT)),
        |  ('t', CAST(34 AS BIGINT)),
        |  ('u', CAST(35 AS BIGINT)),
        |  ('▁', CAST(36 AS BIGINT)),
        |  ('▁africa', CAST(37 AS BIGINT)),
        |  ('▁america', CAST(38 AS BIGINT)),
        |  ('▁nation_', CAST(39 AS BIGINT))) AS t(piece, piece_id)""".stripMargin,
    // golden unigram Viterbi encode table — tools/gen_unigram_golden.py
    "q_ug_encode_gold" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), '▁nation_ 0 ▁africa', CAST(3 AS BIGINT)),
        |  (CAST(1 AS BIGINT), '▁ nation_1 ▁america', CAST(3 AS BIGINT)),
        |  (CAST(2 AS BIGINT), '▁ nation_2 ▁ a s i a', CAST(7 AS BIGINT)),
        |  (CAST(3 AS BIGINT), '▁nation_ 3 ▁ e u r o p e', CAST(9 AS BIGINT)),
        |  (CAST(4 AS BIGINT), '▁nation_ 4 ▁ m i d d l e ▁ e a s t', CAST(14 AS BIGINT)),
        |  (CAST(5 AS BIGINT), '▁nation_ 5 ▁africa', CAST(3 AS BIGINT)),
        |  (CAST(6 AS BIGINT), '▁nation_ 6 ▁america', CAST(3 AS BIGINT)),
        |  (CAST(7 AS BIGINT), '▁nation_ 7 ▁ a s i a', CAST(7 AS BIGINT)),
        |  (CAST(8 AS BIGINT), '▁nation_ 8 ▁ e u r o p e', CAST(9 AS BIGINT)),
        |  (CAST(9 AS BIGINT), '▁nation_ 9 ▁ m i d d l e ▁ e a s t', CAST(14 AS BIGINT)),
        |  (CAST(10 AS BIGINT), '▁ nation_1 0 ▁africa', CAST(4 AS BIGINT)),
        |  (CAST(11 AS BIGINT), '▁ nation_1 1 ▁america', CAST(4 AS BIGINT)),
        |  (CAST(12 AS BIGINT), '▁ nation_1 2 ▁ a s i a', CAST(8 AS BIGINT)),
        |  (CAST(13 AS BIGINT), '▁ nation_1 3 ▁ e u r o p e', CAST(10 AS BIGINT)),
        |  (CAST(14 AS BIGINT), '▁ nation_1 4 ▁ m i d d l e ▁ e a s t', CAST(15 AS BIGINT)),
        |  (CAST(15 AS BIGINT), '▁ nation_1 5 ▁africa', CAST(4 AS BIGINT)),
        |  (CAST(16 AS BIGINT), '▁ nation_1 6 ▁america', CAST(4 AS BIGINT)),
        |  (CAST(17 AS BIGINT), '▁ nation_1 7 ▁ a s i a', CAST(8 AS BIGINT)),
        |  (CAST(18 AS BIGINT), '▁ nation_1 8 ▁ e u r o p e', CAST(10 AS BIGINT)),
        |  (CAST(19 AS BIGINT), '▁ nation_1 9 ▁ m i d d l e ▁ e a s t', CAST(15 AS BIGINT)),
        |  (CAST(20 AS BIGINT), '▁ nation_2 0 ▁africa', CAST(4 AS BIGINT)),
        |  (CAST(21 AS BIGINT), '▁ nation_2 1 ▁america', CAST(4 AS BIGINT)),
        |  (CAST(22 AS BIGINT), '▁ nation_2 2 ▁ a s i a', CAST(8 AS BIGINT)),
        |  (CAST(23 AS BIGINT), '▁ nation_2 3 ▁ e u r o p e', CAST(10 AS BIGINT)),
        |  (CAST(24 AS BIGINT), '▁ nation_2 4 ▁ m i d d l e ▁ e a s t', CAST(15 AS BIGINT))) AS t(doc_id, token_str, n_tokens)""".stripMargin,
    // golden WordPiece merge table — tools/gen_wordpiece_golden.py
    "q_wp_merges" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS INTEGER), '##d', '##l', CAST(5 AS BIGINT)),
        |  (CAST(1 AS INTEGER), '##d', '##dl', CAST(5 AS BIGINT)),
        |  (CAST(2 AS INTEGER), 'e', '##u', CAST(5 AS BIGINT)),
        |  (CAST(3 AS INTEGER), '##ddl', '##e', CAST(5 AS BIGINT)),
        |  (CAST(4 AS INTEGER), '##m', '##e', CAST(5 AS BIGINT)),
        |  (CAST(5 AS INTEGER), '##p', '##e', CAST(5 AS BIGINT)),
        |  (CAST(6 AS INTEGER), '##f', '##r', CAST(5 AS BIGINT)),
        |  (CAST(7 AS INTEGER), '##me', '##r', CAST(5 AS BIGINT)),
        |  (CAST(8 AS INTEGER), 'eu', '##r', CAST(5 AS BIGINT)),
        |  (CAST(9 AS INTEGER), 'a', '##fr', CAST(5 AS BIGINT)),
        |  (CAST(10 AS INTEGER), 'a', '##mer', CAST(5 AS BIGINT)),
        |  (CAST(11 AS INTEGER), 'a', '##s', CAST(5 AS BIGINT)),
        |  (CAST(12 AS INTEGER), '##n', '##_', CAST(25 AS BIGINT)),
        |  (CAST(13 AS INTEGER), '##n_', '##1', CAST(11 AS BIGINT)),
        |  (CAST(14 AS INTEGER), '##n_', '##2', CAST(6 AS BIGINT)),
        |  (CAST(15 AS INTEGER), '##o', '##n_', CAST(8 AS BIGINT))) AS t(rank, left_sym, right_sym, pair_count)""".stripMargin,
    // golden WordPiece vocabulary — tools/gen_wordpiece_golden.py
    "q_wp_vocab" ->
      """SELECT * FROM (VALUES
        |  ('##0', CAST(0 AS BIGINT)),
        |  ('##1', CAST(1 AS BIGINT)),
        |  ('##2', CAST(2 AS BIGINT)),
        |  ('##3', CAST(3 AS BIGINT)),
        |  ('##4', CAST(4 AS BIGINT)),
        |  ('##5', CAST(5 AS BIGINT)),
        |  ('##6', CAST(6 AS BIGINT)),
        |  ('##7', CAST(7 AS BIGINT)),
        |  ('##8', CAST(8 AS BIGINT)),
        |  ('##9', CAST(9 AS BIGINT)),
        |  ('##_', CAST(10 AS BIGINT)),
        |  ('##a', CAST(11 AS BIGINT)),
        |  ('##c', CAST(12 AS BIGINT)),
        |  ('##d', CAST(13 AS BIGINT)),
        |  ('##e', CAST(14 AS BIGINT)),
        |  ('##f', CAST(15 AS BIGINT)),
        |  ('##i', CAST(16 AS BIGINT)),
        |  ('##l', CAST(17 AS BIGINT)),
        |  ('##m', CAST(18 AS BIGINT)),
        |  ('##n', CAST(19 AS BIGINT)),
        |  ('##o', CAST(20 AS BIGINT)),
        |  ('##p', CAST(21 AS BIGINT)),
        |  ('##r', CAST(22 AS BIGINT)),
        |  ('##s', CAST(23 AS BIGINT)),
        |  ('##t', CAST(24 AS BIGINT)),
        |  ('##u', CAST(25 AS BIGINT)),
        |  ('[UNK]', CAST(26 AS BIGINT)),
        |  ('a', CAST(27 AS BIGINT)),
        |  ('e', CAST(28 AS BIGINT)),
        |  ('m', CAST(29 AS BIGINT)),
        |  ('n', CAST(30 AS BIGINT)),
        |  ('##dl', CAST(31 AS BIGINT)),
        |  ('##ddl', CAST(32 AS BIGINT)),
        |  ('eu', CAST(33 AS BIGINT)),
        |  ('##ddle', CAST(34 AS BIGINT)),
        |  ('##me', CAST(35 AS BIGINT)),
        |  ('##pe', CAST(36 AS BIGINT)),
        |  ('##fr', CAST(37 AS BIGINT)),
        |  ('##mer', CAST(38 AS BIGINT)),
        |  ('eur', CAST(39 AS BIGINT)),
        |  ('afr', CAST(40 AS BIGINT)),
        |  ('amer', CAST(41 AS BIGINT)),
        |  ('as', CAST(42 AS BIGINT)),
        |  ('##n_', CAST(43 AS BIGINT)),
        |  ('##n_1', CAST(44 AS BIGINT)),
        |  ('##n_2', CAST(45 AS BIGINT)),
        |  ('##on_', CAST(46 AS BIGINT))) AS t(token, token_id)""".stripMargin,
    // golden WordPiece greedy encode — tools/gen_wordpiece_golden.py
    "q_wp_encode_gold" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), 'n ##a ##t ##i ##on_ ##0 afr ##i ##c ##a', CAST(10 AS BIGINT)),
        |  (CAST(1 AS BIGINT), 'n ##a ##t ##i ##on_ ##1 amer ##i ##c ##a', CAST(10 AS BIGINT)),
        |  (CAST(2 AS BIGINT), 'n ##a ##t ##i ##on_ ##2 as ##i ##a', CAST(9 AS BIGINT)),
        |  (CAST(3 AS BIGINT), 'n ##a ##t ##i ##on_ ##3 eur ##o ##pe', CAST(9 AS BIGINT)),
        |  (CAST(4 AS BIGINT), 'n ##a ##t ##i ##on_ ##4 m ##i ##ddle e ##a ##s ##t', CAST(13 AS BIGINT)),
        |  (CAST(5 AS BIGINT), 'n ##a ##t ##i ##on_ ##5 afr ##i ##c ##a', CAST(10 AS BIGINT)),
        |  (CAST(6 AS BIGINT), 'n ##a ##t ##i ##on_ ##6 amer ##i ##c ##a', CAST(10 AS BIGINT)),
        |  (CAST(7 AS BIGINT), 'n ##a ##t ##i ##on_ ##7 as ##i ##a', CAST(9 AS BIGINT)),
        |  (CAST(8 AS BIGINT), 'n ##a ##t ##i ##on_ ##8 eur ##o ##pe', CAST(9 AS BIGINT)),
        |  (CAST(9 AS BIGINT), 'n ##a ##t ##i ##on_ ##9 m ##i ##ddle e ##a ##s ##t', CAST(13 AS BIGINT)),
        |  (CAST(10 AS BIGINT), 'n ##a ##t ##i ##on_ ##1 ##0 afr ##i ##c ##a', CAST(11 AS BIGINT)),
        |  (CAST(11 AS BIGINT), 'n ##a ##t ##i ##on_ ##1 ##1 amer ##i ##c ##a', CAST(11 AS BIGINT)),
        |  (CAST(12 AS BIGINT), 'n ##a ##t ##i ##on_ ##1 ##2 as ##i ##a', CAST(10 AS BIGINT)),
        |  (CAST(13 AS BIGINT), 'n ##a ##t ##i ##on_ ##1 ##3 eur ##o ##pe', CAST(10 AS BIGINT)),
        |  (CAST(14 AS BIGINT), 'n ##a ##t ##i ##on_ ##1 ##4 m ##i ##ddle e ##a ##s ##t', CAST(14 AS BIGINT)),
        |  (CAST(15 AS BIGINT), 'n ##a ##t ##i ##on_ ##1 ##5 afr ##i ##c ##a', CAST(11 AS BIGINT)),
        |  (CAST(16 AS BIGINT), 'n ##a ##t ##i ##on_ ##1 ##6 amer ##i ##c ##a', CAST(11 AS BIGINT)),
        |  (CAST(17 AS BIGINT), 'n ##a ##t ##i ##on_ ##1 ##7 as ##i ##a', CAST(10 AS BIGINT)),
        |  (CAST(18 AS BIGINT), 'n ##a ##t ##i ##on_ ##1 ##8 eur ##o ##pe', CAST(10 AS BIGINT)),
        |  (CAST(19 AS BIGINT), 'n ##a ##t ##i ##on_ ##1 ##9 m ##i ##ddle e ##a ##s ##t', CAST(14 AS BIGINT)),
        |  (CAST(20 AS BIGINT), 'n ##a ##t ##i ##on_ ##2 ##0 afr ##i ##c ##a', CAST(11 AS BIGINT)),
        |  (CAST(21 AS BIGINT), 'n ##a ##t ##i ##on_ ##2 ##1 amer ##i ##c ##a', CAST(11 AS BIGINT)),
        |  (CAST(22 AS BIGINT), 'n ##a ##t ##i ##on_ ##2 ##2 as ##i ##a', CAST(10 AS BIGINT)),
        |  (CAST(23 AS BIGINT), 'n ##a ##t ##i ##on_ ##2 ##3 eur ##o ##pe', CAST(10 AS BIGINT)),
        |  (CAST(24 AS BIGINT), 'n ##a ##t ##i ##on_ ##2 ##4 m ##i ##ddle e ##a ##s ##t', CAST(14 AS BIGINT))) AS t(doc_id, token_str, n_tokens)""".stripMargin,
    // golden LR model (fixture corpus; micro-unit weights) — tools/gen_lr_golden.py
    "q_lr_model" ->
      """SELECT * FROM (VALUES
        |  (CAST(-1 AS BIGINT), CAST(-63829 AS DOUBLE)/1000000.0),
        |  (CAST(0 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(1 AS BIGINT), CAST(-350216 AS DOUBLE)/1000000.0),
        |  (CAST(2 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(3 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(4 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(5 AS BIGINT), CAST(370098 AS DOUBLE)/1000000.0),
        |  (CAST(6 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(7 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(8 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(9 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(10 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(11 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(12 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(13 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(14 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(15 AS BIGINT), CAST(-350216 AS DOUBLE)/1000000.0),
        |  (CAST(16 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(17 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(18 AS BIGINT), CAST(-224752 AS DOUBLE)/1000000.0),
        |  (CAST(19 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(20 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(21 AS BIGINT), CAST(952336 AS DOUBLE)/1000000.0),
        |  (CAST(22 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(23 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(24 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(25 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(26 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(27 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(28 AS BIGINT), CAST(-327039 AS DOUBLE)/1000000.0),
        |  (CAST(29 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(30 AS BIGINT), CAST(370098 AS DOUBLE)/1000000.0),
        |  (CAST(31 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(32 AS BIGINT), CAST(-640508 AS DOUBLE)/1000000.0),
        |  (CAST(33 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(34 AS BIGINT), CAST(-619735 AS DOUBLE)/1000000.0),
        |  (CAST(35 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(36 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(37 AS BIGINT), CAST(-327039 AS DOUBLE)/1000000.0),
        |  (CAST(38 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(39 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(40 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(41 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(42 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(43 AS BIGINT), CAST(370098 AS DOUBLE)/1000000.0),
        |  (CAST(44 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(45 AS BIGINT), CAST(370098 AS DOUBLE)/1000000.0),
        |  (CAST(46 AS BIGINT), CAST(-640508 AS DOUBLE)/1000000.0),
        |  (CAST(47 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(48 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(49 AS BIGINT), CAST(-350216 AS DOUBLE)/1000000.0),
        |  (CAST(50 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(51 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(52 AS BIGINT), CAST(370098 AS DOUBLE)/1000000.0),
        |  (CAST(53 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(54 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(55 AS BIGINT), CAST(-350216 AS DOUBLE)/1000000.0),
        |  (CAST(56 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(57 AS BIGINT), CAST(-350216 AS DOUBLE)/1000000.0),
        |  (CAST(58 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(59 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(60 AS BIGINT), CAST(370098 AS DOUBLE)/1000000.0),
        |  (CAST(61 AS BIGINT), CAST(393986 AS DOUBLE)/1000000.0),
        |  (CAST(62 AS BIGINT), CAST(0 AS DOUBLE)/1000000.0),
        |  (CAST(63 AS BIGINT), CAST(676264 AS DOUBLE)/1000000.0)) AS t(bucket, weight)""".stripMargin,
    // golden LR margin-sign decisions — tools/gen_lr_golden.py
    "q_lr_predict" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
        |  (CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
        |  (CAST(2 AS BIGINT), CAST(0 AS BIGINT)),
        |  (CAST(3 AS BIGINT), CAST(1 AS BIGINT)),
        |  (CAST(4 AS BIGINT), CAST(0 AS BIGINT)),
        |  (CAST(5 AS BIGINT), CAST(1 AS BIGINT)),
        |  (CAST(6 AS BIGINT), CAST(0 AS BIGINT)),
        |  (CAST(7 AS BIGINT), CAST(1 AS BIGINT)),
        |  (CAST(8 AS BIGINT), CAST(0 AS BIGINT)),
        |  (CAST(9 AS BIGINT), CAST(1 AS BIGINT)),
        |  (CAST(10 AS BIGINT), CAST(0 AS BIGINT)),
        |  (CAST(11 AS BIGINT), CAST(1 AS BIGINT)),
        |  (CAST(12 AS BIGINT), CAST(0 AS BIGINT)),
        |  (CAST(13 AS BIGINT), CAST(1 AS BIGINT)),
        |  (CAST(14 AS BIGINT), CAST(0 AS BIGINT)),
        |  (CAST(15 AS BIGINT), CAST(1 AS BIGINT)),
        |  (CAST(16 AS BIGINT), CAST(0 AS BIGINT)),
        |  (CAST(17 AS BIGINT), CAST(1 AS BIGINT)),
        |  (CAST(18 AS BIGINT), CAST(0 AS BIGINT)),
        |  (CAST(19 AS BIGINT), CAST(1 AS BIGINT)),
        |  (CAST(20 AS BIGINT), CAST(0 AS BIGINT)),
        |  (CAST(21 AS BIGINT), CAST(1 AS BIGINT)),
        |  (CAST(22 AS BIGINT), CAST(0 AS BIGINT)),
        |  (CAST(23 AS BIGINT), CAST(1 AS BIGINT)),
        |  (CAST(24 AS BIGINT), CAST(0 AS BIGINT))) AS t(doc_id, pred)""".stripMargin,
    "q_pk_ids" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, CAST(sum(strlen(w) + 1) AS BIGINT) AS nt
        |  FROM w WHERE w <> '' GROUP BY 1),
        |base AS (
        |  SELECT d.doc_id, coalesce(n.nt, 0) AS nt,
        |    CAST('0x' || substr(md5('pkshard' || CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 8 AS shard,
        |    CAST('0x' || substr(md5('pk' || CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT) / 4294967296.0 AS u
        |  FROM documents d LEFT JOIN n USING (doc_id)
        |  WHERE coalesce(n.nt, 0) >= 1),
        |c AS (
        |  SELECT doc_id, shard, nt,
        |    CAST(sum(nt) OVER (PARTITION BY shard ORDER BY u, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM base),
        |seg AS (
        |  SELECT shard, doc_id, nt, cum, cum - nt AS cb, CAST(sq.s AS BIGINT) AS seq_idx
        |  FROM c, unnest(range(CAST((cum - nt) // 128 AS BIGINT),
        |                       CAST((cum - 1) // 128 + 1 AS BIGINT))) AS sq(s))
        |SELECT shard, seq_idx, doc_id,
        |  cb + greatest(seq_idx * 128 - cb, 0) - seq_idx * 128 AS seq_offset,
        |  least((seq_idx + 1) * 128, cum) - cb - greatest(seq_idx * 128 - cb, 0) AS seg_tokens
        |FROM seg""".stripMargin,
    "q_bpe_pairs_bytes" ->
      """WITH wf AS (
        |  SELECT w AS word, count(*) AS freq
        |  FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
        |        FROM documents)
        |  WHERE w <> '' GROUP BY 1),
        |syms AS (
        |  SELECT freq,
        |    list_append(regexp_extract_all(lower(hex(CAST(word AS BLOB))), '..'), '</w>') AS s
        |  FROM wf),
        |pairs AS (
        |  SELECT s[CAST(t.i AS INT)] AS left_sym, s[CAST(t.i AS INT)+1] AS right_sym, freq
        |  FROM syms, unnest(range(1, len(s))) AS t(i))
        |SELECT left_sym, right_sym, CAST(sum(freq) AS BIGINT) AS pair_count
        |FROM pairs GROUP BY 1, 2""".stripMargin,
    "q_tx_vocab" ->
      """SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
        |FROM (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |      FROM documents)
        |WHERE token <> ''
        |GROUP BY token
        |ORDER BY tf DESC, token LIMIT 100""".stripMargin,
    "q_corpus_report" -> {
      val bandSelects = (0 until 2)
        .map { b =>
          val sig = (0 until 4).map(r => minhashSql(b * 4 + r)).mkString(" || '_' || ")
          s"SELECT doc_id, $b AS band, $sig AS sig FROM $shingleFrom"
        }
        .mkString("\n  UNION ALL ")
      s"""WITH RECURSIVE banded AS (
         |  $bandSelects),
         |prs AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         |edges AS (
         |  SELECT id_a AS u, id_b AS v FROM prs
         |  UNION SELECT id_b, id_a FROM prs),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.id),
         |cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
         |q AS (
         |  SELECT doc_id, len(t) AS wc,
         |    (CASE WHEN len(t) BETWEEN 20 AND 400 THEN 0.5 ELSE 0.0 END)
         |    + (CASE WHEN (CASE WHEN len(t) = 0 THEN 0.0
         |         ELSE CAST(len(list_filter(t, x -> x IN ('the','a','and','of','to','in','is'))) AS DOUBLE) / len(t) END)
         |         BETWEEN 0.01 AND 0.5 THEN 0.5 ELSE 0.0 END) AS score
         |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents))
         |SELECT
         |  (SELECT count(*) FROM documents) AS total_docs,
         |  (SELECT count(DISTINCT md5(trim(lower(text)))) FROM documents) AS distinct_texts,
         |  (SELECT count(*) FROM cl WHERE doc_id <> cluster_id) AS near_dup_docs,
         |  (SELECT count(*) FROM q WHERE score >= 0.5) AS quality_pass_docs,
         |  (SELECT CAST(sum(wc) AS BIGINT) FROM q) AS total_tokens,
         |  (SELECT count(*) FROM documents)
         |    - (SELECT count(DISTINCT md5(trim(lower(text)))) FROM documents)
         |    AS exact_dup_docs""".stripMargin
    },
    "q_cr_keep" -> {
      // every stage of the engine-side composition recomputed in SQL: the
      // q_dd_clusters recursive closure, the q_tx_langid marker scoring,
      // the q_tx_quality composite, the q_dd_exact canonical, and the
      // q_sm_hash md5 sample — joined per doc
      val bandSelects = (0 until 2)
        .map { b =>
          val sig = (0 until 4).map(r => minhashSql(b * 4 + r)).mkString(" || '_' || ")
          s"SELECT doc_id, $b AS band, $sig AS sig FROM $shingleFrom"
        }
        .mkString("\n  UNION ALL ")
      val u = "(CAST('0x' || substr(md5('cr' || CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT) / 4294967296.0)"
      s"""WITH RECURSIVE banded AS (
         |  $bandSelects),
         |prs AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         |edges AS (
         |  SELECT id_a AS u, id_b AS v FROM prs
         |  UNION SELECT id_b, id_a FROM prs),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.id),
         |cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
         |lg AS (SELECT doc_id, lang_guess FROM (${langIdOracleSql(TextAnalysis.LangMarkers)})),
         |q AS (
         |  SELECT doc_id,
         |    (CASE WHEN len(t) BETWEEN 20 AND 400 THEN 0.5 ELSE 0.0 END)
         |    + (CASE WHEN (CASE WHEN len(t) = 0 THEN 0.0
         |         ELSE CAST(len(list_filter(t, x -> x IN ('the','a','and','of','to','in','is'))) AS DOUBLE) / len(t) END)
         |         BETWEEN 0.01 AND 0.5 THEN 0.5 ELSE 0.0 END) AS score
         |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents)),
         |ex AS (SELECT md5(trim(lower(text))) AS ch, min(doc_id) AS can FROM documents GROUP BY 1)
         |SELECT d.doc_id,
         |  q.score >= 0.5 AS quality_ok,
         |  lg.lang_guess IN ('en', 'und') AS lang_ok,
         |  d.doc_id = e.can AS exact_canonical,
         |  d.doc_id = cl.cluster_id AS near_canonical,
         |  $u < 0.9 AS sampled,
         |  (q.score >= 0.5 AND lg.lang_guess IN ('en', 'und') AND d.doc_id = e.can
         |   AND d.doc_id = cl.cluster_id AND $u < 0.9) AS keep
         |FROM documents d
         |JOIN q ON q.doc_id = d.doc_id
         |JOIN lg ON lg.doc_id = d.doc_id
         |JOIN ex e ON e.ch = md5(trim(lower(d.text)))
         |JOIN cl ON cl.doc_id = d.doc_id""".stripMargin
    },
    // the indexed path must give the SAME answer as the direct scan — one
    // oracle text serves both queries
    "q_dc_overlap_idx" -> dcOverlapOracleSql,
    "q_dc_overlap" -> dcOverlapOracleSql,
    "q_e2e_curate" -> e2eCurateOracleSql,
    "q_mm_exif" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 13 = 0 OR doc_id % 31 = 0 THEN FALSE
        |       ELSE TRUE END AS has_exif,
        |  CASE WHEN doc_id % 13 = 0 OR doc_id % 31 = 0 THEN 0
        |       ELSE CAST(doc_id % 8 + 1 AS INTEGER) END AS orientation,
        |  CASE WHEN doc_id % 13 = 0 OR doc_id % 31 = 0 THEN NULL
        |       ELSE '2024:01:' || lpad(CAST(doc_id % 27 + 1 AS VARCHAR), 2, '0')
        |            || ' 10:00:00' END AS datetime,
        |  CASE WHEN doc_id % 13 = 0 OR doc_id % 31 = 0 THEN FALSE
        |       ELSE doc_id % 3 = 0 END AS has_gps,
        |  CASE WHEN doc_id % 13 = 0 OR doc_id % 31 = 0 OR doc_id % 5 <> 0 THEN NULL
        |       ELSE 'CamA' END AS make,
        |  CASE WHEN doc_id % 13 = 0 OR doc_id % 31 = 0 THEN NULL
        |       ELSE 'M' || CAST(doc_id % 4 AS VARCHAR) END AS model
        |FROM documents""".stripMargin,
    "q_mm_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS byte_len,
        |  CAST(CAST('0x' || substr(md5(text), 1, 4) AS BIGINT) % 1856 + 64 AS BIGINT) AS width,
        |  CAST(CAST('0x' || substr(md5(text), 5, 4) AS BIGINT) % 1016 + 64 AS BIGINT) AS height,
        |  'image/fake' AS mime
        |FROM documents""".stripMargin,
    "q_mm_audio" ->
      """WITH m AS (SELECT doc_id, md5(text) AS h,
        |    octet_length(encode(text)) AS len FROM documents)
        |SELECT doc_id, CAST(len AS BIGINT) AS byte_len,
        |  CAST(8000 + CAST('0x' || substr(h, 1, 4) AS BIGINT) % 40000 AS BIGINT) AS sample_rate,
        |  CAST(1 + CAST('0x' || substr(h, 9, 2) AS BIGINT) % 2 AS BIGINT) AS channels,
        |  CAST(8 * (1 + CAST('0x' || substr(h, 11, 2) AS BIGINT) % 2) AS BIGINT) AS bits,
        |  CAST(len // ((1 + CAST('0x' || substr(h, 9, 2) AS BIGINT) % 2)
        |             * (1 + CAST('0x' || substr(h, 11, 2) AS BIGINT) % 2)) AS BIGINT) AS frames,
        |  'audio/fake' AS mime
        |FROM m""".stripMargin,
    "q_mm_frames" ->
      """SELECT doc_id, CAST(u.i AS INT) AS frame_idx,
        |  md5(substr(text, CAST(u.i AS INT) * 100 + 1, 100)) AS frame_md5
        |FROM documents, unnest(range(0, (length(text) - 1) // 100 + 1)) AS u(i)
        |WHERE length(text) >= 1""".stripMargin,
    "q_sd_keep" ->
      """SELECT v.vec_id, v.label AS cluster,
        |  NOT EXISTS (
        |    SELECT 1 FROM embeddings o
        |    WHERE o.label = v.label AND o.vec_id < v.vec_id
        |      AND floor(list_cosine_similarity(
        |            CAST(o.embedding AS DOUBLE[]), CAST(v.embedding AS DOUBLE[]))
        |            * 10000 + 0.5) / 10000 >= 0.30) AS keep
        |FROM embeddings v""".stripMargin,
    "q_nb_model" ->
      s"""WITH tr AS (
         |  SELECT lang AS label, $nbToksSql AS tt FROM documents),
         |tok AS (SELECT label, unnest(tt) AS token FROM tr),
         |cnt AS (SELECT label, token, count(*) AS cnt FROM tok GROUP BY 1, 2),
         |tot AS (SELECT label, sum(cnt) AS tot FROM cnt GROUP BY 1),
         |v AS (SELECT count(DISTINCT token) AS v FROM tok)
         |SELECT c.label, c.token, c.cnt,
         |  floor(ln((c.cnt + 1.0) / (t.tot + 1.0 * v.v)) * 1e6 + 0.5) / 1e6 AS log_cond
         |FROM cnt c JOIN tot t USING (label), v""".stripMargin,
    "q_nb_predict" ->
      s"""WITH tr AS (
         |  SELECT doc_id, lang AS label, $nbToksSql AS tt FROM documents),
         |tok AS (SELECT label, unnest(tt) AS token FROM tr),
         |cnt AS (SELECT label, token, count(*) AS c FROM tok GROUP BY 1, 2),
         |tot AS (SELECT label, sum(c) AS tot FROM cnt GROUP BY 1),
         |v AS (SELECT count(DISTINCT token) AS v FROM tok),
         |pri AS (SELECT label, count(*) AS d FROM tr GROUP BY 1),
         |td AS (SELECT count(*) AS td FROM tr),
         |stats AS (
         |  SELECT p.label,
         |    CAST(floor(ln(CAST(p.d AS DOUBLE) / td.td) * 1e9 + 0.5) AS BIGINT) AS prior,
         |    CAST(floor(ln(1.0 / (t.tot + 1.0 * v.v)) * 1e9 + 0.5) AS BIGINT) AS dflt
         |  FROM pri p, td, v, tot t WHERE t.label = p.label),
         |lp AS (
         |  SELECT c.label, c.token,
         |    CAST(floor(ln((c.c + 1.0) / (t.tot + 1.0 * v.v)) * 1e9 + 0.5) AS BIGINT) AS lp
         |  FROM cnt c JOIN tot t USING (label), v),
         |dt AS (SELECT doc_id, unnest(tt) AS token FROM tr),
         |adj AS (
         |  SELECT dt.doc_id, lp.label, sum(lp.lp - s.dflt) AS adj
         |  FROM dt JOIN lp USING (token) JOIN stats s ON s.label = lp.label
         |  GROUP BY 1, 2),
         |base AS (
         |  SELECT tr.doc_id, s.label, s.prior + len(tr.tt) * s.dflt AS b
         |  FROM tr, stats s),
         |sc AS (
         |  SELECT base.doc_id, base.label,
         |    floor((base.b + coalesce(a.adj, 0)) / 1e9 * 1e6 + 0.5) / 1e6 AS score
         |  FROM base LEFT JOIN adj a
         |    ON a.doc_id = base.doc_id AND a.label = base.label)
         |SELECT doc_id, label AS pred_label, score FROM sc
         |QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, label) = 1""".stripMargin,
    "q_ds_weights" ->
      s"""WITH $dsirCteSql
         |SELECT d.doc_id, coalesce(w.n_feats, 0) AS n_feats,
         |  floor(coalesce(w.w, 0) / 1e9 * 1e6 + 0.5) / 1e6 AS weight
         |FROM d LEFT JOIN w USING (doc_id)""".stripMargin,
    "q_ds_sample" ->
      s"""WITH $dsirCteSql,
         |ww AS (
         |  SELECT d.doc_id, coalesce(w.n_feats, 0) AS n_feats,
         |    floor(coalesce(w.w, 0) / 1e9 * 1e6 + 0.5) / 1e6 AS weight
         |  FROM d LEFT JOIN w USING (doc_id))
         |SELECT doc_id, weight,
         |  floor((weight - ln(-ln(
         |    (CAST('0x' || substr(md5('dsir' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) + 0.5)
         |      / 4294967296.0))) * 1e6 + 0.5) / 1e6 AS sample_key
         |FROM ww
         |ORDER BY sample_key DESC, doc_id
         |LIMIT 50""".stripMargin)
  /** UL2 oracle: the q_t5_spans SQL shape instantiated per denoiser
    * (geometry + salt + routing-draw predicate) plus the S-continuation
    * arm — integer thresholds over the 32-bit md5 domain, no float
    * comparison between engines.
    */
  private def ul2MixOracleSql: String = {
    val rT = math.floor(0.5 * 4294967296.0).toLong
    val xT = math.floor(0.75 * 4294967296.0).toLong
    // coalesce(-1) mirrors the engine: a NULL id routes to the R arm
    val draw = "coalesce(CAST('0x' || substr(md5('ul2:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT), -1)"
    def corruptArm(tag: String, salt: String, b: Int, l: Int, pred: String): String =
      s"""SELECT doc.doc_id, '$tag' AS denoiser, coalesce(agg.n, 0) AS n_tokens,
         |  coalesce(agg.input_text, '') AS input_text,
         |  CASE WHEN agg.tgt IS NULL OR agg.tgt = ''
         |       THEN '<extra_id_' || CAST(coalesce(agg.n, 0) // $b AS VARCHAR) || '>'
         |       ELSE agg.tgt || ' <extra_id_' || CAST(agg.n // $b AS VARCHAR) || '>'
         |       END AS target_text
         |FROM (SELECT * FROM documents WHERE $pred) doc LEFT JOIN (
         |  WITH d AS (SELECT doc_id,
         |      list_filter(string_split_regex(trim(lower(coalesce(text, ''))), '\\s+'),
         |        x -> x <> '') AS l
         |    FROM documents WHERE $pred),
         |  tk AS (SELECT doc_id, len(l) AS n, z[1] AS tok, CAST(z[2] AS BIGINT) AS pos
         |    FROM d, unnest(list_zip(l, range(0, len(l)))) AS t(z)),
         |  c AS (SELECT doc_id, n, tok, pos,
         |      pos // $b AS blk, pos % $b AS ib, n // $b AS numfull,
         |      CAST('0x' || substr(md5('$salt:' || CAST(doc_id AS VARCHAR) || ':'
         |        || CAST(pos // $b AS VARCHAR)), 1, 8) AS BIGINT) % ${b - l + 1} AS off
         |    FROM tk),
         |  cl AS (SELECT doc_id, n, pos, blk, ib, off, tok,
         |      (blk < numfull AND ib >= off AND ib < off + $l) AS corr FROM c)
         |  SELECT doc_id, any_value(n) AS n,
         |      string_agg(CASE WHEN NOT corr THEN tok
         |          WHEN ib = off THEN '<extra_id_' || CAST(blk AS VARCHAR) || '>' END,
         |        ' ' ORDER BY pos) AS input_text,
         |      string_agg(CASE
         |          WHEN corr AND ib = off
         |            THEN '<extra_id_' || CAST(blk AS VARCHAR) || '> ' || tok
         |          WHEN corr THEN tok END,
         |        ' ' ORDER BY pos) AS tgt
         |  FROM cl GROUP BY doc_id) agg USING (doc_id)""".stripMargin
    val sArm =
      s"""SELECT doc_id, 's' AS denoiser, CAST(len(l) AS BIGINT) AS n_tokens,
         |  array_to_string(list_concat(l[1:cut], ['<extra_id_0>']), ' ') AS input_text,
         |  array_to_string(list_concat(list_concat(['<extra_id_0>'],
         |    l[cut + 1:len(l)]), ['<extra_id_1>']), ' ') AS target_text
         |FROM (
         |  SELECT doc_id, l,
         |    CAST(CAST('0x' || substr(md5('ul2-s:' || CAST(doc_id AS VARCHAR)), 1, 8)
         |      AS BIGINT) % (len(l) + 1) AS INT) AS cut
         |  FROM (SELECT doc_id,
         |      list_filter(string_split_regex(trim(lower(coalesce(text, ''))), '\\s+'),
         |        x -> x <> '') AS l
         |    FROM documents WHERE $draw >= $xT))""".stripMargin
    Seq(
      corruptArm("r", "ul2-r", 16, 3, s"$draw < $rT"),
      corruptArm("x", "ul2-x", 16, 8, s"$draw >= $rT AND $draw < $xT"),
      sArm).mkString("\n", "\nUNION ALL\n", "")
  }
}
